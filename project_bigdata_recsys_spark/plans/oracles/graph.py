"""DuckDB oracle SQL texts — graph family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['item_pmi'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair_counts AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS c_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    margins AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY 1),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets
           FROM basket)
    SELECT p.part_a, p.part_b,
           CAST(p.c_ab AS BIGINT) AS c_ab,
           round(log2(nb.n_baskets * p.c_ab / (ma.c * mb.c)), 6) AS pmi
    FROM pair_counts p
    JOIN margins ma ON ma.l_partkey = p.part_a
    JOIN margins mb ON mb.l_partkey = p.part_b
    CROSS JOIN nb
    ORDER BY pmi DESC, p.part_a, p.part_b
    LIMIT 25
"""

TEXTS['item_communities'] = """
    WITH RECURSIVE basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pr AS (
        SELECT a.l_partkey AS doc_a, b.l_partkey AS doc_b
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
              UNION SELECT doc_b AS s, doc_a AS d FROM pr),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
    cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
    SELECT label AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_parts,
           min(id) AS min_part,
           max(id) AS max_part
    FROM cc
    GROUP BY label
    HAVING count(*) >= 2
    ORDER BY n_parts DESC, cluster_id
    LIMIT 25
"""

TEXTS['item_triangles'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM und e1
        JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN und e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
    corners AS (
        SELECT x AS l_partkey FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri),
    per_node AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY l_partkey),
    t AS (SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri)
    SELECT l_partkey, n_triangles, total_triangles
    FROM per_node CROSS JOIN t
    ORDER BY n_triangles DESC, l_partkey
    LIMIT 20
"""

TEXTS['link_prediction_adamic_adar'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (
        SELECT src AS z, dst AS nb FROM und
        UNION ALL SELECT dst, src FROM und),
    deg AS (SELECT z, CAST(count(*) AS BIGINT) AS dg
            FROM adj GROUP BY z),
    centers AS (
        SELECT z, CAST(round(1000000.0 / ln(dg)) AS BIGINT) AS w
        FROM deg WHERE dg >= 2 AND dg <= 64),
    wedges AS (
        SELECT a.nb AS u, b.nb AS v, c.w
        FROM adj a
        JOIN centers c ON a.z = c.z
        JOIN adj b ON b.z = a.z AND a.nb < b.nb),
    scored AS (
        SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(w) AS BIGINT) AS aa
        FROM wedges GROUP BY u, v),
    ne AS (
        SELECT s.* FROM scored s
        WHERE NOT EXISTS (SELECT 1 FROM und e
                          WHERE e.src = s.u AND e.dst = s.v))
    SELECT u, v, n_common, round(aa / 1000000.0, 6) AS aa_score
    FROM ne ORDER BY aa DESC, u, v LIMIT 20
"""

TEXTS['two_hop_reach'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst, src FROM half),
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY src),
    seeds AS (
        SELECT src AS seed, degree FROM deg
        ORDER BY degree DESC, src ASC LIMIT 20),
    h1 AS (
        SELECT s.seed, e.dst AS n1
        FROM seeds s JOIN edges e ON e.src = s.seed),
    h2 AS (
        SELECT h.seed, e.dst AS node
        FROM h1 h JOIN edges e ON e.src = h.n1),
    reach AS (
        SELECT DISTINCT seed, node FROM (
            SELECT seed, n1 AS node FROM h1
            UNION ALL SELECT seed, node FROM h2)
        WHERE node <> seed)
    SELECT s.seed AS part, s.degree,
           s.degree AS n_one_hop,
           CAST(count(*) AS BIGINT) AS n_two_hop,
           round(count(*) * 1.0 / s.degree, 6) AS expansion_ratio
    FROM reach r JOIN seeds s ON s.seed = r.seed
    GROUP BY s.seed, s.degree ORDER BY part
"""

TEXTS['cooccurrence_drift'] = """
    WITH basket AS (
        SELECT DISTINCT strftime(o.o_orderdate, '%Y-%m') AS month,
               l.l_orderkey, l.l_partkey
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
        JOIN orders o ON o.o_orderkey = l.l_orderkey),
    edges AS (
        SELECT DISTINCT a.month, a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    months AS (SELECT DISTINCT month FROM edges),
    month_pairs AS (
        SELECT lag(month) OVER (ORDER BY month) AS prev_month,
               month AS curr_month
        FROM months QUALIFY prev_month IS NOT NULL),
    counts AS (
        SELECT month, CAST(count(*) AS BIGINT) AS n_edges
        FROM edges GROUP BY month),
    common AS (
        SELECT p.prev_month, p.curr_month,
               CAST(count(*) AS BIGINT) AS n_common
        FROM month_pairs p
        JOIN edges e1 ON e1.month = p.prev_month
        JOIN edges e2 ON e2.month = p.curr_month
                     AND e2.src = e1.src AND e2.dst = e1.dst
        GROUP BY p.prev_month, p.curr_month)
    SELECT p.prev_month, p.curr_month,
           cp.n_edges AS n_prev,
           cc.n_edges AS n_curr,
           CAST(coalesce(cm.n_common, 0) AS BIGINT) AS n_common,
           CAST(cc.n_edges - coalesce(cm.n_common, 0) AS BIGINT) AS n_new,
           CAST(cp.n_edges - coalesce(cm.n_common, 0) AS BIGINT)
               AS n_dropped,
           round(coalesce(cm.n_common, 0) * 1.0
                 / (cp.n_edges + cc.n_edges - coalesce(cm.n_common, 0)), 6)
               AS edge_jaccard
    FROM month_pairs p
    JOIN counts cp ON cp.month = p.prev_month
    JOIN counts cc ON cc.month = p.curr_month
    LEFT JOIN common cm ON cm.prev_month = p.prev_month
                       AND cm.curr_month = p.curr_month
    ORDER BY p.curr_month
"""

TEXTS['label_prop_communities'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (
        SELECT src, dst FROM half WHERE w >= 2.0
        UNION ALL SELECT dst, src FROM half WHERE w >= 2.0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    v1 AS (
        SELECT e.src, l.label, count(*) AS n
        FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY e.src, l.label),
    l1 AS (
        SELECT src AS node, label FROM (
            SELECT src, label, row_number() OVER (PARTITION BY src
                ORDER BY n DESC, label ASC) AS rk FROM v1)
        WHERE rk = 1),
    v2 AS (
        SELECT e.src, l.label, count(*) AS n
        FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY e.src, l.label),
    l2 AS (
        SELECT src AS node, label FROM (
            SELECT src, label, row_number() OVER (PARTITION BY src
                ORDER BY n DESC, label ASC) AS rk FROM v2)
        WHERE rk = 1),
    v3 AS (
        SELECT e.src, l.label, count(*) AS n
        FROM edges e JOIN l2 l ON l.node = e.dst GROUP BY e.src, l.label),
    l3 AS (
        SELECT src AS node, label FROM (
            SELECT src, label, row_number() OVER (PARTITION BY src
                ORDER BY n DESC, label ASC) AS rk FROM v3)
        WHERE rk = 1)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_member,
           CAST(sum(node) AS BIGINT) AS member_checksum
    FROM l3 GROUP BY label
    ORDER BY n_members DESC, label ASC LIMIT 50
"""

TEXTS['local_clustering_profile'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM und e1
        JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN und e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
    corners AS (
        SELECT x AS l_partkey FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri),
    per_node AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY l_partkey),
    deg AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT src AS l_partkey FROM und
              UNION ALL SELECT dst FROM und)
        GROUP BY l_partkey)
    SELECT p.l_partkey, d.degree, p.n_triangles,
           CAST((2::HUGEINT * p.n_triangles * 1000000)
                // (d.degree::HUGEINT * (d.degree - 1)) AS BIGINT)
               AS cc_micro
    FROM per_node p JOIN deg d USING (l_partkey)
    WHERE d.degree >= 2 AND d.degree <= 512
    ORDER BY cc_micro DESC, p.n_triangles DESC, p.l_partkey
    LIMIT 25
"""
