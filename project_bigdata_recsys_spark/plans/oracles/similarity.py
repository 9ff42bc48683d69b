"""DuckDB oracle SQL texts — similarity family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['label_centroid_outliers'] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT vec_id, label,
               unnest(range(0, len(emb))) AS pos,
               unnest(emb) AS v
        FROM b),
    cent AS (SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos),
    cnorm AS (SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label),
    per_vec AS (
        SELECT vals.vec_id, vals.label,
               sum(vals.v * cent.c) AS dot,
               sqrt(sum(vals.v * vals.v)) AS vn
        FROM vals JOIN cent ON vals.label = cent.label AND vals.pos = cent.pos
        GROUP BY vals.vec_id, vals.label),
    scored AS (
        SELECT p.label, p.vec_id,
               round(p.dot / (p.vn * n.cn), 6) AS cos_sim
        FROM per_vec p JOIN cnorm n ON p.label = n.label),
    ranked AS (
        SELECT label, vec_id, cos_sim,
               row_number() OVER (PARTITION BY label
                   ORDER BY cos_sim ASC, vec_id ASC) AS rank
        FROM scored)
    SELECT label, CAST(rank AS INT) AS rank, vec_id, cos_sim
    FROM ranked WHERE rank <= 5 ORDER BY label, rank
"""

TEXTS['nearest_centroid_agreement'] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT vec_id, label,
               unnest(range(0, len(emb))) AS pos,
               unnest(emb) AS v
        FROM b),
    cent AS (SELECT label AS label_c, pos, avg(v) AS c
             FROM vals GROUP BY label, pos),
    cnorm AS (SELECT label_c, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label_c),
    scores AS (
        SELECT vals.vec_id, vals.label, cent.label_c,
               round(sum(vals.v * cent.c)
                     / (sqrt(sum(vals.v * vals.v)) * any_value(n.cn)), 6)
                   AS cos_sim
        FROM vals
        JOIN cent ON vals.pos = cent.pos
        JOIN cnorm n ON cent.label_c = n.label_c
        GROUP BY vals.vec_id, vals.label, cent.label_c),
    nearest AS (
        SELECT vec_id, label,
               CASE WHEN first(label_c ORDER BY cos_sim DESC, label_c ASC)
                         = label
                    THEN 1 ELSE 0 END AS agree
        FROM scores GROUP BY vec_id, label)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(agree) AS BIGINT) AS n_agree,
           round(sum(agree) * 1.0 / count(*), 4) AS agree_rate
    FROM nearest GROUP BY label ORDER BY label
"""

TEXTS['int8_quantization_profile'] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    s AS (SELECT vec_id, label, emb,
                 list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
          FROM b),
    r AS (SELECT vec_id, label, scale, emb,
                 list_transform(emb,
                     x -> least(greatest(round(x / scale), -127.0), 127.0)
                          * scale) AS recon
          FROM s WHERE scale > 0),
    e AS (SELECT label, scale,
                 list_sum(list_transform(range(0, len(emb)),
                     i -> pow(emb[i + 1] - recon[i + 1], 2))) / len(emb)
                     AS mse,
                 list_dot_product(emb, recon)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(recon, recon))) AS cos_sim
          FROM r)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(mse), 8) AS avg_mse,
           round(avg(cos_sim), 6) AS avg_cos,
           round(min(cos_sim), 6) AS min_cos,
           round(avg(scale), 6) AS avg_scale
    FROM e GROUP BY label ORDER BY label
"""

TEXTS['embedding_dim_profile'] = """
    WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    vals AS (
        SELECT unnest(range(0, len(emb))) AS pos, unnest(emb) AS v FROM b),
    per_dim AS (
        SELECT pos, count(*) AS n,
               sum(CAST(round(v * 1e9) AS BIGINT)) AS s1,
               sum(CAST(round(v * v * 1e12) AS BIGINT)) AS s2,
               sum(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS n_zero,
               min(v) AS mn, max(v) AS mx
        FROM vals GROUP BY pos)
    SELECT CAST(pos AS INT) AS dim,
           CAST(n AS BIGINT) AS n,
           round(s1 * 1.0 / n / 1e9, 6) AS mean,
           round(sqrt(greatest(
               s2 * 1.0 / n / 1e12
               - (s1 * 1.0 / n / 1e9) * (s1 * 1.0 / n / 1e9), 0.0)), 6)
               AS std,
           round(n_zero * 1.0 / n, 4) AS zero_frac,
           round(mn, 6) AS min_v,
           round(mx, 6) AS max_v
    FROM per_dim ORDER BY dim
"""

TEXTS['centroid_confusion'] = """
    WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    vals AS (
        SELECT label, unnest(range(0, len(emb))) AS pos, unnest(emb) AS v
        FROM b),
    cent AS (SELECT label, pos, avg(v) AS c FROM vals GROUP BY label, pos),
    packed AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM cent GROUP BY label),
    pairs AS (
        SELECT a.label AS label_a, b2.label AS label_b,
               round(list_dot_product(a.centroid, b2.centroid)
                     / (sqrt(list_dot_product(a.centroid, a.centroid))
                        * sqrt(list_dot_product(b2.centroid, b2.centroid))),
                     6) AS cos_sim
        FROM packed a JOIN packed b2 ON a.label < b2.label)
    SELECT label_a, label_b, cos_sim, cos_sim >= 0.90 AS confusable
    FROM pairs ORDER BY cos_sim DESC, label_a, label_b
"""

TEXTS['ann_rerank'] = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
               FROM embeddings WHERE vec_id < 5),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT query_id, vec_id, emb, q_emb,
               round(list_dot_product(emb, q_emb)
                     / (sqrt(list_dot_product(emb, emb))
                        * sqrt(list_dot_product(q_emb, q_emb))), 6) AS cos_sim
        FROM e CROSS JOIN q WHERE vec_id != query_id),
    short AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored),
    rr AS (
        SELECT query_id, vec_id, cos_sim,
               round(0.7 * cos_sim
                     + 0.2 * (list_sum(list_transform(range(0, len(emb)),
                           i -> CASE WHEN emb[i + 1] * q_emb[i + 1] > 0
                                     THEN 1.0 ELSE 0.0 END)) / len(emb))
                     + 0.1 / (1 + sqrt(list_sum(list_transform(range(0, len(emb)),
                           i -> (emb[i + 1] - q_emb[i + 1])
                                * (emb[i + 1] - q_emb[i + 1]))))), 6)
                   AS rerank_score
        FROM short WHERE rnk <= 25)
    SELECT query_id, vec_id, cos_sim, rerank_score,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY rerank_score DESC, vec_id) AS INTEGER) AS final_rank
    FROM rr
    QUALIFY final_rank <= 5
    ORDER BY query_id, final_rank
"""

TEXTS['item_similar_neighbors'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (
        SELECT src, dst, w FROM half
        UNION ALL SELECT dst, src, w FROM half),
    margins AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
                FROM basket GROUP BY 1),
    anchors AS (
        SELECT l_partkey AS src, c AS c_src FROM margins
        ORDER BY c DESC, l_partkey LIMIT 50),
    scored AS (
        SELECT e.src, e.dst, e.w AS c_ab,
               round(e.w / sqrt(a.c_src * m.c), 6) AS salton
        FROM edges e
        JOIN anchors a ON e.src = a.src
        JOIN margins m ON e.dst = m.l_partkey),
    ranked AS (
        SELECT src, dst, c_ab, salton,
               row_number() OVER (PARTITION BY src
                                  ORDER BY salton DESC, dst) AS rk
        FROM scored)
    SELECT src, CAST(rk AS INT) AS rk, dst, c_ab, salton
    FROM ranked WHERE rk <= 5
    ORDER BY src, rk
"""

TEXTS['embedding_correlation_pairs'] = """
    WITH b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings),
    vals AS (
        SELECT vec_id,
               unnest(range(0, len(emb))) AS pos,
               CAST(round(unnest(emb) * 1e6) AS BIGINT) AS vm
        FROM b),
    per_dim AS (
        SELECT pos, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vm) AS BIGINT) AS s1,
               sum(CAST(vm AS HUGEINT) * vm) AS s2
        FROM vals GROUP BY pos),
    pair_sums AS (
        SELECT a.pos AS i, bb.pos AS j,
               sum(CAST(a.vm AS HUGEINT) * bb.vm) AS sij
        FROM vals a JOIN vals bb
          ON a.vec_id = bb.vec_id AND a.pos < bb.pos
        GROUP BY a.pos, bb.pos),
    m AS (
        SELECT p.i, p.j, di.n AS n_vecs,
               CAST(di.n AS DOUBLE) * CAST(p.sij AS DOUBLE)
                   - CAST(di.s1 AS DOUBLE) * dj.s1 AS num,
               CAST(di.n AS DOUBLE) * CAST(di.s2 AS DOUBLE)
                   - CAST(di.s1 AS DOUBLE) * di.s1 AS var_i,
               CAST(di.n AS DOUBLE) * CAST(dj.s2 AS DOUBLE)
                   - CAST(dj.s1 AS DOUBLE) * dj.s1 AS var_j
        FROM pair_sums p
        JOIN per_dim di ON di.pos = p.i
        JOIN per_dim dj ON dj.pos = p.j)
    SELECT CAST(i AS INTEGER) AS dim_i,
           CAST(j AS INTEGER) AS dim_j,
           n_vecs,
           round(num / sqrt(var_i * var_j), 6) AS r
    FROM m
    WHERE var_i > 0 AND var_j > 0
    ORDER BY CAST(round(abs(num / sqrt(var_i * var_j)) * 1e6) AS BIGINT)
                 DESC,
             dim_i, dim_j
    LIMIT 20
"""

TEXTS['jl_distortion_audit'] = """
    WITH samp AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        ORDER BY ('0x' || substr(md5('jl:' || CAST(vec_id AS VARCHAR)),
                                 1, 8))::BIGINT / 4294967296.0, vec_id
        LIMIT 32),
    cells AS MATERIALIZED (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
                    AS BIGINT) AS xm
        FROM samp),
    ks AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS kk),
    proj AS MATERIALIZED (
        SELECT vec_id, kk,
               CAST(sum((1 - 2 * (('0x' || substr(md5('jls:'
                             || CAST(i AS VARCHAR) || ':'
                             || CAST(kk AS VARCHAR)), 1, 8))::BIGINT % 2))
                        * xm) AS BIGINT) AS p
        FROM cells CROSS JOIN ks GROUP BY 1, 2),
    po AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS proj2
        FROM proj a JOIN proj b ON a.kk = b.kk AND a.vec_id < b.vec_id
        GROUP BY 1, 2),
    od AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(sum((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS orig2
        FROM cells a JOIN cells b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT round(proj2 * 1.0 / (8.0 * orig2), 6) AS ratio
        FROM po JOIN od USING (va, vb))
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(CAST(round(ratio * 1e6) AS BIGINT)) / 1e6
                 / count(*), 6) AS mean_ratio,
           min(ratio) AS min_ratio,
           max(ratio) AS max_ratio,
           round(sum(CASE WHEN abs(ratio - 1.0) <= 0.2
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
               AS frac_within_20pct
    FROM pairs
"""

TEXTS['mann_kendall_trend'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS MATERIALIZED (
        SELECT g.event_type, g.day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b2.y > a.y THEN 1
                             WHEN b2.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM series a JOIN series b2
          ON b2.event_type = a.event_type AND a.day < b2.day
        GROUP BY 1),
    nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM series GROUP BY 1),
    ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
              FROM series GROUP BY 1, 2)
        GROUP BY 1),
    j AS (
        SELECT nd.event_type, n_days, s_stat,
               (n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)
                   / 18.0 AS var_s
        FROM nd JOIN s USING (event_type) JOIN ties USING (event_type)),
    zed AS (
        SELECT event_type, n_days, s_stat, round(var_s, 4) AS var_s,
               round(CASE WHEN s_stat > 0
                          THEN (s_stat - 1) / sqrt(var_s)
                          WHEN s_stat < 0
                          THEN (s_stat + 1) / sqrt(var_s)
                          ELSE 0.0 END, 4) AS z_score
        FROM j)
    SELECT event_type, n_days, s_stat, var_s, z_score,
           CASE WHEN z_score > 1.96 THEN 'increasing'
                WHEN z_score < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM zed ORDER BY event_type
"""

TEXTS['hard_negative_mining'] = """
    WITH q AS (SELECT vec_id AS query_id, label AS anchor_label,
                      embedding AS q_emb
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, q.anchor_label,
               e.vec_id AS neg_vec_id, e.label AS neg_label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.q_emb AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                                CAST(q.q_emb AS DOUBLE[])))),
                     6) AS cos_sim
        FROM embeddings e CROSS JOIN q WHERE e.label != q.anchor_label),
    ranked AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id
            ORDER BY cos_sim DESC, neg_vec_id) AS INTEGER) AS rank
        FROM scored)
    SELECT query_id, anchor_label, rank, neg_vec_id, neg_label, cos_sim
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
"""
