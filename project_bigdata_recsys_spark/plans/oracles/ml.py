"""DuckDB oracle SQL texts — ml family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['psi_drift'] = """
    WITH u AS (
        SELECT o_orderkey, o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    newsnap AS (
        SELECT CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_totalprice FROM u WHERE u_new < 0.01),
    ranked AS (
        SELECT o_totalprice,
               percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        FROM orders),
    eb AS (SELECT least(floor(pr * 10), 9) AS b, max(o_totalprice) AS e
           FROM ranked GROUP BY 1 HAVING least(floor(pr * 10), 9) < 9),
    edges AS (SELECT list(e ORDER BY e) AS arr FROM eb),
    oc AS (SELECT len(list_filter(edges.arr, x -> x < o_totalprice)) AS bucket,
                  count(*) AS n_old
           FROM orders CROSS JOIN edges
           GROUP BY 1),
    nc AS (SELECT len(list_filter(edges.arr, x -> x < o_totalprice)) AS bucket,
                  count(*) AS n_new
           FROM newsnap CROSS JOIN edges
           GROUP BY 1),
    j AS (SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
                 coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
          FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket),
    t AS (SELECT sum(n_old) AS so, sum(n_new) AS sn FROM j)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           round(greatest(n_old * 1.0 / so, 1e-9), 6) AS p_old,
           round(greatest(n_new * 1.0 / sn, 1e-9), 6) AS p_new,
           round((greatest(n_old * 1.0 / so, 1e-9)
                  - greatest(n_new * 1.0 / sn, 1e-9))
                 * ln(greatest(n_old * 1.0 / so, 1e-9)
                      / greatest(n_new * 1.0 / sn, 1e-9)), 8) AS psi_term
    FROM j CROSS JOIN t ORDER BY bucket
"""

TEXTS['schema_drift_report'] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    newsnap AS (
        SELECT o_custkey, o_orderstatus, o_orderpriority,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM u WHERE u_new < 0.01),
    old_p AS (
        SELECT * FROM (
            SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
                   count(o_custkey) AS nn, count(DISTINCT o_custkey) AS nd
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*), count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM orders)),
    new_p AS (
        SELECT * FROM (
            SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
                   count(o_custkey) AS nn, count(DISTINCT o_custkey) AS nd
            FROM newsnap
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM newsnap
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM newsnap
            UNION ALL
            SELECT 'o_totalprice', count(*), count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM newsnap))
    SELECT o.col_name,
           CAST(o.n_rows AS BIGINT) AS n_rows_old,
           CAST(n.n_rows AS BIGINT) AS n_rows_new,
           CAST(o.nn AS BIGINT) AS n_nonnull_old,
           CAST(n.nn AS BIGINT) AS n_nonnull_new,
           CAST(o.nd AS BIGINT) AS n_distinct_old,
           CAST(n.nd AS BIGINT) AS n_distinct_new,
           CAST(n.nd - o.nd AS BIGINT) AS distinct_delta
    FROM old_p o JOIN new_p n USING (col_name)
    ORDER BY o.col_name
"""

TEXTS['als_ranking_eval'] = """
    WITH u AS (
        SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_users
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT k, u.n_users,
           TRUE AS coverage_ok,
           TRUE AS range_ok,
           TRUE AS sandwich_ok
    FROM (SELECT unnest([5, 10, 20]) AS k) ks CROSS JOIN u
    ORDER BY k
"""

TEXTS['ucb_ranking'] = """
    WITH arms AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_pulls,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS N FROM arms)
    SELECT l_partkey, n_pulls,
           round(s / CAST(n_pulls AS DOUBLE), 6) AS mean_reward,
           round(s / CAST(n_pulls AS DOUBLE)
                 + sqrt(2.0 * ln(CAST(N AS DOUBLE)) / n_pulls), 6)
               AS ucb_score
    FROM arms CROSS JOIN tot
    WHERE n_pulls >= 25
    ORDER BY ucb_score DESC, l_partkey
    LIMIT 20
"""

TEXTS['ips_eval'] = """
    WITH arms AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                    AS BIGINT) AS rs
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(sum(rs) AS BIGINT) AS rt FROM arms),
    topk AS (SELECT l_partkey FROM arms
             ORDER BY n DESC, l_partkey LIMIT 100),
    fl AS (
        SELECT a.n, a.rs,
               CAST(round(1000000.0 * t.nt / (100 * a.n)) AS BIGINT) AS w,
               t.nt, t.rt
        FROM arms a JOIN topk USING (l_partkey) CROSS JOIN tot t),
    agg AS (
        SELECT max(nt) AS nt, max(rt) AS rt,
               CAST(sum(rs * w) AS BIGINT) AS rw,
               CAST(sum(n * w) AS BIGINT) AS sw,
               CAST(sum(n * w * w) AS BIGINT) AS sw2
        FROM fl)
    SELECT nt AS n_logged, CAST(100 AS BIGINT) AS k,
           round(rt * 1.0 / nt, 6) AS logged_reward,
           round(rw / 1000000.0 / nt, 6) AS ips_reward,
           round((sw / 1000000.0) * (sw / 1000000.0)
                 / (sw2 / 1000000000000.0), 4) AS effective_sample_size
    FROM agg
"""

TEXTS['recs_diversity_profile'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS DOUBLE) AS w
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (SELECT src, dst, w FROM half
              UNION ALL SELECT dst, src, w FROM half),
    anchors AS (
        SELECT src FROM (
            SELECT src, sum(w) AS s FROM edges GROUP BY src
            ORDER BY s DESC, src LIMIT 20)),
    recs AS (
        SELECT src, dst FROM (
            SELECT e.src, e.dst,
                   row_number() OVER (
                       PARTITION BY e.src ORDER BY e.w DESC, e.dst) AS rk
            FROM edges e JOIN anchors a USING (src))
        WHERE rk <= 5),
    pairs AS (
        SELECT r1.src AS anchor, r1.dst % 500 AS v1, r2.dst % 500 AS v2
        FROM recs r1 JOIN recs r2
          ON r1.src = r2.src AND r1.dst < r2.dst),
    vec AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    scored AS (
        SELECT anchor,
               CAST(round(1000000.0 * (1 - list_dot_product(e1.v, e2.v)
                    / (sqrt(list_dot_product(e1.v, e1.v))
                       * sqrt(list_dot_product(e2.v, e2.v)))))
                    AS BIGINT) AS d
        FROM pairs p
        JOIN vec e1 ON e1.vec_id = p.v1
        JOIN vec e2 ON e2.vec_id = p.v2),
    cov AS (SELECT round(count(DISTINCT dst) * 1.0
                         / (SELECT count(*) FROM part), 6) AS c
            FROM recs)
    SELECT anchor, CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(d) / 1000000.0 / count(*), 6)
               AS intra_list_diversity,
           (SELECT c FROM cov) AS catalog_coverage
    FROM scored GROUP BY anchor ORDER BY anchor
"""

TEXTS['hybrid_search'] = """
    WITH toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(sum(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY term),
    q AS (SELECT term, doc_freq FROM dft
          ORDER BY total_tf DESC, term LIMIT 3),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                 (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
    bscored AS (
        SELECT tf.term, tf.doc_id,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    sparse AS (
        SELECT term, doc_id, rk_s FROM (
            SELECT term, doc_id,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY bm25 DESC, doc_id) AS rk_s
            FROM bscored)
        WHERE rk_s <= 50),
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    qe AS (
        SELECT qv.term, e.v AS qvec
        FROM (SELECT term,
                     ('0x' || substr(md5('qvec:' || term), 1, 8))::BIGINT
                         % 500 AS qvid
              FROM q) qv
        JOIN emb e ON e.vec_id = qv.qvid),
    cells AS (
        SELECT qe.term, e.vec_id,
               round(list_dot_product(e.v, qe.qvec)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(qe.qvec, qe.qvec))), 6)
                   AS cs
        FROM emb e CROSS JOIN qe),
    probed AS (
        SELECT term, vec_id, cs FROM (
            SELECT term, vec_id, cs,
                   row_number() OVER (PARTITION BY term
                                      ORDER BY cs DESC, vec_id) AS crk
            FROM cells)
        WHERE crk <= 5),
    docs AS (SELECT doc_id, doc_id % 500 AS vec_id FROM documents),
    dense AS (
        SELECT term, doc_id, rk_d FROM (
            SELECT p.term, d.doc_id,
                   row_number() OVER (PARTITION BY p.term
                                      ORDER BY p.cs DESC, d.doc_id)
                       AS rk_d
            FROM docs d JOIN probed p USING (vec_id))
        WHERE rk_d <= 50),
    fused AS (
        SELECT coalesce(s.term, de.term) AS query_term,
               coalesce(s.doc_id, de.doc_id) AS doc_id,
               CAST(coalesce(s.rk_s, 0) AS INTEGER) AS bm25_rank,
               CAST(coalesce(de.rk_d, 0) AS INTEGER) AS cos_rank,
               CAST(coalesce(CAST(round(1000000000.0 / (60 + s.rk_s))
                                  AS BIGINT), 0)
                    + coalesce(CAST(round(1000000000.0 / (60 + de.rk_d))
                                    AS BIGINT), 0) AS BIGINT) AS rrf_micro
        FROM sparse s
        FULL OUTER JOIN dense de
          ON s.term = de.term AND s.doc_id = de.doc_id)
    SELECT query_term, doc_id, bm25_rank, cos_rank, rrf_micro
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_term
              ORDER BY rrf_micro DESC, doc_id) AS frk
          FROM fused)
    WHERE frk <= 10
    ORDER BY query_term, rrf_micro DESC, doc_id
"""

TEXTS['welch_ttest_drift'] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    sided AS (
        SELECT vc, CASE WHEN day <= m THEN 1 ELSE 0 END AS a
        FROM ev CROSS JOIN mid),
    agg AS (
        SELECT CAST(sum(a) AS BIGINT) AS n_a,
               CAST(sum(1 - a) AS BIGINT) AS n_b,
               CAST(sum(a * vc) AS BIGINT) AS sa,
               CAST(sum((1 - a) * vc) AS BIGINT) AS sb,
               CAST(sum(a * vc * vc) AS BIGINT) AS ssa,
               CAST(sum((1 - a) * vc * vc) AS BIGINT) AS ssb
        FROM sided),
    m2 AS (
        SELECT n_a, n_b,
               sa / CAST(n_a AS DOUBLE) AS ma,
               sb / CAST(n_b AS DOUBLE) AS mb,
               (ssa - sa * (sa / CAST(n_a AS DOUBLE)))
                   / (CAST(n_a AS DOUBLE) - 1.0) AS va,
               (ssb - sb * (sb / CAST(n_b AS DOUBLE)))
                   / (CAST(n_b AS DOUBLE) - 1.0) AS vb
        FROM agg),
    m3 AS (
        SELECT *, va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)
                      AS se2
        FROM m2)
    SELECT n_a, n_b,
           round(ma / 100.0, 6) AS mean_early,
           round(mb / 100.0, 6) AS mean_late,
           round((ma - mb) / sqrt(se2), 6) AS t_stat,
           round(se2 * se2
                 / ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) - 1.0)
                    + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
                        / (CAST(n_b AS DOUBLE) - 1.0)), 4) AS welch_df,
           abs(round((ma - mb) / sqrt(se2), 6)) > 1.96
               AS mean_shift_detected
    FROM m3
"""

TEXTS['calibration_bins'] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN day <= m THEN 1 ELSE 0 END) AS BIGINT)
                   AS ne,
               CAST(sum(CASE WHEN day <= m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pe,
               CAST(max(CASE WHEN day > m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev CROSS JOIN mid GROUP BY user_id),
    scored AS (
        SELECT y,
               CAST(round(1000000.0 * (pe + 1) / (ne + 2)) AS BIGINT)
                   AS p_micro
        FROM per_user),
    binned AS (
        SELECT CAST(floor(p_micro / 100000) AS BIGINT) AS bin, y, p_micro
        FROM scored),
    folds AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(p_micro) AS BIGINT) AS sp,
               CAST(sum(p_micro * p_micro) AS BIGINT) AS spp,
               CAST(sum(p_micro * y) AS BIGINT) AS spy,
               CAST(sum(y) AS BIGINT) AS sy
        FROM binned GROUP BY bin)
    SELECT bin, n_users,
           round(sp / CAST(n_users AS DOUBLE) / 1000000.0, 6)
               AS avg_predicted,
           round(sy / CAST(n_users AS DOUBLE), 6) AS observed_rate,
           round((CAST(spp AS DOUBLE) - 2000000.0 * spy
                  + 1000000000000.0 * sy)
                 / CAST(n_users AS DOUBLE) / 1000000000000.0, 6) AS brier
    FROM folds ORDER BY bin
"""

TEXTS['conformal_interval_eval'] = """
    WITH o AS (
        SELECT o_orderpriority AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5('conf:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT % 4 AS b
        FROM orders),
    model AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n_train,
               CAST(round(sum(cents) * 1.0 / count(*)) AS BIGINT)
                   AS pred_cents
        FROM o WHERE b <= 1 GROUP BY prio),
    cal AS (
        SELECT o.prio, abs(cents - pred_cents) AS score,
               CAST(count(*) AS BIGINT) AS n
        FROM o JOIN model USING (prio) WHERE b = 2
        GROUP BY 1, 2),
    ranked AS (
        SELECT prio, score,
               sum(n) OVER (PARTITION BY prio ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               CAST(sum(n) OVER (PARTITION BY prio) AS BIGINT) AS n_calib
        FROM cal),
    q AS (
        SELECT prio, n_calib, CAST(min(score) AS BIGINT) AS q_hat_cents
        FROM ranked
        WHERE cum_n >= CAST(ceil((n_calib + 1) * 9.0 / 10) AS BIGINT)
        GROUP BY prio, n_calib),
    cov AS (
        SELECT o.prio, n_train, n_calib, pred_cents, q_hat_cents,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN abs(cents - pred_cents) <= q_hat_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM o JOIN model USING (prio) JOIN q USING (prio)
        WHERE b = 3
        GROUP BY 1, 2, 3, 4, 5)
    SELECT prio, n_train, n_calib, n_test,
           round(pred_cents / 100.0, 2) AS pred_price,
           round(q_hat_cents / 100.0, 2) AS q_hat_price,
           round(n_covered * 1.0 / n_test, 4) AS coverage,
           0.9 AS target_coverage
    FROM cov ORDER BY prio
"""

TEXTS['aa_test_calibration'] = """
    WITH reps AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               unnest(range(0, 20)) AS split_id
        FROM events),
    cells AS (
        SELECT split_id,
               ('0x' || substr(md5('aa:' || CAST(user_id AS VARCHAR)
                               || ':' || CAST(split_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM reps GROUP BY 1, 2),
    sides AS (
        SELECT split_id, arm, n,
               s / CAST(n AS DOUBLE) AS m,
               (ss - s * (s / CAST(n AS DOUBLE))) / (n - 1.0) AS v
        FROM cells),
    per_split AS MATERIALIZED (
        SELECT t.split_id, t.n AS nt, c.n AS nc,
               round((t.m - c.m) / sqrt(t.v / t.n + c.v / c.n), 4)
                   AS z_score,
               CAST(CASE WHEN abs(round((t.m - c.m)
                          / sqrt(t.v / t.n + c.v / c.n), 4)) > 1.96
                         THEN 1 ELSE 0 END AS INT) AS false_positive
        FROM (SELECT * FROM sides WHERE arm = 1) t
        JOIN (SELECT * FROM sides WHERE arm = 0) c USING (split_id)),
    summary AS (
        SELECT round(sum(false_positive) * 1.0 / count(*), 4) AS fp_rate,
               round(sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                     / count(*), 4) AS mean_z,
               round((sum(CAST(round(z_score * 1e4) AS BIGINT)
                          * CAST(round(z_score * 1e4) AS BIGINT)) / 1e8
                      - count(*)
                        * (sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                           / count(*))
                        * (sum(CAST(round(z_score * 1e4) AS BIGINT)) / 1e4
                           / count(*)))
                     / (count(*) - 1.0), 4) AS var_z
        FROM per_split)
    SELECT split_id, nt, nc, z_score, false_positive,
           fp_rate, mean_z, var_z
    FROM per_split CROSS JOIN summary
    ORDER BY split_id
"""

# shared propensity fixture (propensity_scored) for the Brier
# decomposition and isotonic recalibration twins
_PROPENSITY_CTES = """ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN day <= m THEN 1 ELSE 0 END) AS BIGINT)
                   AS ne,
               CAST(sum(CASE WHEN day <= m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pe,
               CAST(max(CASE WHEN day > m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev CROSS JOIN mid GROUP BY user_id),
    scored AS (
        SELECT y,
               CAST(round(1000000.0 * (pe + 1) / (ne + 2)) AS BIGINT)
                   AS p_micro
        FROM per_user),
    binned AS (
        SELECT CAST(floor(p_micro / 100000) AS BIGINT) AS bin, y, p_micro
        FROM scored)"""

TEXTS['pr_auc_by_group'] = """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders),
    hist AS (
        SELECT grp, cents, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(pos) AS BIGINT) AS tp
        FROM o GROUP BY grp, cents),
    cum AS (
        SELECT grp, cents,
               sum(t) OVER (PARTITION BY grp ORDER BY cents DESC) AS c,
               sum(tp) OVER (PARTITION BY grp ORDER BY cents DESC) AS ctp
        FROM hist),
    prec AS (
        SELECT grp, cents, c, ctp,
               CAST(ctp::HUGEINT * 1000000 // c::HUGEINT AS BIGINT)
                   AS prec_micro
        FROM cum),
    stepped AS (
        SELECT grp,
               ctp - coalesce(lag(ctp) OVER
                   (PARTITION BY grp ORDER BY cents DESC), 0) AS dtp,
               prec_micro,
               coalesce(lag(prec_micro) OVER
                   (PARTITION BY grp ORDER BY cents DESC), 1000000)
                   AS prev_prec_micro
        FROM prec),
    folds AS (
        SELECT grp,
               CAST(sum(dtp * (prec_micro + prev_prec_micro)) AS BIGINT)
                   AS area2,
               CAST(sum(dtp) AS BIGINT) AS n_pos
        FROM stepped GROUP BY grp),
    totals AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_total
               FROM o GROUP BY grp)
    SELECT f.grp, f.n_pos,
           CAST(t.n_total - f.n_pos AS BIGINT) AS n_neg,
           CAST(f.area2::HUGEINT // (2::HUGEINT * f.n_pos) AS BIGINT)
               AS pr_auc_micro,
           CAST(f.n_pos::HUGEINT * 1000000 // t.n_total::HUGEINT AS BIGINT)
               AS prevalence_micro
    FROM folds f JOIN totals t USING (grp)
    ORDER BY grp
"""

TEXTS['brier_decomposition'] = f"""
    WITH {_PROPENSITY_CTES},
    bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(p_micro) AS BIGINT) AS sp_b,
               CAST(sum(y) AS BIGINT) AS sy_b,
               CAST(sum(p_micro * p_micro) AS BIGINT) AS spp_b,
               CAST(sum(p_micro * y) AS BIGINT) AS spy_b
        FROM binned GROUP BY bin),
    tot AS (
        SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(sy_b) AS BIGINT)
                   AS sy,
               CAST(sum(spp_b) AS BIGINT) AS spp,
               CAST(sum(spy_b) AS BIGINT) AS spy
        FROM bins),
    folded AS (
        SELECT
            sum((sp_b::HUGEINT - sy_b::HUGEINT * 1000000)
                * (sp_b::HUGEINT - sy_b::HUGEINT * 1000000)
                // n_b::HUGEINT) AS rel_num,
            sum((sy_b::HUGEINT * n - sy::HUGEINT * n_b)
                * (sy_b::HUGEINT * n - sy::HUGEINT * n_b) * 1000000
                // n_b::HUGEINT) AS res_num,
            first(n) AS n, first(sy) AS sy,
            first(spp) AS spp, first(spy) AS spy
        FROM bins CROSS JOIN tot)
    SELECT CAST(n AS BIGINT) AS n_users, CAST(sy AS BIGINT) AS n_pos,
           CAST((spp::HUGEINT - 2000000::HUGEINT * spy
                 + sy::HUGEINT * 1000000000000)
                // (n::HUGEINT * 1000000) AS BIGINT) AS brier_micro,
           CAST(rel_num // (n::HUGEINT * 1000000) AS BIGINT)
               AS reliability_micro,
           CAST(res_num // (n::HUGEINT * n * n) AS BIGINT)
               AS resolution_micro,
           CAST(sy::HUGEINT * (n - sy) * 1000000 // (n::HUGEINT * n)
                AS BIGINT) AS uncertainty_micro
    FROM folded
"""

TEXTS['isotonic_calibration_pav'] = f"""
    WITH {_PROPENSITY_CTES},
    bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(y) AS BIGINT) AS sy_b
        FROM binned GROUP BY bin),
    pref AS (
        SELECT bin, n_b, sy_b,
               sum(n_b) OVER (ORDER BY bin) AS cn,
               sum(sy_b) OVER (ORDER BY bin) AS cy
        FROM bins),
    lo AS (SELECT bin AS j, cn - n_b AS cn_lo, cy - sy_b AS cy_lo
           FROM pref),
    hi AS (SELECT bin AS k, cn AS cn_hi, cy AS cy_hi FROM pref),
    ranges AS (
        SELECT j, k,
               CAST((cy_hi - cy_lo)::HUGEINT * 1000000
                    // (cn_hi - cn_lo)::HUGEINT AS BIGINT) AS avg_micro
        FROM lo JOIN hi ON j <= k),
    inner_min AS (
        SELECT b.bin AS i, b.n_b, b.sy_b, r.j,
               min(r.avg_micro) AS min_avg
        FROM bins b JOIN ranges r ON r.j <= b.bin AND r.k >= b.bin
        GROUP BY b.bin, b.n_b, b.sy_b, r.j)
    SELECT i AS bin, CAST(n_b AS BIGINT) AS n_users,
           round(sy_b / CAST(n_b AS DOUBLE), 6) AS observed_rate,
           CAST(max(min_avg) AS BIGINT) AS isotonic_micro
    FROM inner_min
    GROUP BY i, n_b, sy_b
    ORDER BY bin
"""

TEXTS['srm_check'] = """
    WITH assigned AS (
        SELECT c_mktsegment AS segment,
               CASE WHEN ('0x' || substr(md5('srm:' ||
                    CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.52 THEN 1 ELSE 0 END AS treat
        FROM customer),
    folded AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(treat) AS BIGINT) AS o
        FROM assigned GROUP BY segment
        UNION ALL
        SELECT '__all', CAST(count(*) AS BIGINT), CAST(sum(treat) AS BIGINT)
        FROM assigned)
    SELECT segment, n, o AS n_treatment,
           CAST((2 * o - n)::HUGEINT * (2 * o - n) * 1000000 // n::HUGEINT
                AS BIGINT) AS chi2_micro,
           CASE WHEN (2 * o - n)::HUGEINT * (2 * o - n) * 1000000
                     // n::HUGEINT > 3841000
                THEN 'SRM' ELSE 'ok' END AS verdict
    FROM folded ORDER BY segment
"""

TEXTS['qini_uplift_curve'] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN day <= m THEN 1 ELSE 0 END) AS BIGINT)
                   AS ne,
               CAST(sum(CASE WHEN day <= m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pe,
               CAST(max(CASE WHEN day > m AND is_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev CROSS JOIN mid GROUP BY user_id),
    rows_ AS (
        SELECT y,
               CAST(floor(CAST(round(1000000.0 * (pe + 1) / (ne + 2))
                               AS BIGINT) / 100000) AS BIGINT) AS bin,
               CASE WHEN ('0x' || substr(md5('qini:' ||
                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.5 THEN 1 ELSE 0 END AS treat
        FROM per_user),
    bins AS (
        SELECT bin,
               CAST(sum(treat) AS BIGINT) AS nt,
               CAST(sum(1 - treat) AS BIGINT) AS nc,
               CAST(sum(treat * y) AS BIGINT) AS yt,
               CAST(sum((1 - treat) * y) AS BIGINT) AS yc
        FROM rows_ GROUP BY bin),
    cum AS (
        SELECT bin,
               sum(nt) OVER (ORDER BY bin DESC) AS nt_k,
               sum(nc) OVER (ORDER BY bin DESC) AS nc_k,
               sum(yt) OVER (ORDER BY bin DESC) AS yt_k,
               sum(yc) OVER (ORDER BY bin DESC) AS yc_k
        FROM bins)
    SELECT bin, CAST(nt_k AS BIGINT) AS nt_k, CAST(nc_k AS BIGINT) AS nc_k,
           CAST(yt_k AS BIGINT) AS yt_k, CAST(yc_k AS BIGINT) AS yc_k,
           CAST((yt_k::HUGEINT * greatest(nc_k, 1)
                 - yc_k::HUGEINT * nt_k) * 1000000
                // greatest(nc_k, 1)::HUGEINT AS BIGINT) AS qini_micro
    FROM cum ORDER BY bin DESC
"""

TEXTS['mann_whitney_test'] = """
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 1000000) AS BIGINT)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS x
        FROM events GROUP BY user_id),
    seg0 AS (
        SELECT c.c_mktsegment AS segment, p.x,
               CASE WHEN ('0x' || substr(md5('mwu:' ||
                    CAST(p.user_id AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.5 THEN 1 ELSE 0 END AS treat
        FROM per_user p JOIN customer c ON p.user_id = c.c_custkey),
    both_ AS (
        SELECT segment, x, treat FROM seg0
        UNION ALL SELECT '__all', x, treat FROM seg0),
    hist AS (
        SELECT segment, x, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(treat) AS BIGINT) AS t1
        FROM both_ GROUP BY segment, x),
    ranked AS (
        SELECT segment, t, t1,
               2 * COALESCE(sum(t) OVER (PARTITION BY segment ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + t + 1 AS rank2
        FROM hist),
    per_seg AS (
        SELECT segment, CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(t1) AS BIGINT) AS n1,
               CAST(sum(t1 * rank2) AS BIGINT) AS r2,
               CAST(sum(t * t * t - t) AS BIGINT) AS ties
        FROM ranked GROUP BY segment),
    stats AS (
        SELECT segment, n, n1, r2, ties,
               CAST(n1 AS DOUBLE) * (n - n1)
                 * ((n + 1) - ties / (CAST(n AS DOUBLE) * (n - 1)))
                 / 12.0 AS var
        FROM per_seg),
    fin AS (
        SELECT segment, n1 AS n_treatment,
               CAST(n - n1 AS BIGINT) AS n2,
               CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2,
               round(CASE WHEN var > 0 THEN
                     (r2 - n1 * (n1 + 1) - n1 * (n - n1))
                       / (2.0 * sqrt(var))
                     ELSE 0.0 END, 6) AS z
        FROM stats)
    SELECT segment, n_treatment, n2, u2, z,
           CASE WHEN abs(z) > 1.959964 THEN 'significant' ELSE 'ns' END
               AS verdict
    FROM fin ORDER BY segment
"""
