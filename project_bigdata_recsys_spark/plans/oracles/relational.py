"""DuckDB oracle SQL texts — relational family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['snapshot_diff'] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders
    ),
    newsnap AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
               o_orderpriority, o_totalprice
        FROM u WHERE u_new < 0.01
    ),
    diff AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
                      OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                      OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                      OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                    THEN 'changed' ELSE 'unchanged' END AS change_type
        FROM orders o FULL OUTER JOIN newsnap n USING (o_orderkey)
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM diff
    GROUP BY change_type
    ORDER BY change_type
"""

TEXTS['group_quantile_filter'] = """
    WITH scored AS (
        SELECT doc_id, lang,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    hist AS (
        SELECT lang, score, count(*) AS n FROM scored GROUP BY lang, score),
    cum AS (
        SELECT lang, score,
               sum(n) OVER (PARTITION BY lang ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(n) OVER (PARTITION BY lang) AS n_total
        FROM hist),
    thr AS (
        SELECT lang, min(score) AS threshold, min(n_total) AS n_total
        FROM cum WHERE cum_n >= 0.25 * n_total GROUP BY lang)
    SELECT s.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(t.n_total) AS BIGINT) AS n_total,
           round(min(t.threshold), 6) AS threshold,
           round(avg(s.score), 6) AS avg_kept_score
    FROM scored s JOIN thr t USING (lang)
    WHERE s.score > t.threshold
    GROUP BY s.lang
    ORDER BY s.lang
"""

TEXTS['sql_cheapest_supplier'] = """
    SELECT l.l_partkey,
           CAST(min(l.l_suppkey) AS BIGINT) AS cheapest_supp,
           CAST(min(round(l.l_extendedprice * 100)) AS BIGINT)
               AS min_price_cents
    FROM lineitem l
    WHERE l.l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    LIMIT 200
"""

TEXTS['sql_exists_filter'] = """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F')
    ORDER BY c.c_custkey
    LIMIT 500
"""

TEXTS['sql_in_subquery'] = """
    SELECT l.l_partkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING count(*) > 30)
    GROUP BY l.l_partkey
    ORDER BY n_lines DESC, l.l_partkey
    LIMIT 100
"""

TEXTS['jsonl_roundtrip_ingest'] = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""

TEXTS['variant_extraction'] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CAST(props::JSON ->> 'k' AS INTEGER)) AS BIGINT) AS n_with_k,
           round(avg(CAST(props::JSON ->> 'k' AS INTEGER)), 4) AS avg_k,
           CAST(min(CAST(props::JSON ->> 'k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(max(CAST(props::JSON ->> 'k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

TEXTS['cdc_current_view'] = """
    WITH u AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               ('0x' || substr(md5('cdc-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_upd,
               ('0x' || substr(md5('cdc-del:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_del
        FROM orders),
    current_state AS (
        -- deletes win (seq 2), then updates (seq 1), else base (seq 0)
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN u_upd < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_del >= 0.02)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_price
    FROM current_state
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

TEXTS['equi_depth_histogram'] = """
    WITH ranked AS (
        SELECT o_totalprice AS v,
               percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        FROM orders),
    bucketed AS (
        SELECT v, CAST(least(floor(pr * 10), 9) AS INTEGER) AS bucket
        FROM ranked)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(v), 2) AS lo,
           round(max(v), 2) AS hi,
           round(avg(v), 4) AS mean
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""

TEXTS['cohort_retention'] = """
    WITH cohort AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey),
    activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', o_orderdate) AS active_month
        FROM orders)
    SELECT strftime(c.cohort_month, '%Y-%m') AS cohort,
           CAST(date_diff('month', c.cohort_month, a.active_month) AS INTEGER)
               AS month_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity a JOIN cohort c USING (o_custkey)
    WHERE date_diff('month', c.cohort_month, a.active_month) <= 6
    GROUP BY 1, 2
    ORDER BY cohort, month_offset
    LIMIT 500
"""

TEXTS['event_funnel'] = """
    WITH t1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id),
    t2 AS (
        SELECT e.user_id, min(t1.t_view) AS t_view,
               min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t_view
                        THEN e.ts END) AS t_click
        FROM events e JOIN t1 USING (user_id) GROUP BY e.user_id),
    t3 AS (
        SELECT e.user_id, min(t2.t_view) AS t_view, min(t2.t_click) AS t_click,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t_click
                        THEN e.ts END) AS t_purchase
        FROM events e JOIN t2 USING (user_id) GROUP BY e.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_viewed,
           CAST(count(t_click) AS BIGINT) AS n_view_click,
           CAST(count(t_purchase) AS BIGINT) AS n_view_click_purchase
    FROM t3
"""

TEXTS['rfm_segments'] = """
    WITH per_cust AS (
        SELECT o_custkey, max(o_orderdate) AS last_order,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT spend_cents,
               percent_rank() OVER (ORDER BY last_order, o_custkey) AS pr_r,
               percent_rank() OVER (ORDER BY n_orders, o_custkey) AS pr_f,
               percent_rank() OVER (ORDER BY spend_cents, o_custkey) AS pr_m
        FROM per_cust)
    SELECT CAST(least(floor(pr_r * 4), 3) AS INTEGER) AS r_quartile,
           CAST(least(floor(pr_f * 4), 3) AS INTEGER) AS f_quartile,
           CAST(least(floor(pr_m * 4), 3) AS INTEGER) AS m_quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(spend_cents) / count(*) / 100.0, 4) AS avg_spend
    FROM ranked
    GROUP BY 1, 2, 3
    ORDER BY r_quartile, f_quartile, m_quartile
"""

TEXTS['association_rules'] = """
    WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y, count(*) AS c_ab
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3),
    rules AS (
        SELECT x AS antecedent, y AS consequent, c_ab FROM half
        UNION ALL
        SELECT y AS antecedent, x AS consequent, c_ab FROM half),
    margins AS (SELECT l_partkey, count(*) AS c FROM basket GROUP BY 1),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets
           FROM basket)
    SELECT r.antecedent, r.consequent,
           CAST(r.c_ab AS BIGINT) AS c_ab,
           round(r.c_ab / nb.n_baskets, 6) AS support,
           round(r.c_ab * 1.0 / ma.c, 6) AS confidence,
           round(nb.n_baskets * r.c_ab / (ma.c * mb.c), 6) AS lift
    FROM rules r
    JOIN margins ma ON ma.l_partkey = r.antecedent
    JOIN margins mb ON mb.l_partkey = r.consequent
    CROSS JOIN nb
    ORDER BY confidence DESC, lift DESC, r.antecedent, r.consequent
    LIMIT 25
"""

TEXTS['robust_outliers'] = """
    WITH vals AS (SELECT o_totalprice AS v FROM orders),
    h1 AS (SELECT v, count(*) AS n FROM vals GROUP BY v),
    c1 AS (SELECT v, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(n) OVER () AS nt FROM h1),
    med AS (SELECT min(v) AS median FROM c1 WHERE cum >= 0.5 * nt),
    dev AS (SELECT v, med.median, round(abs(v - med.median), 2) AS d
            FROM vals CROSS JOIN med),
    h2 AS (SELECT d, count(*) AS n FROM dev GROUP BY d),
    c2 AS (SELECT d, sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(n) OVER () AS nt FROM h2),
    mad AS (SELECT min(d) AS mad FROM c2 WHERE cum >= 0.5 * nt)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(min(dev.median), 2) AS median,
           round(min(mad.mad), 2) AS mad,
           CAST(sum(CASE WHEN dev.d > 3.0 * 1.4826 * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(CASE WHEN dev.d > 3.0 * 1.4826 * mad.mad
                     THEN dev.v END), 2) AS max_outlier
    FROM dev CROSS JOIN mad
"""

TEXTS['dau_wau_stickiness'] = """
    WITH active AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
    dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM active GROUP BY d),
    offs AS (SELECT unnest(range(0, 7)) AS off),
    supported AS (
        SELECT a.d + (o.off * INTERVAL 1 DAY) AS w_day, a.user_id
        FROM active a CROSS JOIN offs o),
    wau AS (SELECT w_day, count(DISTINCT user_id) AS wau
            FROM supported GROUP BY w_day)
    SELECT strftime(d.d, '%Y-%m-%d') AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.w_day = d.d
    ORDER BY day
    LIMIT 60
"""

TEXTS['scd2_history'] = """
    WITH per_key AS (
        SELECT o_orderstatus,
               (('0x' || substr(md5('cdc-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.05) AS has_u,
               (('0x' || substr(md5('cdc-del:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 < 0.02) AS has_d
        FROM orders)
    SELECT o_orderstatus,
           CAST(sum(1 + has_u::INT) AS BIGINT) AS n_versions,
           CAST(sum(CASE WHEN has_d THEN 0 ELSE 1 END) AS BIGINT) AS n_current,
           CAST(sum(has_u::INT + CASE WHEN has_d THEN 1 ELSE 0 END) AS BIGINT)
               AS n_closed
    FROM per_key
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

TEXTS['cross_source_overlap'] = """
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    sh0 AS (
        SELECT source,
               unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
                        ELSE [] END)) AS shingle
        FROM toks),
    sh AS (SELECT DISTINCT source, substr(md5(shingle), 1, 16) AS h
           FROM sh0 WHERE length(shingle) > 0),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2)
    SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY n_shared DESC, src_a, src_b LIMIT 25
"""

TEXTS['novelty_profile'] = """
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                  FROM documents),
    grams AS (
        SELECT doc_id, lang,
               unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
                        ELSE [] END)) AS g
        FROM toks),
    g2 AS (SELECT doc_id, lang, substr(md5(g), 1, 16) AS h
           FROM grams WHERE length(g) > 0),
    train AS (SELECT DISTINCT h FROM g2 WHERE doc_id % 5 != 0),
    per_doc AS (
        SELECT g2.doc_id, g2.lang, count(*) AS n_grams,
               sum(CASE WHEN tr.h IS NULL THEN 1 ELSE 0 END) AS n_novel
        FROM g2 LEFT JOIN train tr ON g2.h = tr.h
        WHERE g2.doc_id % 5 = 0
        GROUP BY g2.doc_id, g2.lang)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_novel) AS BIGINT) AS total_novel,
           round(avg(n_novel * 1.0 / n_grams), 4) AS avg_novelty
    FROM per_doc GROUP BY lang ORDER BY lang
"""

TEXTS['source_quantile_filter'] = """
    WITH scored AS (
        SELECT doc_id, source,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4)
               - round(len(list_filter(string_split(text, ' '),
                                       t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                       / len(string_split(text, ' ')), 4) AS score
        FROM documents),
    hist AS (
        SELECT source, score, count(*) AS n FROM scored GROUP BY source, score),
    cum AS (
        SELECT source, score,
               sum(n) OVER (PARTITION BY source ORDER BY score
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               sum(n) OVER (PARTITION BY source) AS n_total
        FROM hist),
    thr AS (
        SELECT source, min(score) AS threshold, min(n_total) AS n_total
        FROM cum WHERE cum_n >= 0.25 * n_total GROUP BY source)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(t.n_total) AS BIGINT) AS n_total,
           round(min(t.threshold), 6) AS threshold,
           round(avg(s.score), 6) AS avg_kept_score
    FROM scored s JOIN thr t USING (source)
    WHERE s.score > t.threshold
    GROUP BY s.source
    ORDER BY s.source
"""

TEXTS['monthly_growth'] = """
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
    lagged AS (
        SELECT month, n_orders, cents,
               lag(cents) OVER (ORDER BY month) AS prev
        FROM monthly)
    SELECT month, n_orders,
           round(cents / 100.0, 2) AS revenue,
           round((cents - prev) / 100.0, 2) AS mom_delta,
           CASE WHEN prev IS NOT NULL
                THEN round((cents - prev) * 1.0 / prev, 6) END AS mom_growth
    FROM lagged ORDER BY month
"""

TEXTS['conversion_lag'] = """
    WITH fc AS (
        SELECT user_id, min(ts) AS first_click FROM events
        WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
        SELECT e.user_id,
               min(e.ts) AS first_purchase, min(fc.first_click) AS first_click
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
        GROUP BY e.user_id),
    lagged AS (
        SELECT CASE
                 WHEN epoch(first_purchase) - epoch(first_click) < 600
                     THEN 'a_lt_10m'
                 WHEN epoch(first_purchase) - epoch(first_click) < 3600
                     THEN 'b_lt_1h'
                 WHEN epoch(first_purchase) - epoch(first_click) < 21600
                     THEN 'c_lt_6h'
                 WHEN epoch(first_purchase) - epoch(first_click) < 86400
                     THEN 'd_lt_1d'
                 WHEN epoch(first_purchase) - epoch(first_click) < 604800
                     THEN 'e_lt_7d'
                 ELSE 'f_ge_7d' END AS lag_bucket
        FROM conv),
    counts AS (SELECT lag_bucket, CAST(count(*) AS BIGINT) AS n_users
               FROM lagged GROUP BY lag_bucket),
    t AS (SELECT sum(n_users) AS total FROM counts)
    SELECT lag_bucket, n_users,
           round(n_users * 1.0 / total, 6) AS share
    FROM counts CROSS JOIN t ORDER BY lag_bucket
"""

TEXTS['rolling_distinct_users'] = """
    WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT day, count(*) AS n_events FROM ev GROUP BY day),
    spine AS (
        SELECT d.day,
               CAST((SELECT sum(n_events) FROM days d2
                     WHERE d2.day <= d.day
                       AND d2.day > d.day - 7) AS BIGINT) AS n_events_7d,
               CAST((SELECT count(DISTINCT e.user_id) FROM ev e
                     WHERE e.day <= d.day
                       AND e.day > d.day - 7) AS BIGINT) AS n_users_7d
        FROM days d)
    SELECT strftime(day, '%Y-%m-%d') AS day, n_events_7d, n_users_7d,
           TRUE AS approx_users_ok
    FROM spine ORDER BY day
"""

TEXTS['gap_filled_daily'] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(round(value * 1000000) AS BIGINT)) AS micros
        FROM events GROUP BY 1, 2),
    bounds AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
               FROM events),
    spine AS (
        SELECT t.event_type, CAST(gs.day AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN bounds
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(bounds.d0, bounds.d1,
                                          INTERVAL 1 DAY)) AS day) gs)
    SELECT s.event_type,
           strftime(s.day, '%Y-%m-%d') AS day,
           CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
           round(coalesce(d.micros, 0) / 1000000.0, 4) AS total_value,
           d.n_events IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    ORDER BY s.event_type, s.day
"""

TEXTS['ab_test_lift'] = """
    WITH per_user AS (
        SELECT CASE WHEN ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                         % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 1000000) AS BIGINT)
                        ELSE 0 END) AS micros
        FROM events GROUP BY 1, 2)
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(sum(converted) * 1.0 / count(*), 6) AS conversion_rate,
           round(sum(micros) * 1.0 / count(*) / 1000000.0, 4)
               AS value_per_user
    FROM per_user GROUP BY arm ORDER BY arm
"""

TEXTS['pareto_curve'] = """
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_partkey),
    ranked AS (
        SELECT cents,
               percent_rank() OVER (ORDER BY cents, l_partkey) AS pr
        FROM per_part),
    bands AS (
        SELECT CAST(least(floor((1.0 - pr) * 10), 9) AS INT) AS band,
               count(*) AS n_items, sum(cents) AS band_cents
        FROM ranked GROUP BY 1),
    t AS (SELECT sum(band_cents) AS total FROM bands)
    SELECT band,
           CAST(n_items AS BIGINT) AS n_items,
           round(band_cents / 100.0, 2) AS band_revenue,
           round(band_cents * 1.0 / total, 6) AS revenue_share,
           round(sum(band_cents) OVER (ORDER BY band
                     ROWS UNBOUNDED PRECEDING) * 1.0 / total, 6)
               AS cumulative_share
    FROM bands CROSS JOIN t ORDER BY band
"""

TEXTS['forget_users_plan'] = """
    WITH cohort AS (
        SELECT c_custkey FROM customer
        WHERE ('0x' || substr(md5('forget:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                  / 4294967296.0 < 0.02),
    doomed_orders AS (
        SELECT o.o_orderkey FROM orders o
        JOIN cohort ON o.o_custkey = cohort.c_custkey)
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM cohort) AS BIGINT) AS n_to_delete
        UNION ALL
        SELECT 'events',
               CAST((SELECT count(*) FROM events) AS BIGINT),
               CAST((SELECT count(*) FROM events e
                     JOIN cohort ON e.user_id = cohort.c_custkey) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     JOIN doomed_orders d ON l.l_orderkey = d.o_orderkey)
                    AS BIGINT)
        UNION ALL
        SELECT 'orders',
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               CAST((SELECT count(*) FROM doomed_orders) AS BIGINT)) t(table_name, n_rows, n_to_delete)
"""

TEXTS['event_transitions'] = """
    WITH steps AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
    counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM steps WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type),
    tot AS (SELECT sum(n_transitions) AS total FROM counts)
    SELECT from_type, to_type, n_transitions,
           round(n_transitions * 1.0 / total, 6) AS transition_share
    FROM counts CROSS JOIN tot
    ORDER BY n_transitions DESC, from_type, to_type
    LIMIT 25
"""

TEXTS['backfill_plan'] = """
    WITH u AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS part,
               ('0x' || substr(md5('snap-drop:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_drop,
               ('0x' || substr(md5('snap-bump:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_bump,
               ('0x' || substr(md5('snap-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    oldsnap AS (
        SELECT part, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM u),
    newsnap AS (
        SELECT part, o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN u_bump < 0.05 THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE u_drop >= 0.02
        UNION ALL
        SELECT part, o_orderkey + 1000000000, o_custkey, o_orderstatus,
               o_totalprice
        FROM u WHERE u_new < 0.01),
    od AS (
        SELECT part, count(*) AS n_rows,
               bit_xor(('0x' || substr(sha256(
                   concat_ws(chr(31),
                       coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_custkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_orderstatus AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_totalprice AS VARCHAR), chr(1) || '<null>'))),
                   1, 15))::BIGINT) AS digest
        FROM oldsnap GROUP BY part),
    nd AS (
        SELECT part, count(*) AS n_rows,
               bit_xor(('0x' || substr(sha256(
                   concat_ws(chr(31),
                       coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_custkey AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_orderstatus AS VARCHAR), chr(1) || '<null>'),
                       coalesce(CAST(o_totalprice AS VARCHAR), chr(1) || '<null>'))),
                   1, 15))::BIGINT) AS digest
        FROM newsnap GROUP BY part)
    SELECT coalesce(od.part, nd.part) AS part,
           CAST(coalesce(od.n_rows, 0) AS BIGINT) AS n_rows_old,
           CAST(coalesce(nd.n_rows, 0) AS BIGINT) AS n_rows_new,
           CASE WHEN od.part IS NULL THEN 'added'
                WHEN nd.part IS NULL THEN 'removed'
                WHEN od.digest != nd.digest
                     OR od.n_rows != nd.n_rows THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM od FULL OUTER JOIN nd ON od.part = nd.part
    ORDER BY part
"""

TEXTS['multi_touch_attribution'] = """
    WITH purch AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts,
               CAST(round(value * 1000000) AS BIGINT) AS p_micros
        FROM events WHERE event_type = 'purchase'),
    clicks AS (
        SELECT user_id, ts AS c_ts, strftime(ts, '%Y-%m-%d') AS click_day
        FROM events WHERE event_type = 'click'),
    touched AS (
        SELECT p.purchase_id, p.p_micros, c.click_day
        FROM purch p JOIN clicks c ON p.user_id = c.user_id
        WHERE c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 7 DAY),
    credited AS (
        SELECT click_day, purchase_id,
               CAST(round(p_micros * 1.0 / count(*) OVER (PARTITION BY purchase_id))
                    AS BIGINT) AS credit_micros
        FROM touched)
    SELECT click_day,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           round(sum(credit_micros) / 1000000.0, 4) AS credited_value
    FROM credited GROUP BY click_day ORDER BY click_day
"""

TEXTS['decayed_popularity'] = """
    WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(pow(0.5,
                 ((epoch(now_ts) - epoch(ts)) / 86400.0) / 7.0) * 1e9)
                 AS BIGINT)) / 1e9, 4) AS decayed_score
    FROM events CROSS JOIN now_t
    GROUP BY event_type ORDER BY event_type
"""

TEXTS['pit_segment_rollup'] = """
    WITH c AS (
        SELECT c_custkey, c_mktsegment,
               ('0x' || substr(md5('scd:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 < 0.3 AS changed
        FROM customer),
    o AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
    j AS (SELECT CASE WHEN c.changed AND o.order_day >= '1996-01-01'
                      THEN c.c_mktsegment || '_V2'
                      ELSE c.c_mktsegment END AS segment,
                 o.o_custkey, o.cents
          FROM o JOIN c ON o.o_custkey = c.c_custkey)
    SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(sum(cents) / 100.0, 2) AS total_spend
    FROM j GROUP BY segment ORDER BY segment
"""

TEXTS['incremental_agg_merge'] = """
    SELECT event_type,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
               AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""

TEXTS['hll_daily_rollup'] = """
    SELECT event_type,
           CAST(count(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS approx_users_ok
    FROM events GROUP BY event_type ORDER BY event_type
"""

TEXTS['k_anonymity_profile'] = """
    WITH g AS (
        SELECT lang, source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
               CAST(count(*) AS BIGINT) AS group_size
        FROM documents
        GROUP BY lang, source, floor(n_chars / 100))
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_at_risk,
           round(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                 / CAST(sum(group_size) AS DOUBLE), 6) AS risk_frac,
           CAST(min(group_size) AS BIGINT) AS min_group
    FROM g
    GROUP BY source
    ORDER BY source
"""

TEXTS['ddsketch_quantile_rollup'] = """
    WITH ev AS (
        SELECT event_type, value, event_id FROM events WHERE value > 0),
    bk AS (
        SELECT event_type,
               CAST(ceil(round(ln(value) / ln(1.02), 6)) AS BIGINT) AS b
        FROM ev),
    merged AS (
        SELECT event_type, b, count(*) AS n FROM bk GROUP BY 1, 2),
    cum AS (
        SELECT event_type, b,
               sum(n) OVER (PARTITION BY event_type ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM merged),
    sk AS (
        SELECT event_type,
               CAST(max(total) AS BIGINT) AS n_events,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.5 * total)
                                              THEN b END)) / 2.02, 6) AS p50_est,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.9 * total)
                                              THEN b END)) / 2.02, 6) AS p90_est,
               round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.99 * total)
                                              THEN b END)) / 2.02, 6) AS p99_est
        FROM cum GROUP BY event_type),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM ev),
    exact AS (
        SELECT event_type,
               min(CASE WHEN rn = ceil(0.5 * n) THEN value END) AS p50_exact,
               min(CASE WHEN rn = ceil(0.9 * n) THEN value END) AS p90_exact,
               min(CASE WHEN rn = ceil(0.99 * n) THEN value END) AS p99_exact
        FROM ranked GROUP BY event_type)
    SELECT sk.event_type, n_events, p50_est, p90_est, p99_est,
           p50_exact, p90_exact, p99_exact,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM sk JOIN exact USING (event_type)
    ORDER BY sk.event_type
"""

TEXTS['merge_upsert_profile'] = """
    WITH o AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS part,
               ('0x' || substr(md5('merge-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_upd,
               ('0x' || substr(md5('merge-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    final AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN u_upd < 0.05
                    THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice,
               part
        FROM o
        UNION ALL
        SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice, part
        FROM o WHERE u_new < 0.01)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT part) AS BIGINT) AS n_parts,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_price
    FROM final
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""

TEXTS['rerank_uplift_profile'] = """
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
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS cos_rank
        FROM scored
        QUALIFY cos_rank <= 25),
    rr AS (
        SELECT query_id, vec_id, cos_rank,
               round(0.7 * cos_sim
                     + 0.2 * (list_sum(list_transform(range(0, len(emb)),
                           i -> CASE WHEN emb[i + 1] * q_emb[i + 1] > 0
                                     THEN 1.0 ELSE 0.0 END)) / len(emb))
                     + 0.1 / (1 + sqrt(list_sum(list_transform(range(0, len(emb)),
                           i -> (emb[i + 1] - q_emb[i + 1])
                                * (emb[i + 1] - q_emb[i + 1]))))), 6)
                   AS rerank_score
        FROM short),
    ranked AS (
        SELECT query_id, vec_id, cos_rank,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rerank_score DESC, vec_id) AS final_rank
        FROM rr)
    SELECT query_id,
           CAST(sum(CASE WHEN cos_rank <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS overlap_at_k,
           max(CASE WHEN final_rank = 1 THEN cos_rank = 1 END) AS top1_same,
           round(avg(abs(cos_rank - final_rank)), 4) AS mean_rank_shift
    FROM ranked WHERE final_rank <= 5
    GROUP BY query_id ORDER BY query_id
"""

TEXTS['concurrent_events_peak'] = """
    WITH ev AS (
        SELECT event_type,
               epoch_us(ts) AS start_us,
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS end_us
        FROM events
        WHERE CAST(round(value * 1000000) AS BIGINT) > 0),
    pieces AS (
        SELECT event_type, day,
               greatest(start_us, day * 86400000000) AS lo,
               least(end_us, (day + 1) * 86400000000) AS hi
        FROM ev,
             unnest(range(CAST(floor(start_us / 86400000000.0) AS BIGINT),
                          CAST(floor((end_us - 1) / 86400000000.0) AS BIGINT)
                          + 1)) AS t(day)),
    edges AS (
        SELECT event_type, day, lo AS t, 1 AS delta FROM pieces
        UNION ALL
        SELECT event_type, day, hi AS t, -1 AS delta FROM pieces),
    sweep AS (
        SELECT event_type, day,
               sum(delta) OVER (PARTITION BY event_type, day
                                ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM edges),
    day_peaks AS (
        SELECT event_type, day, max(running) AS day_peak
        FROM sweep GROUP BY event_type, day),
    best AS (
        SELECT event_type,
               CAST(day_peak AS BIGINT) AS peak_concurrent,
               CAST(day AS BIGINT) AS peak_epoch_day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY day_peak DESC, day) AS rn
        FROM day_peaks),
    totals AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals
        FROM events GROUP BY event_type)
    SELECT b.event_type, t.n_intervals, b.peak_concurrent, b.peak_epoch_day
    FROM best b JOIN totals t ON b.event_type = t.event_type
    WHERE rn = 1
    ORDER BY b.event_type
"""

TEXTS['label_agreement_kappa'] = """
    WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
    u AS (
        SELECT row_id,
               ('0x' || substr(md5('42:tier:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
               ('0x' || substr(md5('42:truth:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
        FROM base),
    t AS (
        SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                       WHEN u_tier < 0.7 THEN 'mid'
                       ELSE 'low' END AS tier
        FROM u),
    gen AS (
        SELECT CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                   WHEN 'mid' THEN 0.60
                                                   ELSE 0.30 END)
                    THEN 0 ELSE 1 END AS INTEGER) AS truth,
               CAST(1700000000 + row_id AS BIGINT) AS event_ts
        FROM t),
    m AS (
        SELECT truth AS label_a,
               CASE WHEN ('0x' || substr(md5('7:sample:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.10
                         AND ('0x' || substr(md5('7:flip:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.05
                    THEN 1 - truth ELSE truth END AS label_b
        FROM gen),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN label_a = 0 AND label_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
               CAST(sum(CASE WHEN label_a = 0 AND label_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(sum(CASE WHEN label_a = 1 AND label_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(sum(CASE WHEN label_a = 1 AND label_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        FROM m)
    SELECT n, n00, n01, n10, n11,
           round((n00 + n11) * 1.0 / n, 6) AS p_observed,
           round(((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                 * 1.0 / (n * n), 6) AS p_expected,
           round(((n00 + n11) * 1.0 / n
                  - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                    * 1.0 / (n * n))
                 / (1.0 - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))
                          * 1.0 / (n * n)), 6) AS kappa
    FROM agg
"""

TEXTS['cms_heavy_hitters'] = """
    WITH li AS (SELECT l_partkey FROM lineitem),
    cells AS (
        SELECT j,
               ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':'
                                   || CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % 256 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM li, range(0, 4) AS r(j)
        GROUP BY 1, 2),
    exact AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n
        FROM li GROUP BY 1),
    topk AS (
        SELECT l_partkey, exact_n FROM exact
        ORDER BY exact_n DESC, l_partkey LIMIT 15),
    probes AS (
        SELECT t.l_partkey, t.exact_n, r.j,
               ('0x' || substr(md5('cms' || CAST(r.j AS VARCHAR) || ':'
                                   || CAST(t.l_partkey AS VARCHAR)), 1, 8))::BIGINT
                   % 256 AS bucket
        FROM topk t, range(0, 4) AS r(j)),
    est AS (
        SELECT p.l_partkey, p.exact_n,
               CAST(min(c.n) AS BIGINT) AS cms_est
        FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
        GROUP BY 1, 2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS N FROM li)
    SELECT l_partkey, exact_n, cms_est,
           cms_est >= exact_n AS overestimates,
           (cms_est - exact_n)
               <= CAST(ceil(2.718281828 * N / 256) AS BIGINT) AS within_budget
    FROM est CROSS JOIN tot
    ORDER BY exact_n DESC, l_partkey
"""

TEXTS['bloom_membership_profile'] = """
    WITH bk AS (SELECT DISTINCT o_custkey AS key FROM orders),
    bpos AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(key AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM bk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    cust AS (
        SELECT c_custkey FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 FROM customer),
    probe AS (
        SELECT c_custkey AS key,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(c_custkey AS VARCHAR)),
                               1, 8))::BIGINT % 8192 AS pos
        FROM cust CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    hits AS (
        SELECT p.key, count(*) AS n_hit
        FROM probe p JOIN bpos b ON b.pos = p.pos
        GROUP BY p.key),
    verdict AS (
        SELECT c.c_custkey,
               CASE WHEN COALESCE(h.n_hit, 0) = 4 THEN 1 ELSE 0 END
                   AS maybe,
               CASE WHEN bk.key IS NOT NULL THEN 1 ELSE 0 END AS present
        FROM cust c
        LEFT JOIN hits h ON h.key = c.c_custkey
        LEFT JOIN bk ON bk.key = c.c_custkey),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_built FROM bk),
    nbits AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bpos)
    SELECT nb.n_keys_built, nbits.n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(present) AS BIGINT) AS n_present,
           CAST(sum(maybe) AS BIGINT) AS n_maybe,
           CAST(sum(maybe * (1 - present)) AS BIGINT) AS n_false_pos,
           round(sum(maybe * (1 - present)) / sum(1 - present), 6)
               AS fp_rate,
           (min(CASE WHEN present = 1 THEN maybe ELSE 1 END) = 1)
               AS no_false_negatives
    FROM verdict CROSS JOIN nb CROSS JOIN nbits
    GROUP BY nb.n_keys_built, nbits.n_bits_set
"""

TEXTS['trending_items'] = """
    WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
    aged AS (
        SELECT l_partkey,
               date_diff('day', o_orderdate, (SELECT a FROM anchor)) AS age
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    scored AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(1000000.0 * 30.0 / (30.0 + age))
                             AS BIGINT)) AS BIGINT) AS sm
        FROM aged GROUP BY l_partkey)
    SELECT l_partkey, n_orders,
           round(sm / 1000000.0, 6) AS trend_score
    FROM scored ORDER BY sm DESC, l_partkey LIMIT 15
"""

TEXTS['kmv_distinct_rollup'] = """
    WITH ev AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               strftime(ts, '%Y-%m-%d') AS day,
               user_id
        FROM events),
    du AS (SELECT DISTINCT week, day, user_id FROM ev),
    hashed AS (
        SELECT week, day,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    daily AS (
        SELECT week, day, u
        FROM (SELECT week, day, u,
                     row_number() OVER (PARTITION BY day ORDER BY u) AS rk
              FROM hashed)
        WHERE rk <= 256),
    weekly AS (
        SELECT week, u, rk FROM (
            SELECT week, u,
                   row_number() OVER (PARTITION BY week ORDER BY u) AS rk
            FROM (SELECT DISTINCT week, u FROM daily))
        WHERE rk <= 256),
    sketch AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n_sketch,
               max(CASE WHEN rk = 256 THEN u END) AS u_k
        FROM weekly GROUP BY week),
    nd AS (SELECT week, CAST(count(DISTINCT day) AS BIGINT) AS n_days
           FROM daily GROUP BY week),
    ex AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM ev GROUP BY week)
    SELECT s.week, nd.n_days, ex.n_exact, s.n_sketch,
           round(CASE WHEN s.n_sketch < 256 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 255.0 / s.u_k END, 4) AS kmv_estimate,
           round(abs(CASE WHEN s.n_sketch < 256
                          THEN CAST(s.n_sketch AS DOUBLE)
                          ELSE 255.0 / s.u_k END - ex.n_exact)
                 / ex.n_exact, 6) AS rel_err
    FROM sketch s
    JOIN nd ON nd.week = s.week
    JOIN ex ON ex.week = s.week
    ORDER BY s.week
"""

TEXTS['l_diversity_profile'] = """
    WITH g AS (
        SELECT source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(count(DISTINCT lang) AS BIGINT) AS l
        FROM documents
        GROUP BY source, floor(n_chars / 100))
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l = 1 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_exposed,
           round(sum(CASE WHEN l >= 3 THEN group_size ELSE 0 END)
                 / CAST(sum(group_size) AS DOUBLE), 6) AS diverse_frac
    FROM g
    GROUP BY source
    ORDER BY source
"""

TEXTS['ewma_anomalies'] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events),
    c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
          FROM ev GROUP BY event_type, day),
    w(age, wt) AS (VALUES
        (1, 700000), (2, 490000), (3, 343000), (4, 240100),
        (5, 168070), (6, 117649), (7, 82354), (8, 57648),
        (9, 40354), (10, 28248), (11, 19773), (12, 13841),
        (13, 9689), (14, 6782)),
    b AS (
        SELECT event_type, day + age AS day,
               CAST(sum(wt * n) AS BIGINT) AS ws,
               CAST(sum(wt) AS BIGINT) AS sw,
               count(*) AS nh
        FROM c CROSS JOIN w
        GROUP BY event_type, day + age
        HAVING count(*) = 14),
    j AS (
        SELECT c.event_type, c.day, c.n, b.ws, b.sw,
               round(c.n * b.sw / b.ws, 6) AS ratio
        FROM c JOIN b ON b.event_type = c.event_type AND b.day = c.day)
    SELECT event_type, day, n,
           round(ws * 1.0 / sw, 4) AS baseline,
           ratio,
           CAST(CASE WHEN ratio >= 1.5 OR ratio <= 0.5 THEN 1 ELSE 0 END
                AS INTEGER) AS is_anomaly
    FROM j ORDER BY event_type, day
"""

TEXTS['zorder_layout_profile'] = """
    WITH coded AS (
        SELECT o_custkey % 16 AS x,
               CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 16
                   AS y
        FROM orders),
    z AS (
        SELECT x, y,
               (x % 2) * 1 + (y % 2) * 2
             + (CAST(floor(x / 2) AS BIGINT) % 2) * 4
             + (CAST(floor(y / 2) AS BIGINT) % 2) * 8
             + (CAST(floor(x / 4) AS BIGINT) % 2) * 16
             + (CAST(floor(y / 4) AS BIGINT) % 2) * 32
             + (CAST(floor(x / 8) AS BIGINT) % 2) * 64
             + (CAST(floor(y / 8) AS BIGINT) % 2) * 128 AS zv
        FROM coded),
    files AS (
        SELECT 'zorder' AS layout, CAST(floor(zv / 4) AS BIGINT)
                   AS file_id, x, y
        FROM z
        UNION ALL
        SELECT 'linear', CAST(floor((x * 16 + y) / 4) AS BIGINT), x, y
        FROM z),
    stats AS (
        SELECT layout, file_id, min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM files GROUP BY layout, file_id),
    probes AS (SELECT CAST(range AS BIGINT) AS c FROM range(0, 16)),
    xs AS (
        SELECT layout, 'x' AS probe_dim, count(*) / 16.0 AS avg_files
        FROM stats CROSS JOIN probes
        WHERE min_x <= c AND c <= max_x GROUP BY layout),
    ys AS (
        SELECT layout, 'y' AS probe_dim, count(*) / 16.0 AS avg_files
        FROM stats CROSS JOIN probes
        WHERE min_y <= c AND c <= max_y GROUP BY layout),
    nf AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_files
           FROM stats GROUP BY layout),
    u AS (SELECT * FROM xs UNION ALL SELECT * FROM ys)
    SELECT u.layout, u.probe_dim, nf.n_files,
           round(u.avg_files, 4) AS avg_files_scanned
    FROM u JOIN nf ON nf.layout = u.layout
    ORDER BY u.layout, u.probe_dim
"""

TEXTS['compaction_plan'] = """
    WITH files AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS f_rows
        FROM orders GROUP BY 1, 2),
    binned AS (
        SELECT month, day, f_rows,
               CAST(floor(coalesce(sum(f_rows) OVER (
                   PARTITION BY month ORDER BY f_rows DESC, day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) / 64) AS BIGINT) AS bin_id
        FROM files)
    SELECT month, bin_id, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(f_rows) AS BIGINT) AS bin_rows
    FROM binned GROUP BY month, bin_id
    HAVING count(*) >= 2
    ORDER BY month, bin_id
"""

TEXTS['t_closeness_profile'] = """
    WITH docs AS (
        SELECT lang, source,
               CAST(floor(n_chars / 100) AS BIGINT) AS len_band
        FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
    gdist AS (
        SELECT lang,
               CAST(round(1000000000.0 * count(*)
                          / CAST((SELECT n FROM tot) AS DOUBLE))
                    AS BIGINT) AS q_micro
        FROM docs GROUP BY lang),
    cells AS (
        SELECT source, len_band, lang,
               CAST(count(*) AS BIGINT) AS cnt
        FROM docs GROUP BY source, len_band, lang),
    sizes AS (
        SELECT source, len_band, CAST(sum(cnt) AS BIGINT) AS group_size
        FROM cells GROUP BY source, len_band),
    joined AS (
        SELECT c.source, c.len_band, s.group_size,
               CAST(round(1000000000.0 * c.cnt
                          / CAST(s.group_size AS DOUBLE)) AS BIGINT)
                   AS p_micro,
               g.q_micro
        FROM cells c
        JOIN gdist g USING (lang)
        JOIN sizes s ON c.source = s.source AND c.len_band = s.len_band),
    per_group AS (
        SELECT source, len_band, group_size,
               CAST((sum(abs(p_micro - q_micro))
                     + (1000000000 - sum(q_micro))) // 2 AS BIGINT)
                   AS t_micro
        FROM joined GROUP BY source, len_band, group_size)
    SELECT source,
           CAST(sum(group_size) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_groups,
           round(max(t_micro) / 1000000000.0, 6) AS max_t,
           round(sum(t_micro) / CAST(count(*) AS DOUBLE)
                 / 1000000000.0, 6) AS avg_t,
           CAST(sum(CASE WHEN t_micro > 500000000 THEN group_size
                         ELSE 0 END) AS BIGINT) AS n_skewed_docs
    FROM per_group
    GROUP BY source
    ORDER BY source
"""

TEXTS['survival_km_curve'] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS h,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events),
    horizon AS (SELECT max(h) AS max_h FROM ev),
    per_user AS (
        SELECT user_id, min(h) AS first_h,
               min(CASE WHEN is_p = 1 THEN h END) AS first_p
        FROM ev GROUP BY user_id),
    durations AS (
        SELECT CAST(CASE WHEN first_p IS NOT NULL THEN first_p - first_h
                         ELSE max_h - first_h END AS BIGINT) AS t_hours,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS d
        FROM per_user CROSS JOIN horizon),
    level AS (
        SELECT t_hours, CAST(sum(d) AS BIGINT) AS n_deaths,
               CAST(sum(1 - d) AS BIGINT) AS n_censored
        FROM durations GROUP BY t_hours),
    at_risk AS (
        SELECT *, CAST(sum(n_deaths + n_censored) OVER (
                   ORDER BY t_hours DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        FROM level),
    deaths AS (SELECT * FROM at_risk WHERE n_deaths > 0),
    curve AS (
        SELECT *,
               max(CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END) OVER w
                   AS zero_f,
               sum(CASE WHEN n_deaths < n_risk
                        THEN ln((n_risk - n_deaths)
                                / CAST(n_risk AS DOUBLE))
                        ELSE 0.0 END) OVER w AS lnsum
        FROM deaths
        WINDOW w AS (ORDER BY t_hours ROWS UNBOUNDED PRECEDING))
    SELECT t_hours, n_risk, n_deaths, n_censored,
           CASE WHEN zero_f = 1 THEN 0.0
                ELSE round(exp(lnsum), 6) END AS survival
    FROM curve ORDER BY t_hours
"""

TEXTS['ols_trend_per_group'] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               event_type
        FROM events),
    anchor AS (SELECT min(day) AS day0 FROM ev),
    daily AS (
        SELECT event_type,
               CAST(day - day0 AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM ev CROSS JOIN anchor
        GROUP BY event_type, day - day0),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM daily GROUP BY event_type),
    m AS (
        SELECT *,
               CAST(n_days AS DOUBLE) * sxy
                   - CAST(sx AS DOUBLE) * sy AS cov_n,
               CAST(n_days AS DOUBLE) * sxx
                   - CAST(sx AS DOUBLE) * sx AS var_x_n,
               CAST(n_days AS DOUBLE) * syy
                   - CAST(sy AS DOUBLE) * sy AS var_y_n
        FROM stats)
    SELECT event_type, n_days, sy AS n_events,
           round(cov_n / var_x_n, 6) AS slope_per_day,
           round((sy - (cov_n / var_x_n) * sx)
                 / CAST(n_days AS DOUBLE), 6) AS intercept,
           round(cov_n * cov_n / (var_x_n * var_y_n), 6) AS r2
    FROM m ORDER BY event_type
"""

TEXTS['target_encoding_oof'] = """
    WITH o AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    g AS (
        SELECT o_orderpriority, o_orderstatus,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM o GROUP BY o_orderpriority, o_orderstatus),
    enc AS (
        SELECT o.o_orderpriority, o.o_orderstatus,
               CASE WHEN g.n > 1
                    THEN CAST(floor((g.s - o.cents)
                                    / CAST(g.n - 1 AS DOUBLE)
                                    / 5000.0) AS BIGINT)
               END AS loo_band
        FROM o JOIN g USING (o_orderpriority, o_orderstatus))
    SELECT o_orderpriority, o_orderstatus, loo_band,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM enc
    GROUP BY o_orderpriority, o_orderstatus, loo_band
    ORDER BY o_orderpriority, o_orderstatus, loo_band
"""

TEXTS['bloom_pruned_join'] = """
    WITH build AS (
        SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'),
    bpos AS (
        SELECT DISTINCT
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM build CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    kp AS (
        SELECT l_orderkey,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM keys CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    hits AS (
        SELECT l_orderkey
        FROM kp JOIN bpos USING (pos)
        GROUP BY l_orderkey HAVING count(*) = 4),
    li AS (
        SELECT l_orderkey, l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
    passed AS (SELECT li.* FROM li JOIN hits USING (l_orderkey)),
    stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM li) AS n_probe,
               (SELECT CAST(count(*) AS BIGINT) FROM passed)
                   AS n_bloom_pass)
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(cents) / 100.0, 2) AS revenue,
           n_probe, n_bloom_pass
    FROM passed JOIN build ON passed.l_orderkey = build.o_orderkey
    CROSS JOIN stats
    GROUP BY l_returnflag, n_probe, n_bloom_pass
    ORDER BY l_returnflag
"""

TEXTS['salted_join_agg'] = """
    WITH ev AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events)
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(vc) / 100.0, 2) AS total_value
    FROM ev JOIN customer ON ev.user_id = customer.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""

TEXTS['kmv_set_ops'] = """
    WITH ev AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day, user_id
        FROM events),
    du AS (SELECT DISTINCT day, user_id FROM ev),
    hashed AS (
        SELECT day,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    sketch AS (
        SELECT day, u FROM (
            SELECT day, u,
                   row_number() OVER (PARTITION BY day ORDER BY u) AS rk
            FROM hashed)
        WHERE rk <= 64),
    nxt AS (SELECT day - 1 AS day, u FROM sketch),
    merged AS (
        SELECT DISTINCT day, u FROM (
            SELECT day, u FROM sketch
            UNION ALL SELECT day, u FROM nxt)),
    union_sk AS (
        SELECT day, u, rk FROM (
            SELECT day, u,
                   row_number() OVER (PARTITION BY day ORDER BY u) AS rk
            FROM merged)
        WHERE rk <= 64),
    marked AS (
        SELECT us.day, us.u, us.rk,
               CASE WHEN a.u IS NOT NULL THEN 1 ELSE 0 END AS in_a,
               CASE WHEN b.u IS NOT NULL THEN 1 ELSE 0 END AS in_b
        FROM union_sk us
        LEFT JOIN sketch a ON a.day = us.day AND a.u = us.u
        LEFT JOIN nxt b ON b.day = us.day AND b.u = us.u),
    pair_est AS (
        SELECT day,
               CAST(count(*) AS BIGINT) AS n_union_sketch,
               max(CASE WHEN rk = 64 THEN u END) AS uk,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        FROM marked GROUP BY day),
    a_cnt AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n_a_exact
        FROM du GROUP BY day),
    b_cnt AS (
        SELECT day - 1 AS day, CAST(count(*) AS BIGINT) AS n_b_exact
        FROM du GROUP BY day - 1),
    inter AS (
        SELECT x.day, CAST(count(*) AS BIGINT) AS inter_exact
        FROM du x JOIN du y
          ON y.day = x.day + 1 AND y.user_id = x.user_id
        GROUP BY x.day),
    est AS (
        SELECT p.day, a.n_a_exact, b.n_b_exact,
               CAST(coalesce(i.inter_exact, 0) AS BIGINT) AS inter_exact,
               CAST(a.n_a_exact + b.n_b_exact
                    - coalesce(i.inter_exact, 0) AS BIGINT) AS union_exact,
               CASE WHEN p.n_union_sketch < 64
                    THEN CAST(p.n_union_sketch AS DOUBLE)
                    ELSE 63.0 / p.uk END AS eu,
               p.n_both / CAST(p.n_union_sketch AS DOUBLE) AS jac
        FROM pair_est p
        JOIN a_cnt a ON a.day = p.day
        JOIN b_cnt b ON b.day = p.day
        LEFT JOIN inter i ON i.day = p.day)
    SELECT day, n_a_exact, n_b_exact, inter_exact, union_exact,
           round(eu, 4) AS union_est,
           round(jac, 6) AS jaccard_est,
           CAST(round(jac * eu) AS BIGINT) AS inter_est
    FROM est ORDER BY day
"""

TEXTS['dp_noisy_counts'] = """
    WITH counts AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_true
        FROM documents GROUP BY lang),
    drawn AS (
        SELECT lang, n_true,
               ('0x' || substr(md5('dp:' || lang), 1, 8))::BIGINT
                   / 4294967296.0 - 0.5 AS c
        FROM counts)
    SELECT lang, n_true,
           round(n_true + (-1.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 4)
               AS n_noisy,
           round(abs((-1.0) * sign(c) * ln(1.0 - 2.0 * abs(c))), 4)
               AS abs_err,
           CAST(1.0 AS DOUBLE) AS eps
    FROM drawn ORDER BY lang
"""

TEXTS['exact_auc_by_group'] = """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders),
    hist AS (
        SELECT grp, cents,
               CAST(count(*) AS BIGINT) AS t,
               CAST(sum(pos) AS BIGINT) AS tp
        FROM o GROUP BY grp, cents),
    cum AS (
        SELECT *, CAST(sum(t) OVER (PARTITION BY grp ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM hist),
    folds AS (
        SELECT grp,
               CAST(sum(tp * (2 * (c - t) + t + 1)) AS BIGINT) AS r2,
               CAST(sum(tp) AS BIGINT) AS n_pos,
               CAST(sum(t - tp) AS BIGINT) AS n_neg
        FROM cum GROUP BY grp)
    SELECT grp, n_pos, n_neg,
           round((r2 - n_pos * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc,
           round(2.0 * ((r2 - n_pos * (n_pos + 1))
                        / (2.0 * n_pos * n_neg)) - 1.0, 6) AS gini
    FROM folds ORDER BY grp
"""

TEXTS['rm3_query_expansion'] = """
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
    scored AS (
        SELECT tf.term, tf.doc_id,
               round(ln(1.0 + (c.n - q.doc_freq + 0.5) / (q.doc_freq + 0.5))
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl * c.n / c.sum_dl)),
                     6) AS bm25
        FROM tf JOIN q ON tf.term = q.term
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN c),
    fb AS (
        SELECT term AS query_term, doc_id
        FROM (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY bm25 DESC, doc_id) AS rk
              FROM scored)
        WHERE rk <= 10),
    cand AS (
        SELECT fb.query_term, tf.term,
               CAST(round(1e9 * tf.tf / dl.dl) AS BIGINT) AS w_micro,
               tf.doc_id
        FROM tf
        JOIN fb ON fb.doc_id = tf.doc_id
        JOIN dl ON dl.doc_id = tf.doc_id
        WHERE tf.term <> fb.query_term),
    rm AS (
        SELECT query_term, term,
               CAST(sum(w_micro) AS BIGINT) AS rm_micro,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_support
        FROM cand GROUP BY query_term, term),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_term
                                     ORDER BY rm_micro DESC, term) AS rnk
        FROM rm)
    SELECT query_term, term AS expansion_term,
           CAST(rnk AS INT) AS rank,
           round(rm_micro / 10.0 / 1e9, 6) AS rm_weight,
           doc_support
    FROM ranked WHERE rnk <= 5
    ORDER BY query_term, rnk
"""

TEXTS['cusum_changepoint'] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events),
    daily AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
        FROM ev GROUP BY event_type, day),
    totals AS (
        SELECT event_type, CAST(sum(y) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type),
    dev AS (
        SELECT d.event_type, d.day, t.total, t.n_days,
               CAST(t.n_days * d.y - t.total AS BIGINT) AS dd
        FROM daily d JOIN totals t USING (event_type)),
    path AS (
        SELECT *, CAST(sum(dd) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
        FROM dev),
    picked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY abs(s) DESC, day) AS rk
        FROM path)
    SELECT event_type, n_days, total, day AS peak_day,
           round(abs(s) / CAST(n_days AS DOUBLE), 4) AS cusum_max,
           CAST(sign(s) AS INT) AS shift_sign
    FROM picked WHERE rk = 1
    ORDER BY event_type
"""

TEXTS['cms_join_size_estimate'] = """
    WITH li AS (
        SELECT l_partkey AS key FROM lineitem),
    ev AS (SELECT user_id AS key FROM events),
    both_t AS (
        SELECT 'lineitem.l_partkey' AS table_key, key FROM li
        UNION ALL
        SELECT 'events.user_id' AS table_key, key FROM ev),
    counts AS (
        SELECT table_key, key, CAST(count(*) AS BIGINT) AS c
        FROM both_t GROUP BY table_key, key),
    positions AS (
        SELECT table_key, j, c,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                               || CAST(key AS VARCHAR)), 1, 8))::BIGINT
                   % 512 AS pos
        FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    cms AS (
        SELECT table_key, j, pos, CAST(sum(c) AS BIGINT) AS cnt
        FROM positions GROUP BY table_key, j, pos),
    est AS (
        SELECT table_key, CAST(min(ip) AS BIGINT) AS cms_estimate
        FROM (SELECT table_key, j,
                     CAST(sum(cnt * cnt) AS BIGINT) AS ip
              FROM cms GROUP BY table_key, j)
        GROUP BY table_key),
    exact AS (
        SELECT table_key,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(c * c) AS BIGINT) AS exact_self_join
        FROM counts GROUP BY table_key)
    SELECT e.table_key, e.n_rows, e.n_keys, e.exact_self_join,
           s.cms_estimate,
           round((s.cms_estimate - e.exact_self_join)
                 / CAST(e.exact_self_join AS DOUBLE), 6) AS overest_frac
    FROM exact e JOIN est s USING (table_key)
    ORDER BY e.table_key
"""

TEXTS['seasonal_naive_eval'] = """
    WITH ev AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events),
    daily AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
        FROM ev GROUP BY event_type, day),
    joined AS (
        SELECT a.event_type, a.y, b.y AS yhat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day = b.day + 7),
    folds AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(abs(y - yhat)) AS BIGINT) AS sae,
               CAST(sum(y - yhat) AS BIGINT) AS sbias,
               CAST(sum(CAST(round(1000000.0 * abs(y - yhat) / y)
                             AS BIGINT)) AS BIGINT) AS sape_micro
        FROM joined GROUP BY event_type)
    SELECT event_type, n_eval,
           round(sae / CAST(n_eval AS DOUBLE), 4) AS mae,
           round(sape_micro / CAST(n_eval AS DOUBLE) / 1000000.0, 6)
               AS mape,
           round(sbias / CAST(n_eval AS DOUBLE), 4) AS bias
    FROM folds ORDER BY event_type
"""

TEXTS['winsorized_stats'] = """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
    hist AS (SELECT vc, CAST(count(*) AS BIGINT) AS c
             FROM ev GROUP BY vc),
    cum AS (
        SELECT vc, CAST(sum(c) OVER (ORDER BY vc
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        FROM hist),
    lo AS (SELECT min(vc) AS lo_t FROM cum CROSS JOIN n_t
           WHERE cm >= 0.01 * n),
    hi AS (SELECT min(vc) AS hi_t FROM cum CROSS JOIN n_t
           WHERE cm >= 0.99 * n),
    clipped AS (
        SELECT event_type, vc,
               greatest(lo_t, least(hi_t, vc)) AS wc,
               CASE WHEN vc < lo_t THEN 1 ELSE 0 END AS clo,
               CASE WHEN vc > hi_t THEN 1 ELSE 0 END AS chi
        FROM ev CROSS JOIN lo CROSS JOIN hi)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(vc) AS BIGINT)
                 / CAST(count(*) AS DOUBLE) / 100.0, 6) AS raw_mean,
           round(CAST(sum(wc) AS BIGINT)
                 / CAST(count(*) AS DOUBLE) / 100.0, 6)
               AS winsorized_mean,
           CAST(sum(clo) AS BIGINT) AS n_clipped_lo,
           CAST(sum(chi) AS BIGINT) AS n_clipped_hi
    FROM clipped GROUP BY event_type ORDER BY event_type
"""

TEXTS['cuped_adjusted_lift'] = """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    per_user AS (
        SELECT CASE WHEN ('0x' || substr(md5('ab:'
                        || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               user_id,
               CAST(sum(CASE WHEN day <= m THEN vc ELSE 0 END) AS BIGINT)
                   AS x,
               CAST(sum(CASE WHEN day > m THEN vc ELSE 0 END) AS BIGINT)
                   AS y
        FROM ev CROSS JOIN mid GROUP BY 1, 2),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM per_user),
    arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS ax,
               CAST(sum(y) AS BIGINT) AS ay
        FROM per_user GROUP BY arm),
    m2 AS (
        SELECT a.*, p.n, p.sx,
               CAST(p.n AS DOUBLE) * p.sxy
                   - CAST(p.sx AS DOUBLE) * p.sy AS cov_n,
               CAST(p.n AS DOUBLE) * p.sxx
                   - CAST(p.sx AS DOUBLE) * p.sx AS var_x_n,
               CAST(p.n AS DOUBLE) * p.syy
                   - CAST(p.sy AS DOUBLE) * p.sy AS var_y_n
        FROM arms a CROSS JOIN pooled p)
    SELECT arm, n_users,
           round(ay / CAST(n_users AS DOUBLE) / 100.0, 6) AS mean_y,
           round((ay / CAST(n_users AS DOUBLE)
                  - (cov_n / var_x_n)
                    * (ax / CAST(n_users AS DOUBLE)
                       - sx / CAST(n AS DOUBLE))) / 100.0, 6)
               AS mean_y_cuped,
           round(cov_n / var_x_n, 6) AS theta,
           round(1.0 - (var_y_n - 2.0 * (cov_n / var_x_n) * cov_n
                        + (cov_n / var_x_n) * (cov_n / var_x_n) * var_x_n)
                       / var_y_n, 6) AS var_reduction
    FROM m2 ORDER BY arm
"""

TEXTS['neyman_allocation_plan'] = """
    WITH ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        FROM events),
    moments AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(vc) AS BIGINT) AS s,
               CAST(sum(vc * vc) AS BIGINT) AS ss
        FROM ev GROUP BY event_type),
    weighted AS (
        SELECT event_type, n_rows,
               round(sqrt((ss - s * (s / CAST(n_rows AS DOUBLE)))
                          / (CAST(n_rows AS DOUBLE) - 1.0)) / 100.0, 4)
                   AS std,
               CAST(round(n_rows
                          * sqrt((ss - s * (s / CAST(n_rows AS DOUBLE)))
                                 / (CAST(n_rows AS DOUBLE) - 1.0))
                          * 10000.0) AS BIGINT) AS weight_micro
        FROM moments),
    total AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS tw
              FROM weighted)
    SELECT event_type, n_rows, std, weight_micro,
           CAST(round(1000.0 * weight_micro / tw) AS BIGINT) AS alloc_n
    FROM weighted CROSS JOIN total
    ORDER BY event_type
"""

TEXTS['rendezvous_shard_plan'] = """
    WITH keys AS (SELECT DISTINCT user_id AS key FROM events),
    hw AS (
        SELECT key, w,
               ('0x' || substr(md5(CAST(key AS VARCHAR) || '@'
                               || CAST(w AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM keys CROSS JOIN (SELECT unnest(range(0, 9)) AS w) ws),
    after_a AS (
        SELECT key, w AS shard_after FROM (
            SELECT key, w, row_number() OVER (PARTITION BY key
                           ORDER BY h DESC, w DESC) AS rn
            FROM hw) WHERE rn = 1),
    before_a AS (
        SELECT key, w AS shard_before FROM (
            SELECT key, w, row_number() OVER (PARTITION BY key
                           ORDER BY h DESC, w DESC) AS rn
            FROM hw WHERE w < 8) WHERE rn = 1),
    assigned AS (
        SELECT a.key, a.shard_after, b.shard_before
        FROM after_a a JOIN before_a b USING (key)),
    audit AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys_total,
               round(sum(CASE WHEN shard_after <> shard_before
                              THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS moved_frac,
               round(1.0 / 9, 6) AS expected_moved_frac
        FROM assigned),
    ca AS (SELECT shard_after AS shard,
                  CAST(count(*) AS BIGINT) AS n_keys_after
           FROM assigned GROUP BY shard_after),
    cb AS (SELECT shard_before AS shard,
                  CAST(count(*) AS BIGINT) AS n_keys_before
           FROM assigned GROUP BY shard_before)
    SELECT ca.shard, cb.n_keys_before, ca.n_keys_after,
           n_keys_total, moved_frac, expected_moved_frac
    FROM ca LEFT JOIN cb USING (shard)
    CROSS JOIN audit
    ORDER BY ca.shard
"""

TEXTS['acf_ljung_box'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1,
               CAST(max(day) - min(day) + 1 AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS ss
        FROM c GROUP BY event_type),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    ck AS (
        SELECT t.event_type, l.lag,
               CAST(sum(t.x * p.x) AS BIGINT) AS c_k
        FROM c t CROSS JOIN lags l
        JOIN c p ON p.event_type = t.event_type
                AND t.day = p.day + l.lag
        GROUP BY 1, 2),
    clip AS (
        SELECT c.event_type, l.lag,
               CAST(sum(CASE WHEN c.day >= b.d0 + l.lag THEN c.x
                             ELSE 0 END) AS BIGINT) AS a_k,
               CAST(sum(CASE WHEN c.day <= b.d1 - l.lag THEN c.x
                             ELSE 0 END) AS BIGINT) AS b_k
        FROM c JOIN b USING (event_type) CROSS JOIN lags l
        GROUP BY 1, 2),
    r AS (
        SELECT clip.event_type, clip.lag, b.n AS n_days,
               round((b.n * b.n * coalesce(ck.c_k, 0)
                      - b.n * b.s * (clip.a_k + clip.b_k)
                      + (b.n - clip.lag) * b.s * b.s) * 1.0
                     / (b.n * b.n * b.ss - b.n * b.s * b.s), 6) AS acf
        FROM clip
        LEFT JOIN ck ON ck.event_type = clip.event_type
                    AND ck.lag = clip.lag
        JOIN b ON b.event_type = clip.event_type
        WHERE clip.lag < b.n)
    SELECT event_type, lag, n_days, acf,
           round(n_days * (n_days + 2)
                 * sum(acf * acf / (n_days - lag))
                       OVER (PARTITION BY event_type ORDER BY lag),
                 4) AS q_stat
    FROM r
    ORDER BY event_type, lag
"""

TEXTS['benford_audit'] = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS observed
        FROM orders
        GROUP BY 1 HAVING digit >= 1),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM digits),
    scored AS (
        SELECT digit, observed,
               round(observed * 1.0 / n, 6) AS obs_frac,
               round((ln(digit + 1) - ln(digit)) / ln(10.0), 6) AS exp_frac,
               CAST(round(1000000.0
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          * (observed - round((ln(digit + 1) - ln(digit))
                                              / ln(10.0), 6) * n)
                          / (round((ln(digit + 1) - ln(digit))
                                   / ln(10.0), 6) * n)) AS BIGINT) AS chi
        FROM digits CROSS JOIN tot),
    total_chi AS (
        SELECT round(sum(chi) / 1000000.0, 4) AS chi_square FROM scored)
    SELECT digit, observed, obs_frac, exp_frac, chi_square
    FROM scored CROSS JOIN total_chi
    ORDER BY digit
"""

TEXTS['pinball_quantile_eval'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT event_type, min(day) AS d0, max(day) AS d1,
               CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS mid
        FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day, mid
             FROM b),
    series AS (
        SELECT g.event_type, g.day, g.mid,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    hist AS (
        SELECT event_type, y, CAST(count(*) AS BIGINT) AS n
        FROM series WHERE day <= mid GROUP BY 1, 2),
    cum AS (
        SELECT event_type, y,
               sum(n) OVER (PARTITION BY event_type ORDER BY y
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_train_days
        FROM hist),
    qs(q) AS (VALUES (10), (50), (90)),
    preds AS (
        SELECT event_type, CAST(q AS INT) AS q, n_train_days,
               CAST(min(y) AS BIGINT) AS pred
        FROM cum CROSS JOIN qs
        WHERE cum_n >= CAST(ceil(q * n_train_days / 100.0) AS BIGINT)
        GROUP BY 1, 2, 3)
    SELECT s.event_type, p.q, p.pred, p.n_train_days,
           CAST(count(*) AS BIGINT) AS n_test_days,
           round(sum(CASE WHEN s.y >= p.pred
                          THEN p.q * (s.y - p.pred)
                          ELSE (100 - p.q) * (p.pred - s.y) END)
                 / 100.0 / count(*), 4) AS avg_pinball
    FROM series s JOIN preds p ON p.event_type = s.event_type
    WHERE s.day > s.mid
    GROUP BY 1, 2, 3, 4
    ORDER BY s.event_type, p.q
"""

TEXTS['hashing_collision_audit'] = """
    WITH d AS (
        SELECT list_filter(string_split(text, ' '), t -> length(t) > 0)
                   AS toks
        FROM documents),
    vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_concat(toks,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(1, len(toks)),
                                           i -> toks[i] || '_' || toks[i + 1])
                       ELSE [] END)) AS term
              FROM d)
        GROUP BY term),
    widths(n_buckets) AS (VALUES (256), (1024), (4096)),
    bucketed AS (
        SELECT n_buckets, cnt,
               ('0x' || substr(md5('fh:' || term), 1, 8))::BIGINT
                   % n_buckets AS bucket
        FROM vocab CROSS JOIN widths),
    per_bucket AS (
        SELECT n_buckets, bucket,
               CAST(count(*) AS BIGINT) AS bt,
               CAST(sum(cnt) AS BIGINT) AS bm
        FROM bucketed GROUP BY 1, 2)
    SELECT n_buckets,
           CAST(sum(bt) AS BIGINT) AS n_terms,
           CAST(count(*) AS BIGINT) AS n_occupied,
           CAST(max(bt) AS BIGINT) AS max_bucket_terms,
           round(sum(CASE WHEN bt > 1 THEN bt ELSE 0 END) * 1.0
                 / sum(bt), 6) AS term_collision_frac,
           round(sum(CASE WHEN bt > 1 THEN bm ELSE 0 END) * 1.0
                 / sum(bm), 6) AS mass_collision_frac
    FROM per_bucket GROUP BY n_buckets ORDER BY n_buckets
"""

TEXTS['did_lift_estimate'] = """
    WITH base AS (
        SELECT ('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS arm,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    anchor AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT)
                   AS mid FROM base),
    groups AS (
        SELECT arm,
               CASE WHEN day <= (SELECT mid FROM anchor)
                    THEN 'pre' ELSE 'post' END AS period,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM base GROUP BY 1, 2),
    wide AS (
        SELECT (CASE WHEN arm = 1 THEN 't' ELSE 'c' END
                || '_' || period) AS g,
               round(s / 100.0 / n, 4) AS m,
               CAST(round(1000000.0
                          * (ss - s * (s / CAST(n AS DOUBLE)))
                          / (n - 1.0) / 10000.0 / n) AS BIGINT) AS vt,
               n
        FROM groups),
    p AS (
        SELECT
            max(CASE WHEN g = 't_pre' THEN n END) AS n_t_pre,
            max(CASE WHEN g = 't_post' THEN n END) AS n_t_post,
            max(CASE WHEN g = 'c_pre' THEN n END) AS n_c_pre,
            max(CASE WHEN g = 'c_post' THEN n END) AS n_c_post,
            max(CASE WHEN g = 't_pre' THEN m END) AS mean_t_pre,
            max(CASE WHEN g = 't_post' THEN m END) AS mean_t_post,
            max(CASE WHEN g = 'c_pre' THEN m END) AS mean_c_pre,
            max(CASE WHEN g = 'c_post' THEN m END) AS mean_c_post,
            max(CASE WHEN g = 't_post' THEN vt END)
              + max(CASE WHEN g = 't_pre' THEN vt END)
              + max(CASE WHEN g = 'c_post' THEN vt END)
              + max(CASE WHEN g = 'c_pre' THEN vt END) AS vsum
        FROM wide)
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           mean_t_pre, mean_t_post, mean_c_pre, mean_c_post,
           round((mean_t_post - mean_t_pre)
                 - (mean_c_post - mean_c_pre), 4) AS did_estimate,
           round(sqrt(vsum / 1e6), 4) AS se,
           round(round((mean_t_post - mean_t_pre)
                       - (mean_c_post - mean_c_pre), 4)
                 / round(sqrt(vsum / 1e6), 4), 4) AS z_score
    FROM p
"""

TEXTS['woe_iv_profile'] = """
    WITH ev AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
        FROM events),
    hist AS (SELECT v, count(*) AS n FROM ev GROUP BY v),
    cum AS (
        SELECT v,
               sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER () AS nt
        FROM hist),
    binmap AS (
        SELECT v, CAST((10 * c + nt - 1) // nt AS INT) AS bin FROM cum),
    binned AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(good) AS BIGINT) AS n_good,
               CAST(sum(1 - good) AS BIGINT) AS n_bad
        FROM ev JOIN binmap USING (v)
        GROUP BY bin),
    tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS G,
                   CAST(sum(n_bad) AS BIGINT) AS B FROM binned),
    scored AS (
        SELECT bin, n, n_good, n_bad,
               round(n_good * 1.0 / n, 4) AS good_rate,
               round(ln(((n_good + 0.5) / (G + 5.0))
                        / ((n_bad + 0.5) / (B + 5.0))), 6) AS woe,
               CAST(round(1000000.0
                          * ((n_good + 0.5) / (G + 5.0)
                             - (n_bad + 0.5) / (B + 5.0))
                          * round(ln(((n_good + 0.5) / (G + 5.0))
                                     / ((n_bad + 0.5) / (B + 5.0))), 6))
                    AS BIGINT) AS ivt
        FROM binned CROSS JOIN tot),
    iv AS (SELECT round(sum(ivt) / 1e6, 6) AS iv_total FROM scored)
    SELECT bin, n, n_good, n_bad, good_rate, woe, iv_total
    FROM scored CROSS JOIN iv
    ORDER BY bin
"""

TEXTS['theil_sen_trend'] = """
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
    slopes AS (
        SELECT a.event_type, a.day, b2.day AS day2,
               round((b2.y - a.y) * 1.0 / (b2.day - a.day), 9) AS slope
        FROM series a JOIN series b2
          ON b2.event_type = a.event_type AND a.day < b2.day),
    ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope, day, day2) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes)
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           slope AS slope_per_day
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
"""

TEXTS['holt_forecast_eval'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, max(day) AS d1 FROM c GROUP BY 1),
    grid AS (SELECT event_type, d1,
                    unnest(range(d1 - 34, d1 + 1)) AS day
             FROM b),
    series AS (
        SELECT g.event_type, g.d1, g.day,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    w(idx, wl, wb) AS (VALUES (1, -21652, -4577), (2, -3774, -928), (3, -4302, -1090), (4, -4871, -1274), (5, -5476, -1483), (6, -6106, -1717), (7, -6743, -1979), (8, -7365, -2268), (9, -7937, -2584), (10, -8415, -2924), (11, -8737, -3285), (12, -8823, -3659), (13, -8567, -4037), (14, -7834, -4404), (15, -6451, -4740), (16, -4199, -5017), (17, -802, -5196), (18, 4085, -5231), (19, 10891, -5056), (20, 20148, -4589), (21, 32508, -3726), (22, 48772, -2332), (23, 69917, -242), (24, 97127, 2754), (25, 131836, 6917), (26, 175770, 12567), (27, 231000, 20100), (28, 300000, 30000)),
    fit AS (
        SELECT event_type,
               CAST(sum(wl * y) AS BIGINT) AS l_micro,
               CAST(sum(wb * y) AS BIGINT) AS b_micro
        FROM series JOIN w ON w.idx = series.day - (d1 - 34) + 1
        WHERE day <= d1 - 7
        GROUP BY event_type),
    scored AS (
        SELECT s.event_type, f.l_micro, f.b_micro,
               abs(s.y * 1000000
                   - (f.l_micro + (s.day - (s.d1 - 7)) * f.b_micro))
                   AS abs_err_micro
        FROM series s JOIN fit f USING (event_type)
        WHERE s.day > s.d1 - 7)
    SELECT event_type,
           round(l_micro / 1e6, 4) AS level,
           round(b_micro / 1e6, 4) AS trend_per_day,
           CAST(count(*) AS BIGINT) AS n_test_days,
           round(sum(abs_err_micro) / 1e6 / count(*), 4) AS mae
    FROM scored
    GROUP BY event_type, l_micro, b_micro
    ORDER BY event_type
"""

TEXTS['overdispersion_profile'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM series GROUP BY 1)
    SELECT event_type, n_days,
           round(s * 1.0 / n_days, 4) AS mean_daily,
           round((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0), 4)
               AS var_daily,
           round(((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0))
                 / (s * 1.0 / n_days), 4) AS dispersion_index,
           round((n_days - 1) * ((ss - s * (s * 1.0 / n_days))
                                 / (n_days - 1.0))
                 / (s * 1.0 / n_days), 4) AS chi_square,
           CASE WHEN round(((ss - s * (s * 1.0 / n_days))
                            / (n_days - 1.0))
                          / (s * 1.0 / n_days), 4) > 1.5
                THEN 'overdispersed'
                WHEN round(((ss - s * (s * 1.0 / n_days))
                            / (n_days - 1.0))
                          / (s * 1.0 / n_days), 4) < 0.67
                THEN 'underdispersed'
                ELSE 'poisson_like' END AS verdict
    FROM m ORDER BY event_type
"""

TEXTS['capture_recapture_estimate'] = """
    WITH users AS (
        SELECT user_id,
               CASE WHEN ('0x' || substr(md5('crA:'
                          || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0 < 0.3 THEN 1 ELSE 0 END AS in_a,
               CASE WHEN ('0x' || substr(md5('crB:'
                          || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0 < 0.3 THEN 1 ELSE 0 END AS in_b
        FROM (SELECT DISTINCT user_id FROM events)),
    agg AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n1,
               CAST(sum(in_b) AS BIGINT) AS n2,
               CAST(sum(in_a * in_b) AS BIGINT) AS m,
               CAST(sum(greatest(in_a, in_b)) AS BIGINT) AS n_observed,
               CAST(count(*) AS BIGINT) AS n_true
        FROM users)
    SELECT n1, n2, m, n_observed,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2) AS n_hat,
           n_true,
           round(round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2)
                 / n_true, 4) AS recovery_ratio
    FROM agg
"""

TEXTS['eb_shrunk_rates'] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id),
    rm AS (
        SELECT user_id, n, conv,
               CAST(round(1000000.0 * conv / n) AS BIGINT) AS rm
        FROM per_user),
    moments AS (
        SELECT CAST(count(*) AS BIGINT) AS nu,
               CAST(sum(rm) AS BIGINT) AS s1,
               CAST(sum(rm * rm) AS BIGINT) AS s2
        FROM rm),
    prior AS (
        SELECT round(round(s1 / 1e6 / nu, 6)
                     * (round(s1 / 1e6 / nu, 6)
                        * (1 - round(s1 / 1e6 / nu, 6))
                        / round((s2 / 1e12
                                 - nu * round(s1 / 1e6 / nu, 6)
                                      * round(s1 / 1e6 / nu, 6))
                                / (nu - 1.0), 6)
                        - 1), 4) AS alpha,
               round((1 - round(s1 / 1e6 / nu, 6))
                     * (round(s1 / 1e6 / nu, 6)
                        * (1 - round(s1 / 1e6 / nu, 6))
                        / round((s2 / 1e12
                                 - nu * round(s1 / 1e6 / nu, 6)
                                      * round(s1 / 1e6 / nu, 6))
                                / (nu - 1.0), 6)
                        - 1), 4) AS beta
        FROM moments)
    SELECT user_id, n, conv,
           round(conv * 1.0 / n, 4) AS raw_rate,
           alpha, beta,
           round((conv + alpha) / (n + alpha + beta), 6) AS eb_rate
    FROM rm CROSS JOIN prior
    ORDER BY eb_rate DESC, user_id
    LIMIT 15
"""

TEXTS['shapley_channel_attribution'] = """
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1
             + max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 2
             + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
             + max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 8
                   AS mask,
               max(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id),
    game AS (
        SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
               round(sum(conv) * 1.0 / count(*), 6) AS v
        FROM per_user GROUP BY mask),
    grid AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS m),
    vfull AS (
        SELECT m, coalesce(game.v, 0.0) AS v
        FROM grid LEFT JOIN game ON game.mask = grid.m),
    channels(channel, bit) AS (VALUES
        ('click', 1), ('view', 2), ('signup', 4), ('error', 8)),
    terms AS (
        SELECT c.channel,
               (CASE bit_count(s.m)
                     WHEN 0 THEN 6 WHEN 1 THEN 2
                     WHEN 2 THEN 2 ELSE 6 END)
               * CAST(round(1000000.0 * (w.v - s.v)) AS BIGINT) AS t24
        FROM channels c
        JOIN vfull s ON (s.m & c.bit) = 0
        JOIN vfull w ON w.m = (s.m | c.bit)),
    phi AS (
        SELECT channel, round(sum(t24) / 24.0 / 1e6, 6) AS shapley_value
        FROM terms GROUP BY channel),
    wc AS (
        SELECT channel, CAST(count(*) AS BIGINT) AS n_users_with_channel
        FROM per_user CROSS JOIN channels
        WHERE (mask & bit) != 0
        GROUP BY channel)
    SELECT p.channel,
           coalesce(wc.n_users_with_channel, 0) AS n_users_with_channel,
           p.shapley_value
    FROM phi p LEFT JOIN wc USING (channel)
    ORDER BY shapley_value DESC, channel
"""

TEXTS['join_order_advisor'] = """
    WITH sc AS (SELECT CAST(count(*) AS BIGINT) AS rows_c,
                       CAST(count(DISTINCT c_custkey) AS BIGINT)
                           AS ndv_c_cust
                FROM customer),
    so AS (SELECT CAST(count(*) AS BIGINT) AS rows_o,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_o_cust,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT)
                      AS ndv_o_order
           FROM orders),
    sl AS (SELECT CAST(count(*) AS BIGINT) AS rows_l,
                  CAST(count(DISTINCT l_orderkey) AS BIGINT)
                      AS ndv_l_order
           FROM lineitem),
    tc AS (SELECT CAST(count(*) AS BIGINT) AS true_co
           FROM customer JOIN orders ON c_custkey = o_custkey),
    tl AS (SELECT CAST(count(*) AS BIGINT) AS true_ol
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    one AS (SELECT * FROM sc CROSS JOIN so CROSS JOIN sl
            CROSS JOIN tc CROSS JOIN tl),
    est AS (
        SELECT *,
               round(rows_c * rows_o * 1.0
                     / greatest(ndv_c_cust, ndv_o_cust), 2) AS est_co,
               round(rows_o * rows_l * 1.0
                     / greatest(ndv_o_order, ndv_l_order), 2) AS est_ol
        FROM one)
    SELECT step, rows_left, rows_right, est_rows, true_rows,
           est_over_true, recommended
    FROM (
        SELECT 'customer*orders' AS step, rows_c AS rows_left,
               rows_o AS rows_right, est_co AS est_rows,
               true_co AS true_rows,
               round(est_co / true_co, 4) AS est_over_true,
               CASE WHEN est_co <= est_ol THEN 'customer_first'
                    ELSE 'lineitem_first' END AS recommended
        FROM est
        UNION ALL
        SELECT 'orders*lineitem', rows_o, rows_l, est_ol, true_ol,
               round(est_ol / true_ol, 4),
               CASE WHEN est_co <= est_ol THEN 'customer_first'
                    ELSE 'lineitem_first' END
        FROM est)
    ORDER BY step
"""

TEXTS['source_kl_divergence'] = """
    WITH toks AS (
        SELECT source, term FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE length(term) > 0),
    st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
           FROM toks GROUP BY 1, 2),
    vocab AS (SELECT term, CAST(sum(n) AS BIGINT) AS nt
              FROM st GROUP BY term),
    vs AS (SELECT CAST(count(*) AS BIGINT) AS vsz,
                  CAST(sum(nt) AS BIGINT) AS ncorp FROM vocab),
    src AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
            FROM st GROUP BY source),
    grid AS (
        SELECT src.source, src.ns, vocab.term, vocab.nt,
               coalesce(st.n, 0) AS n
        FROM src CROSS JOIN vocab
        LEFT JOIN st ON st.source = src.source AND st.term = vocab.term),
    cell AS (
        SELECT source, ns,
               CAST(round(1000000.0
                          * ((n + 1) * 1.0 / (ns + vsz))
                          * ln(((n + 1) * 1.0 / (ns + vsz))
                               / ((nt + 1) * 1.0 / (ncorp + vsz))))
                    AS BIGINT) AS t
        FROM grid CROSS JOIN vs)
    SELECT source, ns AS n_tokens,
           round(sum(t) / 1e6, 6) AS kl_nats
    FROM cell GROUP BY source, ns
    ORDER BY kl_nats DESC, source
"""

TEXTS['cv_paired_ttest'] = """
    WITH o AS (
        SELECT o_orderpriority AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5('cv:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT % 5 AS fold
        FROM orders),
    cells AS (
        SELECT fold, prio, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s
        FROM o GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nall,
                   CAST(sum(s) AS BIGINT) AS sall FROM cells),
    pr AS (SELECT prio, CAST(sum(n) AS BIGINT) AS np,
                  CAST(sum(s) AS BIGINT) AS sp
           FROM cells GROUP BY prio),
    train AS (
        SELECT c.fold, c.prio,
               CAST(round((pr.sp - c.s) * 1.0 / (pr.np - c.n)) AS BIGINT)
                   AS pred_grp
        FROM cells c JOIN pr USING (prio)),
    ft AS (SELECT fold, CAST(sum(n) AS BIGINT) AS nf,
                  CAST(sum(s) AS BIGINT) AS sf
           FROM cells GROUP BY fold),
    gm AS (
        SELECT fold,
               CAST(round((sall - sf) * 1.0 / (nall - nf)) AS BIGINT)
                   AS pred_glob
        FROM ft CROSS JOIN tot),
    scored AS (
        SELECT o.fold, CAST(count(*) AS BIGINT) AS n_test,
               round(sum(abs(cents - t.pred_grp)) / 100.0 / count(*), 4)
                   AS mae_group_model,
               round(sum(abs(cents - g.pred_glob)) / 100.0 / count(*), 4)
                   AS mae_global_model
        FROM o JOIN train t ON t.fold = o.fold AND t.prio = o.prio
        JOIN gm g ON g.fold = o.fold
        GROUP BY o.fold),
    diffs AS (
        SELECT fold, n_test, mae_group_model, mae_global_model,
               round(mae_group_model - mae_global_model, 4) AS d
        FROM scored),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS kf,
               CAST(sum(CAST(round(d * 10000) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(d * 10000) AS BIGINT)
                        * CAST(round(d * 10000) AS BIGINT)) AS BIGINT)
                   AS s2
        FROM diffs),
    verdict AS (
        SELECT round((s1 / 1e4 / kf)
                     / sqrt((s2 / 1e8 - kf * (s1 / 1e4 / kf)
                                           * (s1 / 1e4 / kf))
                            / (kf - 1.0) / kf), 4) AS t_stat
        FROM stats)
    SELECT fold, n_test, mae_group_model, mae_global_model,
           d AS mae_diff, t_stat,
           CASE WHEN abs(t_stat) > 2.776 THEN 'group_model_differs'
                ELSE 'no_significant_difference' END AS verdict
    FROM diffs CROSS JOIN verdict
    ORDER BY fold
"""

TEXTS['largest_remainder_allocation'] = """
    WITH counts AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        t -> length(t) > 0))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS w_all FROM counts),
    quotas AS (
        SELECT source, n_tokens,
               CAST((1000 * n_tokens) // w_all AS BIGINT) AS base,
               CAST(1000 * n_tokens
                    - ((1000 * n_tokens) // w_all) * w_all AS BIGINT)
                   AS rem,
               round(1000.0 * n_tokens / w_all, 4) AS quota,
               w_all
        FROM counts CROSS JOIN tot),
    leftover AS (
        SELECT CAST(1000 - sum(base) AS BIGINT) AS extra_seats
        FROM quotas),
    ranked AS (
        SELECT q.*, l.extra_seats,
               CAST(row_number() OVER (ORDER BY rem DESC, source)
                    AS BIGINT) AS rnk
        FROM quotas q CROSS JOIN leftover l)
    SELECT source, n_tokens, quota,
           base AS base_seats,
           CAST(CASE WHEN rnk <= extra_seats THEN 1 ELSE 0 END AS INT)
               AS extra,
           CAST(base + CASE WHEN rnk <= extra_seats THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM ranked
    ORDER BY source
"""

TEXTS['changepoint_slopes'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    daily AS MATERIALIZED (
        SELECT g.event_type, g.day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    totals AS (
        SELECT event_type, CAST(sum(y) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1),
    path AS (
        SELECT d.event_type, d.day, t.n_days,
               sum(t.n_days * d.y - t.total)
                   OVER (PARTITION BY d.event_type ORDER BY d.day
                         ROWS UNBOUNDED PRECEDING) AS s
        FROM daily d JOIN totals t USING (event_type)),
    peak AS MATERIALIZED (
        SELECT event_type, day AS peak_day,
               round(abs(s) / CAST(n_days AS DOUBLE), 4) AS cusum_max
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(s) DESC, day) AS rk
              FROM path)
        WHERE rk = 1),
    seg AS (
        SELECT d.event_type, p.peak_day, p.cusum_max,
               CASE WHEN d.day <= p.peak_day THEN 1 ELSE 0 END AS before,
               CAST(d.day - p.peak_day AS BIGINT) AS x, d.y
        FROM daily d JOIN peak p USING (event_type)),
    stats AS (
        SELECT event_type, peak_day, cusum_max, before,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM seg GROUP BY 1, 2, 3, 4),
    sided AS (
        SELECT event_type, peak_day, cusum_max, before,
               CASE WHEN n * sxx - sx * sx <> 0
                    THEN round((n * sxy - sx * sy) * 1.0
                               / (n * sxx - sx * sx), 6)
                    ELSE 0.0 END AS slope,
               round(sy * 1.0 / n, 4) AS mean_y,
               n AS n_days
        FROM stats)
    SELECT bf.event_type, bf.peak_day, bf.cusum_max,
           bf.n_days AS n_days_before,
           coalesce(af.n_days, 0) AS n_days_after,
           bf.mean_y AS mean_before,
           coalesce(af.mean_y, 0.0) AS mean_after,
           bf.slope AS slope_before,
           coalesce(af.slope, 0.0) AS slope_after,
           round(coalesce(af.slope, 0.0) - bf.slope, 6) AS slope_change
    FROM (SELECT * FROM sided WHERE before = 1) bf
    LEFT JOIN (SELECT * FROM sided WHERE before = 0) af
           ON af.event_type = bf.event_type
    ORDER BY bf.event_type
"""

TEXTS['quantile_normalize_profile'] = """
    WITH docs AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
        FROM documents),
    ranked AS (
        SELECT source, v,
               row_number() OVER (PARTITION BY source
                                  ORDER BY v, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS ns
        FROM docs),
    withg AS (
        SELECT source, v,
               CAST((1000 * r + ns - 1) // ns AS BIGINT) AS g
        FROM ranked),
    hist AS (SELECT v, count(*) AS n FROM docs GROUP BY v),
    cum AS (
        SELECT v,
               sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER () AS nt
        FROM hist),
    pooled AS MATERIALIZED (
        SELECT g.g, CAST(min(cum.v) AS BIGINT) AS v_mapped
        FROM (SELECT unnest(range(1, 1001)) AS g) g
        JOIN cum ON cum.c >= CAST(ceil(g.g * cum.nt / 1000.0) AS BIGINT)
        GROUP BY g.g),
    mapped AS (
        SELECT w.source, w.v, p.v_mapped
        FROM withg w JOIN pooled p USING (g)),
    per_source AS MATERIALIZED (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(v) * 1.0 / count(*), 4) AS mean_pre,
               round(sum(v_mapped) * 1.0 / count(*), 4) AS mean_post
        FROM mapped GROUP BY source),
    spread AS (
        SELECT round(max(CAST(round(mean_pre * 1e4) AS BIGINT)) / 1e4
                     - min(CAST(round(mean_pre * 1e4) AS BIGINT)) / 1e4,
                     4) AS pre_spread,
               round(max(CAST(round(mean_post * 1e4) AS BIGINT)) / 1e4
                     - min(CAST(round(mean_post * 1e4) AS BIGINT)) / 1e4,
                     4) AS post_spread
        FROM per_source)
    SELECT source, n_docs, mean_pre, mean_post, pre_spread, post_spread
    FROM per_source CROSS JOIN spread
    ORDER BY source
"""

TEXTS['spearman_user_metrics'] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS a,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS b
        FROM events GROUP BY user_id),
    ha AS (SELECT a, CAST(count(*) AS BIGINT) AS nv FROM per_user
           GROUP BY a),
    ca AS (SELECT a, nv,
                  sum(nv) OVER (ORDER BY a ROWS UNBOUNDED PRECEDING)
                      AS c
           FROM ha),
    dra AS (SELECT a, CAST(2 * c - nv + 1 AS BIGINT) AS dr_a FROM ca),
    hb AS (SELECT b, CAST(count(*) AS BIGINT) AS nv FROM per_user
           GROUP BY b),
    cb AS (SELECT b, nv,
                  sum(nv) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                      AS c
           FROM hb),
    drb AS (SELECT b, CAST(2 * c - nv + 1 AS BIGINT) AS dr_b FROM cb),
    ranked AS (
        SELECT dr_a, dr_b
        FROM per_user JOIN dra USING (a) JOIN drb USING (b)),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dr_a) AS BIGINT) AS sx,
               CAST(sum(dr_b) AS BIGINT) AS sy,
               CAST(sum(dr_a * dr_a) AS BIGINT) AS sxx,
               CAST(sum(dr_b * dr_b) AS BIGINT) AS syy,
               CAST(sum(dr_a * dr_b) AS BIGINT) AS sxy
        FROM ranked)
    SELECT n AS n_users,
           round((n * sxy - sx * sy) * 1.0
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS spearman_rho
    FROM m
"""

TEXTS['price_elasticity'] = """
    WITH qty AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY l_partkey),
    base AS (
        SELECT p.p_type,
               CAST(round(ln(CAST(round(p.p_retailprice * 100) AS BIGINT)
                             / 100.0) * 10000) AS BIGINT) AS xm,
               CAST(round(ln(CAST(q AS DOUBLE)) * 10000) AS BIGINT) AS ym
        FROM qty JOIN part p ON p.p_partkey = qty.l_partkey),
    m AS (
        SELECT p_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xm) AS BIGINT) AS sx,
               CAST(sum(ym) AS BIGINT) AS sy,
               CAST(sum(xm * xm) AS BIGINT) AS sxx,
               CAST(sum(ym * ym) AS BIGINT) AS syy,
               CAST(sum(xm * ym) AS BIGINT) AS sxy
        FROM base GROUP BY p_type)
    SELECT p_type, n AS n_parts,
           round(sx / 1e4 / n, 4) AS avg_ln_price,
           round(sy / 1e4 / n, 4) AS avg_ln_qty,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 4)
               AS elasticity,
           round((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 4)
               AS r_squared
    FROM m ORDER BY p_type
"""

TEXTS['doubly_robust_ate'] = """
    WITH ev AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS y,
               ('0x' || substr(md5('dr:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 2 AS t
        FROM events),
    strata AS (
        SELECT event_type,
               round(sum(t) / CAST(count(*) AS DOUBLE), 6) AS e,
               round(sum(t * y) / CAST(sum(t) AS DOUBLE), 6) AS m1,
               round(sum((1 - t) * y)
                     / CAST(count(*) - sum(t) AS DOUBLE), 6) AS m0
        FROM ev GROUP BY event_type),
    scored AS (
        SELECT ev.t, ev.y, s.e, s.m1, s.m0,
               CAST(round(1000000.0 * (s.m1 + ev.t * (ev.y - s.m1) / s.e))
                    AS BIGINT) AS t1,
               CAST(round(1000000.0 * (s.m0 + (1 - ev.t) * (ev.y - s.m0)
                                       / (1 - s.e))) AS BIGINT) AS t0
        FROM ev JOIN strata s USING (event_type)),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS n_treat,
               CAST(sum(t1) AS BIGINT) AS s1,
               CAST(sum(t0) AS BIGINT) AS s0,
               CAST(sum(t * y) AS BIGINT) AS syt,
               CAST(sum((1 - t) * y) AS BIGINT) AS syc
        FROM scored)
    SELECT n, n_treat,
           round((syt / CAST(n_treat AS DOUBLE)
                  - syc / CAST(n - n_treat AS DOUBLE)) / 100.0, 4)
               AS ate_naive,
           round(s1 / 1e6 / n / 100.0, 4) AS mu1_dr,
           round(s0 / 1e6 / n / 100.0, 4) AS mu0_dr,
           round(s1 / 1e6 / n / 100.0 - s0 / 1e6 / n / 100.0, 4)
               AS ate_dr
    FROM agg
"""

TEXTS['pps_horvitz_thompson'] = """
    WITH orders_c AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pop,
                   CAST(sum(cents) AS BIGINT) AS s_all FROM orders_c),
    base AS (
        SELECT o_orderkey, cents, n_pop, s_all,
               least(1.0, CAST(round(n_pop * 0.05) AS BIGINT) * cents
                          / CAST(s_all AS DOUBLE)) AS pi,
               ('0x' || substr(md5('pps:' || CAST(o_orderkey AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM orders_c CROSS JOIN tot),
    est AS (
        SELECT CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(CAST(round(cents / pi) AS BIGINT)) AS BIGINT)
                   AS ht_cents
        FROM base WHERE u < pi)
    SELECT n_pop, n_sampled,
           round(s_all / 100.0, 2) AS true_total,
           round(ht_cents / 100.0, 2) AS ht_estimate,
           round(ht_cents / CAST(s_all AS DOUBLE) - 1.0, 6) AS rel_err
    FROM est CROSS JOIN tot
"""

TEXTS['seasonal_indices'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type,
               CAST((g.day + 4) % 7 AS INT) AS weekday,
               CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    per_wd AS (
        SELECT event_type, weekday,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s
        FROM series GROUP BY 1, 2),
    tot AS (
        SELECT event_type, CAST(sum(n_days) AS BIGINT) AS nt,
               CAST(sum(s) AS BIGINT) AS st
        FROM per_wd GROUP BY 1)
    SELECT p.event_type, p.weekday, p.n_days,
           round(p.s * 1.0 / p.n_days, 4) AS mean_count,
           round((p.s * 1.0 / p.n_days)
                 / (t.st * 1.0 / t.nt), 4) AS seasonal_index
    FROM per_wd p JOIN tot t USING (event_type)
    ORDER BY p.event_type, p.weekday
"""

TEXTS['bh_fdr_correction'] = """
    WITH base AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    anchor AS (SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT)
                   AS mid FROM base),
    m AS (
        SELECT event_type,
               CASE WHEN day <= (SELECT mid FROM anchor)
                    THEN 1 ELSE 0 END AS a,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss
        FROM base GROUP BY 1, 2),
    sides AS (
        SELECT event_type, a, n,
               s / CAST(n AS DOUBLE) AS mu,
               (ss - s * (s / CAST(n AS DOUBLE))) / (n - 1.0) AS v
        FROM m),
    scored AS (
        SELECT ea.event_type,
               round((ea.mu - eb.mu)
                     / sqrt(ea.v / ea.n + eb.v / eb.n), 4) AS z_score
        FROM (SELECT * FROM sides WHERE a = 1) ea
        JOIN (SELECT * FROM sides WHERE a = 0) eb USING (event_type)),
    ranked AS (
        SELECT event_type, z_score,
               CAST(row_number() OVER (ORDER BY abs(z_score) DESC,
                                       event_type) AS INT) AS rank
        FROM scored),
    th(rank, z_star_micro) AS (VALUES
        (1, 2326348), (2, 2053749), (3, 1880794),
        (4, 1750686), (5, 1644854)),
    passed AS MATERIALIZED (
        SELECT r.event_type, r.rank, r.z_score, t.z_star_micro,
               CASE WHEN CAST(round(abs(r.z_score) * 1e6) AS BIGINT)
                         >= t.z_star_micro
                    THEN 1 ELSE 0 END AS passes
        FROM ranked r JOIN th t USING (rank)),
    kstar AS (
        SELECT CAST(coalesce(max(CASE WHEN passes = 1 THEN rank END), 0)
                    AS INT) AS k_star
        FROM passed)
    SELECT event_type, rank, z_score,
           round(z_star_micro / 1e6, 6) AS bh_boundary,
           CAST(CASE WHEN rank <= k_star THEN 1 ELSE 0 END AS INT)
               AS drift_rejected
    FROM passed CROSS JOIN kstar
    ORDER BY rank
"""

TEXTS['icc_profile'] = """
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM events GROUP BY user_id),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s) AS BIGINT) AS sy,
               CAST(sum(ss) AS BIGINT) AS syy,
               CAST(sum(CAST(round(1000000.0 * s * s
                                   / CAST(n AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS sb_micro,
               CAST(sum(n * n) AS BIGINT) AS sn2
        FROM per_user),
    d AS (
        SELECT k, nn,
               nn * 1.0 / k AS mbar,
               (sb_micro / 1e6 - sy * (sy / CAST(nn AS DOUBLE)))
                   / (k - 1.0) AS msb,
               (syy - sb_micro / 1e6) / CAST(nn - k AS DOUBLE) AS msw,
               (nn - sn2 / CAST(nn AS DOUBLE)) / (k - 1.0) AS m0
        FROM agg)
    SELECT k AS n_users, nn AS n_events,
           round(mbar, 4) AS avg_cluster_size,
           round(msw / 10000.0, 4) AS within_var,
           round(greatest(0.0, (msb - msw) / m0) / 10000.0, 4)
               AS between_var,
           round(greatest(0.0, (msb - msw) / m0)
                 / (greatest(0.0, (msb - msw) / m0) + msw), 6) AS icc,
           round(1.0 + (mbar - 1.0)
                       * (greatest(0.0, (msb - msw) / m0)
                          / (greatest(0.0, (msb - msw) / m0) + msw)), 4)
               AS design_effect
    FROM d
"""

TEXTS['mde_power_analysis'] = """
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_obs,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM events),
    grid(n0) AS (VALUES (1000), (10000), (100000), (-1)),
    base AS (
        SELECT CASE WHEN n0 = -1 THEN n_obs // 2
                    ELSE CAST(n0 AS BIGINT) END AS n_per_arm,
               CAST(CASE WHEN n0 = -1 THEN 1 ELSE 0 END AS INT)
                   AS is_observed_n,
               s / CAST(n_obs AS DOUBLE) AS mu_c,
               (ss - s * (s / CAST(n_obs AS DOUBLE))) / (n_obs - 1.0)
                   AS var_c
        FROM m CROSS JOIN grid)
    SELECT n_per_arm, is_observed_n,
           round(mu_c / 100.0, 4) AS baseline_mean,
           round(2.801585 * sqrt(2.0 * var_c / n_per_arm) / 100.0, 4)
               AS mde_abs,
           round(2.801585 * sqrt(2.0 * var_c / n_per_arm) / mu_c, 6)
               AS mde_rel
    FROM base ORDER BY n_per_arm
"""

TEXTS['session_gap_sweep'] = """
    WITH deltas AS (
        SELECT user_id,
               epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                   AS dt
        FROM events),
    totals AS (
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN dt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_users
        FROM deltas),
    gaps(gap_minutes) AS (VALUES (10), (30), (60)),
    sweep AS (
        SELECT g.gap_minutes,
               CAST(sum(CASE WHEN d.dt > g.gap_minutes * 60
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
        FROM deltas d CROSS JOIN gaps g
        GROUP BY g.gap_minutes)
    SELECT CAST(s.gap_minutes AS INT) AS gap_minutes,
           CAST(t.n_users + s.n_breaks AS BIGINT) AS n_sessions,
           round(t.n_events * 1.0 / (t.n_users + s.n_breaks), 4)
               AS avg_events_per_session
    FROM sweep s CROSS JOIN totals t
    ORDER BY gap_minutes
"""

TEXTS['freshness_audit'] = """
    WITH per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(floor(epoch(ts))) AS BIGINT) AS last_epoch
        FROM events GROUP BY event_type),
    anchor AS (SELECT max(last_epoch) AS hwm FROM per_type)
    SELECT event_type, n_events, last_epoch,
           round((hwm - last_epoch) / 3600.0, 4) AS lag_hours,
           CAST(CASE WHEN round((hwm - last_epoch) / 3600.0, 4) > 48.0
                     THEN 1 ELSE 0 END AS INT) AS stale
    FROM per_type CROSS JOIN anchor
    ORDER BY event_type
"""

TEXTS['negbin_fit_profile'] = """
    WITH c AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1
          FROM c GROUP BY 1),
    grid AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM b),
    series AS (
        SELECT g.event_type, CAST(coalesce(c.y, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type
                               AND c.day = g.day),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss,
               CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM series GROUP BY 1),
    d AS (
        SELECT event_type, n_days, n_zero,
               round(s * 1.0 / n_days, 6) AS mean,
               round((ss - s * (s * 1.0 / n_days)) / (n_days - 1.0), 6)
                   AS var
        FROM m)
    SELECT event_type, n_days,
           mean AS mean_daily, var AS var_daily,
           CASE WHEN var > mean
                THEN round(mean * mean / (var - mean), 4)
                ELSE 0.0 END AS nb_r,
           CASE WHEN var > mean THEN round(mean / var, 4)
                ELSE 1.0 END AS nb_p,
           CASE WHEN var > mean
                THEN round(pow(round(mean * mean / (var - mean), 4)
                               / (round(mean * mean / (var - mean), 4)
                                  + mean),
                               round(mean * mean / (var - mean), 4)), 4)
                ELSE round(exp(-mean), 4) END AS p0_fitted,
           round(n_zero * 1.0 / n_days, 4) AS p0_observed
    FROM d ORDER BY event_type
"""

# Full recompute of the merge-on-read join view's end state: customers
# with segment overrides applied (jv-dim cohort), orders with the fact
# delta applied (jv-upd integer-cents bumps + jv-new re-keyed inserts),
# joined and profiled per segment.  Shared verbatim by join_view_mor
# (broadcast-only ledger resolution), join_view_reconcile (CoW fold then
# plain scan) and stream_join_view_mor (three micro-batch ledger
# appends) — one text proving three engine paths reach the identical
# fully-applied join.  Money is exact integer cents (BIGINT sum, one
# final /100 display division), per the post-r12 SQL-surface discipline.
TEXTS['join_view_mor'] = """
    WITH dim AS (
        SELECT c_custkey,
               CASE WHEN ('0x' || substr(md5('jv-dim:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                         / 4294967296.0 < 0.02
                    THEN 'MOVED' ELSE c_mktsegment END AS segment
        FROM customer),
    o AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               ('0x' || substr(md5('jv-upd:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_upd,
               ('0x' || substr(md5('jv-new:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u_new
        FROM orders),
    final AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN u_upd < 0.03
                    THEN ((CAST(round(o_totalprice * 100) AS BIGINT) * 101 + 50) // 100) / 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM o
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, o_totalprice
        FROM o WHERE u_new < 0.01)
    SELECT d.segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_custs,
           round(sum(CAST(round(f.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total_price
    FROM final f JOIN dim d ON f.o_custkey = d.c_custkey
    GROUP BY d.segment
    ORDER BY d.segment
"""

TEXTS['bucketed_join_agg'] = """
    SELECT o.o_orderpriority,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""

TEXTS['skyline_orders'] = """
    WITH base AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
               strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
               CAST(datediff('day', DATE '1990-01-01',
                             CAST(o.o_orderdate AS DATE)) AS BIGINT) AS day_n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    flagged AS (
        SELECT segment, o_orderkey, price_cents, order_date, day_n,
               max(day_n) OVER (PARTITION BY segment ORDER BY price_cents
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_day_lt,
               max(day_n) OVER (PARTITION BY segment ORDER BY price_cents
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS best_day_le
        FROM base)
    SELECT segment, o_orderkey, price_cents, order_date
    FROM flagged
    WHERE (best_day_lt IS NULL OR best_day_lt < day_n)
      AND best_day_le = day_n
    ORDER BY segment, price_cents, o_orderkey
"""

TEXTS['exact_matched_cohort'] = """
    WITH pre AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_pre,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pre_err,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pre_pur
        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY user_id),
    post AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS post_pur
        FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY user_id),
    users AS (
        SELECT p.user_id, p.n_pre // 5 AS band,
               p.pre_err >= p.pre_pur AS exposed,
               COALESCE(po.post_pur, 0) AS post_pur
        FROM pre p LEFT JOIN post po ON p.user_id = po.user_id),
    arm AS (SELECT band, exposed, CAST(count(*) AS BIGINT) AS n_arm
            FROM users GROUP BY 1, 2),
    kb AS (SELECT band, min(n_arm) AS k FROM arm
           GROUP BY band HAVING count(*) = 2),
    ranked AS (
        SELECT u.band, u.exposed, u.post_pur, kb.k,
               row_number() OVER (PARTITION BY u.band, u.exposed
                   ORDER BY ('0x' || substr(md5('match:' ||
                                CAST(u.user_id AS VARCHAR)), 1, 8))::BIGINT,
                            u.user_id) AS rn
        FROM users u JOIN kb ON u.band = kb.band),
    mt AS (
        SELECT band, CAST(max(k) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN exposed THEN post_pur ELSE 0 END)
                    AS BIGINT) AS out_exposed,
               CAST(sum(CASE WHEN NOT exposed THEN post_pur ELSE 0 END)
                    AS BIGINT) AS out_control
        FROM ranked WHERE rn <= k GROUP BY band),
    sz AS (
        SELECT band,
               CAST(sum(CASE WHEN exposed THEN n_arm ELSE 0 END)
                    AS BIGINT) AS n_exposed,
               CAST(sum(CASE WHEN NOT exposed THEN n_arm ELSE 0 END)
                    AS BIGINT) AS n_unexposed
        FROM arm GROUP BY band),
    bands AS (
        SELECT CAST(s.band AS BIGINT) AS band, s.n_exposed, s.n_unexposed,
               COALESCE(m.n_matched, 0) AS n_matched,
               COALESCE(m.out_exposed, 0) AS out_exposed,
               COALESCE(m.out_control, 0) AS out_control
        FROM sz s LEFT JOIN mt m ON s.band = m.band)
    SELECT * FROM (
        SELECT band, n_exposed, n_unexposed, n_matched,
               out_exposed, out_control
        FROM bands
        UNION ALL
        SELECT CAST(-1 AS BIGINT),
               CAST(sum(n_exposed) AS BIGINT),
               CAST(sum(n_unexposed) AS BIGINT),
               CAST(sum(n_matched) AS BIGINT),
               CAST(sum(out_exposed) AS BIGINT),
               CAST(sum(out_control) AS BIGINT)
        FROM bands)
    ORDER BY band
"""

TEXTS['vacuum_retention_plan'] = """
    WITH files AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS f_rows
        FROM orders GROUP BY 1, 2),
    months AS (
        SELECT month,
               CAST(dense_rank() OVER (ORDER BY month) AS BIGINT) AS v
        FROM (SELECT DISTINCT month FROM files)),
    vm AS (SELECT max(v) AS vmax FROM months),
    manifest AS (
        SELECT f.day, f.f_rows, m.v AS added_v,
               CASE WHEN ('0x' || substr(md5('vac:' || f.day), 1, 8))::BIGINT
                         % 10 < 4
                     AND m.v + 1 + ('0x' || substr(md5('vac:' || f.day), 1,
                         8))::BIGINT % 3 <= vm.vmax
                    THEN m.v + 1 + ('0x' || substr(md5('vac:' || f.day), 1,
                         8))::BIGINT % 3
               END AS removed_v,
               vm.vmax - {keep_last} + 1 AS floor_v
        FROM files f JOIN months m USING (month) CROSS JOIN vm),
    added AS (SELECT added_v AS v, CAST(count(*) AS BIGINT) AS n_added
              FROM manifest GROUP BY added_v),
    removed AS (
        SELECT removed_v AS v,
               CAST(count(*) AS BIGINT) AS n_removed,
               CAST(sum(CASE WHEN removed_v <= floor_v THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_deletable,
               CAST(sum(CASE WHEN removed_v <= floor_v THEN f_rows
                        ELSE 0 END) AS BIGINT) AS reclaim_rows
        FROM manifest WHERE removed_v IS NOT NULL GROUP BY removed_v)
    SELECT m.v,
           CAST(coalesce(a.n_added, 0) AS BIGINT) AS n_added,
           CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(coalesce(r.n_deletable, 0) AS BIGINT) AS n_deletable,
           CAST(coalesce(r.reclaim_rows, 0) AS BIGINT) AS reclaim_rows
    FROM (SELECT DISTINCT v FROM months) m
    LEFT JOIN added a ON a.v = m.v
    LEFT JOIN removed r ON r.v = m.v
    ORDER BY m.v
""".replace('{keep_last}', '3')

TEXTS['sql_lateral_topk'] = """
        SELECT c.c_custkey, l.o_orderkey, l.price_cents
        FROM customer c,
        LATERAL (
            SELECT o.o_orderkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                       AS price_cents
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY CAST(round(o.o_totalprice * 100) AS BIGINT) DESC,
                     o.o_orderkey
            LIMIT 2
        ) l
        WHERE c.c_nationkey = 1
        ORDER BY c.c_custkey, l.price_cents DESC, l.o_orderkey
        LIMIT 200
"""

TEXTS['skew_salt_advisor'] = """
    WITH keyed AS (
        SELECT CASE
                 WHEN ('0x' || substr(md5('skew:' ||
                      CAST(l_orderkey * 16 + l_linenumber AS VARCHAR)),
                      1, 8))::BIGINT / 4294967296.0 < 0.25 THEN 1
                 WHEN ('0x' || substr(md5('skew:' ||
                      CAST(l_orderkey * 16 + l_linenumber AS VARCHAR)),
                      1, 8))::BIGINT / 4294967296.0 < 0.35 THEN 2
                 ELSE l_suppkey
               END AS key
        FROM lineitem),
    per_key AS (
        SELECT CAST(key AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS n
        FROM keyed GROUP BY key),
    hist AS (SELECT n, CAST(count(*) AS BIGINT) AS keys_at_n
             FROM per_key GROUP BY n),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM per_key),
    med AS (
        SELECT CAST(min(n) AS BIGINT) AS median_n
        FROM (SELECT n, sum(keys_at_n) OVER (ORDER BY n) AS cum
              FROM hist) c CROSS JOIN tot
        WHERE cum * 2 >= n_keys + 1)
    SELECT p.key, p.n AS n_rows, m.median_n,
           CAST(p.n::HUGEINT * 1000000 // m.median_n::HUGEINT AS BIGINT)
               AS skew_ratio_micro,
           CAST(least((p.n + 4 * m.median_n - 1) // (4 * m.median_n),
                      32) AS BIGINT) AS n_salts
    FROM per_key p CROSS JOIN med m
    WHERE p.n >= m.median_n * 4
    ORDER BY p.n DESC, p.key
    LIMIT 20
"""

TEXTS['shuffle_partition_advisor'] = """
    WITH stats AS (
        SELECT 'lineitem' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) * 76 + sum(length(l_returnflag))
                    + sum(length(l_linestatus)) AS BIGINT) AS est_bytes
        FROM lineitem
        UNION ALL
        SELECT 'orders', CAST(count(*) AS BIGINT),
               CAST(count(*) * 32 + sum(length(o_orderstatus))
                    + sum(length(o_orderpriority)) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(count(*) * 20 + sum(length(c_name))
                    + sum(length(c_mktsegment)) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'events', CAST(count(*) AS BIGINT),
               CAST(count(*) * 32 + sum(length(event_type))
                    + sum(length(props)) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'documents', CAST(count(*) AS BIGINT),
               CAST(count(*) * 16 + sum(length(text)) + sum(length(lang))
                    + sum(length(source)) AS BIGINT)
        FROM documents)
    SELECT table_name, n_rows, est_bytes,
           CAST(greatest((est_bytes + 134217727) // 134217728, 1)
                AS BIGINT) AS scan_partitions,
           CAST(least(greatest((est_bytes + 67108863) // 67108864, 32),
                      2000) AS BIGINT) AS shuffle_partitions
    FROM stats ORDER BY table_name
"""

TEXTS['schema_evolution_read'] = """
    WITH v1 AS (
        SELECT 1 AS version, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               -1 AS priority_rank
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
    v2 AS (
        SELECT 2 AS version, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
                   AS priority_rank
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT CAST(version AS INTEGER) AS version, status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(total_cents) AS BIGINT) AS sum_cents,
           CAST(sum(CASE WHEN priority_rank = -1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_backfilled,
           CAST(sum(CASE WHEN priority_rank <> -1
                         THEN priority_rank ELSE 0 END)
                AS BIGINT) AS sum_rank
    FROM u GROUP BY version, status
    ORDER BY version, status
"""

TEXTS['udtf_token_rows'] = """
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    ORDER BY doc_id, pos
"""

TEXTS['partition_evolution_read'] = """
    WITH ev AS (
        SELECT strftime(ts, '%Y-%m') AS month,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               event_type,
               CAST(round(value * 1000000) AS BIGINT) AS micros
        FROM events),
    mid AS (
        SELECT CAST(floor((min(day) + max(day)) / 2.0) AS BIGINT) AS m
        FROM ev),
    u AS (
        SELECT CASE WHEN day <= m THEN 1 ELSE 2 END AS spec, month, micros
        FROM ev CROSS JOIN mid
        WHERE event_type = 'purchase')
    SELECT CAST(spec AS INTEGER) AS spec, month,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(micros) AS BIGINT) AS sum_micros
    FROM u GROUP BY spec, month ORDER BY spec, month
"""

TEXTS['udaf_trimmed_mean'] = """
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents)
    SELECT source,
           CAST(max(n) AS BIGINT) AS n_docs,
           round(avg(n_chars), 4) AS trimmed_mean_chars
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY source ORDER BY source
"""
