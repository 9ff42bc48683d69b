"""DuckDB oracle SQL texts — streaming family.

Moved verbatim out of plans/queries.py (r12 verdict task 5: the
11k-line registry split).  These are DATA, not code: each entry
is the ANSI-SQL twin the driver runs against the same parquet
tables; plans/queries.py re-exports them into ORACLES at the
original registration sites, so registry order and text bytes
are unchanged.  Oracle-parity rules live in the queries.py
docstring.
"""

TEXTS: dict[str, str] = {}

TEXTS['stream_trending_items'] = """
    WITH counts AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT *,
               CAST(row_number() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type) AS INTEGER) AS rnk
        FROM counts)
    SELECT window_start, event_type, n, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY window_start, rnk
"""

TEXTS['stream_domain_quota'] = """
    WITH dom AS (
        SELECT doc_id, source,
               CAST(floor(u * u * 150.0) AS BIGINT) AS domain_idx
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5('domain:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT / 4294967296.0 AS u
            FROM documents)),
    ranked AS (
        SELECT doc_id, source, domain_idx,
               row_number() OVER (
                   PARTITION BY domain_idx
                   ORDER BY doc_id % 3,
                            md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM dom)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_admitted,
           CAST(sum(CASE WHEN rk > 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rejected
    FROM ranked
    GROUP BY source
    ORDER BY source
"""

TEXTS['stream_value_quantiles'] = """
    WITH ev AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value
        FROM events WHERE value > 0),
    bk AS (
        SELECT day, event_type,
               CAST(ceil(round(ln(value) / ln(1.02), 6)) AS BIGINT) AS b
        FROM ev),
    merged AS (
        SELECT day, event_type, b, count(*) AS n FROM bk GROUP BY 1, 2, 3),
    cum AS (
        SELECT day, event_type, b,
               sum(n) OVER (PARTITION BY day, event_type ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY day, event_type) AS total
        FROM merged)
    SELECT day, event_type,
           CAST(max(total) AS BIGINT) AS n_events,
           round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.5 * total)
                                          THEN b END)) / 2.02, 6) AS p50_est,
           round(2.0 * pow(1.02, min(CASE WHEN cum >= ceil(0.95 * total)
                                          THEN b END)) / 2.02, 6) AS p95_est
    FROM cum GROUP BY day, event_type
    ORDER BY day, event_type
"""

TEXTS['stream_late_data_audit'] = """
    WITH mx AS (SELECT max(ts) AS max_ts FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_on_time,
           CAST(sum(CASE WHEN date_trunc('day', ts) + INTERVAL 1 DAY
                              <= max_ts - INTERVAL 3 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted,
           CAST(sum(CASE WHEN date_trunc('day', ts) + INTERVAL 1 DAY
                              > max_ts - INTERVAL 3 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_withheld,
           CAST(count(*) AS BIGINT) AS n_dropped_late
    FROM events CROSS JOIN mx
    GROUP BY event_type ORDER BY event_type
"""

TEXTS['stream_kmv_distinct'] = """
    WITH ev AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               user_id
        FROM events),
    du AS (SELECT DISTINCT week, user_id FROM ev),
    hashed AS (
        SELECT DISTINCT week,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT / 4294967296.0 AS u
        FROM du),
    weekly AS (
        SELECT week, u, rk FROM (
            SELECT week, u,
                   row_number() OVER (PARTITION BY week ORDER BY u) AS rk
            FROM hashed)
        WHERE rk <= 256),
    sketch AS (
        SELECT week, CAST(count(*) AS BIGINT) AS n_sketch,
               max(CASE WHEN rk = 256 THEN u END) AS u_k
        FROM weekly GROUP BY week),
    ex AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM ev GROUP BY week)
    SELECT s.week, ex.n_exact, s.n_sketch,
           round(CASE WHEN s.n_sketch < 256 THEN CAST(s.n_sketch AS DOUBLE)
                      ELSE 255.0 / s.u_k END, 4) AS kmv_estimate,
           round(abs(CASE WHEN s.n_sketch < 256
                          THEN CAST(s.n_sketch AS DOUBLE)
                          ELSE 255.0 / s.u_k END - ex.n_exact)
                 / ex.n_exact, 6) AS rel_err
    FROM sketch s JOIN ex ON ex.week = s.week
    ORDER BY s.week
"""

TEXTS['stream_pit_enrichment'] = """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    drawn AS (
        SELECT user_id,
               ('0x' || substr(md5('scdstream:'
                                   || CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT / 4294967296.0 AS uu,
               'seg' || CAST(user_id % 4 AS VARCHAR) AS base
        FROM u),
    dim AS (
        SELECT user_id, base AS segment, '2023-01-01' AS vf,
               CASE WHEN uu < 0.3 THEN '2024-01-16'
                    ELSE '9999-12-31' END AS vt
        FROM drawn
        UNION ALL
        SELECT user_id, base || '_V2', '2024-01-16', '9999-12-31'
        FROM drawn WHERE uu < 0.3),
    ev AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
               CAST(round(value * 1000000) AS BIGINT) AS vm
        FROM events),
    j AS (
        SELECT d.segment, e.user_id, e.vm
        FROM ev e JOIN dim d
          ON d.user_id = e.user_id AND e.day >= d.vf AND e.day < d.vt)
    SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(vm) / 1000000.0, 4) AS total_value
    FROM j GROUP BY segment ORDER BY segment
"""

TEXTS['stream_benford_values'] = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(count(*) AS BIGINT) AS observed
        FROM events WHERE value > 0
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
