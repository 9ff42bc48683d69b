"""Base DuckDB oracle texts (the original inline registry dict).

Moved verbatim out of plans/queries.py (round 14 — the module crept
back over the 4,000-line budget after the wave registrations); these
are the founding oracle texts registered as one literal dict before
the per-domain modules existed.  plans/queries.py seeds its ORACLES
mapping from this dict; later registrations layer the per-domain
TEXTS on top exactly as before.  Text bytes are unchanged — registry
identity is proven at move time by a before/after key-order + text
hash snapshot.
"""

from __future__ import annotations

TEXTS: dict[str, str] = {
    "course_stats": """
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS attempts,
               CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS passed,
               CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
               round(avg(l_quantity), 4) AS avg_quantity,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_price,
               round(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) * 100.0 / count(*), 4) AS pass_rate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_partkey
        ORDER BY attempts DESC, l_partkey
        LIMIT 50
    """,
    "label_histogram": """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "user_activity": """
        SELECT c_custkey, c_name,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               round(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 0.0), 2) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY n_orders DESC, c_custkey
        LIMIT 100
    """,
    "distinct_counts": """
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem
    """,
    "conditional_pivot": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN l_linestatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
               round(sum(CAST(round(l_discount * 100) AS BIGINT)) / count(*) / 100.0, 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "time_range_filter": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "derived_projection": """
        SELECT o_orderkey, o_custkey,
               round(o_totalprice * 0.3, 4) AS blended_low,
               round(o_totalprice * 0.7, 4) AS blended_high,
               CAST(o_orderkey % 7 AS BIGINT) AS bucket,
               CASE WHEN o_totalprice > 100000.0 THEN 'high'
                    WHEN o_totalprice > 50000.0 THEN 'mid'
                    ELSE 'low' END AS tier
        FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    "top_k_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "null_handling": """
        SELECT c_custkey,
               CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
               round(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 0.0), 2) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        GROUP BY c_custkey
        ORDER BY c_custkey LIMIT 500
    """,
    "multiway_join": """
        SELECT r_name, n_name,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "rollup_totals": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag)
        ORDER BY l_returnflag NULLS LAST
    """,
    "scalar_functions": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               substr(o_orderpriority, 1, 1) AS prio_code,
               'ORD-' || CAST(o_orderkey AS VARCHAR) AS order_tag,
               round(o_totalprice / 1000.0, 3) AS price_k,
               greatest(0.0, round(o_totalprice - 200000.0, 2)) AS over_200k,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    "json_extraction": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "union_dedup": """
        SELECT DISTINCT o_custkey FROM (
            SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
            UNION ALL
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ) ORDER BY o_custkey
    """,
    "anti_join_new_keys": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND NOT EXISTS (
              SELECT 1 FROM orders e
              WHERE e.o_orderdate < TIMESTAMP '2000-01-01'
                AND e.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
    """,
    "semi_join_filter": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """,
    "cooccurrence_pairs": """
        WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_cooccur
        FROM basket a
        JOIN basket b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_cooccur DESC, part_a, part_b
        LIMIT 50
    """,
    "sample_deterministic": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 3 ORDER BY o_orderkey
    """,
    "cube_totals": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    "percentile_stats": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "approx_profile": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               TRUE AS approx_customers_ok,
               TRUE AS approx_p50_ok,
               TRUE AS approx_p95_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "csv_roundtrip_ingest": """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "paginated_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY totalprice DESC, o_orderkey
        LIMIT 100 OFFSET 300
    """,
    "time_rollup": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_year, o_month)
        ORDER BY o_year NULLS LAST, o_month NULLS LAST
    """,
    "cheapest_order_per_customer": """
        SELECT o_custkey,
               arg_min(o_orderkey, o_totalprice) AS cheapest_orderkey,
               round(min(o_totalprice), 2) AS cheapest_price,
               arg_max(o_orderkey, o_totalprice) AS priciest_orderkey,
               round(max(o_totalprice), 2) AS priciest_price,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    "event_rate": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
               round(count(*) / ((epoch(max(ts)) - epoch(min(ts))) / 60.0), 6)
                   AS events_per_min
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_per_day": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4) AS total_value
        FROM events GROUP BY 1 ORDER BY day
    """,
    "user_topk_recommendations": """
        WITH popularity AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_partkey
            ORDER BY n DESC, l_partkey LIMIT 15),
        scored AS (
            SELECT u.user_id, p.l_partkey, p.n,
                   round(0.3 * (u.user_id % 10) + 0.7 * p.n, 4) AS score
            FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN popularity p),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY score DESC, l_partkey) AS rn
            FROM scored)
        SELECT user_id, l_partkey AS item_id, score, CAST(rn AS INTEGER) AS rank
        FROM ranked WHERE rn <= 5 ORDER BY user_id, rank
    """,
    "purchase_asof_click": """
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    # --- TPC-H-shaped analytics ------------------------------------------
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
                   AS sum_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                   AS sum_base_price,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                              AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * (1 + l_tax) * 1000000)
                              AS BIGINT)) / 1000000.0, 2) AS sum_charge,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_price,
               round(sum(CAST(round(l_discount * 100) AS BIGINT))
                     / count(*) / 100.0, 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "shipping_priority": """
        SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "local_supplier_volume": """
        SELECT n_name,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
        FROM region JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "small_quantity_revenue": """
        WITH avg_qty AS (
            SELECT l_partkey AS a_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
            FROM lineitem GROUP BY l_partkey)
        SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
        JOIN avg_qty ON a_partkey = l_partkey
        WHERE l_quantity < half_avg_qty
    """,
    "big_orders": """
        WITH big AS (
            SELECT l_orderkey AS k, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(total_qty, 2) AS total_qty
        FROM orders JOIN big ON o_orderkey = k
        JOIN customer ON c_custkey = o_custkey
        ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
    "data_quality_report": """
        WITH c AS (
          SELECT 'lineitem_orphan_orderkey' AS check,
                 (SELECT count(*) FROM lineitem l LEFT JOIN orders o
                  ON l.l_orderkey=o.o_orderkey WHERE o.o_orderkey IS NULL) AS violations
          UNION ALL SELECT 'lineitem_orphan_partkey',
                 (SELECT count(*) FROM lineitem l LEFT JOIN part p
                  ON l.l_partkey=p.p_partkey WHERE p.p_partkey IS NULL)
          UNION ALL SELECT 'lineitem_orphan_suppkey',
                 (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
                  ON l.l_suppkey=s.s_suppkey WHERE s.s_suppkey IS NULL)
          UNION ALL SELECT 'orders_orphan_custkey',
                 (SELECT count(*) FROM orders o LEFT JOIN customer cu
                  ON o.o_custkey=cu.c_custkey WHERE cu.c_custkey IS NULL)
          UNION ALL SELECT 'orders_pk_duplicates',
                 (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                  GROUP BY o_orderkey HAVING count(*)>1))
          UNION ALL SELECT 'lineitem_pk_duplicates',
                 (SELECT count(*) FROM (SELECT l_orderkey, l_linenumber
                  FROM lineitem GROUP BY 1,2 HAVING count(*)>1))
          UNION ALL SELECT 'lineitem_negative_quantity',
                 (SELECT coalesce(sum(CASE WHEN l_quantity<=0 THEN 1 ELSE 0 END),0)
                  FROM lineitem)
          UNION ALL SELECT 'lineitem_discount_out_of_range',
                 (SELECT coalesce(sum(CASE WHEN l_discount<0 OR l_discount>1
                  THEN 1 ELSE 0 END),0) FROM lineitem)
          UNION ALL SELECT 'orders_null_orderdate',
                 (SELECT coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),0)
                  FROM orders)
        )
        SELECT "check", CAST(violations AS BIGINT) AS violations
        FROM c ORDER BY "check"
    """,
    # --- range / banded joins + grouping sets -----------------------------
    "quantity_band_stats": """
        SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS band,
               floor(l_quantity / 10.0) * 10.0 AS band_lo,
               (floor(l_quantity / 10.0) + 1) * 10.0 AS band_hi,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem GROUP BY 1, 2, 3 ORDER BY band
    """,
    "price_tier_join": """
        WITH tiers AS (SELECT * FROM (VALUES
            ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
            ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 1e12))
            t(tier, lo, hi))
        SELECT tier, CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_price,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier ORDER BY tier
    """,
    "grouping_sets_stats": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / 100.0, 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    # --- set operations ---------------------------------------------------
    "customers_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
    """,
    "customers_except": """
        SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey
    """,
    "priority_union_all": """
        WITH u AS (
            SELECT o_custkey, 'urgent' AS src, o_totalprice FROM orders
            WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_custkey, 'big' AS src, o_totalprice FROM orders
            WHERE o_totalprice > 300000)
        SELECT src, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS total
        FROM u GROUP BY src ORDER BY src
    """,
    # --- window variants --------------------------------------------------
    "moving_avg_range": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w * 1.0 / count(*) OVER w / 100.0, 4) AS avg_30d,
               CAST(count(*) OVER w AS BIGINT) AS n_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY datediff('day', TIMESTAMP '1995-01-01', o_orderdate)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "ntile_quartiles": """
        SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_nationkey, c_custkey LIMIT 2000
    """,
    "order_gaps": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(datediff('day', o_orderdate,
                    lead(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)) AS INTEGER) AS days_to_next
        FROM orders
        ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "rolling_median": """
        SELECT o_custkey, o_orderkey,
               round(quantile_cont(o_totalprice, 0.5) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS rolling_median
        FROM orders ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    "deterministic_group_sample": """
        WITH r AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                       AS INTEGER) AS rn
            FROM orders)
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
        FROM r WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    # --- streaming (bounded replay; oracle = batch equivalent) -----------
    "stream_stateful_features": """
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "stream_bootstrapped_features": """
        WITH seed AS (
            SELECT * FROM (VALUES
                (5, 'click', 40, 123.5),
                (10, 'purchase', 7, 900.25),
                (999999, 'view', 3, 1.5)
            ) s(user_id, event_type, n_events, total_value)),
        merged AS (
            SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(total_value AS DOUBLE) AS total_value
            FROM seed
            UNION ALL
            SELECT user_id, event_type, count(*), sum(value)
            FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(sum(total_value), 4) AS total_value
        FROM merged GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "stream_tumbling_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    "stream_sliding_counts": """
        WITH starts AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
            FROM events)
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM starts GROUP BY 1 ORDER BY window_start
    """,
    "stream_stream_attribution": """
        SELECT p.event_id AS purchase_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        JOIN (SELECT * FROM events WHERE event_type='click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        ORDER BY purchase_id, click_ts
    """,
    "stream_dedup_events": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "stream_session_windows": """
        WITH lagged AS (
            SELECT user_id, event_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events),
        flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts >= prev_ts + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged)
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS session_value
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    # --- windows ---------------------------------------------------------
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS latest_order_date,
               o_totalprice
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1 ORDER BY o_custkey
    """,
    "drift_lag": """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice - prev_price, 2) AS delta,
               round((o_totalprice - prev_price) * 100.0 / prev_price, 4) AS delta_pct
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     lag(o_totalprice) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev_price
              FROM orders)
        WHERE prev_price IS NOT NULL
        ORDER BY o_custkey, o_orderkey
        LIMIT 2000
    """,
    "power_user_rank": """
        SELECT o_custkey, n_orders, total_spend,
               CAST(activity_rank AS INTEGER) AS activity_rank
        FROM (SELECT o_custkey,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           / 100.0, 2) AS total_spend,
                     dense_rank() OVER (ORDER BY count(*) DESC) AS activity_rank
              FROM orders GROUP BY o_custkey)
        WHERE n_orders > 5
        ORDER BY activity_rank, o_custkey
    """,
    "top_n_per_group": """
        SELECT l_suppkey, CAST(rn AS INTEGER) AS rn,
               l_orderkey, l_partkey, l_extendedprice
        FROM (SELECT l_suppkey, l_orderkey, l_partkey, l_extendedprice,
                     row_number() OVER (
                         PARTITION BY l_suppkey
                         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
        WHERE rn <= 5 ORDER BY l_suppkey, rn
    """,
    "sessionize": """
        WITH lagged AS (
            SELECT user_id, event_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events),
        flagged AS (
            SELECT *, CASE WHEN prev_ts IS NULL
                             OR ts >= prev_ts + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
            FROM lagged),
        sess AS (
            SELECT user_id, value,
                   CAST(sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM flagged)
        SELECT user_id, session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4)
                   AS session_value
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "running_total": """
        SELECT o_custkey, o_orderkey,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey LIMIT 2000
    """,
    # --- text ------------------------------------------------------------
    "doc_quality_profile": """
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / len(string_split(text, ' ')), 4) AS avg_token_len,
               round(len(list_filter(string_split(text, ' '),
                                     t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                     / len(string_split(text, ' ')), 4) AS stopword_ratio,
               round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                     / length(text), 4) AS alpha_ratio
        FROM documents ORDER BY doc_id
    """,
    "lang_profile": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               sha256(text) AS fingerprint,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                           t -> CAST(ascii(t) * 256 + length(t) AS BIGINT))),
                   (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS rolling_fp
        FROM documents ORDER BY doc_id
    """,
    "token_frequencies": """
        SELECT token, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token ORDER BY freq DESC, token LIMIT 100
    """,
    "lang_id_confusion": """
        WITH aug AS (
            SELECT lang,
                   text || CASE WHEN doc_id % 2 = 0 THEN
                       CASE lang
                           WHEN 'es' THEN repeat(' el la que', 25)
                           WHEN 'de' THEN repeat(' der die und', 25)
                           WHEN 'fr' THEN repeat(' le les des', 25)
                           WHEN 'zh' THEN repeat(' de shi bu', 25)
                           ELSE '' END
                   ELSE '' END AS t
            FROM documents),
        scored AS (
            SELECT lang,
                   len(list_filter(string_split(t, ' '), x -> x IN ('the','and','fast'))) AS s_en,
                   len(list_filter(string_split(t, ' '), x -> x IN ('el','la','que'))) AS s_es,
                   len(list_filter(string_split(t, ' '), x -> x IN ('der','die','und'))) AS s_de,
                   len(list_filter(string_split(t, ' '), x -> x IN ('le','les','des'))) AS s_fr,
                   len(list_filter(string_split(t, ' '), x -> x IN ('de','shi','bu'))) AS s_zh
            FROM aug),
        pred AS (
            SELECT lang,
                   CASE
                     WHEN s_zh > greatest(s_en, s_es, s_de, s_fr) THEN 'zh'
                     WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
                     WHEN s_de > greatest(s_en, s_es) THEN 'de'
                     WHEN s_es > s_en THEN 'es'
                     ELSE 'en'
                   END AS lang_pred
            FROM scored)
        SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
    "token_stats": r"""
        WITH per_doc AS (
            SELECT lang,
                   len(string_split(text, ' ')) AS ws_tokens,
                   list_sum(list_transform(
                       regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                       w -> CAST(ceil(length(w)/4.0) AS BIGINT))) AS bpe_tokens,
                   length(text) AS n_chars
            FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
               CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
               round(sum(bpe_tokens) * 1.0 / sum(ws_tokens), 6) AS bpe_per_word,
               round(sum(n_chars) * 1.0 / sum(bpe_tokens), 6) AS chars_per_bpe_token
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "chunk_documents": """
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        k AS (
            SELECT doc_id, n,
                   CASE WHEN n <= 50 THEN 1
                        ELSE 1 + CAST(ceil((n - 50) / 40.0) AS BIGINT) END AS n_chunks
            FROM t WHERE n > 0)
        SELECT doc_id,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(list_sum(list_transform(range(0, CAST(n_chunks AS INTEGER)),
                        j -> least(50, n - 40 * j))) AS BIGINT) AS total_chunk_tokens,
               CAST(least(50, n) AS INTEGER) AS max_chunk_tokens
        FROM k ORDER BY doc_id
    """,
    # --- dedup -------------------------------------------------------------
    "exact_duplicates": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        SELECT sha256(text) AS fingerprint,
               CAST(min(doc_id) AS BIGINT) AS canonical_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM corpus GROUP BY sha256(text)
        HAVING count(*) > 1 ORDER BY canonical_id
    """,
    "ngram_jaccard_pairs": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       CASE WHEN len(t) >= 3
                            THEN list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(list_slice(t, i, i + 2), ' '))
                            ELSE [] END)) AS shingle
            FROM toks),
        sh2 AS (SELECT doc_id, shingle FROM sh WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh2 GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh2 a JOIN sh2 b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
               round(n_inter * 1.0 / (sa.n_shingles + sb.n_shingles - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_inter * 1.0 / (sa.n_shingles + sb.n_shingles - n_inter), 6) >= 0.20
        ORDER BY doc_a, doc_b
    """,
    # --- similarity ---------------------------------------------------------
    "knn_brute_force": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                   FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "knn_multi_query": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.q_emb AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                                    CAST(q.q_emb AS DOUBLE[])))), 6)
                       AS cos_sim
            FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.query_id),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER)
                AS rank
            FROM scored)
        SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    "embedding_stats": """
        WITH per_vec AS (
            SELECT label,
                   len(embedding) AS dim,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))) AS norm,
                   list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS max_component
            FROM embeddings)
        SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(min(dim) AS INTEGER) AS min_dim,
               CAST(max(dim) AS INTEGER) AS max_dim,
               round(sum(CAST(round(norm * 1e9) AS BIGINT))
                     / count(*) / 1e9, 6) AS avg_norm,
               round(max(norm), 6) AS max_norm,
               round(sum(CAST(round(max_component * 1e9) AS BIGINT))
                     / count(*) / 1e9, 6) AS avg_max_component
        FROM per_vec GROUP BY label ORDER BY label
    """,
    "embedding_near_dup_pairs": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])))), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                             CAST(a.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])))), 6) >= 0.40
        ORDER BY id_a, id_b
    """,
    # --- multimodal ----------------------------------------------------------
    "media_profile": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   sha256(text) AS checksum
            FROM documents)
        SELECT media_type,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               round(avg(n_bytes), 4) AS avg_bytes,
               CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct
        FROM media GROUP BY media_type ORDER BY media_type
    """,
    "interval_overlap_counts": """
        WITH iv AS (
            SELECT CAST(l_shipdate AS DATE) AS s,
                   CAST(l_shipdate AS DATE)
                       + (CAST(l_quantity AS INTEGER) % 14 + 1) AS e,
                   l_quantity
            FROM lineitem),
        weeks AS (
            SELECT unnest(generate_series(DATE '1995-01-01',
                                          DATE '2002-01-01',
                                          INTERVAL 7 DAY))::DATE AS w_start)
        SELECT strftime(w.w_start, '%Y-%m-%d') AS week_start,
               CAST(count(*) AS BIGINT) AS n_overlap,
               round(sum(l_quantity), 2) AS total_qty
        FROM weeks w JOIN iv
          ON iv.s <= w.w_start + 6 AND iv.e >= w.w_start
        GROUP BY w.w_start ORDER BY week_start
    """,
    "media_dedup": """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   text,
                   CAST(length(text) AS BIGINT) AS n_bytes
            FROM documents),
        corpus AS (
            SELECT media_id, media_type, text, n_bytes FROM media
            UNION ALL
            SELECT media_id + 5000000, media_type, text, n_bytes
            FROM media WHERE media_id % 7 = 0),
        winners AS (SELECT text, min(media_id) AS media_id
                    FROM corpus GROUP BY text),
        kept AS (SELECT c.* FROM corpus c
                 JOIN winners w ON c.text = w.text AND c.media_id = w.media_id),
        totals AS (SELECT media_type,
                          CAST(count(*) AS BIGINT) AS n_total,
                          CAST(sum(n_bytes) AS BIGINT) AS total_bytes
                   FROM corpus GROUP BY media_type),
        uniq AS (SELECT media_type,
                        CAST(count(*) AS BIGINT) AS n_unique,
                        min(media_id) AS first_kept_id
                 FROM kept GROUP BY media_type)
        SELECT t.media_type, t.n_total, u.n_unique,
               t.n_total - u.n_unique AS n_dropped,
               t.total_bytes, u.first_kept_id
        FROM totals t JOIN uniq u USING (media_type)
        ORDER BY t.media_type
    """,
    # --- ML / recsys ---------------------------------------------------------
    # hash_uniform(salt, key) — sources/ingest.py — is md5-based, so the
    # oracle reproduces the "random" draws bit-for-bit:
    "synthetic_interactions": """
        WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
        u AS (
            SELECT row_id,
                   ('0x' || substr(md5('42:tier:'   || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
                   ('0x' || substr(md5('42:plays:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_plays,
                   ('0x' || substr(md5('42:checks:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_checks,
                   ('0x' || substr(md5('42:truth:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
            FROM base),
        t AS (
            SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                           WHEN u_tier < 0.7 THEN 'mid'
                           ELSE 'low' END AS tier
            FROM u)
        SELECT CAST(row_id % 1000 AS BIGINT) AS user_id,
               'course-' || CAST(row_id % 200 AS VARCHAR) AS course_id,
               CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                   WHEN 'mid' THEN 0.60
                                                   ELSE 0.30 END)
                         THEN 0 ELSE 1 END AS INTEGER) AS truth,
               round(CASE tier WHEN 'high' THEN 50 + u_plays * 150
                               WHEN 'mid'  THEN 10 + u_plays * 40
                               ELSE u_plays * 10 END, 2) AS action_play_video,
               round(CASE tier WHEN 'high' THEN 20 + u_checks * 80
                               WHEN 'mid'  THEN 5 + u_checks * 15
                               ELSE u_checks * 5 END, 2) AS action_problem_check,
               CAST(1700000000 + row_id AS BIGINT) AS event_ts
        FROM t ORDER BY user_id, course_id, event_ts
    """,
    "mutated_interactions": """
        WITH base AS (SELECT range AS row_id FROM range(0, 2000)),
        u AS (
            SELECT row_id,
                   ('0x' || substr(md5('42:tier:'   || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_tier,
                   ('0x' || substr(md5('42:plays:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_plays,
                   ('0x' || substr(md5('42:checks:' || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_checks,
                   ('0x' || substr(md5('42:truth:'  || CAST(row_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_truth
            FROM base),
        t AS (
            SELECT *, CASE WHEN u_tier < 0.3 THEN 'high'
                           WHEN u_tier < 0.7 THEN 'mid'
                           ELSE 'low' END AS tier
            FROM u),
        gen AS (
            SELECT CAST(row_id % 1000 AS BIGINT) AS user_id,
                   'course-' || CAST(row_id % 200 AS VARCHAR) AS course_id,
                   CAST(CASE WHEN u_truth < (CASE tier WHEN 'high' THEN 0.85
                                                       WHEN 'mid' THEN 0.60
                                                       ELSE 0.30 END)
                             THEN 0 ELSE 1 END AS INTEGER) AS truth,
                   round(CASE tier WHEN 'high' THEN 50 + u_plays * 150
                                   WHEN 'mid'  THEN 10 + u_plays * 40
                                   ELSE u_plays * 10 END, 2) AS action_play_video,
                   round(CASE tier WHEN 'high' THEN 20 + u_checks * 80
                                   WHEN 'mid'  THEN 5 + u_checks * 15
                                   ELSE u_checks * 5 END, 2) AS action_problem_check,
                   CAST(1700000000 + row_id AS BIGINT) AS event_ts
            FROM t),
        m AS (
            SELECT *,
                   ('0x' || substr(md5('7:sample:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.10 AS in_sample,
                   ('0x' || substr(md5('7:noise0:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_n0,
                   ('0x' || substr(md5('7:noise1:' || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_n1,
                   ('0x' || substr(md5('7:flip:'   || CAST(event_ts AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u_flip
            FROM gen)
        SELECT user_id, course_id,
               CAST(CASE WHEN in_sample AND u_flip < 0.05
                         THEN 1 - truth ELSE truth END AS INTEGER) AS truth,
               CASE WHEN in_sample
                    THEN greatest(0.0, round(action_play_video * (0.8 + u_n0 * 0.4), 2))
                    ELSE action_play_video END AS action_play_video,
               CASE WHEN in_sample
                    THEN greatest(0.0, round(action_problem_check * (0.8 + u_n1 * 0.4), 2))
                    ELSE action_problem_check END AS action_problem_check,
               event_ts
        FROM m ORDER BY user_id, course_id, event_ts
    """,
    "stratified_sample": """
        WITH frame AS (
            SELECT o.o_orderkey,
                   CASE WHEN coalesce(sum(l.l_quantity), 0) > 100.0
                        THEN 1.0 ELSE 0.0 END AS label
            FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus IN ('F', 'O', 'P')
            GROUP BY o.o_orderkey),
        r AS (
            SELECT label,
                   row_number() OVER (PARTITION BY label
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY label) AS n
            FROM frame)
        SELECT label,
               CAST(sum(CASE WHEN rn <= ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN rn > ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test
        FROM r GROUP BY label ORDER BY label
    """,
    # --- iterative-model invariant profiles: the oracle recomputes the
    # exact data anchors and asserts the structural booleans as literal
    # TRUE (the approx_profile pattern — engine-seeded models can't be
    # value-matched, their invariants can).
    "als_top_recommendations": """
        SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_users,
               CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_items,
               TRUE AS k_per_user_ok, TRUE AS ranks_ok,
               TRUE AS scores_monotone_ok, TRUE AS scores_nonneg_ok,
               TRUE AS items_known_ok, TRUE AS coverage_ok
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "als_user_factors": """
        SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_users,
               TRUE AS dims_ok, TRUE AS finite_ok, TRUE AS nonneg_ok,
               TRUE AS json_export_ok, TRUE AS coverage_ok
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "classifier_metrics": """
        WITH frame AS (
            SELECT o.o_orderkey,
                   CASE WHEN coalesce(sum(l.l_quantity), 0) > 100.0
                        THEN 1.0 ELSE 0.0 END AS label
            FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus IN ('F', 'O', 'P')
            GROUP BY o.o_orderkey),
        r AS (
            SELECT label,
                   row_number() OVER (PARTITION BY label
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY label) AS n
            FROM frame)
        SELECT CAST(sum(CASE WHEN rn <= ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN rn > ceil(0.8 * n) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               TRUE AS auc_ok, TRUE AS logloss_ok, TRUE AS acc_ok,
               TRUE AS acc_above_majority_ok
        FROM r
    """,
    "knn_lsh": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
                   FROM embeddings WHERE vec_id = 0),
        sims AS (
            SELECT e.vec_id,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> 0
            ORDER BY cos_sim DESC, vec_id LIMIT 10)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_corpus,
               round(avg(cos_sim), 6) AS exact_topk_avg_sim,
               TRUE AS recall_ok, TRUE AS sims_exact_ok, TRUE AS k_rows_ok
        FROM sims
    """,
    "knn_ivf_centroid": """
        WITH seeds AS (
            SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS c_emb,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
        assign AS (
            SELECT e.vec_id, e.label, s.cell,
                   round(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.c_emb)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(s.c_emb, s.c_emb))), 6) AS cs
            FROM embeddings e CROSS JOIN seeds s),
        ranked AS (
            SELECT vec_id, label, cell,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY cs DESC, cell) AS rn
            FROM assign),
        cells AS (SELECT vec_id, label, cell FROM ranked WHERE rn = 1),
        qc AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
              FROM embeddings WHERE vec_id = 0)
        SELECT c.vec_id, c.label,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
        FROM cells c
        JOIN qc ON c.cell = qc.cell
        JOIN embeddings e ON e.vec_id = c.vec_id
        CROSS JOIN q
        WHERE c.vec_id <> 0
        ORDER BY cos_sim DESC, c.vec_id LIMIT 10
    """,
    "embedding_dup_clusters": """
        WITH RECURSIVE pr AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(a.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])))),
                        6) >= 0.40),
        edges AS (SELECT id_a AS s, id_b AS d FROM pr
                  UNION SELECT id_b AS s, id_a AS d FROM pr),
        verts AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.s, reach.label FROM edges e JOIN reach ON reach.id = e.d),
        cc AS (SELECT id, min(label) AS label FROM reach GROUP BY id)
        SELECT label AS cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               min(id) AS canonical_id,
               max(id) AS max_vec_id
        FROM cc GROUP BY label HAVING count(*) >= 2
        ORDER BY cluster_size DESC, cluster_id
    """,
    "curation_funnel": """
        WITH corpus AS (
            SELECT doc_id, lang, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, lang, text FROM documents
            WHERE doc_id % 10 = 0),
        uniq AS (
            SELECT c.doc_id, c.lang, c.text
            FROM corpus c
            JOIN (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text) w
              ON c.doc_id = w.doc_id),
        scored AS (
            SELECT doc_id, lang, text,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                         / length(text), 4)
                   - round(len(list_filter(string_split(text, ' '),
                                           t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
                           / len(string_split(text, ' ')), 4) AS score
            FROM uniq),
        ranked AS (
            SELECT *, percent_rank() OVER (ORDER BY score, doc_id) AS pr
            FROM scored),
        kept AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   t -> length(t) > 0)) AS n_tokens
            FROM ranked WHERE pr >= 0.25),
        chunkstats AS (
            SELECT sum(CASE WHEN n_tokens <= 0 THEN 0
                            WHEN n_tokens <= 50 THEN 1
                            ELSE CAST(ceil((n_tokens - 50) / 40.0) AS BIGINT) + 1
                       END) AS n_chunks,
                   sum(CASE WHEN n_tokens <= 0 THEN 0
                            WHEN n_tokens <= 50 THEN n_tokens
                            ELSE n_tokens + 10 *
                                 CAST(ceil((n_tokens - 50) / 40.0) AS BIGINT)
                       END) AS chunk_tokens
            FROM kept),
        packed AS (
            SELECT lang, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM kept),
        packstats AS (
            SELECT (SELECT count(*) FROM (SELECT DISTINCT lang, seq_no
                                          FROM packed)) AS n_sequences,
                   sum(n_tokens) AS kept_tokens, count(*) AS n_kept
            FROM packed)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_raw,
               (SELECT CAST(count(*) AS BIGINT) FROM uniq) AS n_unique,
               CAST(p.n_kept AS BIGINT) AS n_kept,
               CAST(p.kept_tokens AS BIGINT) AS kept_tokens,
               CAST(c.n_chunks AS BIGINT) AS n_chunks,
               CAST(c.chunk_tokens AS BIGINT) AS chunk_tokens,
               CAST(p.n_sequences AS BIGINT) AS n_sequences
        FROM packstats p CROSS JOIN chunkstats c
    """,
    # --- curation: packing / mixing / tf-idf ------------------------------
    "pack_sequences": """
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        p AS (
            SELECT lang, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM t)
        SELECT lang, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(least(1.0, sum(n_tokens) / 256.0), 4) AS fill_ratio
        FROM p GROUP BY lang, seq_no ORDER BY lang, seq_no
    """,
    "pack_sequences_sharded": """
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 4 AS INT) AS shard,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        p AS (
            SELECT lang, shard, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang, shard
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 256.0) AS BIGINT) AS seq_no
            FROM t)
        SELECT lang, shard, seq_no, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(least(1.0, sum(n_tokens) / 256.0), 4) AS fill_ratio
        FROM p GROUP BY lang, shard, seq_no ORDER BY lang, shard, seq_no
    """,
    "corpus_mixture_sharded": """
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 4 AS INT) AS shard,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        sizes AS (SELECT lang, count(*) AS n_docs FROM t GROUP BY lang),
        wts AS (SELECT lang, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
        tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
        quotas AS (
            SELECT lang, n_docs,
                   round(w_raw / w_sum, 6) AS mix_weight,
                   CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
            FROM wts CROSS JOIN tot),
        ranked AS (
            SELECT lang, shard, n_tokens,
                   row_number() OVER (PARTITION BY lang, shard
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM t),
        sampled AS (
            SELECT r.lang, count(*) AS n_sampled,
                   sum(n_tokens) AS sampled_tokens
            FROM ranked r JOIN quotas q ON r.lang = q.lang
            WHERE r.rk <= q.quota // 4
                          + (CASE WHEN r.shard < q.quota % 4 THEN 1 ELSE 0 END)
            GROUP BY r.lang)
        SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
               CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
               CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
        FROM quotas q LEFT JOIN sampled s ON q.lang = s.lang
        ORDER BY q.lang
    """,
    "corpus_mixture": """
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0)) AS n_tokens
            FROM documents),
        sizes AS (SELECT lang, count(*) AS n_docs FROM t GROUP BY lang),
        wts AS (SELECT lang, n_docs, pow(n_docs, 0.5) AS w_raw FROM sizes),
        tot AS (SELECT sum(w_raw) AS w_sum FROM wts),
        quotas AS (
            SELECT lang, n_docs,
                   round(w_raw / w_sum, 6) AS mix_weight,
                   CAST(round(200 * w_raw / w_sum, 0) AS BIGINT) AS quota
            FROM wts CROSS JOIN tot),
        ranked AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM t),
        sampled AS (
            SELECT r.lang, count(*) AS n_sampled,
                   sum(n_tokens) AS sampled_tokens
            FROM ranked r JOIN quotas q ON r.lang = q.lang
            WHERE r.rk <= q.quota GROUP BY r.lang)
        SELECT q.lang, CAST(q.n_docs AS BIGINT) AS n_docs, q.mix_weight,
               CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
               CAST(coalesce(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
        FROM quotas q LEFT JOIN sampled s ON q.lang = s.lang
        ORDER BY q.lang
    """,
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok
            WHERE length(term) > 0 GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1.0)) + 1.0),
                         4) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term) AS rank
            FROM scored)
        SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    "kb_popular_items": """
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
        ORDER BY n DESC, l_partkey LIMIT 50
    """,
    "kb_success_profile": """
        SELECT round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*) / 100.0, 4) AS avg_totalprice,
               CAST(count(*) AS BIGINT) AS n_success
        FROM orders WHERE o_orderstatus = 'F'
    """,
}
