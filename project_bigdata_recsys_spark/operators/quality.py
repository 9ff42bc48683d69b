"""Data-quality validation — the checks a training-data pipeline runs
before every training job.

The reference's only guards are a row-count freshness gate and hard exits
on empty frames (airflow/dags/recsys_pipeline.py:175-212,
core-logic/train_module.py:261-264); a 100 TB pipeline needs declared,
queryable expectations: null rates, primary-key uniqueness, referential
integrity, value-range conformance.  Each check is one aggregation or
anti-join — they compose into a single report DataFrame so one action
scans each table once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_bigdata_recsys_spark.catalog import load_table


def null_rates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Null fraction per column in one pass (conditional partial aggs)."""
    n = F.count(F.lit(1))
    aggs = [
        F.round(F.sum(F.col(c).isNull().cast("int")) / n, 6).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)


def fk_orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent — left-anti join (one shuffle,
    or broadcast when the parent key set is small)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )


def pk_duplicates(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Primary-key groups with more than one row."""
    return (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-check report over the star schema: referential
    integrity (lineitem→orders→customer, lineitem→part/supplier), PK
    uniqueness, null counts, and value-range conformance.

    The nine checks fold into THREE passes (round 2 ran nine branches —
    six scans of lineitem, three of orders; measured ~2.5x this form's
    cost at sf0.1):

      pass A  lineitem FK orphans x3 + both value-range checks in ONE
              scan: left-join the (distinct) parent key sets, then a
              single five-sum aggregate.  part/supplier keys broadcast;
              the orders key set shuffles once — same shuffle the
              anti-join paid, but one scan instead of three.
      pass B  lineitem PK uniqueness: groupBy PK → count of n>1 groups.
              (Different shuffle key than pass A, so a separate pass by
              necessity, not accident.)
      pass C  orders: customer-orphan join + PK groupBy + null-date sum
              chained in one scan (two shuffles, but orders is read once).

    The single-row passes cross-join and unpivot (stack) into the
    (check, violations) report — same output contract as the per-check
    union form.  Parent key sets are DISTINCT'd so a duplicated parent
    key (itself a quality violation) cannot inflate child-side counts.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    def _sum(cond, name: str):
        return F.coalesce(F.sum(cond.cast("int")), F.lit(0)).alias(name)

    o_keys = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__has_o")
    ).distinct()
    p_keys = part.select(
        F.col("p_partkey").alias("l_partkey"), F.lit(1).alias("__has_p")
    ).distinct()
    s_keys = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), F.lit(1).alias("__has_s")
    ).distinct()
    pass_a = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_discount"
        )
        .join(o_keys, "l_orderkey", "left")
        .join(F.broadcast(p_keys), "l_partkey", "left")
        .join(F.broadcast(s_keys), "l_suppkey", "left")
        .agg(
            _sum(F.col("__has_o").isNull(), "lineitem_orphan_orderkey"),
            _sum(F.col("__has_p").isNull(), "lineitem_orphan_partkey"),
            _sum(F.col("__has_s").isNull(), "lineitem_orphan_suppkey"),
            _sum(F.col("l_quantity") <= 0, "lineitem_negative_quantity"),
            _sum(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                "lineitem_discount_out_of_range",
            ),
        )
    )
    pass_b = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(_sum(F.col("n") > 1, "lineitem_pk_duplicates"))
    )
    c_keys = customer.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("__has_c")
    ).distinct()
    pass_c = (
        orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(c_keys, "o_custkey", "left")
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__has_c").isNull().cast("int")).alias("miss_c"),
            F.sum(F.col("o_orderdate").isNull().cast("int")).alias("null_d"),
        )
        .agg(
            _sum(F.col("n") > 1, "orders_pk_duplicates"),
            F.coalesce(F.sum("miss_c"), F.lit(0)).alias("orders_orphan_custkey"),
            F.coalesce(F.sum("null_d"), F.lit(0)).alias("orders_null_orderdate"),
        )
    )
    check_names = [
        "lineitem_orphan_orderkey",
        "lineitem_orphan_partkey",
        "lineitem_orphan_suppkey",
        "orders_orphan_custkey",
        "orders_pk_duplicates",
        "lineitem_pk_duplicates",
        "lineitem_negative_quantity",
        "lineitem_discount_out_of_range",
        "orders_null_orderdate",
    ]
    stack_args = ", ".join(f"'{c}', {c}" for c in check_names)
    return (
        pass_a.crossJoin(pass_b)
        .crossJoin(pass_c)
        .selectExpr(f"stack({len(check_names)}, {stack_args}) AS (check, violations)")
        .select("check", F.col("violations").cast("long").alias("violations"))
        .orderBy("check")
    )


def analyze_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics in ONE pass — the stats a
    cost-based optimizer (or a data catalog) keeps per column: exact
    distinct count, null fraction, min/max.  All columns' aggregates
    ride in a single job over one scan (count_distinct per column is
    partial-aggregated), then unpivot to one row per column; no
    per-column re-scan, which is the naive ANALYZE trap at 100 TB.

    Values are stringified so heterogeneous column types share one
    output schema — the catalog-table convention."""
    from project_bigdata_recsys_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            # min/max on the NATIVE type, stringified after — a min over
            # casted strings would be lexicographic ("10" < "9")
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.count(F.lit(1)).alias(f"{c}__n"),
        ]
    wide = orders.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__ndv").cast("long").alias("ndv"),
                        F.round(
                            F.col(f"{c}__nulls") / F.col(f"{c}__n"), 6
                        ).alias("null_frac"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*").orderBy("column")


def robust_outliers(spark: SparkSession, sf_dir: str, cutoff: float = 3.0) -> DataFrame:
    """Robust outlier detection on order totals: median/MAD z-scores
    (mean/stddev break down exactly when outliers exist — the robust
    pair doesn't).  Outlier ⇔ |x − median| > cutoff · 1.4826 · MAD.

    Both the median and the MAD come from the histogram-cumsum exact
    quantile in its GLOBAL form (functions.text.global_quantile_threshold):
    thresholds from distinct VALUE cumsums range-shuffled across
    partitions — never a single-partition sort, and (r8) never a
    constant-folded unpartitioned window over the whole value histogram,
    which for a 2-dp money column grows toward the full cent range at
    corpus scale.  Two passes over the column (median, then |x−median|),
    each a partial-aggregated groupBy + the distributed cumsum."""
    from project_bigdata_recsys_spark.functions.text import (
        global_quantile_threshold,
    )

    from project_bigdata_recsys_spark.caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders")
    # persist both passes' inputs: vals feeds the median kernel and the
    # deviation join, dev feeds the MAD kernel and the outlier flagging
    # — unmaterialized the plan scanned orders 9× (guide §5); one and
    # three narrow columns respectively
    vals = persist_tracked(orders.select(F.col("o_totalprice").alias("v")))
    med_row = global_quantile_threshold(vals, "v", 0.5)
    med = vals.crossJoin(
        F.broadcast(med_row.select(F.col("threshold").alias("median")))
    )
    dev = persist_tracked(
        med.select(
            "v",
            "median",
            F.round(F.abs(F.col("v") - F.col("median")), 2).alias("d"),
        )
    )
    mad_row = global_quantile_threshold(
        dev.select(F.col("d").alias("v")), "v", 0.5
    )
    flagged = dev.crossJoin(
        F.broadcast(mad_row.select(F.col("threshold").alias("mad")))
    ).withColumn(
        "is_outlier",
        F.col("d") > F.lit(cutoff) * 1.4826 * F.col("mad"),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.first("median"), 2).alias("median"),
        F.round(F.first("mad"), 2).alias("mad"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        F.round(F.max(F.when(F.col("is_outlier"), F.col("v"))), 2).alias(
            "max_outlier"
        ),
    )


def column_profile_stacked(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass per-column stats (row count, non-null count, distinct
    count) unpivoted to one row per column via ``stack`` — the generic
    building block of drift detection.  A single aggregation job however
    many columns are profiled; no per-column scans."""
    aggs: list = []
    for c in cols:
        aggs.append(F.count(c).alias(f"__{c}_nn"))
        aggs.append(F.count_distinct(c).alias(f"__{c}_nd"))
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_expr = "stack({}, {}) as (col_name, n_nonnull, n_distinct)".format(
        len(cols),
        ", ".join(f"'{c}', __{c}_nn, __{c}_nd" for c in cols),
    )
    return row.select(
        F.col("__n").cast("long").alias("n_rows"), F.expr(stack_expr)
    ).select(
        "col_name",
        "n_rows",
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-observability drift report between two snapshots of the same
    table (here: orders vs its deterministic next-day mutation — the
    snapshot_diff corpus): per column, row/non-null/distinct counts on
    both sides and their deltas.  The check a pipeline owner runs BEFORE
    the diff — a column whose distinct count or null mass jumps signals
    an upstream contract break even when every PK still matches.

    Scale: two single-aggregation passes (one per snapshot side,
    column-parallel via stack) joined on the tiny per-column frame —
    cost is two scans regardless of how many columns are profiled."""
    from project_bigdata_recsys_spark.operators.snapshot import _mutated_orders

    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders")
    old_p = column_profile_stacked(orders, cols)
    new_p = column_profile_stacked(_mutated_orders(orders), cols)
    o = old_p.select(
        "col_name",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nonnull").alias("n_nonnull_old"),
        F.col("n_distinct").alias("n_distinct_old"),
    )
    n = new_p.select(
        "col_name",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nonnull").alias("n_nonnull_new"),
        F.col("n_distinct").alias("n_distinct_new"),
    )
    return (
        o.join(n, "col_name")
        .select(
            "col_name",
            "n_rows_old",
            "n_rows_new",
            "n_nonnull_old",
            "n_nonnull_new",
            "n_distinct_old",
            "n_distinct_new",
            (F.col("n_distinct_new") - F.col("n_distinct_old")).alias(
                "distinct_delta"
            ),
        )
        .orderBy("col_name")
    )


def psi_drift(spark: SparkSession, sf_dir: str, n_buckets: int = 10) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — THE model-monitoring drift score (PSI < 0.1 stable,
    0.1–0.25 shifting, > 0.25 retrain): o_totalprice's distribution in
    the deterministic next-day mutation, measured in the CURRENT
    snapshot's decile buckets.

    Determinism discipline: decile edges come from the exact
    distributed percent-rank recipe (range shuffle — no
    single-partition window, no percentile_approx sampling); both sides
    bucket with the same strict-less-than rule against the broadcast
    9-edge array (a JVM higher-order filter, one row of state); PSI
    terms derive from integer counts with the standard 1e-9 share clamp
    so empty buckets stay finite.  Every number reproduces in the
    DuckDB twin.

    Scale: one range shuffle for the edges + one aggregation per side;
    the edge state is n_buckets-1 values regardless of table size."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.functions.text import (
        with_exact_percent_rank,
    )
    from project_bigdata_recsys_spark.operators.snapshot import _mutated_orders

    orders = load_table(spark, sf_dir, "orders")
    new = _mutated_orders(orders)

    ranked = with_exact_percent_rank(
        orders.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        "pr",
    )
    edges = (
        ranked.withColumn(
            "b",
            F.least(F.floor(F.col("pr") * n_buckets), F.lit(n_buckets - 1)),
        )
        .filter(F.col("b") < n_buckets - 1)
        .groupBy("b")
        .agg(F.max("o_totalprice").alias("e"))
        .agg(F.sort_array(F.collect_list("e")).alias("edges"))
    )

    def shares(df, tag):
        bucket = F.size(
            F.filter(F.col("edges"), lambda e: e < F.col("o_totalprice"))
        )
        return (
            df.select("o_totalprice")
            .crossJoin(F.broadcast(edges))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_{tag}"))
        )

    # old-side shares read the percent-rank kernel's PERSISTED ranged
    # frame (same rows, o_totalprice already materialized) instead of
    # re-scanning orders — one corpus scan saved (guide §5/§6)
    joined = (
        shares(ranked.select("o_totalprice"), "old")
        .join(shares(new, "new"), "bucket", "full_outer")
        .fillna(0, ["n_old", "n_new"])
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    clamp = lambda c: F.greatest(c, F.lit(1e-9))  # noqa: E731
    p_old = clamp(F.col("n_old") / F.sum("n_old").over(w_all))
    p_new = clamp(F.col("n_new") / F.sum("n_new").over(w_all))
    return (
        joined.select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_old",
            "n_new",
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round((p_old - p_new) * F.log(p_old / p_new), 8).alias(
                "psi_term"
            ),
        )
        .orderBy("bucket")
    )


def label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two label sets.

    The shape every labeling pipeline hits: two annotator files (here the
    seeded synthetic labels and their drift-mutated copy — reference
    scripts/modify_training_data.py:28-133 is the "second annotator")
    arrive as separate tables keyed by item id; agreement is an equi-join
    on the key followed by ONE full aggregation.  At scale the join
    shuffles on the item key only and the confusion matrix is four
    map-side-combined counters — no per-pair state, no collect.

    kappa = (p_o - p_e) / (1 - p_e) with the standard marginal-product
    chance agreement; all four cells are exact BIGINTs so both engines
    derive the ratios from identical integers.
    """
    from project_bigdata_recsys_spark.sources.ingest import (
        mutate_with_noise,
        synthetic_interactions,
    )

    base = synthetic_interactions(spark, n=2000, seed=42)
    a = base.select("event_ts", F.col("truth").alias("label_a"))
    b = mutate_with_noise(
        base, ["action_play_video", "action_problem_check"], seed=7
    ).select("event_ts", F.col("truth").alias("label_b"))
    joined = a.join(b, "event_ts")

    cell = lambda va, vb: F.sum(  # noqa: E731
        ((F.col("label_a") == va) & (F.col("label_b") == vb)).cast("long")
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cell(0, 0).alias("n00"),
        cell(0, 1).alias("n01"),
        cell(1, 0).alias("n10"),
        cell(1, 1).alias("n11"),
    )
    n = F.col("n").cast("double")
    p_o = (F.col("n00") + F.col("n11")) / n
    p_e = (
        (F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10"))
        + (F.col("n10") + F.col("n11")) * (F.col("n01") + F.col("n11"))
    ) / (n * n)
    return agg.select(
        "n",
        "n00",
        "n01",
        "n10",
        "n11",
        F.round(p_o, 6).alias("p_observed"),
        F.round(p_e, 6).alias("p_expected"),
        F.round((p_o - p_e) / (F.lit(1.0) - p_e), 6).alias("kappa"),
    )


def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between document language and
    source — the corpus-QA screen for "does some source over-contribute
    a language" (a skewed contingency means per-source language mixes
    need rebalancing before training).

    One scan → contingency cells; row/column margins are two tiny
    re-aggregations of the cell frame (never a rescan); expected counts
    and per-cell contributions derive from exact BIGINTs, and the
    chi-square total sums MICRO-quantized contributions as integers so
    partition order can't wiggle the printed statistic.  Output: the
    top-15 contributing cells with the shared total and degrees of
    freedom on every row.
    """
    from project_bigdata_recsys_spark.caching import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    # persist: the contingency cells feed both margins and the scored
    # frame, and scored feeds the chi2 total plus the readout — each
    # re-evaluation re-scanned documents (8× unmaterialized; guide §5).
    # #langs × #sources rows.
    cells = persist_tracked(
        docs.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("long").alias("observed")
        )
    )
    row_tot = cells.groupBy("lang").agg(
        F.sum("observed").cast("long").alias("lang_n")
    )
    col_tot = cells.groupBy("source").agg(
        F.sum("observed").cast("long").alias("source_n")
    )
    n_row = docs.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct("lang").cast("long").alias("__n_langs"),
        F.countDistinct("source").cast("long").alias("__n_sources"),
    )
    expected = F.col("lang_n") * F.col("source_n") / F.col("__n")
    contrib = (F.col("observed") - expected) * (
        F.col("observed") - expected
    ) / expected
    scored = persist_tracked(
        cells.join(F.broadcast(row_tot), "lang")
        .join(F.broadcast(col_tot), "source")
        .crossJoin(F.broadcast(n_row))
        .select(
            "lang",
            "source",
            "observed",
            F.round(expected, 6).alias("expected"),
            F.round(contrib, 6).alias("contrib"),
            # ddsketch pattern: settle the 6-dp value FIRST, then
            # quantize — the micro step never lands near a .5 tie
            F.round(F.round(contrib, 6) * 1e6).cast("long").alias(
                "__contrib_micro"
            ),
            "__n_langs",
            "__n_sources",
        )
    )
    totals = scored.agg(
        F.round(F.sum("__contrib_micro") / 1e6, 6).alias("chi2_stat"),
        F.max(
            (F.col("__n_langs") - 1) * (F.col("__n_sources") - 1)
        ).alias("dof"),
    )
    return (
        scored.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "source",
            "observed",
            "expected",
            "contrib",
            "chi2_stat",
            "dof",
        )
        .orderBy(F.desc("contrib"), "lang", "source")
        .limit(15)
    )


def k_anonymity_profile(
    spark: SparkSession, sf_dir: str, k: int = 5, band: int = 100
) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy QA step a
    training-data release runs before publication: a document whose
    quasi-identifier combination is shared by fewer than ``k`` corpus
    members is re-identifiable by linkage even after direct identifiers
    are redacted (pii_redaction_profile strips those; this measures what
    the REMAINING attributes still leak).

    Quasi-identifiers here: (lang, source, n_chars banded to ``band``) —
    the release-metadata columns an adversary can join on.  Output per
    source: docs, distinct QI groups, docs at risk (group size < k),
    risk fraction, and the smallest group size.

    Scale: two Tungsten aggregations (QI group sizes, then the
    per-source rollup on keys the first shuffle already produced) — no
    windows, no joins beyond the group frame, fact scanned once."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / band).cast("long").alias("len_band"),
    )
    groups = docs.groupBy("lang", "source", "len_band").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return (
        groups.groupBy("source")
        .agg(
            F.sum("group_size").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(
                F.when(F.col("group_size") < k, F.col("group_size")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_at_risk"),
            F.round(
                F.sum(
                    F.when(
                        F.col("group_size") < k, F.col("group_size")
                    ).otherwise(0)
                )
                / F.sum("group_size"),
                6,
            ).alias("risk_frac"),
            F.min("group_size").cast("long").alias("min_group"),
        )
        .orderBy("source")
    )


def l_diversity_profile(
    spark: SparkSession, sf_dir: str, band: int = 100
) -> DataFrame:
    """l-diversity audit — the homogeneity-attack complement of
    :func:`k_anonymity_profile`: a quasi-identifier group can satisfy
    k-anonymity and STILL leak if every member shares the same sensitive
    value (an adversary who links a target to the group learns the
    attribute without identifying the row).  Quasi-identifiers here:
    (source, n_chars banded to ``band``); sensitive attribute: lang.
    Output per source: docs, QI groups, the worst group's distinct-
    sensitive-value count (min_l), docs exposed in homogeneous (l = 1)
    groups, and the fraction of docs in well-diversified (l >= 3)
    groups.

    Scale: identical shape to the k-anonymity audit — one QI-group
    aggregation (count + count-distinct on keys the shuffle already
    co-located) and a per-source rollup.  No windows, no joins."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / band).cast("long").alias("len_band"),
    )
    groups = docs.groupBy("source", "len_band").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("lang").cast("long").alias("l"),
    )
    return (
        groups.groupBy("source")
        .agg(
            F.sum("group_size").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("l").cast("long").alias("min_l"),
            F.sum(
                F.when(F.col("l") == 1, F.col("group_size")).otherwise(0)
            )
            .cast("long")
            .alias("n_exposed"),
            F.round(
                F.sum(
                    F.when(F.col("l") >= 3, F.col("group_size")).otherwise(0)
                )
                / F.sum("group_size"),
                6,
            ).alias("diverse_frac"),
        )
        .orderBy("source")
    )


def _value_side_cum(spark: SparkSession, sf_dir: str, n_parts: int | None = None):
    """Shared kernel of the two-sample drift tests (:func:`ks_value_drift`,
    :func:`mann_whitney_drift`): split events into an EARLY and a LATE
    half at the midpoint epoch day (integer arithmetic on a broadcast
    1-row anchor — deterministic), histogram ``round(value, 6)`` per
    side, and attach EXACT global cumulative counts per distinct value
    via the range-shuffle recipe (with_exact_percent_rank's shape with
    counts as weights): per-__pid local cumsums + a per-partition offset
    frame whose only unpartitioned window covers ≤ num-partitions rows.

    Returns (cum, n_a, n_b): cum has one row per distinct value with
    (v, t_a, t_b, cum_a, cum_b); n_a/n_b are the side totals as 1-row
    broadcastable aggregates folded in as columns."""
    from pyspark.sql import Window

    from project_bigdata_recsys_spark.caching import persist_tracked

    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        F.round("value", 6).alias("v"),
    )
    anchor = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0)
        .cast("long")
        .alias("__mid")
    )
    sided = ev.crossJoin(F.broadcast(anchor)).select(
        "v",
        F.when(F.col("day") <= F.col("__mid"), 1).otherwise(0).alias("__a"),
    )
    hist = sided.groupBy("v").agg(
        F.sum("__a").cast("long").alias("t_a"),
        F.sum(1 - F.col("__a")).cast("long").alias("t_b"),
    )
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    # PERSIST pins one materialization of the range shuffle.  Three
    # branches consume this frame (local cumsums, the per-partition
    # offset/size frame, the partition-min successor patch) and
    # repartitionByRange SAMPLES its boundaries with an evaluation-
    # dependent seed: under AQE the identical exchange subtrees can
    # materialize as SEPARATE stages with separate samplings, and then
    # __pid means different ranges in different branches — measured at
    # 7-core parallelism as edge rows patched with a *smaller*
    # "successor" (v_next < v), silently shrinking W1 by ~3%
    # (tools/check_order_stability.py caught it; the cum offsets share
    # the exposure).  The persisted frame is the distinct-value
    # histogram — bounded by value cardinality, not events.
    ranged = persist_tracked(
        hist.repartitionByRange(n_parts, "v").withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    w_loc = (
        Window.partitionBy("__pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead = Window.partitionBy("__pid").orderBy("v")
    local = (
        ranged.withColumn("__la", F.sum("t_a").over(w_loc))
        .withColumn("__lb", F.sum("t_b").over(w_loc))
        # range-safe successor: local lead, patched at partition edges
        # with the next partition's min (tiny frame, like the offsets)
        .withColumn("__lv", F.lead("v").over(w_lead))
    )
    pmins = ranged.groupBy("__pid").agg(F.min("v").alias("__pv"))
    pnext = pmins.select(
        "__pid",
        F.lead("__pv").over(Window.orderBy("__pid")).alias("__nv"),
    )
    sizes = ranged.groupBy("__pid").agg(
        F.sum("t_a").alias("__wa"), F.sum("t_b").alias("__wb")
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__wa").over(w_off), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("__wb").over(w_off), F.lit(0)).alias("__ob"),
        F.sum("__wa").over(w_all).alias("n_a"),
        F.sum("__wb").over(w_all).alias("n_b"),
    )
    cum = (
        local.join(F.broadcast(offsets), "__pid")
        .join(F.broadcast(pnext), "__pid")
        .select(
            "v",
            "t_a",
            "t_b",
            (F.col("__oa") + F.col("__la")).cast("long").alias("cum_a"),
            (F.col("__ob") + F.col("__lb")).cast("long").alias("cum_b"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.coalesce(F.col("__lv"), F.col("__nv")).alias("v_next"),
        )
    )
    return cum


def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the early and
    late halves of the event stream — the distribution-shape monitor
    next to :func:`psi_drift`'s binned score (KS sees ANY cdf gap, not
    just decile mass shifts; the pair is the standard drift dashboard).

    D = max over distinct values of |cdf_a − cdf_b|, with both cdfs
    lifted to integer micro-units per value first (6-dp cdf semantics,
    documented) so the max is an integer comparison — no float-order
    nondeterminism.  The 5%-level rejection threshold is the classic
    asymptotic c(α)·sqrt((n_a+n_b)/(n_a·n_b)), c(0.05) = 1.358 (sqrt is
    IEEE correctly-rounded — identical in both engines).

    Scale: one scan, one histogram shuffle, one range shuffle; the only
    unpartitioned window is the ≤ num-partitions offset frame."""
    cum = _value_side_cum(spark, sf_dir)
    da = F.round(F.lit(1000000.0) * F.col("cum_a") / F.col("n_a")).cast(
        "long"
    )
    db = F.round(F.lit(1000000.0) * F.col("cum_b") / F.col("n_b")).cast(
        "long"
    )
    d = cum.select(
        F.abs(da - db).alias("__d"), "n_a", "n_b"
    ).groupBy("n_a", "n_b").agg(F.max("__d").alias("__dm"))
    ks = F.round(F.col("__dm") / 1000000.0, 6)
    crit = F.round(
        F.lit(1.358)
        * F.sqrt(
            (F.col("n_a") + F.col("n_b"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        6,
    )
    return d.select(
        "n_a",
        "n_b",
        ks.alias("ks_stat"),
        crit.alias("ks_crit"),
        (ks > crit).alias("drift_detected"),
    )


def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) between the early
    and late event halves — the nonparametric location-shift test
    completing the drift trio (PSI: binned mass; KS: cdf shape; U:
    stochastic dominance).  Rank arithmetic stays EXACT: with per-value
    tie groups of size t = t_a + t_b at cumulative offset c, the
    tie-averaged rank sum doubles to an integer,
    R2_a = Σ t_a·(2·(c−t)+t+1), so U2 = 2·n_a·n_b + n_a·(n_a+1) − R2_a
    is an exact BIGINT fold on both engines; only the final z-score
    (tie-corrected σ) is floating point, built from the same integer
    aggregates with identical expression shape and rounded at 6 dp.

    Scale: same one-histogram shape as :func:`ks_value_drift`; the tie
    correction Σ(t³−t) aggregates the histogram, never the raw rows."""
    cum = _value_side_cum(spark, sf_dir)
    t = F.col("t_a") + F.col("t_b")
    r2_term = F.col("t_a") * (
        2 * (F.col("cum_a") + F.col("cum_b") - t) + t + 1
    )
    agg = cum.groupBy("n_a", "n_b").agg(
        F.sum(r2_term).cast("long").alias("__r2"),
        F.sum(t * t * t - t).cast("long").alias("__ties"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u2 = (
        2 * F.col("n_a") * F.col("n_b")
        + F.col("n_a") * (F.col("n_a") + 1)
        - F.col("__r2")
    )
    u = u2 / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(
        na * nb / 12.0
        * ((n + 1.0) - F.col("__ties") / (n * (n - 1.0)))
    )
    z = F.round((u - mu) / sigma, 6)
    return agg.select(
        "n_a",
        "n_b",
        F.round(u, 1).alias("u_stat"),
        z.alias("z_score"),
        (F.abs(z) > 1.96).alias("shift_detected"),
    )


def welch_ttest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the early and late event
    halves — the parametric mean-shift member completing the drift
    quartet (PSI: binned mass; KS: cdf shape; Mann–Whitney: stochastic
    dominance; THIS: location in original units, the one a dashboard
    alerts on when "average order value moved").

    Moments stay exact: values are lifted to integer cents
    (``round(value*100)`` — identical in both engines), so per-side
    n / Σx / Σx² are BIGINT folds; every float expression downstream
    (means, Welch variance, t, Welch–Satterthwaite df) is built from
    those exact integers with identical shape on both engines and
    rounded at 6 dp (the bm25/ucb sqrt-ln precedent).

    Scale: ONE scan and one 2-row aggregate — no histogram, no window,
    no join beyond the broadcast 1-row midpoint anchor.  Sums stay in
    BIGINT through ~sf100 for cent-scaled values (Σx² ≤ ~1e17)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("ts").cast("double") / 86400.0)
        .cast("long")
        .alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    anchor = ev.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0)
        .cast("long")
        .alias("__mid")
    )
    sided = ev.crossJoin(F.broadcast(anchor)).select(
        "vc",
        F.when(F.col("day") <= F.col("__mid"), 1).otherwise(0).alias("__a"),
    )
    agg = sided.agg(
        F.sum("__a").cast("long").alias("n_a"),
        F.sum(1 - F.col("__a")).cast("long").alias("n_b"),
        F.sum(F.col("__a") * F.col("vc")).cast("long").alias("__sa"),
        F.sum((1 - F.col("__a")) * F.col("vc")).cast("long").alias("__sb"),
        F.sum(F.col("__a") * F.col("vc") * F.col("vc"))
        .cast("long")
        .alias("__ssa"),
        F.sum((1 - F.col("__a")) * F.col("vc") * F.col("vc"))
        .cast("long")
        .alias("__ssb"),
    )
    return welch_from_moments(agg)


def welch_from_moments(agg: DataFrame) -> DataFrame:
    """Shared readout of the Welch test — takes the 1-row exact-moment
    frame (n_a, n_b, __sa, __sb, __ssa, __ssb in integer cents) and
    emits mean/t/df/flag.  Shared by :func:`welch_ttest_drift` and the
    streaming twin (replay.stream_welch_drift), whose state IS this
    moment frame — integer moments merge order-independently, so the
    streamed readout is bit-identical to the batch one."""
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    va = (F.col("__ssa") - F.col("__sa") * ma) / (na - 1.0)
    vb = (F.col("__ssb") - F.col("__sb") * mb) / (nb - 1.0)
    se2 = va / na + vb / nb
    t = F.round((ma - mb) / F.sqrt(se2), 6)
    df_w = F.round(
        se2 * se2
        / ((va / na) * (va / na) / (na - 1.0)
           + (vb / nb) * (vb / nb) / (nb - 1.0)),
        4,
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma / 100.0, 6).alias("mean_early"),
        F.round(mb / 100.0, 6).alias("mean_late"),
        t.alias("t_stat"),
        df_w.alias("welch_df"),
        (F.abs(t) > 1.96).alias("mean_shift_detected"),
    )


def t_closeness_profile(
    spark: SparkSession, sf_dir: str, band: int = 100, t_max_micro: int = 500_000_000
) -> DataFrame:
    """t-closeness audit — third member of the privacy trio
    (:func:`k_anonymity_profile` re-identification,
    :func:`l_diversity_profile` homogeneity, THIS skew: a group can be
    k-anonymous AND l-diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the table's — an adversary
    linking a target to the group gains that much posterior).  Quasi-
    identifiers: (source, n_chars banded to ``band``); sensitive
    attribute: lang (categorical, so the distance is the variational
    distance ½·Σ|p−q| of Li et al. 2007).

    Distances stay exact: both the group share p and the global share q
    are lifted to integer 1e-9 units (``round(1e9·cnt/size)`` —
    identical int-division-to-double then round in both engines), so
    the Σ|p−q| fold is a BIGINT sum; langs ABSENT from a group
    contribute their full q, folded in as (1e9 − Σ_present q) without
    densifying the group×lang matrix.

    Scale: one group×lang aggregation (keys the shuffle co-locates), a
    broadcast ≤#langs global-distribution join, and a per-source
    rollup.  No windows; the matrix stays sparse.

    Output per source: n_docs, n_groups, max_t, avg_t (micro-exact,
    6 dp), n_docs in groups with t > ``t_max_micro``/1e9."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / band).cast("long").alias("len_band"),
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist the sparse group×lang cell matrix and DERIVE the total and
    # the global lang distribution from it (exact integer sums of the
    # same rows) — unmaterialized, total/glob/sizes/joined each re-ran
    # the fact aggregation (4 documents scans → 1; guide §5)
    cells = persist_tracked(
        docs.groupBy("source", "len_band", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
    )
    total = cells.agg(F.sum("cnt").cast("long").alias("__n"))
    glob = (
        cells.groupBy("lang")
        .agg(F.sum("cnt").cast("long").alias("__c"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.round(F.lit(1000000000.0) * F.col("__c") / F.col("__n"))
            .cast("long")
            .alias("q_micro"),
        )
    )
    sizes = cells.groupBy("source", "len_band").agg(
        F.sum("cnt").cast("long").alias("group_size")
    )
    joined = (
        cells.join(F.broadcast(glob), "lang")
        .join(sizes, ["source", "len_band"])
        .withColumn(
            "p_micro",
            F.round(
                F.lit(1000000000.0) * F.col("cnt") / F.col("group_size")
            ).cast("long"),
        )
    )
    per_group = joined.groupBy("source", "len_band", "group_size").agg(
        F.sum(F.abs(F.col("p_micro") - F.col("q_micro")))
        .cast("long")
        .alias("__present_dist"),
        F.sum("q_micro").cast("long").alias("__present_q"),
    )
    # absent langs: p = 0, each contributes its q; their total is the
    # complement of the present-langs q mass (1e9 − Σ_present q)
    t_micro = (
        (
            F.col("__present_dist")
            + (F.lit(1000000000).cast("long") - F.col("__present_q"))
        )
        / 2
    ).cast("long")
    groups = per_group.select(
        "source", "group_size", t_micro.alias("t_micro")
    )
    return (
        groups.groupBy("source")
        .agg(
            F.sum("group_size").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.round(F.max("t_micro") / 1000000000.0, 6).alias("max_t"),
            F.round(
                F.sum("t_micro") / F.count(F.lit(1)) / 1000000000.0, 6
            ).alias("avg_t"),
            F.sum(
                F.when(
                    F.col("t_micro") > t_max_micro, F.col("group_size")
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_skewed_docs"),
        )
        .orderBy("source")
    )


def dp_noisy_counts(
    spark: SparkSession, sf_dir: str, eps_tenths: int = 10
) -> DataFrame:
    """Differentially-private count release — the fourth privacy
    operator beside the k-anonymity / l-diversity / t-closeness audits:
    instead of auditing a grouping, it RELEASES per-lang document
    counts with Laplace(Δ/ε) noise (count queries have sensitivity
    Δ = 1), the mechanism a data clearing house runs before handing
    aggregate stats to an untrusted consumer.

    The noise draw is the md5-uniform recipe (u over the group key) fed
    through the Laplace inverse CDF, −b·sgn(u−½)·ln(1−2|u−½|) — DATA-
    derived, not an engine RNG, so the oracle replays the release
    bit-for-bit (ln behind round(,6) is the bm25/ucb precedent).  A
    production deployment swaps the draw for a secure RNG; everything
    else — sensitivity, scale, release shape — is unchanged.

    Scale: one count aggregation, one narrow map.  Output per lang:
    n_noisy (the release, rounded to 4 dp) plus the gate-readout audit
    columns n_true, abs_err, eps."""
    from project_bigdata_recsys_spark.sources.ingest import hash_uniform

    eps = eps_tenths / 10.0
    docs = load_table(spark, sf_dir, "documents").select("lang")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = hash_uniform(F.col("lang"), "dp:")
    centered = u - 0.5
    noise = (
        F.lit(-1.0 / eps)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    released = counts.select(
        "lang",
        "n_true",
        F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
        F.round(F.abs(noise), 4).alias("abs_err"),
        F.lit(eps).alias("eps"),
    )
    return released.orderBy("lang")


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of o_totalprice — the
    classic fabricated-data / unit-mix-up detector for money columns: a
    naturally-arising amount column should put ~30.1% of first digits at
    1 and only ~4.6% at 9 (P(d) = log10(1 + 1/d)); a synthetic or
    truncated feed deviates loudly.  Emits per digit the observed count,
    observed fraction, Benford's expected fraction, and the total
    chi-square statistic (same value on every row — the single-number
    verdict alongside the per-digit evidence).

    Exactness: the digit comes from the INTEGER cents string
    (first char of CAST(round(x*100) AS BIGINT)), never from log10 of a
    double or from float formatting — integer-to-string is identical on
    both engines.  Expected fractions are ln-ratio doubles rounded to 6
    dp before the chi-square fold, so both engines fold identical
    doubles.

    Scale: one projection + one 9-group aggregation over the fact
    table; the chi-square join is a broadcast of a 9-row frame."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    orders = load_table(spark, sf_dir, "orders")
    # persist: the ≤9-row digit histogram feeds the kernel's total,
    # scored projection, and chi fold — unmaterialized, each re-scanned
    # the fact table (4 orders scans → 1; guide §5).  Persisted HERE,
    # not in the shared kernel: the stream twin feeds a memory-sink
    # snapshot whose re-read is a KB parquet scan, where a persist is
    # pure barrier overhead.
    digits = persist_tracked((
        orders.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .filter(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    ))
    return benford_readout(digits)


def benford_readout(digits: DataFrame) -> DataFrame:
    """Shared chi-square readout of a (digit, observed) first-digit
    frame — the kernel behind :func:`benford_audit` and its streaming
    twin (replay.stream_benford_values): expected fractions at 6 dp,
    chi-square terms micro-frozen before the fold."""
    tot = digits.agg(F.sum("observed").cast("long").alias("__n"))
    # expected fraction log10(1 + 1/d) = ln(d+1)/ln(10) - ln(d)/ln(10),
    # rounded to 6 dp on both engines before any downstream arithmetic
    exp_frac = F.round(
        (F.log(F.col("digit") + 1) - F.log(F.col("digit"))) / F.log(F.lit(10.0)),
        6,
    )
    scored = digits.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        F.round(F.col("observed") / F.col("__n"), 6).alias("obs_frac"),
        exp_frac.alias("exp_frac"),
        F.round(
            F.lit(1_000_000.0)
            * (F.col("observed") - exp_frac * F.col("__n"))
            * (F.col("observed") - exp_frac * F.col("__n"))
            / (exp_frac * F.col("__n"))
        )
        .cast("long")
        .alias("__chi"),
    )
    chi = scored.agg(
        F.round(F.sum("__chi") / 1_000_000.0, 4).alias("chi_square")
    )
    return (
        scored.drop("__chi")
        .crossJoin(F.broadcast(chi))
        .orderBy("digit")
    )


def wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample 1-Wasserstein (earth-mover) distance between the
    early and late halves of the event value stream — the drift
    measure that weights HOW FAR mass moved, completing the dashboard
    next to psi_drift (binned mass), ks_value_drift (max cdf gap) and
    mann_whitney/welch (rank/mean shifts): KS says "something moved",
    W1 says "by this much in value units".

    W1 = ∫|F_a − F_b| dv over the merged support, computed exactly on
    the shared :func:`_value_side_cum` kernel: per distinct value the
    cdf gap in integer micro-units times the integer-micro gap to the
    range-safe successor value — every term a BIGINT product, one
    division at the end.  Also reports W1 normalized by the observed
    value range (scale-free [0,1] score).

    Scale: inherits the kernel's shape — one scan, one histogram
    shuffle, one range shuffle; the only unpartitioned windows cover
    the ≤ num-partitions offset/successor frames."""
    cum = _value_side_cum(spark, sf_dir)
    da = F.round(F.lit(1_000_000.0) * F.col("cum_a") / F.col("n_a")).cast(
        "long"
    )
    db = F.round(F.lit(1_000_000.0) * F.col("cum_b") / F.col("n_b")).cast(
        "long"
    )
    gap_micro = F.coalesce(
        F.round((F.col("v_next") - F.col("v")) * 1_000_000.0).cast("long"),
        F.lit(0),
    )
    terms = cum.select(
        (F.abs(da - db) * gap_micro).alias("__t"),
        "v",
        "n_a",
        "n_b",
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.sum("__t").cast("long").alias("__ts"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
    w1 = F.round(F.col("__ts") / 1e12, 6)
    return agg.select(
        "n_a",
        "n_b",
        "n_values",
        "v_min",
        "v_max",
        w1.alias("w1"),
        F.round(
            F.col("__ts") / 1e12 / (F.col("v_max") - F.col("v_min")), 6
        ).alias("w1_norm"),
    )


# Two-sided normal quantiles for BH at FDR alpha=0.1 over m=5 tests:
# z*(k) = Phi^-1(1 - (alpha*k/m)/2), precomputed offline and embedded
# in BOTH engines (the EWMA/SPRT micro-literal discipline) because SQL
# has no inverse normal CDF.
BH_Z_MICRO = [
    (1, 2326348),
    (2, 2053749),
    (3, 1880794),
    (4, 1750686),
    (5, 1644854),
]


def bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over the per-type drift tests
    — the multiple-testing layer the drift dashboard needs once it
    fires five Welch tests per run (at alpha=0.05 each, one of five
    "drifts" is a coin flip): order the |z| scores, compare the k-th
    largest against the BH boundary z*(alpha·k/m), and reject exactly
    ranks 1..k* where k* is the LARGEST passing rank (the step-up
    rule — a rank can be rejected even if its own comparison fails).

    Exactness: per-type Welch z from BIGINT cent moments of the
    early/late halves, rounded to 4 dp; BH boundaries are offline
    normal quantiles as micro literals; the step-up fold is a max over
    5 integer comparisons.

    Scale: one scan to 2·#types moment rows; everything after is a
    #types-row frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("double") / 86400).cast(
        "long"
    )
    base = ev.select(
        "event_type",
        day.alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = base.agg(
        F.floor((F.min("day") + F.max("day")) / 2.0).cast("long").alias("mid")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    # persist: the moment rollup feeds both the early and late splits —
    # each evaluation re-scanned events through base + anchor (8 events
    # scans unmaterialized; guide §5); 2·#types rows
    m = persist_tracked(
        base.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            F.when(F.col("day") <= F.col("mid"), 1).otherwise(0).alias("a"),
            "cents",
        )
        .groupBy("event_type", "a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
        )
    )
    mean = F.col("s") / F.col("n").cast("double")
    var = (
        F.col("ss") - F.col("s") * (F.col("s") / F.col("n").cast("double"))
    ) / (F.col("n") - 1.0)
    sides = m.select("event_type", "a", F.col("n"), mean.alias("mu"), var.alias("v"))
    ea = sides.filter(F.col("a") == 1).select(
        "event_type",
        F.col("n").alias("na"),
        F.col("mu").alias("ma"),
        F.col("v").alias("va"),
    )
    eb = sides.filter(F.col("a") == 0).select(
        "event_type",
        F.col("n").alias("nb"),
        F.col("mu").alias("mb"),
        F.col("v").alias("vb"),
    )
    z = F.round(
        (F.col("ma") - F.col("mb"))
        / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb")),
        4,
    )
    scored = ea.join(eb, "event_type").select(
        "event_type", z.alias("z_score")
    )
    w = Window.orderBy(
        F.desc(F.abs(F.col("z_score"))), F.asc("event_type")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w).cast("int"))
    thresholds = spark.createDataFrame(
        BH_Z_MICRO, ["rank", "z_star_micro"]
    ).select(F.col("rank").cast("int").alias("rank"), "z_star_micro")
    # persist: feeds the step-up fold and the readout; #types rows
    passed = persist_tracked(
        ranked.join(F.broadcast(thresholds), "rank").withColumn(
            "passes",
            (
                F.round(F.abs(F.col("z_score")) * 1e6).cast("long")
                >= F.col("z_star_micro")
            ).cast("int"),
        )
    )
    kstar = passed.agg(
        F.coalesce(
            F.max(F.when(F.col("passes") == 1, F.col("rank"))), F.lit(0)
        )
        .cast("int")
        .alias("k_star")
    )
    return (
        passed.crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            "rank",
            "z_score",
            F.round(F.col("z_star_micro") / 1e6, 6).alias("bh_boundary"),
            (F.col("rank") <= F.col("k_star")).cast("int").alias(
                "drift_rejected"
            ),
        )
        .orderBy("rank")
    )


def freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment data-freshness audit relative to the corpus
    high-water mark: each event type's last-seen timestamp, its lag in
    hours behind the freshest segment, and a staleness flag at 48 h —
    the first page of every pipeline-health dashboard (a segment whose
    feed silently died shows up here before any drift test fires).
    Anchoring to the corpus max (never wall-clock) keeps the audit a
    pure function of the data — reproducible, oracle-checkable, and
    timezone-proof.

    Scale: one scan, one #types-row aggregate + broadcast anchor."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.floor(F.col("ts").cast("timestamp").cast("double")))
        .cast("long")
        .alias("last_epoch"),
    )
    anchor = per_type.agg(F.max("last_epoch").alias("hwm"))
    lag_h = F.round(
        (F.col("hwm") - F.col("last_epoch")) / 3600.0, 4
    )
    return (
        per_type.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            "n_events",
            "last_epoch",
            lag_h.alias("lag_hours"),
            (lag_h > 48.0).cast("int").alias("stale"),
        )
        .orderBy("event_type")
    )


def lang_source_vmeasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-measure between the corpus's two document partitions (lang,
    source) — the entropy-based clustering agreement score
    (Rosenberg & Hirschberg 2007): homogeneity = 1 − H(lang|source)
    / H(lang), completeness = 1 − H(source|lang)/H(source), V their
    harmonic mean.  The information-theoretic member of the agreement
    family (label_agreement_kappa is chance-corrected counting,
    lang_source_chi2 tests independence; V-measure SCORES how far one
    partition explains the other — near 0 here is itself the QA
    finding: sources are language-balanced, so source-stratified
    sampling cannot skew language mix).

    Exactness: every entropy is a fold of micro-frozen p·ln p terms
    from exact BIGINT cell counts (one contingency aggregation);
    ratios divide rounded micro sums.

    Scale: one scan to the #langs × #sources contingency table."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from project_bigdata_recsys_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    tot = cells.agg(F.sum("n").cast("long").alias("N"))

    def entropy_micro(df, group_cols):
        """Σ −(n/N)·ln(n/N) micro-frozen, over `group_cols` marginals."""
        marg = df.groupBy(*group_cols).agg(
            F.sum("n").cast("long").alias("m")
        )
        return (
            marg.crossJoin(F.broadcast(tot))
            .select(
                F.round(
                    F.lit(-1_000_000.0)
                    * (F.col("m") / F.col("N"))
                    * F.log(F.col("m") / F.col("N"))
                )
                .cast("long")
                .alias("t")
            )
            .agg(F.sum("t").cast("long").alias("h"))
        )
    h_lang = entropy_micro(cells, ["lang"]).withColumnRenamed("h", "h_lang")
    h_src = entropy_micro(cells, ["source"]).withColumnRenamed("h", "h_src")
    h_joint = entropy_micro(cells, ["lang", "source"]).withColumnRenamed(
        "h", "h_joint"
    )
    j = h_lang.crossJoin(h_src).crossJoin(h_joint)
    # H(lang|source) = H(joint) − H(source); H(source|lang) likewise
    hom = 1.0 - (F.col("h_joint") - F.col("h_src")) / F.col("h_lang")
    com = 1.0 - (F.col("h_joint") - F.col("h_lang")) / F.col("h_src")
    return j.select(
        F.round(F.col("h_lang") / 1e6, 6).alias("h_lang"),
        F.round(F.col("h_src") / 1e6, 6).alias("h_source"),
        F.round(F.col("h_joint") / 1e6, 6).alias("h_joint"),
        F.round(hom, 6).alias("homogeneity"),
        F.round(com, 6).alias("completeness"),
        F.round(2.0 * hom * com / (hom + com), 6).alias("v_measure"),
    )
