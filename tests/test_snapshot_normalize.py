"""Semantic contracts for snapshot diff, normalized dedup, and weighted
sampling — oracle parity runs separately in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.functions.curation import weighted_sample
from project_bigdata_recsys_spark.functions.text import normalize_text
from project_bigdata_recsys_spark.operators.snapshot import table_diff
from tests.conftest import SF_SMALL


def test_table_diff_classifies_all_four_states(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    out = {
        r.id: r.change_type
        for r in table_diff(old, new, ["id"], ["s", "v"]).collect()
    }
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_table_diff_null_vs_empty_string(spark):
    """The digest's null sentinel must distinguish NULL from '' — a naive
    concat would call this row unchanged."""
    old = spark.createDataFrame([(1, None)], "id long, s string")
    new = spark.createDataFrame([(1, "")], "id long, s string")
    row = table_diff(old, new, ["id"], ["s"]).head()
    assert row.change_type == "changed"


def test_normalize_text_canonicalizes(spark):
    df = spark.createDataFrame(
        [("The  QUICK, brown fox!",), ("the quick brown fox",)], "t string"
    )
    vals = [r.n for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    assert vals[0] == vals[1] == "the quick brown fox"


def test_normalized_dedup_catches_case_and_punct_variants(spark):
    """Docs identical up to case/punctuation/extra spaces share a
    normalized fingerprint but not a raw one."""
    docs = spark.createDataFrame(
        [(1, "Hello, World"), (2, "hello  world"), (3, "HELLO WORLD!"), (4, "else")],
        "doc_id long, text string",
    )
    fp = docs.select(
        "doc_id",
        F.sha2(normalize_text(F.col("text")), 256).alias("norm_fp"),
        F.sha2(F.col("text"), 256).alias("raw_fp"),
    )
    groups = (
        fp.groupBy("norm_fp")
        .agg(F.count("*").alias("n"), F.countDistinct("raw_fp").alias("raw_variants"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0].n == 3 and groups[0].raw_variants == 3


def test_weighted_sample_shape_and_determinism(spark):
    """Exactly k rows per lang, dense ranks, keys descending within each
    lang, and bit-identical across runs."""
    a = weighted_sample(spark, SF_SMALL, k=5).collect()
    b = weighted_sample(spark, SF_SMALL, k=5).collect()
    assert a == b
    by_lang: dict[str, list] = {}
    for r in a:
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        keys = [r.ares_key for r in rows]
        assert keys == sorted(keys, reverse=True)


def test_weighted_sample_prefers_heavy_docs(spark):
    """With weights spanning orders of magnitude, the A-Res top-1 should
    be a heavy document far more often than uniform chance: build 100
    docs where one is 1000x heavier; it must rank in the top-3."""
    rows = [(i, "w " * 2 + "x", "en") for i in range(99)]  # weight ~3
    rows.append((99, "w " * 2999 + "x", "en"))  # weight 3000
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from project_bigdata_recsys_spark.functions.text import tokens

    n_tok = F.size(tokens(F.col("text")))
    hex8 = F.substring(
        F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8
    )
    u = (F.conv(hex8, 16, 10).cast("double") + 1.0) / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / n_tok.cast("double"))
    ranked = (
        docs.select("doc_id", key.alias("k"))
        .orderBy(F.desc("k"))
        .limit(3)
        .collect()
    )
    assert 99 in {r.doc_id for r in ranked}


def test_group_quantile_threshold_exact(spark):
    """Histogram-cumsum threshold equals the naive per-group quantile:
    min{score : cum_frac >= q} on a hand-built distribution with ties."""
    from project_bigdata_recsys_spark.functions.text import (
        group_quantile_threshold,
    )

    rows = [("a", s) for s in [1.0, 1.0, 2.0, 3.0]] + [("b", s) for s in [5.0] * 4]
    df = spark.createDataFrame(rows, "g string, score double")
    thr = {
        r.g: (r.threshold, r.n_total)
        for r in group_quantile_threshold(df, "g", "score", 0.25).collect()
    }
    # group a: cum at score 1.0 is 2 >= 0.25*4=1 -> threshold 1.0
    assert thr["a"] == (1.0, 4)
    # group b: single value, threshold = 5.0
    assert thr["b"] == (5.0, 4)
    # q=0.75 on a: cum(1.0)=2 < 3, cum(2.0)=3 >= 3 -> threshold 2.0
    thr75 = {
        r.g: r.threshold
        for r in group_quantile_threshold(df, "g", "score", 0.75).collect()
    }
    assert thr75["a"] == 2.0


def test_cdc_current_view_applies_ops_in_sequence(spark):
    """Latest seq wins per key; a winning delete removes the key; an
    older delete superseded by a newer upsert resurrects it."""
    from project_bigdata_recsys_spark.operators.snapshot import cdc_current_view

    changes = spark.createDataFrame(
        [
            (1, "a", 0, "I"),
            (1, "a2", 1, "U"),   # key 1: final value a2
            (2, "b", 0, "I"),
            (2, "b", 1, "D"),    # key 2: deleted
            (3, "c", 0, "D"),
            (3, "c3", 1, "I"),   # key 3: delete superseded -> c3
        ],
        "id long, v string, seq int, op string",
    )
    out = {r.id: r.v for r in cdc_current_view(changes, ["id"], "seq", "op").collect()}
    assert out == {1: "a2", 3: "c3"}


def test_scd2_history_intervals_and_reconciliation(spark):
    """Version intervals: update closes the prior version, delete closes
    without emitting a row, and the history's current rows equal the CDC
    collapsed view."""
    from project_bigdata_recsys_spark.operators.snapshot import (
        cdc_current_view,
        scd2_history,
    )

    changes = spark.createDataFrame(
        [
            (1, "a", 0, "I"), (1, "a2", 1, "U"),            # two versions
            (2, "b", 0, "I"), (2, "b", 1, "D"),             # deleted
            (3, "c", 0, "I"),                               # untouched
        ],
        "id long, v string, seq int, op string",
    )
    hist = scd2_history(changes, ["id"], "seq", "op").collect()
    by = {}
    for r in hist:
        by.setdefault(r.id, []).append(r)
    assert [(r.valid_from, r.valid_to, r.is_current) for r in sorted(by[1], key=lambda r: r.valid_from)] == [
        (0, 1, False), (1, None, True)
    ]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in by[2]] == [(0, 1, False)]
    assert [(r.valid_from, r.valid_to, r.is_current) for r in by[3]] == [(0, None, True)]
    current_hist = {(r.id, r.v) for r in hist if r.is_current}
    current_view = {
        (r.id, r.v)
        for r in cdc_current_view(changes, ["id"], "seq", "op").collect()
    }
    assert current_hist == current_view


def test_bump_price_cents_half_cent_tie_breaks_up(spark):
    """Regression pin for the r5/r6 cdc_current_view red: 295,166.50 ×
    1.01 = 298,118.165 is an exact half-cent.  Spark's double round()
    sends it UP (decimal-string HALF_UP) while DuckDB's sends it DOWN —
    bump_price_cents does the bump in integer cents with an explicit
    +50 // 100 tie-break, so BOTH engines produce 298,118.17 and no
    double is ever rounded (o_orderkey 10234 at sf0.01)."""
    import duckdb

    from project_bigdata_recsys_spark.operators.snapshot import (
        BUMP_PRICE_CENTS_SQL,
        bump_price_cents,
    )

    prices = [295166.50, 100.00, 0.01, 123456.78, 999.995, 50.495]
    df = spark.createDataFrame([(p,) for p in prices], "o_totalprice double")
    got = [
        r.b
        for r in df.select(
            bump_price_cents(F.col("o_totalprice")).alias("b")
        ).collect()
    ]
    con = duckdb.connect()
    expr = BUMP_PRICE_CENTS_SQL.format(price="o_totalprice")
    oracle = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS o_totalprice)", [p])
        .fetchone()[0]
        for p in prices
    ]
    assert got == oracle
    # the half-cent tie specifically resolves UP on both engines
    assert got[0] == 298118.17
