"""Span-level dedup invariants (functions/spans.py) — oracle parity runs
separately in test_oracle_parity; these pin the semantic contracts on
hand-built documents with known duplicate structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.functions.spans import (
    remove_duplicate_spans,
    span_segments,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_segments_cover_text_exactly(spark):
    """Segments tile the token stream: widths are `width` except a kept
    trailing partial, and re-joining them in order rebuilds the text."""
    docs = _docs(
        spark,
        [(1, " ".join(f"t{i}" for i in range(19))), (2, "a b"), (3, "solo")],
    )
    segs = span_segments(docs, width=8).collect()
    by_doc: dict[int, list] = {}
    for s in segs:
        by_doc.setdefault(s.doc_id, []).append(s)
    assert [len(by_doc[d]) for d in (1, 2, 3)] == [3, 1, 1]  # ceil(19/8), 1, 1
    for d, expect in ((1, " ".join(f"t{i}" for i in range(19))), (2, "a b"), (3, "solo")):
        parts = [s.span for s in sorted(by_doc[d], key=lambda s: s.seg_no)]
        assert " ".join(parts) == expect


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    """A span repeated across documents survives only in the doc with
    the smallest (doc_id, seg_no); unique spans are untouched."""
    boiler = " ".join(f"b{i}" for i in range(8))  # exactly one 8-token span
    docs = _docs(
        spark,
        [
            (10, boiler + " " + " ".join(f"x{i}" for i in range(8))),
            (20, boiler + " " + " ".join(f"y{i}" for i in range(8))),
            (30, boiler),
        ],
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, width=8).collect()}
    assert out[10].n_spans_dropped == 0  # first occurrence keeps boilerplate
    assert out[10].text_kept.startswith(boiler)
    assert out[20].n_spans_dropped == 1
    assert out[20].text_kept == " ".join(f"y{i}" for i in range(8))
    assert out[30].n_spans_dropped == 1
    assert out[30].text_kept == ""  # fully-duplicated doc empties out


def test_remove_duplicate_spans_intra_document(spark):
    """A doc that repeats its own span keeps only the first copy —
    dedup is positional, not per-document."""
    seg = " ".join(f"r{i}" for i in range(8))
    docs = _docs(spark, [(5, seg + " " + seg + " " + seg)])
    row = remove_duplicate_spans(docs, width=8).head()
    assert row.n_spans == 3
    assert row.n_spans_dropped == 2
    assert row.text_kept == seg


def test_remove_duplicate_spans_token_conservation(spark):
    """Kept + dropped spans account for every token: the sum of kept
    text tokens plus dropped-span tokens equals the corpus token count
    (all docs here are multiples of the width, so every span is full)."""
    a = " ".join(f"a{i}" for i in range(16))
    docs = _docs(spark, [(1, a), (2, a)])
    rows = remove_duplicate_spans(docs, width=8).collect()
    kept_tokens = sum(
        len(r.text_kept.split()) if r.text_kept else 0 for r in rows
    )
    dropped_spans = sum(r.n_spans_dropped for r in rows)
    assert kept_tokens + dropped_spans * 8 == 32


def test_span_index_probe_matches_inline_classification(spark, tmp_path):
    """Probe against a persisted index must classify exactly as a
    from-scratch pass: corpus spans drop, batch-internal repeats keep
    only their first, fresh spans admit."""
    from project_bigdata_recsys_spark.functions.spans import (
        build_span_index,
        probe_span_index,
        span_segments,
    )
    from project_bigdata_recsys_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "span_idx")
    build_span_index(spark, sf, idx)

    docs = load_table(spark, sf, "documents")
    corpus_doc = docs.orderBy("doc_id").first()
    fresh = " ".join(f"zz{i}" for i in range(16))  # two fresh 8-token spans
    batch = spark.createDataFrame(
        [
            (9_000_001, corpus_doc.text, "en"),          # all spans dup_corpus
            (9_000_002, fresh, "en"),                    # all spans new
            (9_000_003, fresh, "en"),                    # intra dups of above
        ],
        "doc_id long, text string, lang string",
    )
    out = probe_span_index(spark, idx, batch).collect()
    assert len(out) == 1
    r = out[0]
    n_corpus_spans = span_segments(
        spark.createDataFrame([(1, corpus_doc.text)], "doc_id long, text string")
    ).count()
    assert r.n_docs == 3
    assert r.n_dup_corpus == n_corpus_spans
    assert r.n_new == 2  # first sighting of the two fresh spans
    assert r.n_dup_intra == 2  # the second fresh doc repeats both
    assert r.n_spans == r.n_dup_corpus + r.n_dup_intra + r.n_new


def test_span_index_probe_empty_batch(spark, tmp_path):
    """An empty batch probes to an empty profile (and the partition-prune
    collect of zero buckets must not blow up)."""
    from project_bigdata_recsys_spark.functions.spans import (
        build_span_index,
        probe_span_index,
    )

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "span_idx")
    build_span_index(spark, sf, idx)
    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert probe_span_index(spark, idx, empty).collect() == []


def test_update_span_index_equals_rebuild(spark, tmp_path):
    """Yesterday's index ⊕ today's batch must be row-identical to a
    rebuild over the union corpus — and must rewrite only the touched
    bucket partitions."""
    from project_bigdata_recsys_spark.functions.spans import (
        build_span_index,
        update_span_index,
    )

    base = [(i, " ".join(f"b{i}_{j}" for j in range(20))) for i in range(10)]
    batch = [(100 + i, " ".join(f"n{i}_{j}" for j in range(20))) for i in range(3)]
    batch.append((200, base[0][1]))  # repeats corpus spans → n_occ must add

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    inc_dir = str(tmp_path / "inc")
    docs(base).write.mode("overwrite").parquet(str(tmp_path / "a" / "documents.parquet"))
    docs(base + batch).write.mode("overwrite").parquet(
        str(tmp_path / "b" / "documents.parquet")
    )
    build_span_index(spark, str(tmp_path / "a"), inc_dir)
    update_span_index(spark, inc_dir, docs(batch))

    full_dir = str(tmp_path / "full")
    build_span_index(spark, str(tmp_path / "b"), full_dir)

    inc = spark.read.parquet(inc_dir).orderBy("h").collect()
    full = spark.read.parquet(full_dir).orderBy("h").collect()
    assert inc == full


def test_update_span_index_empty_batch_is_noop(spark, tmp_path):
    from project_bigdata_recsys_spark.functions.spans import (
        build_span_index,
        update_span_index,
    )

    idx = str(tmp_path / "idx")
    build_span_index(spark, "/root/testdata/sf0.001", idx)
    before = spark.read.parquet(idx).count()
    empty = spark.createDataFrame([], "doc_id long, text string")
    update_span_index(spark, idx, empty)
    assert spark.read.parquet(idx).count() == before


def test_span_contamination_flags_copies_not_fresh(spark):
    """Eval docs copied from train must flag contaminated (overlap 1.0);
    planted fresh docs must not (overlap 0) — so n_contaminated equals
    exactly the copied-doc count per lang."""
    from pyspark.sql import functions as F2

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.spans import span_contamination

    sf = "/root/testdata/sf0.001"
    rows = {r.lang: r for r in span_contamination(spark, sf).collect()}
    docs = load_table(spark, sf, "documents")
    copied = {
        r.lang: r.n
        for r in docs.filter(F2.col("doc_id") % 17 == 0)
        .groupBy("lang")
        .agg(F2.count("*").alias("n"))
        .collect()
    }
    for lang, r in rows.items():
        assert r.n_contaminated == copied.get(lang, 0)
        assert r.n_eval_docs >= r.n_contaminated
