"""Round-11 regression pins: the parquet-memo audit (VERDICT r10 task #3).

The r10 late pass established the rule: cross-query shared state must be
parquet-memo-backed, because a session owner's between-query block sweep
evicts in-memory persist_shared frames and the tier silently rebuilds.
This round converts the last cross-query tier (doc_unigram_scores — its
consumers perplexity_buckets and domain_reweight run four bench entries
apart) and pins, per remaining tier, which regime it is in:

- PARQUET MEMO (cross-query consumers): shared_components,
  shared_simhash_bands, shared_minhash_signatures,
  shared_cooccurrence_edges, shared_oriented_edges, doc_unigram_scores.
- persist_shared MEMORY tier (adjacent-only consumers, protected by
  bench's _SHARE_WITH_NEXT): shared_item_margins — its single call site
  (graph.item_similar_neighbors) runs immediately after item_triangles,
  which bench marks share-with-next; an eviction there costs one basket
  scan, not a corpus tokenization.
"""

from __future__ import annotations

import os

from tests.conftest import SF_SMALL

PKG = os.path.join(
    os.path.dirname(__file__), "..", "project_bigdata_recsys_spark"
)


def test_unigram_scores_memo_revalidates_after_purge(spark):
    """doc_unigram_scores must rebuild when its scratch path vanishes
    mid-process (the shared_components revalidation contract) and the
    rebuilt frame must be row-identical — the same pin the r10 memos
    carry in test_round10."""
    import shutil

    from project_bigdata_recsys_spark.functions import text as text_fns

    s1 = sorted(
        map(tuple, text_fns.doc_unigram_scores(spark, SF_SMALL).collect())
    )
    assert s1, "unigram score frame is empty at sf0.001"
    key = next(iter(text_fns._UNIGRAM_SCORES))
    shutil.rmtree(os.path.dirname(text_fns._UNIGRAM_SCORES[key]))
    s2 = sorted(
        map(tuple, text_fns.doc_unigram_scores(spark, SF_SMALL).collect())
    )
    assert s1 == s2


def test_unigram_consumers_read_the_memo_not_the_corpus(spark):
    """Once the memo exists, perplexity_buckets and domain_reweight must
    scan the memo parquet — NOT re-tokenize documents.parquet.  A plan
    that still reads the documents text column after the memo landed is
    the silent-rebuild failure mode coming back."""
    from project_bigdata_recsys_spark.functions import text as text_fns
    from project_bigdata_recsys_spark.functions.curation import (
        domain_reweight,
    )

    text_fns.doc_unigram_scores(spark, SF_SMALL).count()  # memo exists
    for df in (
        text_fns.perplexity_buckets(spark, SF_SMALL),
        domain_reweight(spark, SF_SMALL),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "spark_unigram_scores_" in plan, plan
        assert "documents.parquet" not in plan, plan


def test_item_margins_single_call_site_is_adjacent_regime():
    """shared_item_margins stays on the memory tier on purpose: exactly
    one consumer module-wide, and bench runs it inside a
    _SHARE_WITH_NEXT span.  If a second cross-query consumer appears,
    this count bumps and the tier must move to a parquet memo — the
    failing assert is the reminder."""
    import glob

    call_sites = 0
    for path in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        src = open(path, encoding="utf-8").read()
        hits = src.count("shared_item_margins(")
        if "def shared_item_margins(" in src:
            hits -= 1
        call_sites += hits
    assert call_sites == 1, (
        f"shared_item_margins now has {call_sites} call sites — "
        "adjacent-only justification no longer holds; convert it to a "
        "parquet memo (see functions/dedup.py shared_minhash_signatures)"
    )


def test_frozen_subset_is_actually_frozen():
    """bench.FROZEN_SUBSET is the cross-round composition axis — its sum
    only means something if the list NEVER changes.  The fingerprint
    below was taken when the subset was defined (r11); if this test
    fails, someone edited the subset, and the fix is to revert the edit,
    not to update the hash."""
    import hashlib

    import bench

    fp = hashlib.sha256("|".join(bench.FROZEN_SUBSET).encode()).hexdigest()
    assert fp[:16] == "a2c28345bef97603", bench.FROZEN_SUBSET
    assert bench.FROZEN_SUBSET[:25] == bench.HEADLINE[:25]
    missing = [q for q in bench.FROZEN_SUBSET if q not in bench.HEADLINE]
    assert missing == [], missing


def test_bucket_pairs_carry_precondition_raises_value_error(spark):
    """r10 advisory: the carry ⊆ key_cols precondition must survive
    ``python -O`` — a bare assert would vanish and resurface later as an
    opaque missing-column AnalysisException."""
    import pytest as _pytest

    from project_bigdata_recsys_spark.functions import dedup

    frame = spark.range(0).selectExpr("array(id) as ds", "id as k")
    with _pytest.raises(ValueError, match="carry columns"):
        dedup.bucket_pairs(frame, key_cols=["k"], carry=["nope"])


def test_token_budget_planner_greedy_invariants(spark):
    """Allocation must exhaust the budget exactly (caps exceed it on
    this corpus), respect the epoch cap, and be greedy in quality
    order: full allocations form a prefix, at most one source is
    partial, everything after it gets zero."""
    from project_bigdata_recsys_spark.functions.curation import (
        token_budget_planner,
    )

    rows = token_budget_planner(spark, SF_SMALL).collect()
    total = sum(r.n_tokens for r in rows)
    budget = int(total * 1.5)
    assert sum(r.alloc_tokens for r in rows) == budget
    assert all(r.epochs <= 4.0 for r in rows)
    states = [
        "full" if r.alloc_tokens == r.cap_tokens
        else ("zero" if r.alloc_tokens == 0 else "partial")
        for r in rows  # rows arrive quality-ordered
    ]
    import re

    assert re.fullmatch(r"(full)*(partial)?(zero)*", "".join(states))


def test_mixture_temperature_sweep_entropy_monotone(spark):
    """Lower alpha flattens the mixture: entropy must be nonincreasing
    in alpha, every per-alpha share column must sum to ~1, and alpha=1
    must reproduce natural sampling (boost 1 for every source)."""
    from collections import defaultdict

    from project_bigdata_recsys_spark.functions.curation import (
        mixture_temperature_sweep,
    )

    rows = mixture_temperature_sweep(spark, SF_SMALL).collect()
    by_alpha = defaultdict(list)
    for r in rows:
        by_alpha[r.alpha].append(r)
    ent = {a: rs[0].mix_entropy for a, rs in by_alpha.items()}
    alphas = sorted(ent)
    assert all(ent[a] >= ent[b] for a, b in zip(alphas, alphas[1:]))
    for rs in by_alpha.values():
        assert abs(sum(r.sampling_share for r in rs) - 1.0) < 1e-4
    assert all(abs(r.boost - 1.0) < 5e-4 for r in by_alpha[1.0])


def test_secret_scan_detects_every_planted_class(spark):
    """Each planted credential class must be found, and the per-source
    flagged-doc count can never exceed the docs scanned."""
    from project_bigdata_recsys_spark.functions.text import (
        secret_scan_profile,
    )

    rows = secret_scan_profile(spark, SF_SMALL).collect()
    assert sum(r.n_aws_key for r in rows) > 0
    assert sum(r.n_hex32 for r in rows) > 0
    assert sum(r.n_bearer for r in rows) > 0
    assert all(0 < r.docs_flagged <= r.n_docs for r in rows)


def test_mix_planning_ops_cache_the_source_reduction(spark):
    """Both round-11 mix-planning ops fan a tiny per-source frame into
    several aggregation branches; without the persist every branch
    re-tokenizes the corpus (8 scans at 100 TB).  Pin the cache node."""
    from project_bigdata_recsys_spark.functions.curation import (
        mixture_temperature_sweep,
        token_budget_planner,
    )

    for df in (
        mixture_temperature_sweep(spark, SF_SMALL),
        token_budget_planner(spark, SF_SMALL),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan


def test_minhash_calibration_separates_true_and_false_positives(spark):
    """Estimates live on the k/n_hashes grid; the full-agreement bucket
    must exist (planted exact dups collide in every band) and read as
    near-exact duplicates, while some sub-half bucket must expose LSH
    false positives — otherwise the audit is vacuous."""
    from project_bigdata_recsys_spark.functions.dedup import (
        minhash_calibration_profile,
    )

    rows = minhash_calibration_profile(spark, SF_SMALL).collect()
    assert rows, "no candidate pairs at sf0.001"
    for r in rows:
        assert abs(r.est_jaccard * 16 - round(r.est_jaccard * 16)) < 1e-9
        assert 0.0 <= r.fp_rate_at_half <= 1.0
    full = [r for r in rows if r.est_jaccard == 1.0]
    assert full and full[0].mean_exact > 0.9
    assert any(r.n_below_half > 0 for r in rows)


def test_orc_roundtrip_matches_parquet_truth(spark):
    """The ORC snapshot + re-scan aggregate must equal the same
    aggregate computed straight off the parquet table."""
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed
    from project_bigdata_recsys_spark.sources.ingest import (
        orc_roundtrip_query,
    )
    from pyspark.sql import functions as F

    got = sorted(map(tuple, orc_roundtrip_query(spark, SF_SMALL).collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, SF_SMALL, "orders")
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    sum_fixed(
                        F.round(F.col("o_totalprice") * 100).cast("long"),
                        sf_dir=SF_SMALL,
                    )
                    / 100.0,
                    2,
                ).alias("total"),
            )
            .collect(),
        )
    )
    assert got == want


def test_secret_scan_is_one_corpus_scan(spark):
    """Planting + three regex counters + the rollup must fuse into a
    single documents scan — a second scan means the detect pass stopped
    sharing the planted projection."""
    from project_bigdata_recsys_spark.functions.text import (
        secret_scan_profile,
    )

    plan = (
        secret_scan_profile(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("documents.parquet") == 1, plan


def test_minhash_calibration_rides_the_signature_memo(spark):
    """The candidate stage must read the shared signature parquet memo,
    never re-run the md5 shingle pass the memo exists to amortize."""
    from project_bigdata_recsys_spark.functions.dedup import (
        minhash_calibration_profile,
        shared_minhash_signatures,
    )

    shared_minhash_signatures(spark, SF_SMALL).count()  # memo exists
    plan = (
        minhash_calibration_profile(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "spark_minhash_sigs_" in plan, plan


def test_training_data_card_internal_consistency(spark):
    """Rates must be consistent with their counts, the dup signal must
    spread across sources (the md5-uniform planting exists for this),
    and dup docs come in pairs (every planted copy flags its original)."""
    from project_bigdata_recsys_spark.functions.curation import (
        training_data_card,
    )

    rows = training_data_card(spark, SF_SMALL).collect()
    assert rows
    total_dups = 0
    for r in rows:
        assert 0 <= r.dup_docs <= r.n_docs
        assert abs(r.dup_rate - round(r.dup_docs / r.n_docs, 6)) < 1e-9
        assert abs(r.pii_rate - round(r.pii_docs / r.n_docs, 6)) < 1e-9
        assert r.lang_entropy >= 0.0
        total_dups += r.dup_docs
    assert total_dups > 0 and total_dups % 2 == 0
    assert sum(1 for r in rows if r.dup_docs > 0) >= len(rows) // 2


def test_python_datasource_rows_equal_expression_generator(spark):
    """The Spark-4 Python DataSource reader must yield bit-identical
    rows to the Catalyst expression generator — the equivalence that
    lets it share the synthetic_interactions oracle."""
    from project_bigdata_recsys_spark.sources.ingest import (
        synthetic_interactions,
    )
    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )

    spark.dataSource.register(SyntheticInteractionsDataSource)
    got = sorted(
        map(
            tuple,
            spark.read.format("synthetic_interactions")
            .option("n", 500)
            .option("seed", 7)
            .option("numPartitions", 4)
            .load()
            .collect(),
        )
    )
    want = sorted(
        map(tuple, synthetic_interactions(spark, n=500, seed=7).collect())
    )
    assert got == want


def test_python_stream_datasource_multi_batch_incremental(spark, tmp_path):
    """The production shape: incremental offset polls admit batchSize
    rows per micro-batch under a processing-time trigger.  All n rows
    must arrive, across MORE THAN ONE batch, row-identical to the batch
    generator."""
    import time

    from project_bigdata_recsys_spark.sources.ingest import (
        synthetic_interactions,
    )
    from project_bigdata_recsys_spark.sources.pyds import (
        SyntheticInteractionsDataSource,
    )

    spark.dataSource.register(SyntheticInteractionsDataSource)
    stream = (
        spark.readStream.format("synthetic_interactions")
        .option("n", 300)
        .option("seed", 9)
        .option("batchSize", 120)
        .option("numPartitions", 3)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while (
            spark.table("pyds_stream").count() < 300
            and time.time() < deadline
        ):
            time.sleep(0.5)
        n_batches = len(q.recentProgress)
        got = sorted(map(tuple, spark.table("pyds_stream").collect()))
    finally:
        q.stop()
    want = sorted(
        map(tuple, synthetic_interactions(spark, n=300, seed=9).collect())
    )
    assert got == want
    assert n_batches >= 3  # 300 rows at 120/batch => at least 3 polls


def test_python_datasource_writer_two_phase_commit(spark, tmp_path):
    """The jsonl_audit writer must publish a driver-side manifest only
    after every partition commits, and manifest-listed parts must
    re-read to exactly the written frame."""
    import json
    import os

    from project_bigdata_recsys_spark.sources.pyds import (
        JsonlAuditDataSource,
    )

    spark.dataSource.register(JsonlAuditDataSource)
    out = str(tmp_path / "audit")
    df = spark.range(0, 500, 1, 4).selectExpr("id", "id % 9 AS v")
    df.write.format("jsonl_audit").option("path", out).mode("append").save()

    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["n_rows"] == 500 and len(man["parts"]) == 4
    back = spark.read.json([p["path"] for p in man["parts"]])
    got = sorted(map(tuple, back.select("id", "v").collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
