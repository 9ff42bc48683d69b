"""Round-16 optimization tests: the small-state stream partition pin.

Bounded-state replays pin ``spark.sql.shuffle.partitions`` at stream
START (the value the state-store partition count is frozen from) to
``_SMALL_STATE_PARTITIONS`` — these tests pin the two invariants the
optimization rests on:

1. the pin NEVER leaks: the session conf is identical before and after
   a small-state replay (including when the stream errors);
2. pinned vs session-width state partitioning is result-identical for
   a stateful replay (the state partition count is layout, not
   semantics).
"""

from __future__ import annotations

import pytest

import project_bigdata_recsys_spark.streaming.replay as R

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_small_state_pin_restores_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    R.stream_benford_values(spark, SF_SMALL).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_small_state_pin_restores_conf_on_error(spark, tmp_path):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    src = str(tmp_path / "src")
    spark.range(4).write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    # append mode on an unwatermarked aggregation fails at .start() —
    # inside the pinned window, so the restore must still run
    with pytest.raises(Exception):
        R._run_replay(
            stream.groupBy("id").count(), spark, "append", small_state=True
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_small_state_result_identical_to_session_width(spark, monkeypatch):
    pinned = _rows(R.stream_benford_values(spark, SF_SMALL))
    # session fixture runs at shuffle_partitions=8, so disabling the pin
    # means min(8, 8) -> widen the sentinel instead: pin to 2 and to the
    # session width, results must agree exactly
    monkeypatch.setattr(R, "_SMALL_STATE_PARTITIONS", 2)
    narrow = _rows(R.stream_benford_values(spark, SF_SMALL))
    monkeypatch.setattr(R, "_SMALL_STATE_PARTITIONS", 10_000)
    wide = _rows(R.stream_benford_values(spark, SF_SMALL))
    assert pinned == narrow == wide


def test_simhash_pairs_from_bands_equals_inline(spark):

    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.dedup import (
        _simhash_pairs_from_bands,
        shared_simhash_bands,
        simhash_near_pairs_for,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    inline = set(
        map(tuple, simhash_near_pairs_for(docs, sort=False).collect())
    )
    bands = spark.read.parquet(
        shared_simhash_bands(spark, SF_SMALL)
    ).select("doc_id", "simhash", "band_no", "k")
    from_index = set(
        map(tuple, _simhash_pairs_from_bands(bands).collect())
    )
    assert inline == from_index and len(inline) > 0
