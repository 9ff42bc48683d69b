"""Round-12 regression pins.

Covers the r11 VERDICT brief items that land in code this round:

- the frozen-subset guard in bench.py (task #3): flag fires exactly when
  the composition-stable subset moves >15% while the r1 anchor is
  in-band, and stays silent otherwise;
- the CoW merge commit path (`_stage_and_swap`, task #2): single
  partitioned staging write + directory swap must preserve the byte
  identity of untouched partitions and the exact row set of touched
  ones (the dynamic-overwrite behaviors the old path asserted).
"""

from __future__ import annotations

import os

PKG = os.path.join(
    os.path.dirname(__file__), "..", "project_bigdata_recsys_spark"
)


def test_frozen_subset_flag_logic():
    """The composition-axis guard: in-band anchor + >15% frozen-subset
    move hard-flags in BOTH directions; out-of-band runs get the
    ADVISORY instead of silence (r13 ADVICE fix — r12's real 0.86 move
    hid behind a 0.7% ambient excursion); small moves and missing
    baselines stay silent."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import FROZEN_SUBSET_BASELINE_SEC, frozen_subset_verdict

    base = FROZEN_SUBSET_BASELINE_SEC

    # in-band, within tolerance: ratio published, no flag, no advisory
    ratio, flag, adv = frozen_subset_verdict(base * 1.10, ambient_ok=True)
    assert ratio == 1.1 and flag is None and adv is None

    # in-band, regression beyond tolerance: hard flag fires
    ratio, flag, adv = frozen_subset_verdict(base * 1.30, ambient_ok=True)
    assert ratio == 1.3 and flag is not None and "regressed" in flag
    assert adv is None

    # in-band, improvement beyond tolerance: also flagged (a 20%
    # composition-independent speedup needs explaining too)
    ratio, flag, adv = frozen_subset_verdict(base * 0.70, ambient_ok=True)
    assert flag is not None and "improved" in flag

    # out-of-band ambient + beyond-tolerance move: advisory, not the
    # hard flag — visible but distinct from the in-band verdict
    ratio, flag, adv = frozen_subset_verdict(base * 2.0, ambient_ok=False)
    assert ratio == 2.0 and flag is None
    assert adv is not None and "regressed" in adv

    # out-of-band but within tolerance: silent
    ratio, flag, adv = frozen_subset_verdict(base * 1.05, ambient_ok=False)
    assert flag is None and adv is None

    # degenerate inputs stay silent
    assert frozen_subset_verdict(None, True) == (None, None, None)
    assert frozen_subset_verdict(10.0, True, baseline=0.0) == (
        None, None, None,
    )


def test_stage_and_swap_preserves_untouched_partitions(spark, tmp_path):
    """The r12 merge commit rewrite: untouched partition directories
    must remain byte-identical (same files, same mtimes), touched ones
    must hold exactly the merged rows, and a new partition appearing
    only in the batch must be created."""
    import shutil

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_into_partitioned,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [
            (1, "a", "2024-01"),
            (2, "b", "2024-01"),
            (3, "c", "2024-02"),
            (4, "d", "2024-03"),
        ],
        "id long, v string, part string",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(target)
    mar = os.path.join(target, "part=2024-03")
    before = {
        f: os.path.getmtime(os.path.join(mar, f))
        for f in os.listdir(mar)
        if not f.startswith(".")
    }

    updates = spark.createDataFrame(
        [
            (1, "a2", "2024-01"),   # update in place
            (9, "new", "2024-04"),  # brand-new partition
        ],
        "id long, v string, part string",
    )
    touched = merge_into_partitioned(spark, target, updates, ["id"], "part")
    assert sorted(touched) == ["2024-01", "2024-04"]

    after = {
        f: os.path.getmtime(os.path.join(mar, f))
        for f in os.listdir(mar)
        if not f.startswith(".")
    }
    assert before == after  # untouched partition not rewritten

    got = {(r.id, r.v, r.part) for r in spark.read.parquet(target).collect()}
    assert got == {
        (1, "a2", "2024-01"),
        (2, "b", "2024-01"),
        (3, "c", "2024-02"),
        (4, "d", "2024-03"),
        (9, "new", "2024-04"),
    }
    shutil.rmtree(target)


def test_planted_id_guard_raises_on_offset_collision(spark):
    """planted_id (r11 verdict task #7): valid ids shift by exactly the
    offset; an id at/above the offset fails LOUDLY at execution instead
    of silently colliding with a planted id."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from project_bigdata_recsys_spark.functions.dedup import (
        PLANTING_OFFSET,
        planted_id,
    )

    ok = spark.createDataFrame([(0,), (999_999,)], "doc_id long").select(
        planted_id("doc_id").alias("doc_id")
    )
    assert {r.doc_id for r in ok.collect()} == {
        PLANTING_OFFSET,
        PLANTING_OFFSET + 999_999,
    }

    bad = spark.createDataFrame(
        [(5,), (PLANTING_OFFSET,)], "doc_id long"
    ).select(planted_id("doc_id").alias("doc_id"))
    with pytest.raises(
        SparkRuntimeException, match="planting-offset collision"
    ):
        bad.collect()
