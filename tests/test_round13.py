"""Round-13 regression pins (r12 VERDICT brief + ADVICE items).

- `_stage_and_swap` partition-name escaping: a fully-deleted touched
  partition whose value Spark Hive-escapes (e.g. a colon) must actually
  be removed — the pre-r13 code rmtree'd the raw f-string name and left
  the escaped directory (and its stale rows) behind;
- the staging dir joins the exit purge only after the swap commits
  (recovery-copy preservation), covered implicitly: a green merge still
  registers its staging for purge (no /tmp leak on success).
"""

from __future__ import annotations

import os


def test_stage_and_swap_escaped_partition_full_delete(spark, tmp_path):
    """Deleting every row of a partition whose value needs Hive escaping
    must remove the real (escaped) directory, not miss it via a raw
    f-string name (r12 ADVICE #1)."""
    import shutil

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_apply_changelog,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", "x:1"), (2, "b", "x:1"), (3, "c", "plain")],
        "id long, v string, part string",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(target)
    dirs = {d for d in os.listdir(target) if d.startswith("part=")}
    # precondition: Spark escaped the colon, so the raw name is absent
    assert "part=x%3A1" in dirs and "part=x:1" not in dirs

    changelog = spark.createDataFrame(
        [(1, None, "x:1", 1, "D"), (2, None, "x:1", 1, "D")],
        "id long, v string, part string, seq int, op string",
    )
    touched = merge_apply_changelog(
        spark, target, changelog, ["id"], "part"
    )
    assert touched == ["x:1"]

    dirs_after = {d for d in os.listdir(target) if d.startswith("part=")}
    assert "part=x%3A1" not in dirs_after  # stale dir really gone
    got = {(r.id, r.v, r.part) for r in spark.read.parquet(target).collect()}
    assert got == {(3, "c", "plain")}
    shutil.rmtree(target)


def test_stage_and_swap_escaped_partition_update(spark, tmp_path):
    """An UPDATE on an escaped-value partition swaps the escaped dir in
    place (staged name and target name agree because both are
    Spark-written)."""
    import shutil

    from project_bigdata_recsys_spark.operators.maintenance import (
        merge_into_partitioned,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "x:1"), (2, "b", "plain")],
        "id long, v string, part string",
    ).write.mode("overwrite").partitionBy("part").parquet(target)

    updates = spark.createDataFrame(
        [(1, "a2", "x:1")], "id long, v string, part string"
    )
    merge_into_partitioned(spark, target, updates, ["id"], "part")

    dirs = {d for d in os.listdir(target) if d.startswith("part=")}
    assert dirs == {"part=x%3A1", "part=plain"}
    got = {(r.id, r.v, r.part) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a2", "x:1"), (2, "b", "plain")}
    shutil.rmtree(target)
