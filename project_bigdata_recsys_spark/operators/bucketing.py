"""Bucketed tables — shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of ``fact ⨝ fact`` (lineitem⨝orders) is
shuffling both sides on the join key for every query.  Bucketing pays
that shuffle once at write time: both tables hash-clustered into the
same number of buckets on the key, after which every equi-join or
groupBy on that key reads co-located buckets and the exchange disappears
from the plan (verify: no Exchange above the scans in .explain).

The reference's analog is none — Postgres heap tables re-hash on every
join.  This module is engine infrastructure (a write-side layout
operator), exercised by tests rather than the oracle gate since it
manages its own storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    location: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task sort from
    sort-merge joins (the plan keeps SortMergeJoin but both Sort nodes
    vanish).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if location:
        writer = writer.option("path", os.path.join(location, table_name))
    writer = writer.bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned with
    zero Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on)


def write_sorted_partitioned(
    df,
    path: str,
    partition_col: str,
    sort_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write the scan-optimal layout: directory-partitioned on the prune
    column, rows sorted within every file on the filter/merge columns.

    At 100 TB this is the difference between reading a day's partition
    with min/max row-group skipping on the sort key versus scanning
    everything: partition pruning handles the coarse cut, and the
    within-file sort makes parquet column statistics selective for the
    fine cut.  repartition(partition_col) before partitionBy keeps one
    writer task per partition value (no small-file explosion);
    sortWithinPartitions orders rows inside each task's output."""
    (
        df.repartition(F.col(partition_col))
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )
