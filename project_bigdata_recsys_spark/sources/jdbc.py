"""JDBC source/sink wrappers (S-parity with the reference's Postgres I/O).

The reference's one real Spark job reads its training frame over JDBC with
a single-partition whole-table scan and writes results back row-by-row
(reference spark_jobs/batch_als_train.py:24-29,116-117,236-248).  These
wrappers fix both scale problems:

  - ``read_jdbc`` parallelizes the scan with ``partitionColumn`` /
    ``numPartitions`` / bounds — N concurrent range queries instead of one
    executor pulling the whole table through one connection.  Bounds are
    auto-probed with a ``min/max`` pushdown query when not supplied.
  - ``write_jdbc`` bounds the connection fan-in (coalesce before write —
    a 1000-partition DataFrame must not open 1000 database connections)
    and batches inserts (``batchsize``).

No JDBC driver jar ships in this sandbox, so tests cover the option
assembly (pure) and skip the live round-trip; the wrappers are the
deploy-complete surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Assemble the JDBC reader option map (pure, unit-testable).

    ``partition_column`` must be numeric/date-like; with it set, Spark
    issues ``numPartitions`` range-predicated queries.  Bounds left None
    here are probed by :func:`read_jdbc` before reading.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        opts["partitionColumn"] = partition_column
        opts["numPartitions"] = str(num_partitions)
        if lower_bound is not None:
            opts["lowerBound"] = str(lower_bound)
        if upper_bound is not None:
            opts["upperBound"] = str(upper_bound)
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC table scan.

    When ``partition_column`` is given without bounds, probe them with a
    one-row aggregate pushed down to the database (a ``(SELECT min, max)``
    dbtable subquery) — the probe is negligible next to a full-table pull
    and makes the parallel scan self-configuring.
    """
    if partition_column is not None and (lower_bound is None or upper_bound is None):
        probe = spark.read.format("jdbc").options(
            url=url,
            dbtable=(
                f"(SELECT MIN({partition_column}) AS lo, "
                f"MAX({partition_column}) AS hi FROM {table}) AS bounds"
            ),
            **(properties or {}),
        )
        row = probe.load().head()
        if row is None or row.lo is None:
            # empty table — fall back to a single-partition read
            partition_column = None
        else:
            lower_bound, upper_bound = int(row.lo), int(row.hi)

    opts = jdbc_read_options(
        url,
        table,
        partition_column=partition_column,
        num_partitions=num_partitions,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
    )
    opts.update(properties or {})
    return spark.read.format("jdbc").options(**opts).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    max_connections: int = 16,
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC write with bounded connection fan-in.

    ``coalesce`` (no shuffle) caps concurrent connections; ``batchsize``
    turns per-row inserts into executeBatch round-trips — the reference's
    row-by-row ``INSERT`` loop at scale would hold a transaction open per
    row.
    """
    out = df
    if df.rdd.getNumPartitions() > max_connections:
        out = df.coalesce(max_connections)
    opts = {"url": url, "dbtable": table, "batchsize": str(batch_size)}
    opts.update(properties or {})
    out.write.format("jdbc").options(**opts).mode(mode).save()
