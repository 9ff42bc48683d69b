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

Embedded Derby ships inside pyspark's jars (the Hive-metastore
dependency), so the wrappers are LIVE-tested in-sandbox against a real
JDBC database (:func:`jdbc_roundtrip_query`, oracle-gated) — no external
service needed.  The env-gated Postgres round-trip test remains for
deployments with a server to point at.
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
        # ANSI-quote the column: Spark's JDBC writer creates tables with
        # quoted (case-preserved) column names, so an unquoted probe
        # breaks on case-folding databases (Derby resolves bare ``id``
        # to ``ID`` and misses the quoted ``"id"`` column).  Spark's own
        # range predicates quote via the dialect; the probe must match.
        qcol = '"' + partition_column.replace('"', '""') + '"'
        probe = spark.read.format("jdbc").options(
            url=url,
            dbtable=(
                f"(SELECT MIN({qcol}) AS lo, "
                f"MAX({qcol}) AS hi FROM {table}) AS bounds"
            ),
            **(properties or {}),
        )
        row = probe.load().head()
        # positional access: case-folding databases may hand the aliases
        # back upper-cased (Derby: lo -> LO), so attribute access is not
        # portable across dialects
        if row is None or row[0] is None:
            # empty table — fall back to a single-partition read
            partition_column = None
        else:
            lower_bound, upper_bound = int(row[0]), int(row[1])

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


def jdbc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6 live and gate-checkable (the JDBC sibling of the CSV/ORC
    roundtrips): orders → embedded-Derby JDBC sink (bounded connection
    fan-in, batched inserts) → PARALLEL partitioned re-scan with
    auto-probed bounds → the same per-status aggregate, which must
    equal the oracle's aggregate over the original parquet.

    Derby ships inside pyspark's jars (the Hive-metastore dependency),
    so unlike a Postgres round-trip this needs no external service —
    the identical wrapper calls serve both.  What this pins live: the
    writer's type mapping (DOUBLE totals survive exactly), the quoted
    bounds-probe pushdown, and that the re-scan really is range-split
    (``numPartitions`` concurrent range queries, not one connection
    pulling the table)."""
    import os

    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.caching import scratch_dir
    from project_bigdata_recsys_spark.catalog import load_table
    from project_bigdata_recsys_spark.functions.fixedpoint import sum_fixed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    work = scratch_dir(prefix="spark_jdbc_snapshot_")
    db = os.path.join(work, "db")
    # keep derby.log out of the CWD (only effective if set before the
    # engine boots, i.e. before the first Derby connection this JVM)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", os.path.join(work, "derby.log")
    )
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    write_jdbc(
        orders,
        url,
        "orders_jdbc",
        mode="overwrite",
        max_connections=8,
        properties=props,
    )
    back = read_jdbc(
        spark,
        url,
        "orders_jdbc",
        partition_column="o_orderkey",
        num_partitions=8,
        properties=props,
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                sum_fixed(
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                    sf_dir=sf_dir,
                )
                / 100.0,
                2,
            ).alias("total"),
        )
        .orderBy("o_orderstatus")
    )
