"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given scale factor, then compares row count, column names/types, and
order-insensitive values.  Run while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from project_bigdata_recsys_spark.caching import release_shared, release_tracked
from project_bigdata_recsys_spark.catalog import TABLES, table_path
from project_bigdata_recsys_spark.plans.queries import ORACLES, QUERIES
from project_bigdata_recsys_spark.session import get_spark


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


#: (query, column) pairs allowed a 1e-9 RELATIVE tolerance.  The driver
#: hash-compares values EXACTLY, so the default here is exact equality —
#: a blanket relative tolerance swallowed a $0.01 delta on a ~$4e8 sum
#: for two rounds (cdc_current_view: local "ok", driver red).  Every
#: entry needs a one-line justification; an empty set means this checker
#: sees exactly what the driver sees.
TOLERANT_COLUMNS: dict[str, set[str]] = {}


def values_equal(a, b, tolerant: bool = False) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        if af == bf:
            return True
        return tolerant and abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns {sc} vs oracle {oc}")
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    n_bad = 0
    for col in a.columns:
        tolerant = col in TOLERANT_COLUMNS.get(name, ())
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y, tolerant):
                if n_bad < 3:
                    problems.append(f"value mismatch col={col} row={i}: {x!r} vs {y!r}")
                n_bad += 1
    if n_bad:
        problems.append(f"total mismatched values: {n_bad}")
    return problems


def engine_versions(spark) -> dict:
    """Engine/build identifiers for the run — recorded so a
    local-green/driver-red split (r12's sql_in_subquery) is attributable
    in one look instead of unexplainable (VERDICT r12 task 6)."""
    import platform

    versions = {
        "spark": spark.version,
        "duckdb": duckdb.__version__,
        "python": platform.python_version(),
    }
    try:
        versions["jvm"] = (
            spark.sparkContext._jvm.System.getProperty("java.version")
        )
    except Exception:  # noqa: BLE001 — JVM property probe is best-effort
        versions["jvm"] = None
    return versions


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    import json

    print("VERSIONS " + json.dumps(engine_versions(spark), sort_keys=True))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        elapsed = time.time() - t0
        # scoped cache release between queries (same discipline as
        # bench.py): 100+ queries share this session, and pinned
        # signature frames / CC label checkpoints would otherwise
        # accumulate across the whole run
        release_tracked()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        if name not in ORACLES:
            print(f"rows  {name}: {len(spark_pdf)} rows (rows-only, {elapsed:.1f}s)")
            n_rows_only += 1
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name} ({elapsed:.1f}s):")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows ({elapsed:.1f}s)")
            n_pass += 1
    release_shared()
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
