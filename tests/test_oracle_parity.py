"""Every SQL-expressible query must match its DuckDB oracle (the same
check the driver runs, at sf0.001 for speed — the driver gate runs sf0.01).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from project_bigdata_recsys_spark.plans.queries import ORACLES, QUERIES
from tests.conftest import SF_SMALL


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _eq(a, b) -> bool:
    # EXACT float comparison — the driver hash-compares values exactly,
    # and a relative tolerance here once hid a cent-level divergence for
    # two rounds (tools/check_oracle.py has the same contract).
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_SMALL).toPandas()
    oracle_pdf = duck.execute(ORACLES[name]).fetchdf()
    assert len(spark_pdf) == len(oracle_pdf), "row count mismatch"
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        mismatches = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(a[col], b[col]))
            if not _eq(x, y)
        ]
        assert not mismatches, f"col {col}: first mismatches {mismatches[:3]}"


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES) - {"als_user_factors"}):
        df = QUERIES[name](spark, SF_SMALL)
        assert df.columns, name
        df.count()
