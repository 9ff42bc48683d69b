"""Skew-mitigation joins — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins after a shuffle materializes.  Salting is the
plan-level alternative when a key's row count is so pathological (a
power-law user, a null-like sentinel) that even a split partition
overwhelms one task: replicate the small side R times and scatter the
big side's hot keys across R salt buckets, so the hot key's rows spread
over R tasks instead of one.

The reference never joins at a scale where this matters; at 100 TB a
handful of hot keys routinely dominate a shuffle, so the engine carries
the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⨝ small on key`` with the big side salted.

    big rows get a random salt in [0, salt_buckets); the small side is
    exploded across all salt values (small × R rows — acceptable because
    the small side is broadcast-sized by contract).  Join on (key, salt)
    then drop the salt.  Result is row-identical to a plain join; only
    the partitioning of the shuffle changes.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
