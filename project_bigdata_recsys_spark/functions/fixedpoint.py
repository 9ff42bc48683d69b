"""Fixed-point exact-sum discipline, with overflow-safe widening by sf.

Every money/value aggregate in this engine follows one recipe: scale the
≤k-decimal expression to an integer per row (``round(x * 10^k)`` as
BIGINT), sum the integers, divide back — exact and partition-order-
independent, unlike ``sum(double)`` whose printed rounding can flip
between runs (and between Spark and a serial DuckDB oracle).

BIGINT headroom ends around sf1: the widest recipe (6-dp micros over
lineitem) approaches the 9.2e18 ceiling, and Spark's non-ANSI ``sum``
over longs WRAPS silently on overflow.  :func:`sum_fixed` therefore
picks the accumulator by scale:

- **long mode** (test/bench scale, sf ≤ 1): today's BIGINT sum — the
  fast Tungsten long path, exact within headroom.
- **wide mode** (production scale): per-row cast to ``DECIMAL(38,0)``
  (overflow-free to ~1e38), final cast to double — numerically exactly
  what the BIGINT path becomes at its division sites, and what DuckDB's
  ``sum(BIGINT) -> HUGEINT -> double`` produces.

Mode selection (``SPARK_GRAFT_SUM_DTYPE`` = ``long`` | ``decimal`` |
``auto``, default auto): auto widens when the last-loaded data dir's
``sfN`` hint exceeds 1 — and when the dir carries NO sf hint, assumes
production scale and widens (safety over speed for unknown corpora).
The catalog reports every ``load_table`` dir via :func:`note_sf_dir`.

NOT converted to this helper: window-frame sums over bounded-cardinality
partitions (a customer's orders, 10 price bands) — ``.over(w)`` cannot
wrap an outer cast, and those frames sit orders of magnitude below
BIGINT headroom at any sf because the partition, not the table, bounds
the operand count.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEEN_SF: float | None = None


def note_sf_dir(sf_dir: str) -> None:
    """Record the sf hint of a data dir (called by catalog.load_table)."""
    global _SEEN_SF
    m = re.search(
        r"sf(\d+(?:\.\d+)?)", os.path.basename(str(sf_dir).rstrip("/"))
    )
    _SEEN_SF = float(m.group(1)) if m else None


def wide_sums() -> bool:
    mode = os.environ.get("SPARK_GRAFT_SUM_DTYPE", "auto")
    if mode == "long":
        return False
    if mode == "decimal":
        return True
    return _SEEN_SF is None or _SEEN_SF > 1.0


def scaled_long(col: Column, k: int) -> Column:
    """Per-row fixed-point scaling: ``round(col * 10^k)`` as BIGINT."""
    return F.round(col * (10**k)).cast("long")


def sum_fixed(scaled: Column | str) -> Column:
    """Exact sum of an already-scaled fixed-point BIGINT column.

    Long mode returns the plain BIGINT sum (bit-identical to the
    pre-helper plans).  Wide mode sums in DECIMAL(38,0) and casts the
    result to double — the same value the BIGINT sum yields at the
    ``/ 10^k`` division sites, without the silent wraparound past
    9.2e18."""
    c = F.col(scaled) if isinstance(scaled, str) else scaled
    if wide_sums():
        return F.sum(c.cast("decimal(38,0)")).cast("double")
    return F.sum(c)
