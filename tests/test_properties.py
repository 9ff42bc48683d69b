"""Property-based tests (hypothesis) — randomized semantic checks of the
custom operators against brute-force reference implementations.

SURVEY.md §5.1 notes the reference's only randomized testing is its
synthetic-data scripts; here randomized inputs drive real assertions.
Hypothesis generates adversarial small cases (duplicate timestamps, empty
sides, single-key data) that fixed fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_bigdata_recsys_spark.operators.asof import asof_join

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=0,
    max_size=25,
)

_key = lambda t: tuple(-1 if x is None else x for x in t)  # noqa: E731


def brute_force_asof(left, right):
    """Per left row: payload of the latest right row with the same key and
    right_ts <= left_ts (right side pre-deduped per (key, ts))."""
    out = []
    for k, lts, lv in left:
        cand = [(rts, rv) for rk, rts, rv in right if rk == k and rts <= lts]
        out.append((k, lts, lv, max(cand)[1] if cand else None))
    return sorted(out, key=_key)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_asof_join_matches_brute_force(spark, left, right):
    # dedupe (key, ts) on the right so "the latest right row at a given
    # instant" is unique and both implementations must agree exactly
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())

    ldf = spark.createDataFrame(left or [(0, 0, 0)], "k long, ts long, v long")
    if not left:
        ldf = ldf.limit(0)
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, ts long, rv long")
    if not right:
        rdf = rdf.limit(0)

    got = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts", right_payload=["rv"])
    got_rows = sorted(
        ((r.k, r.ts, r.v, r.asof_rv) for r in got.collect()), key=_key
    )
    assert got_rows == brute_force_asof(left, right)
