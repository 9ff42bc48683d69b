"""Measured sf0.1 -> sf1 scale probe of the frozen bench subset.

VERDICT r14 task 3: the 100-TB claims rest on per-operator design
audits; this converts them to measurement at one decade of scale.  It
times the 30-entry FROZEN_SUBSET (bench.py — the composition-stable
comparison axis) twice in one session: at the driver's sf0.1 and at
the 10x derived sf1 (tools/gen_scaledata.py), using bench.py's exact
methodology — settle wait, codegen warmup at sf0.001, the
nightly-build shared artifacts prepared per sf before timing, the same
count()/collect() materialization, and the same inter-query cache
release with the _SHARE_WITH_NEXT exemption.

Interpretation contract (written into the artifact): rows grow 10x, so
a perfectly linear operator shows ratio <= ~10 (usually well under —
fixed job-scheduling overhead dominates sub-second sf0.1 entries); the
probe flags any entry whose wall-time ratio exceeds FLAG_RATIO (15 —
10x rows + 50% headroom) as super-linear-suspect for root-causing.
Output-row ratios are recorded next to time ratios so legitimately
super-linear OUTPUT (a pair query whose planted duplicate groups grow)
is distinguishable from super-linear COMPUTE.

Usage:  python tools/scale_probe.py [sf1_dir] [out_json]
        (defaults: <repo>/scaledata/sf1, SCALEPROBE_r15.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _SHARE_WITH_NEXT, FROZEN_SUBSET
from project_bigdata_recsys_spark.caching import release_shared, release_tracked
from project_bigdata_recsys_spark.plans.queries import QUERIES
from project_bigdata_recsys_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
FLAG_RATIO = 15.0

#: r16 extension (VERDICT r15 task 7): the index/stream families whose
#: sf0.1 costs are dominated by fixed job structure are exactly the ones
#: that must PROVE O(batch)/linear behavior at 10x rows — the frozen
#: subset alone only covers the relational cost classes.
EXTRA_SUBSET = [
    "containment_index_pairs",
    "containment_batch_probe",
    "stream_containment_index",
    "knn_ivf_pq",
    "ivf_pq_recall_profile",
    "ivf_pq_incremental_knn",
    "ivf_pq_nprobe_sweep",
    "stream_zipf_fit",
    "stream_domain_quota",
    "stream_kmv_distinct",
]


def _sweep(spark) -> None:
    release_tracked()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def _prepare_shared(spark, sf_dir: str) -> float:
    """The nightly-build shared artifacts bench.py prepares before
    timing (minus the semantic-dedup stream index — its sole consumer
    is not in the frozen subset).  Returns the build wall time: at 10x
    it is itself scale evidence for the shared tier."""
    from project_bigdata_recsys_spark.functions.dedup import (
        shared_components,
        shared_minhash_signatures,
        shared_simhash_bands,
    )
    from project_bigdata_recsys_spark.functions.graph import (
        shared_cooccurrence_edges,
        shared_oriented_edges,
    )

    t0 = time.time()
    shared_simhash_bands(spark, sf_dir)
    shared_components(spark, sf_dir).count()
    shared_minhash_signatures(spark, sf_dir).count()
    shared_cooccurrence_edges(spark, sf_dir).count()
    shared_oriented_edges(spark, sf_dir).count()
    return round(time.time() - t0, 3)


def _time_subset(spark, sf_dir: str, names=None) -> tuple[dict, dict]:
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in (names or FROZEN_SUBSET):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n = df.count() if name != "knn_brute_force" else len(df.collect())
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
        print(
            f"[probe {sf_dir}] {name}: {timings[name]}s {n} rows",
            file=sys.stderr,
            flush=True,
        )
        if name not in _SHARE_WITH_NEXT:
            _sweep(spark)
    return timings, rows


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "scaledata", "sf1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "SCALEPROBE_r16.json"
    )
    settle_max, settle_load, settle_wait = 240.0, 3.0, 0.0
    while settle_wait < settle_max and os.getloadavg()[0] > settle_load:
        time.sleep(5)
        settle_wait += 5
    load_start = os.getloadavg()[0]
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's codegen warmup, verbatim (sf0.001 — never a benched sf)
    QUERIES["label_histogram"](spark, "/root/testdata/sf0.001").collect()
    for warm_q in ("knn_graph", "knn_ivf_lloyd", "simhash_near_pairs"):
        QUERIES[warm_q](spark, "/root/testdata/sf0.001").collect()
    _sweep(spark)

    result: dict = {
        "what": (
            "frozen-subset wall time at driver sf0.1 vs derived sf1 "
            "(10x rows, tools/gen_scaledata.py) — same session, "
            "bench.py methodology"
        ),
        "date": time.strftime("%Y-%m-%d"),
        "sf1_dir": sf1_dir,
        "flag_ratio": FLAG_RATIO,
        "loadavg_start": round(load_start, 2),
        "settle_wait_sec": settle_wait,
    }

    result["prep_sec_sf0.1"] = _prepare_shared(spark, SF01)
    t01, r01 = _time_subset(spark, SF01)
    e01, er01 = _time_subset(spark, SF01, EXTRA_SUBSET)
    result["prep_sec_sf1"] = _prepare_shared(spark, sf1_dir)
    t1, r1 = _time_subset(spark, sf1_dir)
    e1, er1 = _time_subset(spark, sf1_dir, EXTRA_SUBSET)
    t01 = {**t01, **e01}; r01 = {**r01, **er01}
    t1 = {**t1, **e1}; r1 = {**r1, **er1}
    release_shared()

    queries = {}
    flagged = []
    for name in (*FROZEN_SUBSET, *EXTRA_SUBSET):
        ratio = round(t1[name] / t01[name], 2) if t01[name] else None
        row_ratio = round(r1[name] / r01[name], 2) if r01[name] else None
        entry = {
            "sf0.1_sec": t01[name],
            "sf1_sec": t1[name],
            "time_ratio": ratio,
            "sf0.1_rows": r01[name],
            "sf1_rows": r1[name],
            "row_ratio": row_ratio,
        }
        if ratio is not None and ratio > FLAG_RATIO:
            entry["flag"] = "super-linear-suspect"
            flagged.append(name)
        queries[name] = entry
    result["queries"] = queries
    result["extra_subset"] = EXTRA_SUBSET
    result["total_sf0.1_sec"] = round(sum(t01.values()), 3)
    result["total_sf1_sec"] = round(sum(t1.values()), 3)
    result["total_ratio"] = round(
        result["total_sf1_sec"] / result["total_sf0.1_sec"], 2
    )
    result["flagged"] = flagged
    result["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(
        json.dumps(
            {
                "total_sf0.1_sec": result["total_sf0.1_sec"],
                "total_sf1_sec": result["total_sf1_sec"],
                "total_ratio": result["total_ratio"],
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
