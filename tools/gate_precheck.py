"""Regenerate PRECHECK_r{N}_gate.json evidence for the current gate.

Runs the driver-gate replica (tools/check_oracle.py) on the FIRST 50
``queries()`` entries — exactly the window the driver checks — parses
the per-query results, and writes a structured evidence file so every
window rotation / tail insertion lands with committed check output
instead of an unverifiable "PRE-VERIFIED" annotation (the r12 honesty
rule).

    python tools/gate_precheck.py [out_json] [--what "context sentence"]

Defaults: out_json = PRECHECK_r15_gate.json in the repo root (bump per
round — r13/r14 files are HISTORICAL evidence, never overwrite them); the
``what`` sentence should say which wave/rotation this run covers.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_gate_precheck(
    out_path: str,
    what: str,
    sf_dir: str = "/root/testdata/sf0.01",
    date: str | None = None,
) -> dict:
    from project_bigdata_recsys_spark.plans.queries import QUERIES

    window = list(QUERIES)[:50]
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir, *window],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    out = proc.stdout
    versions = {}
    m = re.search(r"VERSIONS (\{.*\})", out)
    if m:
        versions = json.loads(m.group(1))
    queries: dict[str, dict] = {}
    for name in window:
        mm = re.search(
            rf"^(ok|FAIL|rows) +{re.escape(name)}[: ].*?"
            rf"(?:(\d+) rows )?\(([\d.]+)s\)",
            out,
            re.M,
        )
        if mm:
            # 'rows' is check_oracle's prefix for rows-only entries;
            # normalize to the name sweep_evidence.py writes so the two
            # evidence formats agree (ADVICE r13).
            status = {"ok": "ok", "rows": "rows-only"}.get(
                mm.group(1), mm.group(1)
            )
            queries[name] = {
                "status": status,
                "rows": int(mm.group(2)) if mm.group(2) else None,
                "sec": float(mm.group(3)),
            }
        else:
            # FAIL lines that die before timing (e.g. a raise inside the
            # query builder) carry no '(N.Ns)' suffix — still a FAIL,
            # not MISSING (ADVICE r13).
            mf = re.search(rf"^FAIL +{re.escape(name)}[: ]", out, re.M)
            queries[name] = {"status": "FAIL" if mf else "MISSING"}
    tail = re.search(r"(\d+) ok, (\d+) fail, (\d+) rows-only", out)
    doc = {
        "what": what,
        "sf_dir": sf_dir,
        "date": date or __import__("datetime").date.today().isoformat(),
        "result": (
            f"{tail.group(1)} ok, {tail.group(2)} fail,"
            f" {tail.group(3)} rows-only"
            if tail
            else "PARSE ERROR"
        ),
        "engine_versions": versions,
        "note": (
            "builder-local evidence; the rotation counts once the"
            " driver's CORRECTNESS_rN.json is green"
        ),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    return doc


if __name__ == "__main__":
    args = sys.argv[1:]
    what = "local replica of the driver gate on the current _GATE_WINDOW"
    if "--what" in args:
        i = args.index("--what")
        what = args[i + 1]
        del args[i : i + 2]
    out = args[0] if args else os.path.join(REPO, "PRECHECK_r15_gate.json")
    doc = run_gate_precheck(out, what)
    print(doc["result"])
    bad = [k for k, v in doc["queries"].items() if v.get("status") != "ok"]
    print("non-ok:", bad)
    raise SystemExit(1 if bad else 0)
