"""Turn a full-registry check_oracle.py log into a SWEEP_r*.json
evidence file (the end-of-round sweep artifact the judge reads).

    python tools/check_oracle.py /root/testdata/sf0.01 > /tmp/sweep.log 2>&1
    python tools/sweep_evidence.py /tmp/sweep.log SWEEP_r13_full.json \
        --what "end-of-round full-registry local sweep" \
        --note "refreshed after <which change>" \
        --sum-mode "auto (long at sf<=1)"

Parses the ok/FAIL/rows lines plus the VERSIONS header and writes the
same structure the round-13 sweep files carry.
"""

from __future__ import annotations

import argparse
import json
import re


def make_sweep_json(
    log_path: str,
    out_path: str,
    what: str,
    note: str,
    sum_mode: str,
    sf_dir: str = "/root/testdata/sf0.01",
    date: str | None = None,
) -> dict:
    out = open(log_path).read()
    versions = {}
    m = re.search(r"VERSIONS (\{.*\})", out)
    if m:
        versions = json.loads(m.group(1))
    queries: dict[str, dict] = {}
    for mm in re.finditer(
        r"^(ok|rows) +(\S+?): (\d+) rows(?: \(rows-only)?.*?\(?([\d.]+)s\)",
        out,
        re.M,
    ):
        queries[mm.group(2)] = {
            "status": "ok" if mm.group(1) == "ok" else "rows-only",
            "rows": int(mm.group(3)),
            "sec": float(mm.group(4)),
        }
    tail = re.search(r"(\d+) ok, (\d+) fail, (\d+) rows-only", out)
    doc = {
        "what": what,
        "sum_mode": sum_mode,
        "sf_dir": sf_dir,
        "date": date or __import__("datetime").date.today().isoformat(),
        "result": (
            f"{tail.group(1)} ok, {tail.group(2)} fail,"
            f" {tail.group(3)} rows-only"
            if tail
            else "PARSE ERROR"
        ),
        "engine_versions": versions,
        "queries": queries,
        "note": note,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    return doc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("log_path")
    p.add_argument("out_path")
    p.add_argument("--what", required=True)
    p.add_argument("--note", required=True)
    p.add_argument("--sum-mode", default="auto (long at sf<=1)")
    a = p.parse_args()
    doc = make_sweep_json(a.log_path, a.out_path, a.what, a.note, a.sum_mode)
    print(doc["result"])
    fails = re.findall(r"^FAIL +(\S+)", open(a.log_path).read(), re.M)
    print("fails:", fails)
    raise SystemExit(1 if fails else 0)
