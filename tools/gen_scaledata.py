"""Deterministic 10x scale-up of the driver's sf0.1 testdata (sf1 probe).

The 100-TB story is design-audited every round but measured only to
sf0.1; VERDICT r14 task 3 asks for a measured sf0.1 -> sf1 wall-time
ratio of the frozen bench subset.  The driver cannot hand us sf1 data,
so this tool derives it from the committed sf0.1 tables by replication
with remapping — the point is TIMING-faithful scale (10x rows, same
schema, same distribution shape, same key-join consistency, linear
group cardinalities), not oracle-grade content:

* region/nation stay fixed (TPC-H holds them constant across sf);
* customer/supplier/part/orders/lineitem/events take 10 copies with
  every key column offset by ``copy * stride`` (stride = the source
  key-space size), so intra-copy joins remain exactly as dense as the
  originals and distinct-key counts scale linearly;
* documents retag EVERY word per copy (``w`` -> ``w<i>``) — within-copy
  duplicate/near-duplicate structure is preserved verbatim (the same
  transform hits a dup group identically) while cross-copy token AND
  shingle overlap drop to zero, so near-dup candidates scale ~10x like
  a real corpus instead of ~100x like naive replication.  (The first
  cut mutated only every third word: enough to defeat shingle/Jaccard
  candidates, but simhash — robust to 1/3 token churn BY DESIGN —
  still banded all 10 copies together, and the probe read a spurious
  39x on the CC composition.  A 10x corpus is not 10 lightly-mutated
  replicas; zero cross-copy overlap is the faithful model.);
* embeddings are dimension-ROLLED per copy (np.roll by 5*copy) — a
  rotation is an isometry, so every within-copy dot product / cosine
  is bit-preserved (kNN structure intact) while cross-copy similarity
  drops to the vector's autocorrelation at that lag (the first cut's
  epsilon perturbation left cross-copy cosine at ~0.999: every vector
  gained 9 planted near-duplicates and the LSH kNN graph paid a
  spurious 73x in-bucket quadratic blowup);
* names (c_name/s_name/p_name) take a ``-<i>`` suffix so per-name
  windows keep per-entity row counts flat.

Everything is pure arithmetic on the source rows — no RNG — so the
output is bit-identical across runs.  Output schema is pinned to the
source parquet schema and each table lands as ONE parquet file (the
streaming replay's ``pathGlobFilter=events.parquet`` contract).

Usage:  python tools/gen_scaledata.py [out_dir] [copies]
        (default: <repo>/scaledata/sf1, 10 copies)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: key column -> stride source ("own" = that column's own max+1 in its
#: table; otherwise the named (table, column) key space it references).
KEY_REMAP = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}

NAME_SUFFIX = {
    "customer": ["c_name"],
    "supplier": ["s_name"],
    "part": ["p_name"],
}


def _mutate_text(text: str, copy: int) -> str:
    """Retag every word with the copy index: cross-copy token/shingle/
    simhash overlap is zero while in-copy duplicate relationships are
    untouched (a dup group mutates identically)."""
    tag = str(copy)
    return " ".join(w + tag for w in text.split(" "))


def _scale_table(name: str, copies: int) -> pa.Table:
    src_path = f"{SRC}/{name}.parquet"
    schema = pq.read_schema(src_path).remove_metadata()
    base = pd.read_parquet(src_path)
    if name in ("region", "nation"):
        return pa.Table.from_pandas(base, schema=schema, preserve_index=False)
    parts = []
    for i in range(copies):
        df = base.copy()
        for col, stride in KEY_REMAP.get(name, {}).items():
            df[col] = df[col] + i * stride
        if i > 0:
            for col in NAME_SUFFIX.get(name, []):
                df[col] = df[col] + f"-{i}"
            if name == "documents":
                df["text"] = [_mutate_text(t, i) for t in df["text"]]
                df["n_chars"] = df["text"].str.len().astype("int64")
            if name == "embeddings":
                df["embedding"] = [
                    np.roll(np.asarray(v, dtype="float32"), 5 * i)
                    for v in df["embedding"]
                ]
        parts.append(df)
    out = pd.concat(parts, ignore_index=True)
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaledata",
        "sf1",
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        table = _scale_table(name, copies)
        pq.write_table(table, f"{out_dir}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows", flush=True)
    print(f"wrote {out_dir} (copies={copies})")


if __name__ == "__main__":
    main()
