"""Spark 4 Python DataSource surface (pyspark.sql.datasource).

The modern extension point for sources Spark has no built-in reader for
— REST feeds, vendor SDKs, custom binary formats — is a Python
``DataSource``: schema + partition planning on the driver, per-partition
generators on executors (Arrow-batched back to the JVM).  This module
ships the deterministic synthetic-interactions generator
(sources/ingest.py::synthetic_interactions, reference
scripts/add_synthetic_data.py:29-140) through that API, which buys a
strong correctness statement for the whole surface: the Python reader
must yield BIT-IDENTICAL rows to the SQL-expression generator, so the
gate query shares ``synthetic_interactions``'s DuckDB oracle verbatim —
the three implementations (pure-Python partitions, Catalyst column
expressions, DuckDB SQL) all agree row-for-row.

Scale: ``partitions()`` splits the id range into ``numPartitions``
independent slices, so generation parallelizes exactly like
``spark.range`` — no driver-side materialization, no single-task reads
(the classic custom-source mistake).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = (
    "user_id bigint, course_id string, truth int, "
    "action_play_video double, action_problem_check double, event_ts bigint"
)


def _uniform(row_id: int, tag: str, seed: int) -> float:
    """Pure-Python twin of ingest.hash_uniform: md5(salt || id) first 8
    hex chars over 2^32 — identical bits in Python, Spark, and DuckDB."""
    h = hashlib.md5(f"{seed}:{tag}:{row_id}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def _round2(x: float) -> float:
    """HALF_UP at 2 dp via Decimal(repr(x)) — the BigDecimal.valueOf
    twin (Spark F.round semantics; Python round() is banker's and would
    diverge)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticInteractionsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 5000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(
            options.get("numpartitions", options.get("numPartitions", 8))
        )

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _IdRange(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange):
        seed = self.seed
        for rid in range(partition.start, partition.end):
            ut = _uniform(rid, "tier", seed)
            tier = "high" if ut < 0.3 else ("mid" if ut < 0.7 else "low")
            up = _uniform(rid, "plays", seed)
            uc = _uniform(rid, "checks", seed)
            if tier == "high":
                plays, checks, pp = 50 + up * 150, 20 + uc * 80, 0.85
            elif tier == "mid":
                plays, checks, pp = 10 + up * 40, 5 + uc * 15, 0.60
            else:
                plays, checks, pp = up * 10, uc * 5, 0.30
            truth = 0 if _uniform(rid, "truth", seed) < pp else 1
            yield (
                rid % 1000,
                f"course-{rid % 200}",
                truth,
                _round2(plays),
                _round2(checks),
                1_700_000_000 + rid,
            )


class SyntheticInteractionsDataSource(DataSource):
    """``spark.read.format("synthetic_interactions")`` after
    ``spark.dataSource.register(SyntheticInteractionsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_interactions"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticInteractionsReader:
        return SyntheticInteractionsReader(self.options)

    def streamReader(self, schema) -> "SyntheticInteractionsStreamReader":
        return SyntheticInteractionsStreamReader(self.options)


class SyntheticInteractionsStreamReader(DataSourceStreamReader):
    """Python STREAMING DataSource reader for the same generator — the
    Spark-4 extension point for custom streaming sources (queue
    consumers, vendor event APIs).  Offsets are row positions; each
    ``latestOffset`` poll admits up to ``batchSize`` more rows (the
    admission-control contract a rate-limited production source
    implements), ``partitions(start, end)`` splits every micro-batch
    into ``numPartitions`` independent slices, and ``read`` reuses the
    exact-deterministic row generator — so a bounded replay is
    row-identical to the batch form and the DuckDB oracle.

    Note for bounded replays: ``trigger(availableNow=True)`` snapshots
    ONE ``latestOffset`` poll, so a full-corpus replay passes
    ``batchSize >= n``; incremental multi-batch consumption (the
    production shape) runs under a processing-time trigger — pinned in
    tests with a manual stop."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 5000))
        self.seed = int(options.get("seed", 42))
        self.batch_size = int(
            options.get("batchsize", options.get("batchSize", 1000))
        )
        self.num_partitions = int(
            options.get("numpartitions", options.get("numPartitions", 4))
        )
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._pos = min(self.n, self._pos + self.batch_size)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        if hi <= lo:
            return [_IdRange(lo, lo)]
        step = max(1, -(-(hi - lo) // self.num_partitions))
        return [
            _IdRange(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _IdRange):
        reader = SyntheticInteractionsReader(
            {"n": str(self.n), "seed": str(self.seed)}
        )
        return reader.read(partition)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _PartCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonlAuditWriter(DataSourceWriter):
    """Python DataSource WRITER with a real two-phase commit: each
    partition writes its rows to a uniquely-named staged ``.jsonl``
    part and returns a commit message; ``commit`` (driver-side, fires
    only when EVERY partition succeeded) publishes the manifest that
    makes the output visible, and ``abort`` removes the stage — the
    task-retry/speculation contract any exactly-once sink needs.
    Readers treat only manifest-listed parts as data, so a torn write
    is invisible by construction."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _PartCommit:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        part = _os.path.join(
            self.path, f"part-{pid:05d}-{_uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(part, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartCommit(path=part, n_rows=n)

    def commit(self, messages) -> None:
        import json as _json
        import os as _os

        manifest = {
            "parts": sorted(
                [{"path": m.path, "n_rows": m.n_rows} for m in messages],
                key=lambda d: d["path"],
            ),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(
            _os.path.join(self.path, "_MANIFEST.json"), "w", encoding="utf-8"
        ) as fh:
            _json.dump(manifest, fh)

    def abort(self, messages) -> None:
        import os as _os

        for m in messages:
            try:
                _os.remove(m.path)
            except OSError:
                pass


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir).save()``
    after ``spark.dataSource.register(JsonlAuditDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> JsonlAuditWriter:
        return JsonlAuditWriter(self.options, overwrite)
