"""Scoped lifecycle for persisted frames.

Several operators persist() an intermediate frame that feeds multiple
consumers of ONE returned plan (e.g. the minhash signature frame feeds
the band explosion plus both sides of the signature re-join).  The
returned DataFrame is lazy, so the operator itself can never know when
the caller's action has run — unpersisting inside the builder would
defeat the cache before it is ever hit.

The contract here replaces round 2's "global ``clearCache()`` after
every query" band-aid: builders register every persist through
:func:`persist_tracked`, and the session owner (bench.py, a notebook, a
long-lived service) calls :func:`release_tracked` once the action has
materialized.  Only frames registered by this engine are touched —
unlike ``clearCache()``, caller-owned cached tables survive.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

# ---------------------------------------------------------------------------
# Scratch-dir registry: every temp dir this engine writes (stream
# checkpoints, merge staging, parquet-backed shared memos like the CC
# labeling / simhash-band / ANN indexes) registers here and is removed at
# process exit.  Removal must NOT happen mid-session: lazily-evaluated
# frames returned to callers may still read staged parquet after
# release_tracked(), and the shared memos are the whole point of the
# shared tier — so the lifecycle is process-scoped, which bounds /tmp
# growth to one run instead of accumulating across repeated sessions.
# ---------------------------------------------------------------------------

_SCRATCH: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp registered for removal at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH.append(d)
    return d


def scratch_dir_deferred(prefix: str) -> str:
    """mkdtemp NOT yet registered for the exit purge — for scratch that
    is the only recovery source until some commit point (the CoW
    merge's staging dir).  The caller MUST hand the path to
    :func:`track_scratch` once its commit completes; until then a
    failure deliberately leaves the directory on disk (that's the
    point), so an abandoned path is a recovery artifact, not a leak."""
    return tempfile.mkdtemp(prefix=prefix)


def track_scratch(path: str) -> str:
    """Register an EXISTING directory for the process-exit purge.

    The deferred twin of :func:`scratch_dir`, for callers whose scratch
    must survive a graceful exit until some commit point — e.g. the CoW
    merge's staging dir, which is the only recovery source if the
    directory swap dies halfway (registering it at creation would let a
    mid-swap exception + clean interpreter exit delete the one copy of
    the staged rows)."""
    _SCRATCH.append(path)
    return path


def _purge_scratch() -> None:
    while _SCRATCH:
        shutil.rmtree(_SCRATCH.pop(), ignore_errors=True)


atexit.register(_purge_scratch)


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for scoped release."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> int:
    """Unpersist every frame registered since the last release; returns
    how many were released.  Safe to call repeatedly; never touches
    caches this engine did not create."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


_SHARED: dict[str, DataFrame] = {}


def persist_shared(key: str, builder) -> DataFrame:
    """Keyed persist that SURVIVES :func:`release_tracked` — for frames
    deliberately shared across separately-invoked queries (e.g. the
    co-occurrence edge frame feeding both the classic and personalized
    PageRank gate queries; rebuilding it per query doubled the pair's
    bench cost).  ``builder`` runs only on the first request per key.

    If a session owner's block sweep dropped the cached blocks in the
    meantime, the frame stays registered — Spark re-materializes the
    InMemoryRelation on next action, so correctness never depends on the
    blocks being resident."""
    df = _SHARED.get(key)
    if df is None:
        df = builder().persist()
        _SHARED[key] = df
    return df


def release_shared() -> int:
    """Unpersist every shared frame; returns how many were released.
    Session owners (bench.py, tools/check_oracle.py) call this at END of
    run — NOT between queries, which is the whole point of the tier."""
    n = 0
    for df in list(_SHARED.values()):
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _SHARED.clear()
    return n
