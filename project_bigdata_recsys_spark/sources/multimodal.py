"""Multimodal binary-column plumbing (SURVEY.md §2.12).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` passes.  The decode kernels themselves are
STUBBED (no image/audio libs in this container — see ``decode_image``),
but everything Spark-side is real and tested: schema, batch iteration,
partition-parallel execution, metadata extraction.

Scale: mapInPandas streams Arrow record batches through Python — payload
bytes are never row-pickled; a 100 TB binary corpus processes at partition
parallelism with per-batch (not per-row) Python overhead.  Keep binary
payloads in their own column so column pruning skips them for
metadata-only queries.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from project_bigdata_recsys_spark.catalog import load_table

#: Typed metadata carried beside every binary payload.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("crc32", LongType()),
        StructField("entropy_bucket", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB — real deployments decode with PIL/opencv/ffmpeg here.  The
    container ships no media libraries, so actual decoding raises; the
    deterministic feature path below never calls this."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; swap this stub for PIL.Image.open(io.BytesIO(payload))"
    )


def synthesize_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media corpus: each document's text bytes stand in
    for an encoded payload.  Gives the binary-column pipeline real bytes
    with reproducible content at every scale factor."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-batch kernel is where decode/resize/frame-sample plugs in; the
    shipped kernel computes deterministic stand-ins (crc32, a byte-entropy
    bucket) so the full pipeline is testable without media libs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            crc = payloads.map(lambda b: zlib.crc32(bytes(b)) & 0xFFFFFFFF)
            # entropy bucket: distinct-byte count quantized to 0..15 — the
            # deterministic stand-in for a decoded-content feature
            ent = payloads.map(lambda b: min(15, len(set(bytes(b))) // 16))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                    "crc32": crc.astype("int64"),
                    "entropy_bucket": ent.astype("int32"),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per media type over the extracted features —
    metadata-only aggregate that (thanks to column pruning) never touches
    payload bytes when run on a stored media table."""
    feats = extract_media_features(synthesize_media_table(spark, sf_dir))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.countDistinct("checksum").alias("n_distinct"),
        )
        .orderBy("media_type")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize kernel over mapInPandas.  Real deployments decode + resample
    here (PIL/opencv — not in this container, see decode_image); the
    shipped kernel produces the deterministic stand-in: payload truncated
    or cycled to exactly width*height bytes.  The Spark-side contract —
    Arrow batches, binary column in/out, pinned schema — is identical to
    the real kernel's."""

    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(b: bytes) -> bytes:
                raw = bytes(b)
                if not raw:
                    return bytes(target)
                reps = -(-target // len(raw))  # ceil division
                return (raw * reps)[:target]

            payloads = pdf["payload"].map(fit)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_checksum", StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emit n equally-spaced byte
    windows per payload (the deterministic stand-in for ffmpeg keyframe
    extraction).  One input row fans out to n output rows inside the
    Arrow batch — the same row-expansion shape a real decoder has.

    Scale: mapInPandas keeps the fan-out executor-side; no shuffle is
    introduced, and downstream per-frame feature extraction parallelizes
    over the same partitions."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                window = max(1, len(raw) // max(1, n_frames))
                for i in range(n_frames):
                    frame = raw[i * window : (i + 1) * window] or b"\x00"
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame"].append(frame)
                    out["frame_checksum"].append(hashlib.sha256(frame).hexdigest()[:16])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .mapInPandas(kernel, schema=FRAMES_SCHEMA)
    )


def video_frame_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video frame-sample profile — the declared multimodal
    frame-extraction surface.  The byte-window stand-in is deterministic,
    so the driver oracle-checks it (ASCII corpus: char windows == byte
    windows, asserted in tests)."""
    media = synthesize_media_table(spark, sf_dir)
    frames = sample_frames(media, n_frames=4)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("total_frame_bytes"),
            F.countDistinct("frame_checksum").alias("distinct_frames"),
        )
        .orderBy("media_id")
    )


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY dedup: the digest-only-shuffle dedup family
    (functions/dedup.py) applied to opaque media payloads — group on
    sha2(payload) (the bytes never shuffle, only 32-byte digests + ids),
    keep the min media_id per digest, report per-media-type counts.

    The synthesized corpus ships no duplicate payloads, so verbatim
    copies are planted (media_id % 7 == 0 → re-id'd copy), exactly like
    the text-family gate queries; the oracle replicates the plant and
    the keep-min-id rule on payload equality."""
    from project_bigdata_recsys_spark.caching import persist_tracked

    media = synthesize_media_table(spark, sf_dir)
    planted = media.filter(F.col("media_id") % 7 == 0).withColumn(
        "media_id", F.col("media_id") + 5_000_000
    )
    corpus = media.unionByName(planted)
    # persist the digest projection (id, type, bytes, fp — the payload
    # itself never materializes in the cache): it feeds the winner
    # rollup, the keep semi-join, AND the per-type totals — each
    # consumer re-synthesized the payload corpus unmaterialized (§5)
    fp = persist_tracked(
        corpus.select(
            "media_id",
            "media_type",
            "n_bytes",
            F.sha2("payload", 256).alias("fp"),
        )
    )
    winners = fp.groupBy("fp").agg(F.min("media_id").alias("media_id"))
    kept = fp.join(winners, ["fp", "media_id"], "left_semi")
    totals = fp.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("n_bytes").alias("total_bytes"),
    )
    uniques = kept.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.min("media_id").alias("first_kept_id"),
    )
    return (
        totals.join(uniques, "media_type")
        .select(
            "media_type",
            "n_total",
            "n_unique",
            (F.col("n_total") - F.col("n_unique")).alias("n_dropped"),
            "total_bytes",
            "first_kept_id",
        )
        .orderBy("media_type")
    )
