"""Ingest-layer tests (SURVEY.md §2.1): tolerant CSV, upsert semantics,
synthetic generators; multimodal binary-column plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.sources.ingest import (
    USERS_SCHEMA,
    mutate_with_noise,
    read_csv_tolerant,
    synthetic_interactions,
    upsert_append,
)
from project_bigdata_recsys_spark.sources.multimodal import (
    extract_media_features,
    media_profile,
    synthesize_media_table,
)
from tests.conftest import SF_SMALL


def test_csv_tolerant_coercion_and_row_drop(spark, tmp_path):
    """Bad field -> NULL (reference parse_birth_year); bad PK -> row drop."""
    p = tmp_path / "users.csv"
    p.write_text(
        "user_id,gender,education,birth_year\n"
        "1,M,Bachelor,1997\n"
        "2,F,Master,not_a_year\n"     # bad field -> NULL birth_year
        "not_an_id,M,PhD,1990\n"      # bad PK -> drop row
        "4,F,,1985\n"
    )
    df = read_csv_tolerant(spark, str(p), USERS_SCHEMA, ["user_id"])
    rows = {r.user_id: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2].birth_year is None
    assert rows[1].birth_year == 1997


def test_upsert_first_writer_wins(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id long, payload string"
    )
    incoming = spark.createDataFrame(
        [(2, "CHANGED"), (3, "c"), (3, "c-dup")], "user_id long, payload string"
    )
    out = upsert_append(existing, incoming, ["user_id"]).orderBy("user_id").collect()
    assert [r.user_id for r in out] == [1, 2, 3]
    assert out[1].payload == "b"  # conflict -> DO NOTHING (first writer wins)


def test_synthetic_generator_deterministic(spark):
    a = synthetic_interactions(spark, n=500, seed=42).collect()
    b = synthetic_interactions(spark, n=500, seed=42).collect()
    assert a == b
    labels = {r.truth for r in a}
    assert labels == {0, 1}


def test_mutate_with_noise_clamps_and_flips(spark):
    df = synthetic_interactions(spark, n=500, seed=1)
    mutated = mutate_with_noise(
        df, ["action_play_video"], label_col="truth", seed=7
    )
    assert mutated.filter(F.col("action_play_video") < 0).count() == 0
    assert mutated.count() == df.count()


def test_media_features_deterministic_and_pruned(spark):
    media = synthesize_media_table(spark, SF_SMALL)
    feats = extract_media_features(media)
    n = media.count()
    assert feats.count() == n
    # checksum survives the Arrow round-trip
    joined = feats.join(media.select("media_id", F.col("checksum").alias("c0")), "media_id")
    assert joined.filter("checksum <> c0").count() == 0
    prof = media_profile(spark, SF_SMALL).collect()
    assert {r.media_type for r in prof} == {"image", "audio", "video"}
    assert sum(r.n_media for r in prof) == n


def test_resize_media_deterministic(spark):
    from project_bigdata_recsys_spark.sources.multimodal import (
        resize_media,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, SF_SMALL).limit(20)
    resized = resize_media(media, width=8, height=8)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(r.n_bytes == 64 and len(bytes(r.payload)) == 64 for r in rows)
    # deterministic: same input -> same bytes
    again = {r.media_id: bytes(r.payload) for r in resize_media(media, 8, 8).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_sample_frames_fanout(spark):
    from pyspark.sql import functions as F

    from project_bigdata_recsys_spark.sources.multimodal import (
        sample_frames,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, SF_SMALL)
    n_videos = media.filter(F.col("media_type") == "video").count()
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == n_videos * 4
    per = frames.groupBy("media_id").count()
    assert per.filter("count != 4").count() == 0


def test_documents_ascii_so_video_oracle_valid(spark):
    """The video_frame_profile oracle windows VARCHAR text where the Spark
    kernel windows UTF-8 bytes; equal only while the corpus is ASCII with
    payloads >= 4 bytes.  Assert that precondition on the driver data."""
    from project_bigdata_recsys_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    bad = docs.filter(
        (F.length(F.encode(F.col("text"), "UTF-8")) != F.length("text"))
        | F.col("text").isNull()
        | (F.length("text") < 4)
    ).count()
    assert bad == 0


def test_read_jsonl_tolerant_drops_corrupt_and_bad_pk(spark, tmp_path):
    """Corrupt JSON lines and NULL/absent/mistyped PKs must drop; good
    rows survive with bad FIELDS (not PKs) coerced to NULL."""
    from project_bigdata_recsys_spark.sources.ingest import read_jsonl_tolerant

    p = tmp_path / "in"
    p.mkdir()
    (p / "part-0.json").write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "good", "lang": "en"}',
                '{"doc_id": 2, "text": 42, "lang": "en"}',   # bad field type
                '{"doc_id": 3, "text": "trunc',               # corrupt line
                '{"doc_id": null, "text": "no pk"}',          # NULL PK
                '{"text": "absent pk"}',                      # missing PK
            ]
        )
        + "\n"
    )
    schema = "doc_id long, text string, lang string"
    out = {r.doc_id: r for r in read_jsonl_tolerant(spark, str(p), schema, ["doc_id"]).collect()}
    assert set(out) == {1, 2}
    assert out[1].text == "good"
    assert out[2].text == "42"  # JSON number stringified, row kept (PK intact)
