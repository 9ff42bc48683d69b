"""ML pipeline parity tests (SURVEY.md §5.2.4): metric-level assertions
mirroring the reference's operational checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_bigdata_recsys_spark.ml.classifier import (
    stratified_split,
    train_classifier,
    training_frame,
)
from project_bigdata_recsys_spark.ml.recsys import (
    factors_as_json,
    latest_active_view,
    ledger_append,
    metric_drift,
    train_als,
)
from tests.conftest import SF_SMALL


def test_als_trains_and_exports_factors(spark):
    res = train_als(spark, SF_SMALL, rank=4, max_iter=3)
    assert res.user_factors.count() > 0
    assert res.item_factors.count() > 0
    row = res.user_factors.head()
    assert len(row.features) == 4
    # implicit-feedback eval sanity (reference logs rmse/mae, not thresholds)
    assert 0 < res.metrics["train_rmse"]
    assert 0 < res.metrics["test_mae"]
    js = factors_as_json(res.user_factors, "user_id").head()
    assert js.features_json.startswith("[")


def test_stratified_split_partitions_frame(spark):
    frame = training_frame(spark, SF_SMALL)
    train, test = stratified_split(frame, seed=42)
    total, ntr, nte = frame.count(), train.count(), test.count()
    assert ntr + nte == total
    assert 0.6 < ntr / total < 0.95
    # both labels present in the train split
    labels = {r.label for r in train.select("label").distinct().collect()}
    assert labels == {0.0, 1.0}


def test_classifier_beats_random(spark):
    res = train_classifier(spark, SF_SMALL, max_iter=5, max_depth=3)
    assert res.metrics["auc"] > 0.5
    assert res.metrics["logloss"] > 0
    assert 0 <= res.metrics["accuracy_at_0.6"] <= 1


def test_ledger_latest_wins_and_drift(spark):
    led = None
    for version, (auc, ts) in enumerate(
        [(0.70, "2024-01-01 00:00:00"), (0.80, "2024-02-01 00:00:00"), (0.76, "2024-03-01 00:00:00")]
    ):
        led = ledger_append(
            spark, led, "gbt", f"v{version}", {"auc": auc}, {"maxIter": 5}, ts
        )
    active = latest_active_view(led).collect()
    assert len(active) == 1 and active[0].model_version == "v2"
    drift = metric_drift(led, "auc").orderBy("model_version").collect()
    assert len(drift) == 2
    assert abs(drift[0].drift_pct - round((0.80 - 0.70) / 0.70 * 100, 4)) < 1e-6
    assert drift[1].drift_pct < 0  # regression v1 -> v2 is visible


def test_als_model_save_load_roundtrip(spark, tmp_path):
    """S9/M13 artifact persistence: a saved ALS model reloads and
    produces identical factors (the reference pickles artifacts and
    hot-reloads on mtime; MLlib's save/load is the engine-native form)."""
    from pyspark.ml.recommendation import ALSModel

    from project_bigdata_recsys_spark.ml.recsys import train_als

    result = train_als(spark, SF_SMALL, rank=4, max_iter=3, evaluate=False)
    path = str(tmp_path / "als_model")
    result.model.save(path)
    loaded = ALSModel.load(path)
    orig = {r.id: list(r.features) for r in result.model.userFactors.collect()}
    re = {r.id: list(r.features) for r in loaded.userFactors.collect()}
    assert orig == re


def test_versioned_artifacts_retention(spark, tmp_path):
    """M13: versioned artifact dirs accumulate until keep_n, then the
    oldest (name-ascending) are pruned — reference
    core-logic/train_module.py:160-204 semantics."""
    import json
    import os

    from project_bigdata_recsys_spark.ml.recsys import (
        cleanup_old_versions,
        save_versioned_artifacts,
        train_als,
    )

    result = train_als(spark, SF_SMALL, rank=4, max_iter=2, evaluate=False)
    result.metrics = {"train_rmse": 1.0}
    base = str(tmp_path / "versions")
    os.makedirs(base)
    for i in range(4):
        vdir = save_versioned_artifacts(result, base, f"v000{i}", keep_n=3)
        assert os.path.isdir(os.path.join(vdir, "als_model"))
        assert os.path.isdir(os.path.join(vdir, "user_factors.parquet"))
        assert os.path.isdir(os.path.join(vdir, "item_factors.parquet"))
        with open(os.path.join(vdir, "metrics.json")) as f:
            assert json.load(f) == {"train_rmse": 1.0}
    kept = sorted(os.listdir(base))
    assert kept == ["v0001", "v0002", "v0003"]  # v0000 pruned at the 4th save

    # factor tables reload readable from the latest version
    re = spark.read.parquet(os.path.join(base, "v0003", "user_factors.parquet"))
    assert re.count() == result.user_factors.count()
    assert cleanup_old_versions(base, keep_n=1) == ["v0002", "v0001"]
    assert sorted(os.listdir(base)) == ["v0003"]
