"""End-to-end pipeline test — the reference's full Airflow DAG
(recsys_pipeline: loads → training → streaming) as one Spark application,
asserted stage by stage from the returned manifest."""

from __future__ import annotations

from project_bigdata_recsys_spark.catalog import load_table
from project_bigdata_recsys_spark.pipeline import run_full_pipeline
from tests.conftest import SF_SMALL


def test_full_pipeline(spark, tmp_path):
    manifest = run_full_pipeline(spark, SF_SMALL, str(tmp_path / "run"))

    # ingest: upsert kept first-writer rows; second batch added only new PKs
    assert manifest["interactions_rows"] >= 1000

    # training: both models trained, ledger derives one active row each
    assert manifest["active_models"] == 2
    assert 0.0 < manifest["gbt_metrics"]["auc"] <= 1.0
    assert manifest["als_metrics"]["test_rmse"] > 0.0

    # streaming state: all (user, event_type) keys plus the snapshot-only key
    events = load_table(spark, SF_SMALL, "events")
    n_keys = events.select("user_id", "event_type").distinct().count()
    assert manifest["feature_state_rows"] >= n_keys

    # streamed scoring covered every order in the training frame
    assert manifest["scored_rows"] > 0
    assert manifest["feature_stream"]["rows"] > 0
