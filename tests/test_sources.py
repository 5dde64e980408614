"""Sources/sinks smoke — S6/S7/S8/S9 (+ Kafka gating)."""

from __future__ import annotations

import pytest

from ai_iceberg_demo_spark.multimodal.artifacts import artifact_table
from ai_iceberg_demo_spark.sources.files import (
    kafka_available,
    kafka_options_from_env,
    list_catalog,
    read_artifacts,
    read_binary_files,
    write_artifacts,
    write_events_kafka,
    write_text_report,
)
from tests.conftest import SF_DIR


def test_artifact_roundtrip(spark, tmp_path):
    a = artifact_table(spark, SF_DIR).limit(20)
    path = str(tmp_path / "artifacts")
    write_artifacts(a, path)
    back = read_artifacts(spark, path)
    assert back.count() == 20
    assert dict(back.dtypes)["payload"] == "binary"
    orig = {r.doc_id: bytes(r.payload) for r in a.collect()}
    got = {r.doc_id: bytes(r.payload) for r in back.collect()}
    assert orig == got


def test_text_report_write(spark, tmp_path):
    df = spark.createDataFrame([("# Report\n\nDone.",)], "report string")
    path = str(tmp_path / "report_out")
    write_text_report(df, path)
    files = list((tmp_path / "report_out").glob("part-*"))
    assert len(files) == 1  # coalesce(1): single hand-off file
    assert "# Report" in files[0].read_text()


def test_read_binary_files(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\x00\x01payload")
    df = read_binary_files(spark, str(tmp_path), "*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x00\x01payload"


def test_list_catalog_sees_registered_views(spark):
    spark.range(1).createOrReplaceTempView("catalog_probe_view")
    names = {r.name for r in list_catalog(spark).collect()}
    assert "catalog_probe_view" in names


def test_kafka_options_env_parsing():
    opts = kafka_options_from_env({"KAFKA_BOOTSTRAP_SERVERS": " b1:9092 , b2:9092,"})
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    sasl = kafka_options_from_env(
        {"KAFKA_BOOTSTRAP_SERVERS": "b:9092", "KAFKA_SASL_USERNAME": "u", "KAFKA_SASL_PASSWORD": "p"}
    )
    assert sasl["kafka.sasl.mechanism"] == "SCRAM-SHA-256"
    assert 'username="u"' in sasl["kafka.sasl.jaas.config"]


def test_kafka_write_gated_without_connector(spark):
    if kafka_available(spark):
        pytest.skip("kafka connector present; gate not reachable")
    df = spark.readStream.format("rate").load()
    with pytest.raises(NotImplementedError, match="kafka"):
        write_events_kafka(df, "/tmp/ckpt")


def test_partition_plan_identities(spark):
    """s16: per-col rows must total the corpus, skew >= 1, file counts
    consistent with the byte threshold, and the fixture's small keys
    must flag small_files_risk (kilobyte-scale keys vs a 128 MiB
    target)."""
    from ai_iceberg_demo_spark.operators.scans_filters import s16_partition_plan
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = s16_partition_plan(spark, SF_DIR).collect()
    assert {r["part_col"] for r in rows} == {"source", "lang"}
    n_docs = load_table(spark, "documents", SF_DIR).count()
    for r in rows:
        assert r["total_rows"] == n_docs
        assert r["skew_ratio"] >= 1.0
        assert r["max_key_rows"] <= r["total_rows"]
        assert (r["files_for_largest_key"] > 1) == r["needs_intra_key_split"]
        assert r["small_files_risk"] is True  # fixture keys are tiny


def test_props_schema_drift_classifies_the_planted_key(spark):
    """s17: the planted post-deploy key must classify as 'added' with
    pct_early == 0 and a plausible late rate (~1/9 of late rows); the
    natural key 'k' must be 'stable' at 100% in both periods."""
    from ai_iceberg_demo_spark.operators.scans_filters import s17_props_schema_drift
    from tests.conftest import SF_DIR

    rows = {r["key"]: r for r in s17_props_schema_drift(spark, SF_DIR).collect()}
    assert set(rows) == {"k", "session_v2"}
    v2 = rows["session_v2"]
    assert v2["verdict"] == "added"
    assert v2["pct_early"] == 0.0
    assert 0.05 < v2["pct_late"] < 0.18
    k = rows["k"]
    assert k["verdict"] == "stable"
    assert k["pct_early"] == 1.0 and k["pct_late"] == 1.0
