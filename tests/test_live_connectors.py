"""Live Iceberg / Kafka integration — armed, skipped until the jars land.

This container ships neither the Iceberg Spark runtime nor the
spark-sql-kafka connector, so the engine's M1–M4 mutations run through
the proven DataFrame emulation and the streaming queries run against
file/memory sinks. These tests exercise the REAL paths — Iceberg
``MERGE INTO`` with snapshot isolation, ``writeStream.format("kafka")``
with per-row topic routing — and skip cleanly today. The day the
environment provides the jars (and, for Kafka, a reachable broker via
$KAFKA_BOOTSTRAP_SERVERS), they light up with no code changes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.session import iceberg_available
from ai_iceberg_demo_spark.sources.files import kafka_available
from tests.conftest import SF_DIR


def test_iceberg_merge_into_matches_emulation(spark, tmp_path):
    """Real MERGE INTO (M1) on an Iceberg table equals merge_into()."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on classpath")
    from ai_iceberg_demo_spark.operators.mutations import merge_into, merge_into_table_sql
    from ai_iceberg_demo_spark.tables import load_table

    # catalogs instantiate lazily, so runtime conf is enough
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))

    target = load_table(spark, "orders", SF_DIR).filter(F.col("o_orderkey") <= 200)
    source = target.filter(F.col("o_orderkey") <= 50).withColumn(
        "o_orderstatus", F.lit("U")
    ).unionByName(
        target.filter(F.col("o_orderkey") <= 10).withColumn(
            "o_orderkey", F.col("o_orderkey") + 1_000_000
        )
    )
    spark.sql("DROP TABLE IF EXISTS it.db.m1")
    target.writeTo("it.db.m1").create()
    merge_into_table_sql(
        spark, "it.db.m1", source, keys=["o_orderkey"],
        update_cols=[c for c in target.columns if c != "o_orderkey"],
    )
    live = spark.table("it.db.m1")
    emulated = merge_into(
        target, source, keys=["o_orderkey"],
        update_cols=[c for c in target.columns if c != "o_orderkey"],
    )
    assert live.count() == emulated.count()
    assert live.exceptAll(emulated).count() == 0
    assert emulated.exceptAll(live).count() == 0
    # snapshot isolation surface exists: the merge produced a snapshot
    assert spark.sql("SELECT COUNT(*) AS n FROM it.db.m1.snapshots").first()["n"] >= 2
    spark.sql("DROP TABLE IF EXISTS it.db.m1")


def test_kafka_roundtrip_envelope(spark, tmp_path):
    """Real writeStream.format('kafka') (S4) + Kafka source (S5): the
    routed envelope stream survives a broker roundtrip."""
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on classpath")
    if not os.environ.get("KAFKA_BOOTSTRAP_SERVERS"):
        pytest.skip("no broker: set KAFKA_BOOTSTRAP_SERVERS to run")
    from ai_iceberg_demo_spark.sources.files import (
        kafka_options_from_env,
        write_events_kafka,
    )
    from ai_iceberg_demo_spark.streaming.events import build_envelope, route_topic
    from ai_iceberg_demo_spark.tables import load_table

    events = load_table(spark, "events", SF_DIR).limit(100)
    payload = route_topic(build_envelope(events))
    # stream it: park the batch as files, read back as a file stream
    src_dir = str(tmp_path / "src")
    payload.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(payload.schema).parquet(src_dir)
    q = write_events_kafka(stream, checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    topics = [r["topic"] for r in payload.select("topic").distinct().collect()]
    back = (
        spark.read.format("kafka")
        .options(**kafka_options_from_env())
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", "earliest")
        .load()
    )
    assert back.count() >= 100
