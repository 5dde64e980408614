"""Structured Streaming smoke: the batch-checked transform bodies run
under readStream → memory sink and produce the same aggregates."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_iceberg_demo_spark.streaming.events import (
    streaming_tumbling_counts,
    tumbling_counts,
)
from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR


def test_streaming_tumbling_matches_batch(spark):
    agg = streaming_tumbling_counts(spark, SF_DIR)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM stream_out").toPandas()
    batch = tumbling_counts(load_table(spark, "events", SF_DIR)).toPandas()
    key = ["window_start", "event_type"]
    s = streamed.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b) > 0
    assert (s["n"].to_numpy() == b["n"].to_numpy()).all()


def test_stream_filter_routing_runs_incrementally(spark):
    """route_topic + filter as a streaming map — the T2/T3 consumer path."""
    from ai_iceberg_demo_spark.streaming.events import (
        filter_event_types,
        read_events_stream,
        route_topic,
    )

    stream = read_events_stream(spark, SF_DIR)
    routed = route_topic(filter_event_types(stream, "ick")).select(
        "event_id", "event_type", "topic"
    )
    q = routed.writeStream.outputMode("append").format("memory").queryName("routed_out").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM routed_out").toPandas()
    assert len(out) > 0
    assert set(out["topic"]) == {"app.engagement"}
