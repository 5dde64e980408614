"""Sources & sinks — SURVEY.md §2.1 S4-S9.

The reference writes markdown reports to files
(`cli/run_interactive_research_workflow.py:200-202`), PDFs/images with
timestamped names (`pdf_generation_activity.py:94-106`,
`image_generation_activity.py:102-117`), produces JSON events to
Kafka/Redpanda with env-driven connector config
(`redpanda_activity.py:12-39,114-135`), and lists catalog indexes
(`neo4j_rag.py:130-139`).

Engine mapping: text/binary artifacts land in parquet tables (binary
columns — columnar, splittable, scannable), not loose files; a
single-file text render remains available for the report hand-off.
Kafka wiring is format("kafka") with per-row topic routing
(streaming.events.route_topic); the connector jar is absent in this
container, so ``kafka_available`` gates it and tests cover the option
builder + envelope only.

Scale notes: artifact writes partition by date in production
(writeTo(...).partitionedBy(days(ts))); binary payloads stay columnar.
``coalesce(1)`` renders are for single-report hand-off only — never on
the big path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_text_report(df: DataFrame, path: str, text_col: str = "report") -> None:
    """S6: render one text column to a single text file directory —
    the engine's `interactive_research_report.md` write (cli:200-202)."""
    df.select(F.col(text_col).cast("string").alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def write_artifacts(df: DataFrame, path: str) -> None:
    """S7: persist the binary artifact table (payload + typed metadata)
    as parquet — the engine's form of timestamped PDF/image file writes
    (pdf_generation_activity.py:94-106)."""
    df.write.mode("overwrite").parquet(path)


def read_artifacts(spark: SparkSession, path: str) -> DataFrame:
    """Read an artifact table back (binary payload column intact)."""
    return spark.read.parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest loose files as binary rows (path, modificationTime, length,
    content) — the bridge from the reference's file artifacts into the
    artifact table."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def list_catalog(spark: SparkSession) -> DataFrame:
    """S8: SHOW-TABLES surface (neo4j_rag.py:130-139 SHOW INDEXES)."""
    rows = [
        (t.catalog or "", t.namespace[0] if t.namespace else "", t.name, t.tableType)
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(rows, "catalog string, namespace string, name string, table_type string")


# ---------------------------------------------------------------------------
# Kafka (S4/S5/S9) — gated on the connector jar
# ---------------------------------------------------------------------------


def kafka_options_from_env(env: dict[str, str] | None = None) -> dict[str, str]:
    """S9 env-driven connector config (redpanda_activity.py:12-39):
    bootstrap servers split on ',' + per-element trim; optional SASL."""
    env = env if env is not None else dict(os.environ)
    servers = [s.strip() for s in env.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092").split(",")]
    opts = {"kafka.bootstrap.servers": ",".join(s for s in servers if s)}
    if env.get("KAFKA_SASL_USERNAME"):
        opts.update(
            {
                "kafka.security.protocol": env.get("KAFKA_SECURITY_PROTOCOL", "SASL_SSL"),
                "kafka.sasl.mechanism": env.get("KAFKA_SASL_MECHANISM", "SCRAM-SHA-256"),
                "kafka.sasl.jaas.config": (
                    "org.apache.kafka.common.security.scram.ScramLoginModule required "
                    f'username="{env["KAFKA_SASL_USERNAME"]}" '
                    f'password="{env.get("KAFKA_SASL_PASSWORD", "")}";'
                ),
            }
        )
    return opts


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def write_events_kafka(df: DataFrame, checkpoint: str, env: dict[str, str] | None = None):
    """S4: stream the event envelope to Kafka with per-row topic routing
    (columns `topic` + `value` from streaming.events). At-least-once —
    the reference's swallowed-failure producer (redpanda_activity.py:
    137-140) maps to checkpointed retries instead of data loss."""
    spark = df.sparkSession
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector jar not on classpath in this "
            "container; envelope/routing are oracle-checked in batch "
            "(t1_event_envelope, t2_topic_routing) and the stream runs "
            "against file/memory sinks in tests."
        )
    return (
        df.writeStream.format("kafka")
        .options(**kafka_options_from_env(env))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_events_kafka(spark: SparkSession, topic: str, env: dict[str, str] | None = None) -> DataFrame:
    """S5: Kafka source → parsed envelope (from_json with explicit
    schema — REDPANDA.md:167-186 consumer)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector jar not on classpath in this container."
        )
    from pyspark.sql.types import StringType, StructField, StructType

    envelope = StructType(
        [
            StructField("event_type", StringType()),
            StructField("workflow_id", StringType()),
            StructField("timestamp", StringType()),
        ]
    )
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_options_from_env(env))
        .option("subscribe", topic)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), envelope).alias("e")
    ).select("e.*")
