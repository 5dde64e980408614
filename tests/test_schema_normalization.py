"""Canonical-schema pin across fixture vintages (VERDICT r2 item 3).

Round 2 proved the driver regenerates fixtures between rounds: events.ts
silently changed from parquet TIMESTAMP(NANOS) to timestamp[us], which
Spark 4 reads as TIMESTAMP_NTZ — one physical-type drift, six broken
tests. tables.normalize_schema converts that class of churn into zero
failures by pinning every timestamp column to TIMESTAMP_LTZ at load.
These tests pin the pin: every table, at every sf, must present ONE
canonical logical schema, with no NTZ and no raw-long timestamps.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType, TimestampType

from ai_iceberg_demo_spark.tables import TABLE_NAMES, load_table, normalize_schema

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


def _type_names(schema: StructType) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_one_canonical_schema_across_sfs(spark, name):
    if len(SF_DIRS) < 2:
        pytest.skip("cross-sf comparison needs >= 2 fixture dirs")
    schemas = [_type_names(load_table(spark, name, d).schema) for d in SF_DIRS]
    for other in schemas[1:]:
        assert other == schemas[0], f"{name}: schema differs across sf dirs"


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_no_ntz_and_no_raw_long_ts_anywhere(spark, name):
    for d in SF_DIRS:
        for f in load_table(spark, name, d).schema.fields:
            assert not isinstance(f.dataType, TimestampNTZType), (
                f"{name}.{f.name} is TIMESTAMP_NTZ after load — normalize_schema regressed"
            )
            if f.name == "ts":
                assert isinstance(f.dataType, TimestampType), (
                    f"{name}.ts is {f.dataType.simpleString()}, want timestamp (LTZ)"
                )


def test_normalize_schema_converts_ntz_and_long_ts(spark):
    # Synthetic frames exercising each normalization arm directly.
    ntz = spark.range(1).select(
        F.timestamp_micros(F.lit(1_700_000_000_000_000)).cast("timestamp_ntz").alias("created"),
        F.lit(7).alias("other"),
    )
    out = normalize_schema(ntz)
    assert isinstance(out.schema["created"].dataType, TimestampType)
    assert out.schema["other"].dataType == ntz.schema["other"].dataType

    long_ts = spark.range(1).select(F.lit(1_700_000_000_000_000_000).alias("ts"))
    assert isinstance(long_ts.schema["ts"].dataType, LongType)
    out2 = normalize_schema(long_ts)
    assert isinstance(out2.schema["ts"].dataType, TimestampType)
    # nanos → micros by integer division: exact value survives
    assert out2.select(F.unix_timestamp("ts").alias("s")).first()["s"] == 1_700_000_000


def test_ntz_cast_is_wallclock_exact_under_utc(spark):
    # Session tz is pinned UTC (session.py): NTZ→LTZ must not shift.
    row = (
        spark.range(1)
        .select(F.to_timestamp(F.lit("2024-03-01 12:34:56")).cast("timestamp_ntz").alias("t"))
        .transform(normalize_schema)
        .select(F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .first()
    )
    assert row["s"] == "2024-03-01 12:34:56"


def test_stream_schema_matches_batch_schema(spark):
    from ai_iceberg_demo_spark.streaming.events import read_events_stream
    from tests.conftest import SF_DIR

    batch = load_table(spark, "events", SF_DIR).schema
    stream = read_events_stream(spark, SF_DIR).schema
    assert _type_names(stream) == _type_names(batch)
