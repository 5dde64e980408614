"""SparkSession factory.

One session for the whole engine. Local mode for tests (``local[N]``,
one JVM); the same builder config is what we'd ship to a 1000-executor
cluster — AQE on (runtime coalescing + skew-join handling), Arrow
enabled for every Python seam, UTC session timezone so results are
comparable with external engines (DuckDB oracle, Iceberg snapshots).

Iceberg: the production table format is Apache Iceberg (the reference
demo's namesake). The runtime jar is not present in this container, so
``iceberg_available()`` gates every Iceberg-specific code path
(MERGE INTO / UPDATE / time travel); the engine transparently falls
back to pure-DataFrame merge emulation over parquet
(see ``ai_iceberg_demo_spark.operators.mutations``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle parallelism should track cluster cores, not the 200 default.
# On the 100 TB cluster this is set to ~2-3x total executor cores; AQE
# coalesces small post-shuffle partitions back down at runtime.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "ai_iceberg_demo_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or return) the engine's SparkSession.

    Config notes for scale:
    - ``spark.sql.adaptive.enabled``: runtime re-plan — coalesce tiny
      shuffle partitions, convert sort-merge→broadcast when a side
      turns out small, split skewed partitions.
    - ``spark.sql.shuffle.partitions``: sized to cores locally; on a
      real cluster this is a floor — AQE adjusts downward.
    - ``spark.sql.files.maxPartitionBytes`` left at 128m: at 100 TB
      that is ~800k input splits, which is the right granularity for
      1000 executors.
    - Arrow on: every pandas_udf / applyInPandas / toPandas crossing
      is columnar-batched instead of row-pickled.
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath.

    The engine's mutation layer uses Iceberg ``MERGE INTO`` when this
    is true and falls back to DataFrame merge emulation when not.
    """
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False
