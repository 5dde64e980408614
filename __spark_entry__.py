"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``ai_iceberg_demo_spark``; every operator from
SURVEY.md §2 registers itself (query fn + DuckDB oracle SQL) in its
module's Registry, and this file just aggregates them.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd — for this
# process and (via PYTHONPATH) for any executor Python workers the JVM
# spawns after this import. UDF closures are additionally written
# self-contained (serialized by value) so they survive even workers
# spawned from a pre-existing JVM that never saw this env var.
import os  # noqa: E402

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")

from ai_iceberg_demo_spark.registry import all_registries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The conversation-timeline listing (SURVEY.md §7 step 1): scan +
    parent-child join + per-group agg/last-item + newest-first
    pagination in one plan.
    """
    from ai_iceberg_demo_spark.operators.timeline import flagship_timeline

    return flagship_timeline(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_registries().queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return all_registries().oracle_sql()
