"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This is the same comparison the driver's correctness gate runs at
sf0.01 (row count + column names + order-insensitive value hash),
kept at the small sf so the suite stays fast.
"""

from __future__ import annotations

import duckdb
import pytest

from ai_iceberg_demo_spark.registry import all_registries
from tests.conftest import SF_DIR
from tools.oracle_check import TABLES, value_hash

SPECS = all_registries().specs


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


@pytest.fixture(scope="module", autouse=True)
def _drop_query_persists(spark):
    """The full-registry sweep builds each query's internal persists
    (d2/d5/d8/pipeline diamonds) fresh per call; free them when the
    module finishes so the rest of the suite doesn't carry ~140
    queries' worth of dead cached partitions."""
    yield
    spark.catalog.clearCache()
    from ai_iceberg_demo_spark.tables import clear_table_cache

    clear_table_cache(spark)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: runs and has a schema
        return
    odf = duck.execute(spec.oracle).df()
    assert len(sdf) == len(odf), f"row count {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), "order-insensitive value hash differs"


def test_no_oracle_emits_forbidden_duckdb_types():
    """No oracle may output HUGEINT/INT128 columns: pandas renders them
    as float64 while Spark emits BIGINT, so the driver's value-hash
    diverges even when every value matches (u19's r5 red row).  The
    lint DESCRIBEs every oracle — it catches the class, not just the
    instance."""
    from tools.oracle_check import lint_oracle_types

    hits = lint_oracle_types(SF_DIR)
    assert hits == [], f"oracles with forbidden output types: {hits}"


def test_hll_merge_equals_whole_and_is_accurate(spark):
    """a8b's mergeability claim, enforced: unioning per-shard sketches
    estimates the same cardinality as sketching the whole table (HLL
    merge is lossless), and the estimate is within 5% of exact."""
    from ai_iceberg_demo_spark.tables import load_table

    row = SPECS["a8b_hll_mergeable"].fn(spark, SF_DIR).first()
    assert row["n_shards"] == 7
    assert row["merged_estimate"] == row["whole_estimate"]
    exact = (
        load_table(spark, "lineitem", SF_DIR).select("l_partkey").distinct().count()
    )
    assert abs(row["merged_estimate"] - exact) / exact < 0.05
