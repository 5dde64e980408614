"""Ingestion quarantine + compaction behavior."""

from __future__ import annotations

import glob

from pyspark.sql.types import LongType, StringType, StructField, StructType

from ai_iceberg_demo_spark.sources.ingest import (
    compact_write,
    read_jsonl,
    split_quarantine,
)
from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


def test_jsonl_quarantine_splits_bad_rows(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "not a number", "name": "bad type"}\n'
    )
    good, bad, parsed = split_quarantine(read_jsonl(spark, str(p), SCHEMA))
    try:
        assert {r["id"] for r in good.collect()} == {1, 2}
        raws = [r["raw"] for r in bad.collect()]
        assert len(raws) == 2
        assert any("not json" in r for r in raws)
        # nothing silently dropped: good + bad == input lines
        assert good.count() + bad.count() == 4
    finally:
        parsed.unpersist()
    assert not parsed.is_cached


def test_compact_write_controls_file_count(spark, tmp_path):
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = str(tmp_path / "compacted")
    compact_write(li, out, target_files=4, sort_cols=["l_orderkey"])
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # clustered: each file's orderkey range is disjoint -> stats prune
    import pyspark.sql.functions as F

    ranges = sorted(
        (r["mn"], r["mx"])
        for r in back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx"))
        .collect()
    )
    for (_, prev_max), (nxt_min, _) in zip(ranges, ranges[1:]):
        assert prev_max <= nxt_min


def test_read_evolved_parquet_merges_vintages_onto_one_contract(spark, tmp_path):
    """Schema evolution: v1 files (id, a) and v2 files (id, a, b) read
    as one frame; rows from v1 carry NULL b; with `expect` the output
    binds to exactly the contract schema including a never-written
    column."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ai_iceberg_demo_spark.sources.ingest import read_evolved_parquet

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, a string").write.parquet(v1)
    spark.createDataFrame(
        [(3, "z", 1.5)], "id long, a string, b double"
    ).write.parquet(v2)

    merged = read_evolved_parquet(spark, v1, v2)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["b"] is None and rows[3]["b"] == 1.5

    contract = StructType(
        [
            StructField("id", LongType()),
            StructField("b", DoubleType()),
            StructField("c", StringType()),  # never written anywhere
        ]
    )
    bound = read_evolved_parquet(spark, v1, v2, expect=contract)
    assert [f.name for f in bound.schema.fields] == ["id", "b", "c"]
    assert all(r["c"] is None for r in bound.collect())
