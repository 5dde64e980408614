"""Hash sampling: reproducible under any partition layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_iceberg_demo_spark.operators.sampling import hash_pct
from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR


def test_membership_survives_repartition(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    base = set(r["doc_id"] for r in docs.filter(hash_pct(F.col("doc_id")) < 10).collect())
    shuffled = set(
        r["doc_id"]
        for r in docs.repartition(13).filter(hash_pct(F.col("doc_id")) < 10).collect()
    )
    assert base == shuffled and base


def test_split_partitions_corpus(spark):
    docs = load_table(spark, "documents", SF_DIR)
    pct = hash_pct(F.col("doc_id"))
    assigned = docs.select(
        "doc_id",
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test").alias("split"),
    )
    counts = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    # hash banding approximates the 80/10/10 intent
    total = sum(counts.values())
    assert counts["train"] / total > 0.6
