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


def test_sequence_packing_equals_single_window(spark):
    """The two-phase distributed prefix sum must be bit-identical to
    the naive one-partition global window it replaces."""
    from pyspark.sql import Window

    from ai_iceberg_demo_spark.operators.sampling import PACK_BUDGET, u9_sequence_packing
    from ai_iceberg_demo_spark.tables import load_table

    got = {r["doc_id"]: (r["bin_id"], r["bin_offset"])
           for r in u9_sequence_packing(spark, SF_DIR).collect()}

    docs = load_table(spark, "documents", SF_DIR)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    toks = docs.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n"))
    start = F.sum("n").over(w) - F.col("n")
    naive = {
        r["doc_id"]: (r["b"], r["o"])
        for r in toks.select(
            "doc_id",
            (start / PACK_BUDGET).cast("bigint").alias("b"),
            (start % PACK_BUDGET).cast("bigint").alias("o"),
        ).collect()
    }
    assert got == naive
    # packing is dense: bins 0..max all exist and starts are ordered
    bins = sorted({b for b, _ in got.values()})
    assert bins == list(range(bins[-1] + 1))


def test_decontamination_flags_every_planted_doc(spark):
    """Every doc_id%10==4 doc was copied verbatim into a benchmark doc,
    so decontamination must flag all of them (with ≥1 benchmark hit)."""
    from ai_iceberg_demo_spark.functions.text import t17_decontamination
    from ai_iceberg_demo_spark.tables import load_table

    flagged = {r["doc_id"]: r for r in t17_decontamination(spark, SF_DIR).collect()}
    docs = load_table(spark, "documents", SF_DIR)
    planted = {
        r["doc_id"]
        for r in docs.filter(
            (F.col("doc_id") % 10 == 4) & (F.size(F.split("text", " ")) >= 8)
        ).collect()
        # only planted docs whose benchmark twin exists (doc_id-1 % 10 == 3 is given)
        if r["doc_id"] - 1 in {x["doc_id"] for x in docs.filter(F.col("doc_id") % 10 == 3).collect()}
    }
    assert planted, "fixture must contain planted contamination"
    assert planted <= set(flagged)
    for d in planted:
        assert flagged[d]["n_bench_docs"] >= 1
