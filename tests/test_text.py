

def test_bpe_merge_rounds_strictly_compress(spark):
    """f32: each unrolled merge round must strictly reduce the corpus
    token total (the top pair always recurs on this vocabulary), per-doc
    counts never increase, and round-2 counts are consistent with the
    emitted merged sequence."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.functions.text import _BPE_JOIN, f32_bpe_merge_apply
    from tests.conftest import SF_DIR

    out = f32_bpe_merge_apply(spark, SF_DIR)
    tot = out.agg(
        PF.sum("n_tokens_0").alias("t0"),
        PF.sum("n_tokens_1").alias("t1"),
        PF.sum("n_tokens_2").alias("t2"),
    ).first()
    assert tot["t0"] > tot["t1"] > tot["t2"]
    rows = out.collect()
    for r in rows:
        assert r["n_tokens_0"] >= r["n_tokens_1"] >= r["n_tokens_2"]
        assert len(r["merged_seq"].split(_BPE_JOIN)) == r["n_tokens_2"]
