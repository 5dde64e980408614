

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


def test_web_ingest_funnel_every_stage_fires(spark):
    """pipeline_web_ingest: the quality gate must drop some docs, the
    dedup must remove the planted mirrors (whose whitespace mangling
    the strip normalizes away), and the stages must be properly
    nested: docs_in > docs_clean > docs_unique per the corpus, with
    mirrors only ever removable when their original also survived the
    gate (both carry identical token counts)."""
    from ai_iceberg_demo_spark.pipeline.curation import pipeline_web_ingest
    from tests.conftest import SF_DIR

    rows = pipeline_web_ingest(spark, SF_DIR).collect()
    di = sum(r["docs_in"] for r in rows)
    dc = sum(r["docs_clean"] for r in rows)
    du = sum(r["docs_unique"] for r in rows)
    assert di > dc > du, (di, dc, du)
    # the raw feed carries exactly the corpus + the planted mirrors
    n_docs = di * 10 // 11  # mirrors are doc_id%10==0 → 10% of corpus
    assert di == n_docs + n_docs // 10
    # every source reports, and kept tokens are positive wherever docs survive
    assert all(r["kept_tokens"] > 0 for r in rows if r["docs_unique"] > 0)


def test_dedup_cascade_both_tiers_fire_and_flow_is_conserved(spark):
    """pipeline_dedup_cascade: tier 1 must collapse the planted
    exact-mangled copies, tier 2 must drop the planted footer twins
    (which survive tier 1 by construction), and the survivor flow must
    be conserved: tier2.docs_in == tier1.docs_out and each tier's
    docs_out == docs_in - docs_removed. The plan must stay banded —
    no cartesian fallback."""
    from ai_iceberg_demo_spark.pipeline.curation import pipeline_dedup_cascade
    from ai_iceberg_demo_spark.plans import explain_str
    from tests.conftest import SF_DIR

    df = pipeline_dedup_cascade(spark, SF_DIR)
    assert "CartesianProduct" not in explain_str(df, "formatted")
    t1, t2 = df.collect()
    assert (t1["tier"], t1["stage"]) == (1, "exact_fingerprint")
    assert (t2["tier"], t2["stage"]) == (2, "minhash_jaccard")
    for t in (t1, t2):
        assert t["docs_removed"] > 0, t
        assert t["docs_out"] == t["docs_in"] - t["docs_removed"], t
    assert t2["docs_in"] == t1["docs_out"]
    # tier 1 removes at least every planted mangled copy; tier 2 at
    # least most footer twins (short docs < 20 tokens legitimately
    # score below the 0.8 Jaccard bar)
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.tables import load_table

    docs = load_table(spark, "documents", SF_DIR)
    n_mangled = docs.filter(PF.col("doc_id") % 20 == 0).count()
    assert t1["docs_removed"] >= n_mangled


def test_mad_outliers_are_robust_to_their_own_flags(spark):
    """t59: flagged rows must sit strictly outside the 3.5 modified-z
    fence, the flag rate must be small but non-vacuous (0 < rate <
    10%), and re-fencing WITHOUT the flagged rows must still flag every
    originally-flagged value (robustness: outliers cannot move the
    fence enough to whitelist themselves — the property mean/std gates
    lack)."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.streaming.events import t59_mad_outliers
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = t59_mad_outliers(spark, SF_DIR).collect()
    assert rows
    assert all(abs(r["modified_z"]) > 3.5 for r in rows)
    n_vals = (
        load_table(spark, "events", SF_DIR).filter(PF.col("value").isNotNull()).count()
    )
    assert 0 < len(rows) < 0.10 * n_vals
    # robustness: recompute per-type median/MAD on the UNflagged rows
    # only; every flagged value must still breach the new fence
    import statistics

    flagged_ids = {r["event_id"] for r in rows}
    vals = (
        load_table(spark, "events", SF_DIR)
        .filter(PF.col("value").isNotNull())
        .select("event_id", "event_type", "value")
        .collect()
    )
    by_type = {}
    for v in vals:
        if v["event_id"] not in flagged_ids:
            by_type.setdefault(v["event_type"], []).append(v["value"])
    fences = {
        t: (statistics.median(xs), statistics.median([abs(x - statistics.median(xs)) for x in xs]))
        for t, xs in by_type.items()
    }
    for r in rows:
        med, mad = fences[r["event_type"]]
        assert abs(0.6745 * (r["value"] - med) / mad) > 3.5, r


def test_tokenizer_fertility_identities(spark):
    """t56: per-source fertility must be >= 1 on this punctuation-free
    fixture (every whitespace word splits into >= 1 subword), ratios
    must equal the sums they summarize, and every source reports."""
    from ai_iceberg_demo_spark.functions.text import t56_tokenizer_fertility
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = t56_tokenizer_fertility(spark, SF_DIR).collect()
    n_sources = load_table(spark, "documents", SF_DIR).select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        assert r["fertility"] >= 1.0
        assert abs(r["chars_per_subword"] - round(r["n_chars"] / r["n_subwords"], 6)) < 1e-9
        assert abs(r["fertility"] - round(r["n_subwords"] / r["n_words"], 6)) < 1e-9


def test_mojibake_repair_flags_exactly_the_planted_docs(spark):
    """f42: exactly the doc_id%12==0 docs are flagged (the fixture text
    is ASCII, so only the planted suffix carries signatures), each
    carries all 4 planted markers, and every repair is proven clean
    in-query."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.functions.text import f42_mojibake_repair
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = f42_mojibake_repair(spark, SF_DIR).collect()
    planted = {
        r["doc_id"]
        for r in load_table(spark, "documents", SF_DIR)
        .filter(PF.col("doc_id") % 12 == 0)
        .select("doc_id")
        .collect()
    }
    assert {r["doc_id"] for r in rows} == planted
    for r in rows:
        assert r["n_markers"] == 4, r
        assert r["repaired_clean"] is True


def test_quality_report_ranges_and_coverage(spark):
    """pipeline_quality_report: one row per source, every metric in its
    lawful range, and the scorecard consistent with the operators it
    summarizes (pct_en equals t3's per-source rate)."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.functions.text import t3_langid
    from ai_iceberg_demo_spark.pipeline.curation import pipeline_quality_report
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = pipeline_quality_report(spark, SF_DIR).collect()
    docs = load_table(spark, "documents", SF_DIR)
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert 0.0 <= r["pct_en"] <= 1.0
        assert 0.0 < r["mean_dominance"] <= 1.0
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["mean_ws_tokens"] > 0
    lang = (
        t3_langid(spark, SF_DIR)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(PF.round(PF.avg(PF.when(PF.col("lang_guess") == "en", 1.0).otherwise(0.0)), 6).alias("p"))
        .collect()
    )
    expected = {r["source"]: r["p"] for r in lang}
    for r in rows:
        assert abs(r["pct_en"] - expected[r["source"]]) < 1e-9
