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


def test_epoch_shuffle_is_a_permutation(spark):
    """u11: positions are exactly 0..N-1 with no gaps or collisions —
    the bucket-major composition must reproduce a total order."""
    from ai_iceberg_demo_spark.operators.sampling import u11_epoch_shuffle
    from ai_iceberg_demo_spark.tables import load_table

    out = u11_epoch_shuffle(spark, SF_DIR)
    n = load_table(spark, "documents", SF_DIR).count()
    stats = out.agg(
        F.count("*").alias("rows"),
        F.countDistinct("position").alias("distinct_pos"),
        F.min("position").alias("mn"),
        F.max("position").alias("mx"),
    ).first()
    assert stats["rows"] == stats["distinct_pos"] == n
    assert stats["mn"] == 0 and stats["mx"] == n - 1


def test_epoch_shuffles_are_independent_permutations(spark):
    """Two epochs must give uncorrelated orders: Spearman rank
    correlation between epoch-1 and epoch-2 positions ≈ 0 (md5 re-keyed
    by the epoch prefix), while each epoch alone is a full permutation.
    |rho| < 0.1 puts us ~25 sigma from a same-order leak at n≈6k
    (sigma = 1/sqrt(n-1) ≈ 0.013)."""
    from ai_iceberg_demo_spark.operators.sampling import u11_epoch_shuffle

    e1 = u11_epoch_shuffle(spark, SF_DIR, epoch=1).withColumnRenamed("position", "p1")
    e2 = u11_epoch_shuffle(spark, SF_DIR, epoch=2).withColumnRenamed("position", "p2")
    stats = e1.join(e2, "doc_id").agg(
        F.corr("p1", "p2").alias("rho"), F.count("*").alias("n")
    ).first()
    # positions are ranks, so Pearson on them IS Spearman's rho
    assert stats["n"] > 100
    assert abs(stats["rho"]) < 0.1, stats["rho"]


def test_stratified_sample_hits_exact_quotas(spark):
    """u12: per-lang counts equal ceil(frac × stratum size) exactly."""
    import math

    from ai_iceberg_demo_spark.operators.sampling import (
        STRATA_FRAC,
        u12_stratified_sample,
    )
    from ai_iceberg_demo_spark.tables import load_table

    got = {
        r["lang"]: r["n"]
        for r in u12_stratified_sample(spark, SF_DIR).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["lang"]: math.ceil(STRATA_FRAC * r["n"])
        for r in load_table(spark, "documents", SF_DIR).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_mixture_apply_respects_planned_rates(spark):
    """u10b: each source's kept fraction tracks its planned sample_rate
    (hash percentile is uniform; small strata get wide tolerance), and
    full-rate sources keep everything."""
    from ai_iceberg_demo_spark.operators.sampling import (
        u10_mixture_plan,
        u10b_mixture_apply,
    )
    from ai_iceberg_demo_spark.tables import load_table

    plan = {r["source"]: r for r in u10_mixture_plan(spark, SF_DIR).collect()}
    kept = {
        r["source"]: r["n"]
        for r in u10b_mixture_apply(spark, SF_DIR).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    docs_per_source = {
        r["source"]: r["n"]
        for r in load_table(spark, "documents", SF_DIR).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, p in plan.items():
        if p["sample_rate"] == 1.0:
            assert kept.get(src, 0) == docs_per_source[src], src
        else:
            # hash_pct < rate*100 keeps ~rate of rows; ±4 rows absolute
            # slack for the 0-100 integer percentile granularity
            expected = p["sample_rate"] * docs_per_source[src]
            assert abs(kept.get(src, 0) - expected) <= max(4, 0.5 * expected), src


def test_quality_canonical_keeps_best_member(spark):
    """d9: within every cluster the kept doc has the max quality among
    members (ties to lowest id), and kept_id is itself a member."""
    from ai_iceberg_demo_spark.functions.text import quality_score
    from ai_iceberg_demo_spark.vector.dedup import (
        connected_components,
        d2_ngram_jaccard,
        d9_quality_canonical,
    )
    from ai_iceberg_demo_spark.tables import load_table

    clusters = {r["component_id"]: r for r in d9_quality_canonical(spark, SF_DIR).collect()}
    assert clusters, "fixture must produce verified dup clusters"
    pairs = d2_ngram_jaccard(spark, SF_DIR).select("a_id", "b_id")
    comps = connected_components(pairs)
    q = {
        r["doc_id"]: r["q"]
        for r in load_table(spark, "documents", SF_DIR)
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .collect()
    }
    members: dict = {}
    for r in comps.collect():
        members.setdefault(r["lbl"], []).append(r["id"])
    assert set(members) == set(clusters)
    for cid, docs in members.items():
        row = clusters[cid]
        assert row["n_members"] == len(docs)
        best_q = max(q[d] for d in docs)
        best_id = min(d for d in docs if q[d] == best_q)
        assert row["kept_id"] == best_id
        assert abs(row["best_quality"] - round(best_q, 6)) < 1e-9


def test_u6b_group_split_never_splits_identical_content(spark):
    """The leakage guarantee: every doc sharing a content fingerprint
    lands in the same split, and the bands are roughly 80/10/10."""
    from ai_iceberg_demo_spark.operators.sampling import u6b_group_split

    out = u6b_group_split(spark, SF_DIR)
    per_fp = out.groupBy("fp").agg(
        F.countDistinct("split").alias("k"), F.count("*").alias("n")
    )
    assert per_fp.filter(F.col("k") > 1).count() == 0
    # the fixture has no byte-identical texts, so exercise the property
    # with planted duplicates: same text under different doc_ids (and
    # case/whitespace noise the fingerprint normalizes) must co-assign.
    from ai_iceberg_demo_spark.functions.text import fingerprint
    from ai_iceberg_demo_spark.operators.sampling import hash_pct

    planted = spark.createDataFrame(
        [(1, "Same Doc text"), (2, "same  doc TEXT"), (3, " same doc text ")],
        ["doc_id", "text"],
    ).select(hash_pct(fingerprint(F.col("text"))).alias("band"))
    assert planted.distinct().count() == 1
    shares = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    total = sum(shares.values())
    assert 0.6 < shares["train"] / total < 0.95
    assert shares.keys() == {"train", "val", "test"}


def test_u13_data_card_cells_partition_the_corpus(spark):
    from ai_iceberg_demo_spark.operators.sampling import u13_data_card
    from ai_iceberg_demo_spark.tables import load_table

    card = u13_data_card(spark, SF_DIR).collect()
    docs = load_table(spark, "documents", SF_DIR)
    assert sum(r["n_docs"] for r in card) == docs.count()
    assert sum(r["n_chars"] for r in card) == docs.agg(
        F.sum(F.length("text"))
    ).first()[0]
    assert all(0.0 < r["avg_quality"] <= 1.0 for r in card)
    assert {r["band"] for r in card} <= {"high", "mid", "low"}


def test_curriculum_positions_are_a_band_monotone_permutation(spark):
    from ai_iceberg_demo_spark.operators.sampling import u14_curriculum_order

    rows = u14_curriculum_order(spark, SF_DIR).collect()
    positions = sorted(r["position"] for r in rows)
    assert positions == list(range(len(rows)))
    # every higher band finishes before any lower band starts
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(r["position"])
    bands = sorted(by_band, reverse=True)
    assert len(bands) >= 2, "fixture must populate several bands"
    for hi, lo in zip(bands, bands[1:]):
        assert max(by_band[hi]) < min(by_band[lo])


def test_interleave_is_a_permutation_with_no_long_source_runs(spark):
    """u16: positions form a permutation, and consecutive positions
    rarely share a source (the whole point vs. a source-sorted order) —
    with ~20 active sources, same-source adjacency should be rare."""
    from ai_iceberg_demo_spark.operators.sampling import u16_interleave_sources

    rows = sorted(
        u16_interleave_sources(spark, SF_DIR).collect(), key=lambda r: r["position"]
    )
    assert [r["position"] for r in rows] == list(range(len(rows)))
    runs = sum(
        1 for a, b in zip(rows, rows[1:]) if a["source"] == b["source"]
    )
    # tail ranks can repeat a source once its peers are exhausted;
    # anything beyond a small fraction means interleaving failed
    assert runs < len(rows) * 0.1, runs


def test_weighted_sample_favors_heavy_docs_and_is_layout_stable(spark):
    """u17: the A-ES draw is (a) identical under repartition, (b) biased
    toward high-weight docs vs the unweighted hash sample."""
    from ai_iceberg_demo_spark.operators.sampling import (
        _WS_K,
        u17_weighted_sample,
        weighted_sample_keys,
    )

    picked = u17_weighted_sample(spark, SF_DIR).collect()
    assert len(picked) == _WS_K
    ids = {r["doc_id"] for r in picked}

    docs = load_table(spark, "documents", SF_DIR)
    es = weighted_sample_keys(F.col("doc_id"), F.col("n_chars"))
    re_ids = {
        r["doc_id"]
        for r in docs.repartition(17)
        .select("doc_id", es.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(_WS_K)
        .collect()
    }
    assert ids == re_ids

    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_picked = sum(r["n_chars"] for r in picked) / len(picked)
    # weighting by n_chars must pull the sample mean above the corpus mean
    assert mean_picked > mean_all


def test_quality_calibration_hits_target_keep_rate(spark):
    """u15: each source's realized keep-rate lands near the 20% target
    (exact p80 threshold; ties can only push the rate UP)."""
    from ai_iceberg_demo_spark.operators.sampling import u15_quality_calibration

    rows = u15_quality_calibration(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= r["n_total"]
        assert 0.15 <= r["keep_rate"] <= 0.35, (r["source"], r["keep_rate"])


def test_upsample_mix_copy_counts_match_rates(spark):
    """u18: per-source expansion factor ≈ its rate (exact on the hash
    fraction), every copy_idx sequence is 1..n with no gaps, and the
    output is identical under repartition."""
    from collections import Counter

    from ai_iceberg_demo_spark.operators.sampling import u18_upsample_mix

    rows = u18_upsample_mix(spark, SF_DIR).collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(r["copy_idx"])
    for (doc, src), idxs in per_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))

    docs_per_source = Counter(s for _, s in per_doc)
    copies_per_source = Counter()
    for (d, s), idxs in per_doc.items():
        copies_per_source[s] += len(idxs)
    for src, n_docs in docs_per_source.items():
        n = int(src.removeprefix("src"))
        rate = min(0.5 + (n % 5) / 2.0, 4.0)
        factor = copies_per_source[src] / n_docs
        # whole part exact; fractional part realized by hash percentile
        assert abs(factor - rate) <= 0.5, (src, rate, factor)

    again = {(r["doc_id"], r["source"], r["copy_idx"])
             for r in u18_upsample_mix(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["source"], r["copy_idx"]) for r in rows}


def test_packing_split_bins_are_exactly_full(spark):
    """u19: segments tile every doc completely (Σ seg_len per doc =
    its token count), every interior bin is exactly PACK_BUDGET full,
    and no segment crosses a bin boundary."""
    from collections import defaultdict

    from ai_iceberg_demo_spark.operators.sampling import (
        PACK_BUDGET,
        u19_packing_split,
    )
    from ai_iceberg_demo_spark.tables import load_table

    rows = u19_packing_split(spark, SF_DIR).collect()
    toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, "documents", SF_DIR)
        .select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n"))
        .collect()
    }
    per_doc = defaultdict(int)
    per_bin = defaultdict(int)
    for r in rows:
        assert r["seg_len"] > 0
        assert r["bin_offset"] + r["seg_len"] <= PACK_BUDGET  # never crosses
        per_doc[r["doc_id"]] += r["seg_len"]
        per_bin[r["bin_id"]] += r["seg_len"]
    assert per_doc == toks  # full tiling, nothing lost or duplicated
    last_bin = max(per_bin)
    for b, filled in per_bin.items():
        if b != last_bin:
            assert filled == PACK_BUDGET, (b, filled)  # token-exact, no padding


def test_length_batching_bounds_padding(spark):
    """u21: every batch's members share a log2 band (≤2× length
    spread → padding_frac < 0.5), only the last batch of a band is
    short, and the mean padding beats a naive single global batch of
    the same size taken across mixed bands."""
    from ai_iceberg_demo_spark.operators.sampling import (
        _BATCH_SIZE,
        u21_length_batching,
    )

    rows = u21_length_batching(spark, SF_DIR).collect()
    assert rows
    by_band = {}
    for r in rows:
        assert 0 < r["n_docs"] <= _BATCH_SIZE
        assert 0.0 <= r["padding_frac"] < 0.5  # within-band 2x bound
        by_band.setdefault(r["band"], []).append(r)
    for band, batches in by_band.items():
        short = [b for b in batches if b["n_docs"] < _BATCH_SIZE]
        assert len(short) <= 1  # only the remainder batch is short

    docs = load_table(spark, "documents", SF_DIR)
    lens = sorted(
        r["n"]
        for r in docs.select(
            F.size(F.split("text", " ")).cast("bigint").alias("n")
        ).collect()
    )
    # naive: same batch size, hash order across ALL lengths — padding
    # is governed by the global max/mean gap
    naive_waste = 1 - sum(lens) / (len(lens) * max(lens))
    total_tokens = sum(lens)
    padded = sum(r["n_docs"] * r["padded_width"] for r in rows)
    banded_waste = 1 - total_tokens / padded
    assert banded_waste < naive_waste


def test_dedup_aware_mixture_removes_duplicate_inflation(spark):
    """u22: sources with salted duplicates show inflation > 1, their
    canonical counts subtract exactly the planted copies, and rates
    computed on canonical tokens are >= what raw counts would give
    (duplicates can only deflate a source's justified rate)."""
    from ai_iceberg_demo_spark.operators.sampling import (
        u22_dedup_aware_mixture,
    )

    rows = {r["source"]: r for r in u22_dedup_aware_mixture(spark, SF_DIR).collect()}
    assert rows
    docs = load_table(spark, "documents", SF_DIR).collect()
    planted = {}
    for d in docs:
        if d["doc_id"] % 7 == 0:
            planted[d["source"]] = planted.get(d["source"], 0) + 1
    for src, r in rows.items():
        assert r["n_docs_raw"] - r["n_docs_canon"] == planted.get(src, 0)
        if planted.get(src):
            assert r["inflation"] > 1.0
        assert 0 < r["sample_rate"] <= 1.0


def test_budget_waterfill_reaches_fixpoint_and_conserves_budget(spark):
    """u33: after the 3-round unroll, (a) some sources ARE capped (the
    cap binds on this fixture — otherwise the query is vacuous), (b)
    no uncapped source sits above the cap (fixpoint), and (c) the
    allocations sum to the budget."""
    from ai_iceberg_demo_spark.operators.sampling import (
        _WF_BUDGET,
        _WF_CAP,
        u33_budget_waterfill,
    )
    from tests.conftest import SF_DIR

    rows = u33_budget_waterfill(spark, SF_DIR).collect()
    capped = [r for r in rows if r["capped"]]
    assert capped, "cap never binds — vacuous fixture parameters"
    assert all(r["alloc"] == _WF_CAP for r in capped)
    assert all(r["alloc"] <= _WF_CAP + 1e-6 for r in rows)
    assert abs(sum(r["alloc"] for r in rows) - _WF_BUDGET) < 0.01
