"""PageRank invariants the SQL oracle can't see (mass conservation,
dangling leak, convergence direction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_iceberg_demo_spark.operators.graph import (
    DAMPING,
    pagerank_iterations,
    purchase_edges,
)
from tests.conftest import SF_DIR


def test_pagerank_mass_and_bounds(spark):
    edges = purchase_edges(spark, SF_DIR)
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select("dst"))
        .distinct()
        .count()
    )
    rank = pagerank_iterations(edges, n_iter=2)
    rows = rank.collect()
    assert len(rows) == n_nodes
    base = (1.0 - DAMPING) / n_nodes
    total = sum(r["rank"] for r in rows)
    # dangling suppliers leak mass: total strictly under 1, but at
    # least the undamped base mass survives
    assert (1.0 - DAMPING) - 1e-6 <= total <= 1.0 + 1e-6
    for r in rows:
        assert r["rank"] >= base - 1e-9
    # suppliers (in-degree > 0) must sit above the floor; customers
    # (no in-edges in the bipartite purchase graph) sit exactly on it
    sup = [r["rank"] for r in rows if r["node"] % 2 == 1]
    cust = [r["rank"] for r in rows if r["node"] % 2 == 0]
    assert min(sup) > base
    assert all(abs(c - base) < 1e-9 for c in cust)


def test_label_propagation_mechanics(spark):
    """g2: every held-out customer with at least one purchase edge gets
    exactly ONE inferred label drawn from the nation alphabet, votes
    are positive, and the result is identical under a different
    partition layout (the determinism the fixed tiebreak buys)."""
    from ai_iceberg_demo_spark.operators.graph import g2_label_propagation
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = g2_label_propagation(spark, SF_DIR).collect()
    assert rows
    preds = {r["c_custkey"]: (r["inferred_nation"], r["votes"]) for r in rows}
    assert len(preds) == len(rows)  # one label per customer

    nations = {
        r["c_nationkey"]
        for r in load_table(spark, "customer", SF_DIR).collect()
    }
    orders = load_table(spark, "orders", SF_DIR)
    held_with_edges = {
        r["o_custkey"]
        for r in orders.select("o_custkey").distinct().collect()
        if r["o_custkey"] % 4 == 0
    }
    assert set(preds) == held_with_edges  # full coverage, nothing extra
    for lab, votes in preds.values():
        assert lab in nations and votes > 0

    again = {r["c_custkey"]: (r["inferred_nation"], r["votes"])
             for r in g2_label_propagation(spark, SF_DIR).collect()}
    assert again == preds


def test_modularity_identities_and_null_model(spark):
    """g5: the ledger must satisfy the graph identities — Σ degree_sum
    = 2m, Σ internal_edges ≤ m, every q_contrib ≤ (e_c/m), modularity
    = Σ rounded contribs and Q near/below zero on this nation-random
    fixture (orders ignore nations, so communities are a null model —
    the dense monthly graph actually scores slightly NEGATIVE, ≈-0.1;
    a homophilous graph would score 0.3+)."""
    from ai_iceberg_demo_spark.operators.graph import (
        _coservice_edges,
        g5_modularity,
    )
    from tests.conftest import SF_DIR

    rows = g5_modularity(spark, SF_DIR).collect()
    assert rows, "graph must be non-empty"
    m = _coservice_edges(spark, SF_DIR).count()
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    assert sum(r["internal_edges"] for r in rows) <= m
    q = round(sum(r["q_contrib"] for r in rows), 6)
    assert all(abs(r["modularity"] - q) < 2e-6 for r in rows)
    assert -0.25 < q < 0.2, q
    for r in rows:
        assert r["n_nodes"] > 0
        assert r["q_contrib"] <= r["internal_edges"] / m + 1e-9


def test_hash_to_min_converges_in_log_rounds_on_a_long_chain(spark):
    """The point of g8 vs d6: a 64-hop path must converge in O(log d)
    rounds (min-label propagation would need ~63). Components exact,
    round count pinned well under the diameter."""
    from ai_iceberg_demo_spark.operators.graph import hash_to_min_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 163)], "u bigint, v bigint"
    )
    stats = {}
    comp = {
        r["u"]: r["component_id"]
        for r in hash_to_min_components(edges, stats=stats).collect()
    }
    assert set(comp) == set(range(100, 164))
    assert set(comp.values()) == {100}  # one component, labeled by its min
    # log2(64)=6; hash-to-min needs ~2 extra rounds (+1 to detect the
    # fixed point via the checksum)
    assert stats["rounds"] <= 10, stats


def test_g8_components_are_exactly_the_user_chains(spark):
    from ai_iceberg_demo_spark.operators.graph import g8_logstep_components
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    got = {
        r["u"]: r["component_id"]
        for r in g8_logstep_components(spark, SF_DIR).collect()
    }
    truth = {}
    for r in (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "user_id")
        .collect()
    ):
        truth.setdefault(r["user_id"], []).append(r["event_id"])
    want = {e: min(es) for es in truth.values() for e in es}
    assert got == want
