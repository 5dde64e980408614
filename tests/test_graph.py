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
    sup = [r["rank"] for r in rows if r["node"].startswith("s")]
    cust = [r["rank"] for r in rows if r["node"].startswith("c")]
    assert min(sup) > base
    assert all(abs(c - base) < 1e-9 for c in cust)
