"""Graph analytics over relational edges — PageRank (fixed-point family).

The reference stores a property graph in Neo4j and traverses it with
Cypher (`openai_agents/memory/neo4j_memory.py:379-381,512-513`); its
analytics stop at 1-hop joins. This module adds the iterative-algorithm
family a graph of 100 TB scale needs, complementing d6's connected
components (`vector/dedup.py:665`): PageRank as repeated
sparse-matrix × vector products expressed relationally.

Spark-first shape per iteration:
- ``contrib = edges ⋈ rank ON src`` (shuffle on the uniform src key;
  the rank table is O(nodes) — co-partition edges and ranks by src at
  scale and the join is exchange-free after the first iteration),
- ``groupBy dst`` sum with map-side partial aggregation,
- base term via left join on the node table (nodes with no in-edges
  keep (1−d)/N).

Ranks are ROUNDed at every iteration boundary so Spark's partial-merge
summation and a sequential replay agree bit-for-bit — which is what
makes a FIXED iteration count exactly SQL-expressible (the DuckDB
oracle unrolls the same two iterations; an open-ended fixpoint would be
rows-only like v11b). Dangling mass (suppliers have no out-edges) is
deliberately not redistributed — both engines leak it identically, and
the simple variant keeps every term a local expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()

DAMPING = 0.85
_ITER_ROUND = 9  # per-iteration rounding (engine-portable sums)


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bipartite edges customer→supplier ('bought from'),
    distinct, from orders ⋈ lineitem. Node ids are prefixed strings so
    the two key spaces can share one rank table."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def pagerank_iterations(edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """(node, rank) after ``n_iter`` damped PageRank steps from the
    uniform start. Each step: contributions shuffle once on src, sum
    once on dst; ranks round at the boundary (see module docstring)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # N and the per-node out-degree are corpus-wide constants of the
    # edge set; both are tiny aggregates
    n_nodes = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (1.0 - DAMPING) / n_nodes

    rank = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            edges.join(outdeg, "src")
            .join(rank.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + F.lit(DAMPING) * F.coalesce("inflow", F.lit(0.0)),
                    _ITER_ROUND,
                ).alias("rank"),
            )
        )
    return rank


@REGISTRY.register(
    name="g1_pagerank",
    survey_ref="graph analytics (extends d6's iterative family)",
    doc="2-iteration damped PageRank (d=0.85) over the distinct "
    "customer→supplier purchase graph, top-20 nodes by rank. Each "
    "iteration is one src-keyed join shuffle + one dst-keyed partial "
    "agg; per-iteration rounding makes the fixed unroll exactly "
    "replayable in SQL (the open-ended fixpoint variant would be "
    "rows-only, like v11b's Lloyd loop).",
    oracle=f"""
        WITH edges AS (
            SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), nodes AS (
            SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), n AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes
        ), outdeg AS (
            SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
        ), r0 AS (
            SELECT node, 1.0 / n.nn AS rank FROM nodes, n
        ), c1 AS (
            SELECT e.dst, SUM(r.rank / o.outdeg) AS inflow
            FROM edges e JOIN outdeg o ON e.src = o.src
                         JOIN r0 r ON e.src = r.node
            GROUP BY e.dst
        ), r1 AS (
            SELECT nd.node,
                   ROUND((1.0 - {DAMPING}) / n.nn
                         + {DAMPING} * COALESCE(c.inflow, 0.0), {_ITER_ROUND}) AS rank
            FROM nodes nd CROSS JOIN n LEFT JOIN c1 c ON nd.node = c.dst
        ), c2 AS (
            SELECT e.dst, SUM(r.rank / o.outdeg) AS inflow
            FROM edges e JOIN outdeg o ON e.src = o.src
                         JOIN r1 r ON e.src = r.node
            GROUP BY e.dst
        ), r2 AS (
            SELECT nd.node,
                   ROUND((1.0 - {DAMPING}) / n.nn
                         + {DAMPING} * COALESCE(c.inflow, 0.0), {_ITER_ROUND}) AS rank
            FROM nodes nd CROSS JOIN n LEFT JOIN c2 c ON nd.node = c.dst
        )
        SELECT node, ROUND(rank, 6) AS rank FROM r2
        ORDER BY rank DESC, node LIMIT 20
    """,
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the returned plan reads the edge set in both iteration subtrees
    # (and nodes/outdeg besides) — persist so the orders⋈lineitem
    # distinct runs once; the sweep/driver clearCache reclaims it
    edges = purchase_edges(spark, sf_dir).persist()
    rank = pagerank_iterations(edges, n_iter=2)
    return (
        rank.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )
