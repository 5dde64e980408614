"""Vector-index lifecycle maintenance — drift alarm → retrain/upsert.

The r4 verdict's open loop: ``pipeline_interactive`` routes probes
through a persisted IVF index (``pipeline/research.py``), and
``upsert_vector_index`` documents "retrain when drift says so" — but
nothing composed the two. This pipeline is that composition, the m12
maintenance-plan pattern applied to the M5 index artifact:

1. index yesterday's corpus (IVF: k-means centroids + cell assignment,
   ``facade.VectorRAG.create_vector_index``);
2. run the v16 two-sample z drift gate between the indexed corpus and
   today's arrival batch (``clustering.drift_zscores``);
3. decide: any drifted dimension → RETRAIN (drop + rebuild over the
   full corpus — stale centroids would misroute probes); no drift →
   UPSERT (assign the batch to the existing trained centroids,
   O(batch));
4. verify: the refreshed index covers every vector exactly once.

Reference analog: the vector index DDL + refresh lifecycle in
``/root/reference/openai_agents/memory/neo4j_rag.py:144-157`` (create)
— the reference has no drift-triggered rebuild; a 100 TB embedding
store needs one (provider swaps and preprocessing regressions move the
distribution silently; v16 is the alarm).

At 100 TB: the drift gate moves O(dim) rows; upsert is O(batch);
retrain is the only O(corpus) step and runs exactly when the gate
fires — which is the point of gating it. The decision collects a
handful of scalar aggregates driver-side (1-row reads, the
foreachBatch idiom), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()

MAINT_INDEX = "maint_ivf_index"
MAINT_CELLS = 8
MAINT_PROBE = 4
MAINT_ITER = 2

_REPORT_SCHEMA = "step int, action string, metric string, value bigint"


def index_maintenance(
    base: DataFrame,
    batch: DataFrame,
    name: str = MAINT_INDEX,
    n_cells: int = MAINT_CELLS,
    n_probe: int = MAINT_PROBE,
    n_iter: int = MAINT_ITER,
) -> DataFrame:
    """Run the full lifecycle for an indexed ``base`` corpus receiving
    an arrival ``batch``; returns the 4-row maintenance report. The
    index tables land in the session catalog under ``name`` (dropped
    and rebuilt each call — the pipeline IS the refresh)."""
    from ai_iceberg_demo_spark.facade import VectorRAG
    from ai_iceberg_demo_spark.vector.clustering import drift_zscores

    spark = base.sparkSession
    rag = VectorRAG(base, base)
    rag.drop_vector_index(name)
    rag.create_vector_index(
        name, kind="ivf", n_cells=n_cells, n_probe=n_probe, n_iter=n_iter
    )
    n_base = spark.table(name).select("vec_id").distinct().count()

    n_drifted = (
        drift_zscores(base, batch).agg(F.sum("drifted")).first()[0] or 0
    )

    if n_drifted > 0:
        # stale centroids would misroute every probe touching the new
        # mass — rebuild over the union so cells re-cover the space
        full = base.unionByName(batch)
        rag.drop_vector_index(name)
        VectorRAG(full, full).create_vector_index(
            name, kind="ivf", n_cells=n_cells, n_probe=n_probe, n_iter=n_iter
        )
        action, n_touched = "retrain", full.count()
    else:
        action, n_touched = "upsert", rag.upsert_vector_index(batch, name)

    n_total = spark.table(name).select("vec_id").distinct().count()
    return spark.createDataFrame(
        [
            (1, "index_base", "n_indexed", n_base),
            (2, "drift_check", "n_drifted_dims", int(n_drifted)),
            (3, action, "n_vectors_touched", n_touched),
            (4, "verify", "n_indexed_total", n_total),
        ],
        _REPORT_SCHEMA,
    )


@REGISTRY.register(
    name="pipeline_index_maintenance",
    survey_ref="training-data (index lifecycle: v16 + M5 + d7 composed)",
    doc="the IVF index lifecycle end-to-end: index the first corpus "
    "half, drift-gate the second half against it (v16's z test), "
    "upsert on no-drift / retrain on drift, verify coverage. The "
    "report is fully deterministic, so the oracle replays the gate's "
    "arithmetic AND the branch decision in SQL — the verify row "
    "hash-checks that the catalog side effect (every vector indexed "
    "exactly once) actually happened.",
    oracle=f"""
        WITH hw AS (
            SELECT (MAX(vec_id) + 1) / 2 AS half FROM embeddings
        ), bounds AS (
            SELECT (SELECT half FROM hw) AS half, COUNT(*) AS total,
                   COUNT(*) FILTER (WHERE vec_id < (SELECT half FROM hw)) AS n_base
            FROM embeddings
        ), dims AS (
            SELECT vec_id,
                   UNNEST(CAST(embedding AS DOUBLE[])) AS x,
                   GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS dim_i
            FROM embeddings
        ), half AS (
            SELECT dim_i, x,
                   CASE WHEN vec_id < (SELECT half FROM bounds)
                        THEN 'a' ELSE 'b' END AS slice
            FROM dims
        ), st AS (
            SELECT dim_i, slice,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   ROUND(SUM(x) / COUNT(*), 6) AS m,
                   ROUND(SUM(x * x) / COUNT(*)
                         - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)), 6) AS v
            FROM half GROUP BY dim_i, slice
        ), drift AS (
            SELECT COALESCE(SUM(CASE WHEN ABS((b.m - a.m)
                       / SQRT(a.v / a.n + b.v / b.n)) >= 3 THEN 1 ELSE 0 END), 0)
                   AS n_drifted
            FROM st a JOIN st b ON a.dim_i = b.dim_i
            WHERE a.slice = 'a' AND b.slice = 'b'
        )
        SELECT 1 AS step, 'index_base' AS action, 'n_indexed' AS metric,
               CAST(n_base AS BIGINT) AS value FROM bounds
        UNION ALL
        SELECT 2, 'drift_check', 'n_drifted_dims', CAST(n_drifted AS BIGINT)
        FROM drift
        UNION ALL
        SELECT 3,
               CASE WHEN n_drifted > 0 THEN 'retrain' ELSE 'upsert' END,
               'n_vectors_touched',
               CAST(CASE WHEN n_drifted > 0 THEN total
                         ELSE total - n_base END AS BIGINT)
        FROM bounds, drift
        UNION ALL
        SELECT 4, 'verify', 'n_indexed_total', CAST(total AS BIGINT) FROM bounds
    """,
)
def pipeline_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, "embeddings", sf_dir)
    half = (corpus.agg(F.max("vec_id")).first()[0] + 1) / 2
    base = corpus.filter(F.col("vec_id") < half)
    batch = corpus.filter(F.col("vec_id") >= half)
    return index_maintenance(base, batch)
