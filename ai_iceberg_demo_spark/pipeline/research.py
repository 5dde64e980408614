"""The research dataflow pipeline — SURVEY.md §3.3 (entry point C).

`_run_direct` (reference `research_manager.py:100-141`) is the pure
dataflow slice: cache probe → context probe → plan → fan-out searches
→ concat context+results → write report. Re-expressed as one
declarative DataFrame pipeline over the fixtures, with the
non-deterministic LLM/search seams replaced by deterministic
transformations (the engine's UDF seams carry the real providers in
production — see SURVEY.md §2.12 X2/X3):

- "plan" = top-N context documents for the query vector (V5 shape)
- "searches" = plan rows fanned out (explode, X3) and "summarized"
  deterministically (truncation, F5)
- "report" = collect_list fan-in + assembly (A4/F10)

Everything is joins + string ops, so the whole pipeline is
oracle-checkable end to end — the same guarantee the reference can't
give for its LLM stages.

Scale shape: the probe is a broadcast of one query vector (map-only
scan + top-k); the fan-out is row parallelism; the fan-in collects a
bounded k rows. No unbounded shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table
from ai_iceberg_demo_spark.vector.similarity import _COS_SQL, _query_vec, cosine_topk

REGISTRY = Registry()


@REGISTRY.register(
    name="pipeline_run_direct",
    survey_ref="§3.3,X2,X3,A4,F10",
    doc="_run_direct dataflow (research_manager.py:100-141): context top-3 "
    "probe → fan-out 'search' per context doc → summarize (truncate) → "
    "fan-in report row per query.",
    oracle=f"""
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id,
                   ROUND({_COS_SQL.format(a="e.embedding", b="q.qvec")}, 6) AS score
            FROM embeddings e, q
        ), plan AS (
            SELECT vec_id, score FROM scored WHERE score >= 0.5
            ORDER BY score DESC, vec_id LIMIT 3
        ), searches AS (
            SELECT p.vec_id, p.score,
                   'Summary[' || CAST(p.vec_id AS VARCHAR) || ']: ' || SUBSTR(d.text, 1, 120) AS summary
            FROM plan p JOIN documents d ON p.vec_id = d.doc_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_searches,
               ROUND(MAX(score), 6) AS best_score,
               ARRAY_TO_STRING(LIST_SORT(LIST(summary)), ' --- ') AS report
        FROM searches
    """,
)
def pipeline_run_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    # context probe (V5 shape, min_score 0.5 / k=3 per research_manager.py:407)
    plan = cosine_topk(emb, _query_vec(spark, sf_dir), k=3, min_score=0.5)
    # fan-out "searches" (X3) with deterministic summaries (F5)
    searches = plan.join(docs, plan.vec_id == docs.doc_id).select(
        "vec_id",
        "score",
        F.concat(
            F.lit("Summary["),
            F.col("vec_id").cast("string"),
            F.lit("]: "),
            F.substring("text", 1, 120),
        ).alias("summary"),
    )
    # fan-in report (A4/F10)
    return searches.agg(
        F.count("*").alias("n_searches"),
        F.round(F.max("score"), 6).alias("best_score"),
        F.array_join(F.sort_array(F.collect_list("summary")), " --- ").alias("report"),
    )
