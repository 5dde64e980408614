"""Corpus-curation pipeline — the training-data funnel, end to end.

The single most common 100 TB job this engine exists for: take a raw
document corpus and produce the deduplicated, language-filtered,
quality-filtered slice that feeds tokenization. Each stage exists as
its own oracle-checked operator (t3 langid, t2 quality, t4/d1b
fingerprint dedup, t1 token counts); this module composes them into
ONE declarative plan so Catalyst sees the whole funnel:

- the langid + quality predicates collapse into the same scan
  (PushedFilters / single WholeStageCodegen span — no staging tables
  between stages, which is the difference between this and the
  airflow-style stage-per-table pipelines it replaces);
- the only shuffle is the fingerprint groupBy that picks the
  canonical survivor (min doc_id per fp) — dedup is the one stage
  that genuinely needs data movement;
- survivors carry their audit columns (quality, token count) out of
  the same plan, so the downstream tokenizer reads one table.

The corpus is deterministically "redelivered" (mangled copies of
doc_id%7==0, d1's pattern) so the dedup stage provably fires in tests
and oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.functions.text import (
    _BPE_REGEX,
    bpe_token_count,
    fingerprint,
    quality_score,
)
from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()

QUALITY_MIN = 0.8


def curate(docs: DataFrame) -> DataFrame:
    """langid → quality → canonical-per-fingerprint over any corpus with
    (doc_id, text). Returns the surviving rows with audit columns."""
    scored = docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("quality"),
        bpe_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        F.when(
            F.col("text").contains("the ") | F.col("text").startswith("the "), "en"
        ).otherwise("und").alias("lang_guess"),
    )
    kept = scored.filter((F.col("lang_guess") == "en") & (F.col("quality") >= QUALITY_MIN))
    # one shuffle: canonical survivor per fingerprint via min-struct
    # (doc_id is the struct's first field, so min = lowest doc_id; no
    # window, map-side partials)
    return (
        kept.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "quality", "n_bpe_tokens")).alias("s"))
        .select("fp", "s.doc_id", "s.quality", "s.n_bpe_tokens")
    )


@REGISTRY.register(
    name="pipeline_curation",
    survey_ref="training-data (funnel: t3→t2→d1b→t1)",
    doc="the corpus-curation funnel as one plan: language filter + "
    "quality floor fused into the scan, canonical-per-fingerprint "
    "dedup as the single shuffle, token counts carried through. Runs "
    "over the corpus with planted mangled redeliveries so every stage "
    "provably drops rows.",
    bench=True,
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, '  ' || UPPER(text) || '  ' AS text
            FROM documents WHERE doc_id % 7 = 0
        ), scored AS (
            SELECT doc_id,
                   MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp,
                   0.6 * LEAST(LENGTH(text) / 400.0, 1.0)
                       + 0.4 * (CASE WHEN
                            (CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                 t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                               / GREATEST(LEN(STRING_SPLIT(LOWER(text), ' ')), 1))
                              BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.5 END) AS quality,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_REGEX}')) AS BIGINT) AS n_bpe_tokens,
                   CASE WHEN text LIKE '%the %' OR text LIKE 'the %' THEN 'en'
                        ELSE 'und' END AS lang_guess
            FROM corpus
        ), kept AS (
            SELECT * FROM scored WHERE lang_guess = 'en' AND quality >= {QUALITY_MIN}
        ), ranked AS (
            SELECT fp, doc_id, quality, n_bpe_tokens,
                   ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM kept
        )
        SELECT fp, doc_id, quality, n_bpe_tokens FROM ranked WHERE rn = 1
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    mangled = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit("  ")).alias("text"),
    )
    return curate(docs.select("doc_id", "text").unionByName(mangled))
