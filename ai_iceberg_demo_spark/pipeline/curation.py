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


# ---------------------------------------------------------------------------
# Training prep: decontaminate → filter → mix → shuffle → pack, one plan
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="pipeline_training_prep",
    survey_ref="training-data (funnel: t17→t2/t3→u10b→u11→u9)",
    doc="the last mile before the tokenizer, as ONE declarative plan: "
    "drop benchmark-contaminated docs (t17's 8-gram flags, broadcast "
    "anti-join), apply the language + quality floor (fused into the "
    "scan), sample each source at its mixture-planned rate (u10b's "
    "broadcast rate table), assign the deterministic epoch-shuffle "
    "position (u11's bucket-major rank — no corpus-wide sort), and "
    "pack the shuffled order into 2048-token bins (u9's two-phase "
    "prefix sum over position shards). Zero rangepartitioning, zero "
    "staging tables. Each rate/offset stage is a DIAMOND (the same "
    "frame feeds a tiny aggregate AND the main flow), and chaining "
    "three diamonds would otherwise re-expand the upstream plan 2^3 "
    "times — so the three small intermediates persist() explicitly "
    "(survivor ids + token counts, KBs per 100 GB of input; "
    "MEMORY_AND_DISK, the standard Spark answer to diamond reuse). "
    "tests/test_plans.py pins the persists (InMemoryTableScan present) "
    "so a dropped persist can't silently re-octuple the plan.",
    oracle=f"""
        WITH bench_docs AS (
            SELECT b.doc_id, b.text || ' ' || c.text AS text
            FROM documents b JOIN documents c ON c.doc_id = b.doc_id + 1
            WHERE b.doc_id % 10 = 3
        ), bench_grams AS (
            SELECT DISTINCT UNNEST(
                CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 8 THEN
                    LIST_TRANSFORM(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - 7),
                        i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i : i + 7], ' '))
                ELSE [] END) AS gram
            FROM bench_docs
        ), corpus_grams AS (
            SELECT DISTINCT doc_id, UNNEST(
                CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 8 THEN
                    LIST_TRANSFORM(GENERATE_SERIES(1, LEN(STRING_SPLIT(text, ' ')) - 7),
                        i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i : i + 7], ' '))
                ELSE [] END) AS gram
            FROM documents WHERE doc_id % 10 <> 3
        ), flagged AS (
            SELECT DISTINCT c.doc_id
            FROM corpus_grams c JOIN bench_grams b ON c.gram = b.gram
        ), clean AS (
            SELECT d.doc_id, d.source, d.text
            FROM documents d
            WHERE d.doc_id % 10 <> 3
              AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
        ), kept AS (
            SELECT doc_id, source,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
            FROM clean
            WHERE (text LIKE '%the %' OR text LIKE 'the %')
              AND 0.6 * LEAST(LENGTH(text) / 400.0, 1.0)
                  + 0.4 * (CASE WHEN
                       (CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                            t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
                          / GREATEST(LEN(STRING_SPLIT(LOWER(text), ' ')), 1))
                         BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.5 END) >= {QUALITY_MIN}
        ), per_source AS (
            SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
            FROM kept GROUP BY source
        ), tot AS (
            SELECT SUM(src_tokens) AS total, COUNT(*) AS k FROM per_source
        ), plan AS (
            SELECT s.source,
                   ROUND(LEAST(1.0, (0.5 * t.total / t.k) / s.src_tokens), 6) AS sample_rate
            FROM per_source s CROSS JOIN tot t
        ), sampled AS (
            SELECT k.doc_id, k.source, k.n_tokens
            FROM kept k JOIN plan p ON k.source = p.source
            WHERE (('0x' || SUBSTR(MD5(CAST(k.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)
                  < p.sample_rate * 100
        ), positioned AS (
            SELECT doc_id, source, n_tokens,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY MD5('1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
                        AS BIGINT) AS position
            FROM sampled
        )
        SELECT doc_id, source, n_tokens, position,
               CAST((SUM(n_tokens) OVER w - n_tokens) // 2048 AS BIGINT) AS bin_id,
               CAST((SUM(n_tokens) OVER w - n_tokens) % 2048 AS BIGINT) AS bin_offset
        FROM positioned
        WINDOW w AS (ORDER BY position ROWS UNBOUNDED PRECEDING)
    """,
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ai_iceberg_demo_spark.functions.text import t17_decontamination
    from ai_iceberg_demo_spark.operators.sampling import hash_pct

    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 != 3)

    # 1. decontaminate: t17's flag list is tiny → broadcast anti-join
    flagged = t17_decontamination(spark, sf_dir).select("doc_id")
    clean = corpus.join(F.broadcast(flagged), "doc_id", "left_anti")

    # 2. language + quality floor — map-side, fuses into the scan.
    # persist: kept feeds both the rate aggregate and the sampler (the
    # first diamond), and everything downstream — without it the whole
    # decontamination subtree re-executes per consumer.
    kept = (
        clean.filter(
            (F.col("text").contains("the ") | F.col("text").startswith("the "))
            & (quality_score(F.col("text")) >= QUALITY_MIN)
        )
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .persist()
    )

    # 3. mixture-planned per-source sampling (u10b): tiny rate table broadcasts
    per_source = kept.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("src_tokens")
    )
    tot = per_source.agg(F.sum("src_tokens").alias("total"), F.count("*").alias("k"))
    share = F.lit(0.5) * F.col("total") / F.col("k")
    rates = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(F.least(F.lit(1.0), share / F.col("src_tokens")), 6).alias("sample_rate"),
    )
    sampled = (
        kept.join(F.broadcast(rates), "source")
        .filter(hash_pct(F.col("doc_id")) < F.col("sample_rate") * 100)
        .select("doc_id", "source", "n_tokens")
    )

    # 4. epoch-shuffle position (u11): bucket-major rank, offsets
    # broadcast. persist local (diamond: bucket counts + the rank join).
    h = F.md5(F.concat(F.lit("1:"), F.col("doc_id").cast("string")))
    keyed = sampled.withColumn("_h", h).withColumn("_b", F.substring(h, 1, 2))
    w_local = Window.partitionBy("_b").orderBy("_h", "doc_id")
    local = keyed.withColumn("_rn", F.row_number().over(w_local)).persist()
    b_counts = local.groupBy("_b").agg(F.count("*").alias("_n"))
    w_boff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    b_offsets = b_counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_boff), F.lit(0)).alias("_off")
    )
    positioned = local.join(F.broadcast(b_offsets), "_b").select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("_off") + F.col("_rn") - 1).cast("bigint").alias("position"),
    )

    # 5. pack the SHUFFLED order into 2048-token bins (u9's two-phase
    # prefix sum, sharded on contiguous position ranges). persist the
    # sharded frame (diamond: shard totals + the offset join).
    sharded = positioned.withColumn(
        "_shard", (F.col("position") / 1000).cast("bigint")
    ).persist()
    w_shard = Window.partitionBy("_shard").orderBy("position").rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_end = sharded.withColumn("_local_end", F.sum("n_tokens").over(w_shard))
    s_tot = sharded.groupBy("_shard").agg(F.sum("n_tokens").alias("_tot"))
    w_soff = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    s_offsets = s_tot.select(
        "_shard", F.coalesce(F.sum("_tot").over(w_soff), F.lit(0)).alias("_soff")
    )
    start = F.col("_soff") + F.col("_local_end") - F.col("n_tokens")
    return with_end.join(F.broadcast(s_offsets), "_shard").select(
        "doc_id",
        "source",
        "n_tokens",
        "position",
        (start / 2048).cast("bigint").alias("bin_id"),
        (start % 2048).cast("bigint").alias("bin_offset"),
    )
