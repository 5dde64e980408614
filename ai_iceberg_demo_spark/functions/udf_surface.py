"""UDF / retry surface — SURVEY.md §2.12 X1-X5.

The reference exposes side-effecting functions to agents as tools
(`imagegen_agent.py:65-69`), runs LLM calls with structured-output
schemas (`research_manager.py:426-433`), retries activities with
exponential backoff (`run_worker.py:50-60`), and aborts retries on
non-retryable error indicators (`image_generation_activity.py:131-153`,
`research_manager.py:578-606`).

Engine mapping:
- X1/X2: ``register_struct_udf`` — a vectorized (Arrow) UDF with a
  declared StructType return schema, registered into the SQL catalog so
  ``spark.sql`` queries call it like a built-in. The struct schema is
  the engine's analog of the Pydantic structured-output model.
- X4: ``with_retries`` — backoff ×2.0, 1 s initial, 5 s cap (the
  reference's retry policy), as a provider-call wrapper for UDF seams.
- X5: ``classify_error`` — indicator-list error taxonomy as a column
  expression (retryable vs not), plus the same list consumed by
  ``with_retries`` to abort early.

Scale notes: the registered UDF is pandas-vectorized (Arrow batches,
not row pickling); retry wrappers live INSIDE the UDF body so a
transient provider failure retries one batch, not a Spark stage.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()

#: reference retry policy, run_worker.py:54-59
BACKOFF_INITIAL = 1.0
BACKOFF_COEFF = 2.0
BACKOFF_MAX = 5.0

#: reference non-retryable indicators, image_generation_activity.py:131-146
NON_RETRYABLE_INDICATORS = [
    "content_policy_violation",
    "invalid_request",
    "billing",
    "quota",
]


class NonRetryableError(RuntimeError):
    """X5: an error whose message matched a non-retryable indicator."""


def classify_error(err: Column, indicators: Sequence[str] = tuple(NON_RETRYABLE_INDICATORS)) -> Column:
    """Column form of the indicator-list taxonomy: True = retryable."""
    ind = F.array(*[F.lit(i) for i in indicators])
    return ~F.exists(ind, lambda i: F.instr(F.lower(err), i) > 0)


def with_retries(
    fn: Callable,
    *,
    max_attempts: int = 4,
    initial: float = BACKOFF_INITIAL,
    coeff: float = BACKOFF_COEFF,
    cap: float = BACKOFF_MAX,
    indicators: Sequence[str] = tuple(NON_RETRYABLE_INDICATORS),
    sleep: Callable[[float], None] = time.sleep,
) -> Callable:
    """X4 retry wrapper for provider calls inside UDF bodies: exponential
    backoff ×coeff capped at ``cap`` (run_worker.py:54-59; the client's
    ``min(delay*1.5, 5.0)`` variant is the same shape, cli:192), aborting
    immediately when the error message matches a non-retryable indicator
    (X5) — the reference's ApplicationError(non_retryable=True)."""

    def wrapped(*args, **kwargs):
        delay = initial
        for attempt in range(1, max_attempts + 1):
            try:
                return fn(*args, **kwargs)
            except NonRetryableError:
                raise
            except Exception as exc:
                msg = str(exc).lower()
                if any(i in msg for i in indicators):
                    raise NonRetryableError(str(exc)) from exc
                if attempt == max_attempts:
                    raise
                sleep(delay)
                delay = min(delay * coeff, cap)

    return wrapped


def register_struct_udf(spark: SparkSession, name: str = "parse_report") -> None:
    """X1/X2: a struct-returning vectorized UDF in the SQL catalog.

    ``parse_report(text)`` → struct(title, n_words, n_chars): the
    structured-output shape of the reference's ReportData model
    (writer_agent.py:30-39) derived deterministically from the text.
    Closure is self-contained (worker-cwd independent).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: the closure imports pandas locally, so hint
    # resolution can't see `pd`; SCALAR eval type is the default
    def parse_report(texts):
        import re

        title_re = re.compile(r"(?m)^# ([^#].*)$")

        def title_of(t: str) -> str:
            m = title_re.search(t)
            return m.group(1) if m else ""

        return pd.DataFrame(
            {
                "title": texts.map(title_of),
                "n_words": texts.map(lambda t: len(t.split())).astype("int32"),
                "n_chars": texts.map(len).astype("int32"),
            }
        )

    spark.udf.register(name, pandas_udf(parse_report, "title string, n_words int, n_chars int"))


@REGISTRY.register(
    name="x1_registered_struct_udf",
    survey_ref="X1,X2",
    doc="struct-returning vectorized UDF registered in the SQL catalog "
    "and invoked from spark.sql — the activity-as-tool + structured-"
    "output-schema surface (imagegen_agent.py:65-69, writer_agent.py:"
    "30-39). The oracle recomputes the struct fields in SQL, so the "
    "Arrow UDF path itself is hash-checked.",
    oracle="""
        SELECT doc_id,
               COALESCE(REGEXP_EXTRACT(text, '(?m)^# ([^#].*)$', 1), '') AS title,
               CAST(LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS INT) AS n_words,
               CAST(LENGTH(text) AS INT) AS n_chars
        FROM documents
    """,
)
def x1_registered_struct_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_struct_udf(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("x1_documents")
    return spark.sql(
        "SELECT doc_id, r.title, r.n_words, r.n_chars "
        "FROM (SELECT doc_id, parse_report(text) AS r FROM x1_documents)"
    )


@REGISTRY.register(
    name="x5_error_classification",
    survey_ref="X5,E6",
    doc="indicator-list error taxonomy as a column op: retryable unless "
    "the message contains a non-retryable indicator "
    "(image_generation_activity.py:131-153).",
    oracle="""
        SELECT event_id,
               event_type || ': ' || props AS err,
               NOT (CONTAINS(LOWER(event_type || ': ' || props), 'error')
                    OR CONTAINS(LOWER(event_type || ': ' || props), 'quota')) AS retryable
        FROM events
    """,
)
def x5_error_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    err = F.concat(F.col("event_type"), F.lit(": "), F.col("props"))
    return ev.select(
        "event_id",
        err.alias("err"),
        classify_error(err, ["error", "quota"]).alias("retryable"),
    )


# ---------------------------------------------------------------------------
# X6: Python UDTF (table function) — the Spark 4 lateral fan-out surface
# ---------------------------------------------------------------------------


def register_chunk_udtf(spark: SparkSession, name: str = "chunk_lines") -> None:
    """Register a Python UDTF that fans one (doc_id, text) row out into
    fixed-size word windows — the table-function spelling of x3's
    posexplode fan-out. UDTFs are the Spark 4 API for row→table
    transforms invoked laterally from SQL; per-row Python, so the HOT
    path stays with the built-in explode twins (f47) — this pins the
    API surface itself, not a performance claim."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class ChunkLines:
        def eval(self, text: str):  # noqa: D401 — UDTF contract
            toks = text.split(" ")
            size = 16
            for i in range(0, len(toks), size):
                window = toks[i : i + size]
                yield i // size, len(window), " ".join(window)

    spark.udtf.register(name, ChunkLines)


@REGISTRY.register(
    name="x6_python_udtf",
    survey_ref="X-family (Spark 4 Python UDTF): x3 fans out with "
    "posexplode, this pins the TABLE-FUNCTION registration surface — "
    "the API an activity-as-table-tool integration targets",
    doc="Python UDTF registered in the SQL catalog and invoked via "
    "LATERAL join: each document fans into 16-token word windows "
    "(chunk_idx, n_tokens, chunk). The DuckDB oracle rebuilds the "
    "same windows with list slicing, so the UDTF execution path "
    "itself is hash-checked end-to-end. Per-row Python — the hot "
    "path belongs to f47's explode spelling; what this buys is the "
    "catalog-registered table-function surface (UDTFs can't be "
    "expressed as scalar UDFs). Row fan-out ~len/16, no shuffle.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        ), starts AS (
            SELECT doc_id, t,
                   UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t), 1), 16)) AS s
            FROM toks
        )
        SELECT doc_id,
               CAST((s - 1) / 16 AS INT) AS chunk_idx,
               CAST(LEN(t[s:(s + 15)]) AS INT) AS n_tokens,
               ARRAY_TO_STRING(t[s:(s + 15)], ' ') AS chunk
        FROM starts WHERE LEN(t[s:(s + 15)]) > 0
        ORDER BY doc_id, chunk_idx
    """,
)
def x6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_iceberg_demo_spark.tables import load_table

    register_chunk_udtf(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("x6_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM x6_docs d, LATERAL chunk_lines(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


# ---------------------------------------------------------------------------
# X7: Arrow-optimized scalar Python UDF (Spark 4 useArrow=True)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="x7_arrow_scalar_udf",
    survey_ref="X1's scalar sibling (Spark 4 Arrow-optimized Python UDF API pin)",
    doc="the Spark 4 `@udf(useArrow=True)` scalar seam, API-pinned the "
    "way x6 pins the UDTF: a deterministic quality-bucket labeler "
    "(length + vowel-ratio arithmetic) runs as an ARROW-serialized "
    "scalar Python UDF — plan shows ArrowEvalPython, never the "
    "pickle-per-row BatchEvalPython — and the oracle replays the "
    "arithmetic in SQL so the Arrow transport itself is hash-checked "
    "bit-for-bit. This is the migration target for any row UDF a "
    "reference user carries over; the repo's hot paths stay JVM-side "
    "(this seam is for logic that genuinely needs Python).",
    oracle="""
        SELECT doc_id,
               CASE WHEN LENGTH(text) >= 400 AND
                         CAST(LENGTH(REGEXP_REPLACE(text, '[^aeiou]', '', 'g')) AS DOUBLE)
                         / LENGTH(text) >= 0.2
                    THEN 'long_fluent'
                    WHEN LENGTH(text) >= 400 THEN 'long_other'
                    ELSE 'short' END AS bucket,
               CAST(LENGTH(text) AS INT) AS n_chars
        FROM documents
    """,
)
def x7_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    @udf(returnType=StringType(), useArrow=True)
    def bucket(text: str | None) -> str | None:
        if text is None:  # NULL propagation, matching the SQL oracle
            return None
        n = len(text)
        if n >= 400:
            vowels = sum(1 for ch in text if ch in "aeiou")
            return "long_fluent" if vowels / n >= 0.2 else "long_other"
        return "short"

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        bucket(F.col("text")).alias("bucket"),
        F.length("text").cast("int").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# X8: grouped-map applyInPandas (the per-group Python seam)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="x8_grouped_map_pandas",
    survey_ref="X-family (grouped-map applyInPandas API pin; completes the "
    "Python-seam matrix: x1 struct scalar, x6 UDTF, x7 Arrow scalar, "
    "v8b mapInPandas, t5 applyInPandasWithState)",
    doc="per-source z-score standardization of document lengths through "
    "the REAL applyInPandas grouped-map seam: each source's docs "
    "arrive as ONE pandas DataFrame (whole-group semantics — the "
    "property mapInPandas cannot give), the group mean/std are "
    "computed with population ddof=0, and every doc emits its z-score. "
    "The oracle replays the arithmetic with SQL window functions, so "
    "the hash check pins the Arrow round-trip AND the grouped-map "
    "batching bit-for-bit. Single-doc groups emit z=0 (std 0 guard), "
    "mirrored by the oracle's NULLIF. Scale: one shuffle on the group "
    "key, each group a single Arrow batch — the seam for per-entity "
    "model scoring (sklearn per group) where group state must be "
    "whole; skewed groups cap via salting upstream.",
    oracle="""
        SELECT doc_id, source,
               CAST(LENGTH(COALESCE(text, '')) AS INT) AS n_chars,
               ROUND(COALESCE(
                   (LENGTH(COALESCE(text, ''))
                    - AVG(LENGTH(COALESCE(text, ''))) OVER (PARTITION BY source))
                   / NULLIF(STDDEV_POP(LENGTH(COALESCE(text, '')))
                            OVER (PARTITION BY source), 0),
                   0.0), 4) AS z_len
        FROM documents
    """,
)
def x8_grouped_map_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def standardize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # NULL text counts as length 0 (oracle: LENGTH(COALESCE(text,''))) —
        # .str.len() yields NaN for None and astype(int32) would raise.
        n = pdf["text"].str.len().fillna(0)
        std = n.std(ddof=0)
        z = (n - n.mean()) / std if std and std > 0 else n * 0.0
        # SQL ROUND is half-away-from-zero; pandas .round is half-even —
        # a z landing exactly on a 4th-decimal tie would hash-mismatch.
        z4 = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_chars": n.astype("int32"),
                "z_len": z4,
            }
        )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    return docs.groupBy("source").applyInPandas(
        standardize,
        schema="doc_id bigint, source string, n_chars int, z_len double",
    )


# ---------------------------------------------------------------------------
# x9: cogrouped-map applyInPandas — the last Python-seam API member
# ---------------------------------------------------------------------------

_X9_SPLIT = "2024-01-15"  # t84/t113's reference/comparison boundary


@REGISTRY.register(
    name="x9_cogrouped_map_pandas",
    survey_ref="X-family (cogrouped-map applyInPandas API pin; with x1 "
    "struct scalar, x6 UDTF, x7 Arrow scalar, x8 grouped map, v8b "
    "mapInPandas and t5 applyInPandasWithState the Python-seam matrix "
    "is COMPLETE — cogroup is the seam for per-key two-frame work: "
    "champion/challenger scoring, ref-vs-cmp stats, feature joins too "
    "ragged for SQL)",
    doc="per-event_type reference-vs-comparison value summary through "
    "the REAL df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas "
    "seam (t84's date split): both periods' rows for one type arrive "
    "as TWO whole pandas DataFrames — the property neither grouped "
    "map (one frame) nor a join (row-aligned) gives — and the UDF "
    "emits counts, per-side means and the mean shift. The oracle "
    "replays the arithmetic as two aggregates FULL-JOINed on the key "
    "(cogroup emits keys present in EITHER side; empty sides emit "
    "n=0/mean=0, mirrored by COALESCE), so the hash pins the Arrow "
    "cogroup batching bit-for-bit. Means round to 4 with the x8 "
    "half-away trick (SQL ROUND is half-away; pandas is half-even). "
    "Scale: one shuffle per side on the group key, each (key, side) "
    "a single Arrow batch.",
    oracle=f"""
        WITH ref AS (
            SELECT event_type, CAST(COUNT(*) AS INT) AS n_ref,
                   ROUND(COALESCE(AVG(value), 0.0) + 0.0, 4) AS mean_ref
            FROM events
            WHERE value IS NOT NULL AND CAST(ts AS DATE) < '{_X9_SPLIT}'
            GROUP BY event_type
        ), cmp AS (
            SELECT event_type, CAST(COUNT(*) AS INT) AS n_cmp,
                   ROUND(COALESCE(AVG(value), 0.0) + 0.0, 4) AS mean_cmp
            FROM events
            WHERE value IS NOT NULL AND CAST(ts AS DATE) >= '{_X9_SPLIT}'
            GROUP BY event_type
        )
        SELECT COALESCE(r.event_type, c.event_type) AS event_type,
               COALESCE(r.n_ref, 0) AS n_ref,
               COALESCE(c.n_cmp, 0) AS n_cmp,
               COALESCE(r.mean_ref, 0.0) AS mean_ref,
               COALESCE(c.mean_cmp, 0.0) AS mean_cmp,
               ROUND(COALESCE(c.mean_cmp, 0.0) - COALESCE(r.mean_ref, 0.0)
                     + 0.0, 4) AS mean_shift
        FROM ref r FULL JOIN cmp c ON r.event_type = c.event_type
    """,
)
def x9_cogrouped_map_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def _round4(x: float) -> float:
        # SQL half-away-from-zero at 4 decimals (x8's convention)
        return float(np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4)

    def summarize(key: tuple, ref: "pd.DataFrame", cmp_: "pd.DataFrame") -> "pd.DataFrame":
        # np.mean is a sequential/pairwise float64 sum — rounding to 4
        # absorbs the sum-order delta vs the oracle's AVG (x8's trick)
        mr = _round4(float(np.mean(ref["value"])) if len(ref) else 0.0)
        mc = _round4(float(np.mean(cmp_["value"])) if len(cmp_) else 0.0)
        return pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_ref": [np.int32(len(ref))],
                "n_cmp": [np.int32(len(cmp_))],
                "mean_ref": [mr],
                "mean_cmp": [mc],
                "mean_shift": [_round4(mc - mr)],
            }
        )

    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    split = F.lit(_X9_SPLIT).cast("date")
    ref = ev.filter(F.col("ts").cast("date") < split).select("event_type", "value")
    cmp_ = ev.filter(F.col("ts").cast("date") >= split).select("event_type", "value")
    return (
        ref.groupBy("event_type")
        .cogroup(cmp_.groupBy("event_type"))
        .applyInPandas(
            summarize,
            schema="event_type string, n_ref int, n_cmp int, "
            "mean_ref double, mean_cmp double, mean_shift double",
        )
    )
