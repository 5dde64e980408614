"""Scalar function surface — SURVEY.md §2.9 (F1–F26).

String / date / math / array / map / JSON / conditional expressions the
reference performs in Python or Cypher, re-expressed as built-in
`pyspark.sql.functions` so they stay JVM-side inside whole-stage
codegen — no Python in the hot path.

Reference sites are cited per query. All queries run over the
`documents` / `events` / `orders` / `lineitem` fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()


# --- F1/F2: title extraction + prefix tests ------------------------------
@REGISTRY.register(
    name="f1_title_extract",
    survey_ref="F1,F2,F8",
    doc="markdown H1-style first-token extraction (ui/backend/main.py:68-89) "
    "via regexp_extract + startswith + length.",
    oracle="""
        SELECT doc_id,
               REGEXP_EXTRACT(text, '^(\\w+)', 1) AS first_word,
               (text LIKE 'the %') AS starts_the,
               CAST(LENGTH(text) AS BIGINT) AS len_chars
        FROM documents
    """,
)
def f1_title_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.col("text").startswith("the ").alias("starts_the"),
        F.length("text").cast("bigint").alias("len_chars"),
    )


# --- F3: conditional path normalization ----------------------------------
@REGISTRY.register(
    name="f3_path_normalize",
    survey_ref="F3",
    doc="prefix '/' to path if missing (ui/backend/main.py:121-123).",
    oracle="""
        SELECT doc_id,
               CASE WHEN source LIKE '/%' THEN source ELSE '/' || source END AS norm_path
        FROM documents
    """,
)
def f3_path_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.when(F.col("source").startswith("/"), F.col("source"))
        .otherwise(F.concat(F.lit("/"), F.col("source")))
        .alias("norm_path"),
    )


# --- F4/F7: trim + lowercase compare ------------------------------------
@REGISTRY.register(
    name="f4_trim_lower",
    survey_ref="F4,F7",
    doc="query.strip() (ui/backend/main.py:233) + case-insensitive compare "
    "(research_manager.py:592-596).",
    oracle="""
        SELECT doc_id, TRIM(LOWER(lang)) AS lang_norm,
               (LOWER(source) = 'src0') AS is_src0
        FROM documents
    """,
)
def f4_trim_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.trim(F.lower(F.col("lang"))).alias("lang_norm"),
        (F.lower(F.col("source")) == "src0").alias("is_src0"),
    )


# --- F5: substring / truncation ------------------------------------------
@REGISTRY.register(
    name="f5_truncate",
    survey_ref="F5",
    doc="markdown_report[:2000] + '...' truncation (research_manager.py:511); "
    "100-char variant over documents.",
    oracle="""
        SELECT doc_id,
               CASE WHEN LENGTH(text) > 100 THEN SUBSTR(text, 1, 100) || '...'
                    ELSE text END AS preview
        FROM documents
    """,
)
def f5_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.when(
            F.length("text") > 100, F.concat(F.substring("text", 1, 100), F.lit("..."))
        )
        .otherwise(F.col("text"))
        .alias("preview"),
    )


# --- F6: split tokens -----------------------------------------------------
@REGISTRY.register(
    name="f6_split_tokens",
    survey_ref="F6",
    doc="split('\\n') / split(',') + per-element trim (redpanda_activity.py:17).",
    oracle="""
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
               STRING_SPLIT(text, ' ')[1] AS head_token
        FROM documents
    """,
)
def f6_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("head_token"),
    )


# --- F9: key synthesis ----------------------------------------------------
@REGISTRY.register(
    name="f9_key_synthesis",
    survey_ref="F9",
    doc='f"{workflow_id}-msg-{seq}" composite keys (neo4j_memory.py:359,491).',
    oracle="""
        SELECT CAST(l_orderkey AS VARCHAR) || '-item-' || CAST(l_linenumber AS VARCHAR) AS item_key,
               l_orderkey, l_linenumber
        FROM lineitem
    """,
)
def f9_key_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        F.concat_ws("-", F.col("l_orderkey"), F.lit("item"), F.col("l_linenumber")).alias(
            "item_key"
        ),
        "l_orderkey",
        "l_linenumber",
    )


# --- F10: multi-row text assembly ----------------------------------------
@REGISTRY.register(
    name="f10_text_assembly",
    survey_ref="F10",
    doc="join context parts with separator + header (neo4j_rag.py:357-375).",
    oracle="""
        SELECT lang,
               'Context:' || ARRAY_TO_STRING(LIST_SORT(LIST(SUBSTR(text, 1, 20))), ' --- ') AS context
        FROM documents
        GROUP BY lang
    """,
)
def f10_text_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        F.concat(
            F.lit("Context:"),
            F.array_join(F.sort_array(F.collect_list(F.substring("text", 1, 20))), " --- "),
        ).alias("context")
    )


# --- F11: template enrichment with defaults -------------------------------
@REGISTRY.register(
    name="f11_template_enrich",
    survey_ref="F11,F18",
    doc="query + per-question '- {q}: {a}' with default on missing "
    "(research_manager.py:296-304): concat + coalesce/nullif defaults.",
    oracle="""
        SELECT doc_id,
               'Q: ' || REGEXP_EXTRACT(text, '^(\\w+)', 1)
                     || ' [' || COALESCE(NULLIF(lang, ''), 'No specific preference') || ']'
                   AS enriched
        FROM documents
    """,
)
def f11_template_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("Q: "),
            F.regexp_extract("text", r"^(\w+)", 1),
            F.lit(" ["),
            F.coalesce(F.nullif(F.col("lang"), F.lit("")), F.lit("No specific preference")),
            F.lit("]"),
        ).alias("enriched"),
    )


# --- F12/F13: timestamp formatting ---------------------------------------
@REGISTRY.register(
    name="f12_date_format",
    survey_ref="F12,F13",
    doc="ISO timestamps in envelopes (redpanda_activity.py:119) + "
    "strftime('%Y%m%d_%H%M%S') filenames (pdf_generation_activity.py:99).",
    oracle="""
        SELECT o_orderkey,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
               STRFTIME(o_orderdate, '%Y%m%d_%H%M%S') AS file_stamp
        FROM orders
    """,
)
def f12_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_format("o_orderdate", "yyyyMMdd_HHmmss").alias("file_stamp"),
    )


# --- F14/F15: arithmetic, casts, least ------------------------------------
@REGISTRY.register(
    name="f14_arithmetic",
    survey_ref="F14,F15",
    doc="index+1, ratio scaling, float casts (interactive_research_workflow.py:163-178, "
    "image_generation_activity.py:80-81) + min-clamp (cli:192).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_linenumber + 1 AS INT) AS next_index,
               l_extendedprice * (1 - l_discount) / 100.0 AS scaled,
               CAST(l_quantity AS INT) AS qty_int,
               LEAST(l_quantity * 1.5, 50.0) AS clamped
        FROM lineitem
    """,
)
def f14_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_linenumber") + 1).cast("int").alias("next_index"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) / F.lit(100.0)).alias("scaled"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.least(F.col("l_quantity") * 1.5, F.lit(50.0)).alias("clamped"),
    )


# --- F16: CASE label dispatch ---------------------------------------------
@REGISTRY.register(
    name="f16_label_dispatch",
    survey_ref="F16",
    doc="CASE WHEN n:Message THEN … WHEN n:Result THEN … (neo4j_memory.py:345-351); "
    "event-category routing analog of redpanda topic dispatch.",
    oracle="""
        SELECT event_id, event_type,
               CASE WHEN event_type LIKE '%error%' THEN 'errors'
                    WHEN event_type IN ('signup') THEN 'lifecycle'
                    WHEN event_type IN ('click', 'view') THEN 'engagement'
                    ELSE 'commerce' END AS topic
        FROM events
    """,
)
def f16_label_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type").contains("error"), "errors")
        .when(F.col("event_type").isin("signup"), "lifecycle")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .otherwise("commerce")
        .alias("topic"),
    )


# --- F17: multi-branch status derivation ----------------------------------
@REGISTRY.register(
    name="f17_status_derive",
    survey_ref="F17",
    doc="derive status from 5 state predicates (interactive_research_workflow.py:390-405).",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' AND o_totalprice > 150000.0 THEN 'completed_large'
                    WHEN o_orderstatus = 'F' THEN 'completed'
                    WHEN o_orderstatus = 'P' THEN 'in_progress'
                    WHEN o_totalprice > 150000.0 THEN 'pending_large'
                    ELSE 'pending' END AS derived_status
        FROM orders
    """,
)
def f17_status_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.when((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0), "completed_large")
        .when(F.col("o_orderstatus") == "F", "completed")
        .when(F.col("o_orderstatus") == "P", "in_progress")
        .when(F.col("o_totalprice") > 150000.0, "pending_large")
        .otherwise("pending")
        .alias("derived_status"),
    )


# --- F20: JSON field extraction -------------------------------------------
@REGISTRY.register(
    name="f20_json_extract",
    survey_ref="F19,F20",
    doc="consumer json.loads / jq .event_type filters (REDPANDA.md:121-140): "
    "get_json_object on the props envelope.",
    oracle="""
        SELECT event_id, JSON_EXTRACT_STRING(props, '$.k') AS k_value
        FROM events
    """,
)
def f20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_value"),
    )


# --- F22: array membership / any-match ------------------------------------
@REGISTRY.register(
    name="f22_any_match",
    survey_ref="F22",
    doc="any(indicator in error for indicator in [...]) (research_manager.py:579-596).",
    oracle="""
        SELECT event_id, event_type,
               (event_type LIKE '%ror%' OR event_type LIKE '%up%') AS matches_indicator
        FROM events
    """,
)
def f22_any_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    indicators = F.array(F.lit("ror"), F.lit("up"))
    return ev.select(
        "event_id",
        "event_type",
        F.exists(indicators, lambda ind: F.instr(F.col("event_type"), ind) > 0).alias(
            "matches_indicator"
        ),
    )


# --- F24: enumerate with position (posexplode) ----------------------------
@REGISTRY.register(
    name="f24_posexplode",
    survey_ref="F24,X3",
    doc="for i, q in enumerate(questions) (research_manager.py:301) — "
    "posexplode of split tokens; the UDTF-like fan-out shape (X3).",
    oracle="""
        SELECT d.doc_id, CAST(t.i - 1 AS INT) AS pos, d.toks[t.i] AS token
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
              FROM documents WHERE doc_id < 20) d,
             LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(d.toks))) AS i) t
    """,
)
def f24_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


# --- F23: map construction & lookup with default --------------------------
@REGISTRY.register(
    name="f23_map_lookup",
    survey_ref="F23",
    doc="responses[key] = answer / responses.get(key, default) "
    "(interactive_research_workflow.py:487-488, research_manager.py:302): "
    "map_from_entries over grouped rows + element_at lookups with "
    "coalesce defaults — the dict the workflow keeps per session, as a "
    "per-user event-type→count map.",
    oracle="""
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS clicks,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchases
        FROM events
        GROUP BY user_id
    """,
)
def f23_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    per_type = ev.groupBy("user_id", "event_type").count()
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "count"))).alias("m")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("clicks"),
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias("purchases"),
    )


@REGISTRY.register(
    name="f21_struct_flatten",
    survey_ref="F21",
    doc="nested-object flattening (serializable_model_activity.py:77-109 "
    "model_dump normalization): JSON → typed struct → flat columns via "
    "select(s.*), then re-serialized — the round-trip the reference does "
    "with model_dump(mode='json').",
    oracle="""
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k,
               '{"k":' || (props->>'k') || '}' AS rejson
        FROM events
    """,
)
def f21_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    parsed = ev.select(
        "event_id", F.from_json("props", "k BIGINT").alias("s")
    )
    flat = parsed.select("event_id", "s.*")  # struct → columns
    return flat.select(
        "event_id",
        "k",
        F.to_json(F.struct("k")).alias("rejson"),
    )


# ---------------------------------------------------------------------------
# f36: JSON payload contract validation
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="f36_json_contract",
    survey_ref="F-family extra (ingest payload validation); f20's enforcer",
    doc="JSON payload contract check over the event props column: "
    "well-formedness, required key 'k' present, and integer-typed — "
    "per-row verdict valid / malformed / missing_key / bad_type. The "
    "fixture payloads are all clean (the check would be vacuous), so "
    "planted corruption cycles through all three failure classes "
    "(doc-salting pattern): event_id%31==1 truncated JSON, %31==2 "
    "wrong key, %31==3 string-typed value. Map-only; this is the "
    "quarantine predicate an ingest stream applies before parsing "
    "payloads for real (f20/x5's upstream).",
    oracle="""
        WITH salted AS (
            SELECT event_id,
                   CASE WHEN event_id % 31 = 1 THEN SUBSTR(props, 1, 4)
                        WHEN event_id % 31 = 2 THEN REPLACE(props, '"k"', '"x"')
                        WHEN event_id % 31 = 3 THEN '{"k": "oops"}'
                        ELSE props END AS props
            FROM events
        )
        SELECT event_id,
               CASE WHEN TRY_CAST(props AS JSON) IS NULL THEN 'malformed'
                    WHEN json_extract(props, '$.k') IS NULL THEN 'missing_key'
                    WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                         IS NULL THEN 'bad_type'
                    ELSE 'valid' END AS verdict
        FROM salted
    """,
)
def f36_json_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    salted = ev.select(
        "event_id",
        F.when(F.col("event_id") % 31 == 1, F.substring("props", 1, 4))
        .when(F.col("event_id") % 31 == 2, F.replace(F.col("props"), F.lit('"k"'), F.lit('"x"')))
        .when(F.col("event_id") % 31 == 3, F.lit('{"k": "oops"}'))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    parsed = F.try_parse_json(F.col("props"))
    k = F.get_json_object("props", "$.k")
    return salted.select(
        "event_id",
        F.when(parsed.isNull(), "malformed")
        .when(k.isNull(), "missing_key")
        .when(k.try_cast("bigint").isNull(), "bad_type")
        .otherwise("valid")
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# f37: suffixed-numeric normalization ("3.5k" → 3500)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="f37_numeric_normalize",
    survey_ref="F-family extra (messy-numeric ingest); f12/f14's sibling",
    doc="normalization of human-formatted numerics — '3.5k', '2M', "
    "'75%', '1,250' — into doubles, the scrubber every scraped-metrics "
    "ingest needs before arithmetic. The fixture has no messy numbers "
    "(planted: event_id%7 cycles the four formats built from value), "
    "and parse failures (planted 'n/a' at %29==0) yield NULL + a "
    "parseable=false flag instead of poisoning the pipeline. Pure "
    "regexp/CASE column expressions — map-only, codegen'd, no UDF.",
    oracle="""
        WITH salted AS (
            SELECT event_id,
                   CASE WHEN event_id % 29 = 0 THEN 'n/a'
                        WHEN event_id % 7 = 1 THEN CAST(ROUND(value, 1) AS VARCHAR) || 'k'
                        WHEN event_id % 7 = 2 THEN CAST(ROUND(value, 1) AS VARCHAR) || 'M'
                        WHEN event_id % 7 = 3 THEN CAST(ROUND(value, 1) AS VARCHAR) || '%'
                        WHEN event_id % 7 = 4 THEN '1,' || LPAD(CAST(CAST(ROUND(value * 10, 0) AS BIGINT) AS VARCHAR), 3, '0')
                        ELSE CAST(ROUND(value, 2) AS VARCHAR) END AS raw
            FROM events
        ), parsed AS (
            SELECT event_id, raw,
                   TRY_CAST(REGEXP_EXTRACT(REPLACE(raw, ',', ''),
                                           '^([0-9]+(?:\\.[0-9]+)?)', 1) AS DOUBLE) AS base,
                   CASE WHEN raw LIKE '%k' THEN 1000.0
                        WHEN raw LIKE '%M' THEN 1000000.0
                        WHEN raw LIKE '%\\%' ESCAPE '\\' THEN 0.01
                        ELSE 1.0 END AS mult
            FROM salted
        )
        SELECT event_id, raw,
               ROUND(base * mult, 6) AS normalized,
               base IS NOT NULL AS parseable
        FROM parsed
    """,
)
def f37_numeric_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v1 = F.round("value", 1).cast("string")
    raw = (
        F.when(F.col("event_id") % 29 == 0, F.lit("n/a"))
        .when(F.col("event_id") % 7 == 1, F.concat(v1, F.lit("k")))
        .when(F.col("event_id") % 7 == 2, F.concat(v1, F.lit("M")))
        .when(F.col("event_id") % 7 == 3, F.concat(v1, F.lit("%")))
        .when(
            F.col("event_id") % 7 == 4,
            F.concat(
                F.lit("1,"),
                F.lpad(F.round(F.col("value") * 10, 0).cast("bigint").cast("string"), 3, "0"),
            ),
        )
        .otherwise(F.round("value", 2).cast("string"))
    )
    salted = ev.select("event_id", raw.alias("raw"))
    base = F.regexp_extract(
        F.replace(F.col("raw"), F.lit(","), F.lit("")), r"^([0-9]+(?:\.[0-9]+)?)", 1
    ).try_cast("double")
    mult = (
        F.when(F.col("raw").endswith("k"), 1000.0)
        .when(F.col("raw").endswith("M"), 1000000.0)
        .when(F.col("raw").endswith("%"), 0.01)
        .otherwise(1.0)
    )
    return salted.select(
        "event_id",
        "raw",
        F.round(base * mult, 6).alias("normalized"),
        base.isNotNull().alias("parseable"),
    )
