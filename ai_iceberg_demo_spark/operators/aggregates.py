"""Aggregations — SURVEY.md §2.4 (A1–A6 + standard surface extras).

Reference shapes: per-group MAX for sequence allocation
(`neo4j_memory.py:327-339`), predicated counts (`neo4j_rag.py:236-241`),
progress counters (`interactive_research_workflow.py:315-317`),
collect-to-list fan-in (`research_manager.py:125-129,464-472`),
MAX+1 allocation (`neo4j_memory.py:335-339`), token-usage accumulation
(`serializable_model_activity.py:14-64`). Plus the standard agg surface
the reference lacks but any engine user expects: rollup/cube, distinct
aggregates, approximate sketches.

Scale notes: all groupBys here are partial-aggregate (map-side combine)
before the shuffle — Spark's HashAggregate does this automatically, so
shuffle volume is #groups, not #rows. `collect_list` is the exception
(no combine benefit); it's kept per-parent-key where group sizes are
bounded (~7 lineitems/order), never per global key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table, persist_once

REGISTRY = Registry()


# --- A1: per-group MAX ---------------------------------------------------
@REGISTRY.register(
    name="a1_max_per_group",
    survey_ref="A1",
    doc="RETURN MAX(n.sequence) per conversation (neo4j_memory.py:327-339).",
    oracle="""
        SELECT l_orderkey, CAST(MAX(l_linenumber) AS INT) AS max_seq
        FROM lineitem GROUP BY l_orderkey
    """,
    bench=True,
)
def a1_max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.max("l_linenumber").alias("max_seq"))
    )


# --- A2: COUNT with predicate -------------------------------------------
@REGISTRY.register(
    name="a2_predicated_count",
    survey_ref="A2",
    doc="count nodes matching a predicate (neo4j_rag.py:236-241) — "
    "conditional count alongside total.",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM lineitem GROUP BY l_returnflag
    """,
)
def a2_predicated_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            F.count("*").alias("n_total"),
        )
    )


# --- A3: cardinality / progress counters --------------------------------
@REGISTRY.register(
    name="a3_progress_counters",
    survey_ref="A3",
    doc="answers_collected vs total_questions style counters "
    "(interactive_research_workflow.py:315-317,496-501).",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_kinds
        FROM events GROUP BY user_id
    """,
)
def a3_progress_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_kinds"),
        )
    )


# --- A4: collect-to-list fan-in -----------------------------------------
@REGISTRY.register(
    name="a4_collect_list_fanin",
    survey_ref="A4",
    doc="gather per-search summaries into all_results (research_manager.py:125-129). "
    "Sorted before join so the hash is order-stable on both engines.",
    oracle="""
        SELECT l_orderkey,
               ARRAY_TO_STRING(LIST_SORT(LIST(l_partkey)), ',') AS parts
        FROM lineitem GROUP BY l_orderkey
    """,
)
def a4_collect_list_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("l_partkey")), lambda x: x.cast("string")),
                ",",
            ).alias("parts")
        )
    )


# --- A5: MAX+1 allocation with empty-group default ----------------------
@REGISTRY.register(
    name="a5_next_sequence",
    survey_ref="A5",
    doc="next_sequence = max_seq + 1 if any else 0 (neo4j_memory.py:335-339,466-470). "
    "LEFT JOIN keeps conversations with no children -> coalesce default.",
    oracle="""
        SELECT o.o_orderkey,
               CAST(COALESCE(MAX(l.l_linenumber) + 1, 0) AS INT) AS next_seq
        FROM orders o
        LEFT JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 49.0
        GROUP BY o.o_orderkey
    """,
)
def a5_next_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 49.0)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.coalesce(F.max("l_linenumber") + 1, F.lit(0)).alias("next_seq"))
    )


# --- A6: usage accumulation ---------------------------------------------
@REGISTRY.register(
    name="a6_usage_accumulation",
    survey_ref="A6",
    doc="token-usage style sums per key (serializable_model_activity.py:14-64).",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    bench=True,
)
def a6_usage_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
            (F.sum(F.col("value").cast("decimal(14,2)")).cast("double") / F.count("*")).alias("avg_value"),
            F.count("*").alias("n"),
        )
    )


# --- standard surface: TPC-H Q1 pricing summary -------------------------
@REGISTRY.register(
    name="q1_pricing_summary",
    survey_ref="A6/§7",
    doc="TPC-H Q1-shaped pricing summary — the engine's headline wide "
    "aggregation (8 aggregates, 2 group keys, map-side combine).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2)) * CAST(1 + l_tax AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
               SUM(l_quantity) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    # Money aggregates in exact DECIMAL then cast to double: identical
    # bits regardless of summation order, so the DuckDB oracle matches
    # without lossy rounding (quantities are integral doubles -> exact).
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_dec = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    tax_dec = (F.lit(1) + F.col("l_tax")).cast("decimal(3,2)")
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(price_dec).cast("double").alias("sum_base_price"),
        F.sum(price_dec * disc_dec).cast("double").alias("sum_disc_price"),
        F.sum(price_dec * disc_dec * tax_dec).cast("double").alias("sum_charge"),
        (F.sum("l_quantity") / n).alias("avg_qty"),
        (F.sum(price_dec).cast("double") / n).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(3,2)")).cast("double") / n).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- standard surface: rollup -------------------------------------------
@REGISTRY.register(
    name="a7_rollup",
    survey_ref="§2.4 extras",
    doc="ROLLUP over (returnflag, linestatus) — hierarchy totals the "
    "reference lacks but the engine exposes as standard surface.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


# --- standard surface: cube + grouping id -------------------------------
@REGISTRY.register(
    name="a10_cube",
    survey_ref="§2.4 extras",
    doc="CUBE over (returnflag, linestatus) with GROUPING() markers — "
    "all 2^n grouping combinations in one shuffle pass (Spark expands "
    "grouping sets map-side; no per-set rescan).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


# --- standard surface: approx sketches (rows-only check) ----------------
@REGISTRY.register(
    name="a8_approx_distinct",
    survey_ref="§2.4 extras",
    doc="approx_count_distinct (HLL++) — sketch aggregates for 100 TB "
    "cardinality estimation. Sketch internals differ across engines, so "
    "this is a rows-only check (exact distinct is covered by a3). "
    "Quantiles are projected as scalar columns (one per requested "
    "quantile), never an array — query outputs stay canonicalizable.",
    oracle=None,
)
def a8_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("price_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.95)").alias("price_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.99)").alias("price_p99"),
    )


@REGISTRY.register(
    name="a8b_hll_mergeable",
    survey_ref="§2.4 extras (sketches)",
    doc="MERGEABLE cardinality sketches — the incremental-analytics "
    "story at 100 TB: per-shard (think per-day Iceberg partition) "
    "hll_sketch_agg sketches are hll_union_agg-merged and estimated "
    "WITHOUT rescanning the corpus; a new day's data costs one "
    "sketch + one union, never a full recount. Output compares the "
    "merged estimate with the whole-table estimate (equal by HLL's "
    "merge semantics — asserted in tests/test_queries_oracle.py). "
    "Sketch bytes differ across engines, so rows-only.",
    oracle=None,
)
def a8b_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    daily = li.groupBy((F.col("l_orderkey") % 7).alias("shard")).agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = daily.agg(
        F.count("*").cast("bigint").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"),
    )
    whole = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("whole_estimate")
    )
    return merged.crossJoin(whole)


# HLL geometry for a8c: 256 registers (8 index bits), 24 rank bits.
_HLL_M = 256
_HLL_W = 24  # rank bits; rank in [1, _HLL_W + 1]
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)  # Flajolet et al. 2007, m >= 128


@REGISTRY.register(
    name="a8c_hll_register_core",
    survey_ref="§2.4 extras (sketches) — a8/a8b's estimator core, hash-checked",
    doc="deterministic HyperLogLog core (Flajolet et al., AofA 2007): "
    "md5-hashed l_partkey split into 8 index bits + 24 rank bits, "
    f"per-register MAX(rank) over {_HLL_M} registers, harmonic-mean "
    "raw estimate with the small-range linear-counting correction — "
    "the whole estimator is md5-deterministic, so unlike a8/a8b "
    "(engine-opaque sketch bytes, rows-only) every register AND the "
    "final estimate hash-match the DuckDB oracle. The two test SFs "
    "exercise BOTH branches (sf0.001 corrects via linear counting, "
    "sf0.01 keeps the raw estimate). Register maxes reduce map-side "
    "(a partition's partial registers ARE an HLL merge — a8b's "
    "mergeability, here auditable); the corpus shuffles 256 partial "
    "rows per partition, never values. Output: hit registers "
    "(reg, max_rank) each carrying the summary columns so one hash "
    "pins registers, correction branch, and the error actually "
    "achieved.",
    oracle=f"""
        WITH hx AS (
            SELECT ('0x' || SUBSTR(MD5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS x
            FROM lineitem
        ), ranked AS (
            SELECT x % {_HLL_M} AS reg,
                   CASE WHEN x // {_HLL_M} = 0 THEN {_HLL_W + 1}
                        ELSE {_HLL_W + 1} - LENGTH(BIN(x // {_HLL_M})) END AS rank
            FROM hx
        ), regs AS (
            SELECT CAST(reg AS BIGINT) AS reg, CAST(MAX(rank) AS BIGINT) AS max_rank
            FROM ranked GROUP BY reg
        ), summ AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_hit,
                   CAST({_HLL_M} - COUNT(*) AS BIGINT) AS n_zero,
                   CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                       / (SUM(POWER(2.0, -max_rank)) + {_HLL_M} - COUNT(*)) AS raw
            FROM regs
        ), est AS (
            SELECT n_hit, n_zero, ROUND(raw, 4) AS raw_est,
                   ROUND(CASE WHEN raw <= 2.5 * {_HLL_M} AND n_zero > 0
                              THEN {_HLL_M} * LN({_HLL_M} / CAST(n_zero AS DOUBLE))
                              ELSE raw END, 4) AS est
            FROM summ
        ), exact AS (
            SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
            FROM lineitem
        )
        SELECT r.reg, r.max_rank, e.n_hit, e.n_zero, e.raw_est, e.est,
               x.exact_distinct,
               ROUND(ABS(e.est - x.exact_distinct) / x.exact_distinct, 4) AS rel_err
        FROM regs r CROSS JOIN est e CROSS JOIN exact x
        ORDER BY r.reg
    """,
)
def a8c_hll_register_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    x = (
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("x")
    )
    y = F.shiftright(F.col("x"), 8)
    ranked = li.select(x).select(
        (F.col("x") % _HLL_M).alias("reg"),
        F.when(y == 0, F.lit(_HLL_W + 1))
        .otherwise(F.lit(_HLL_W + 1) - F.length(F.bin(y)))
        .alias("rank"),
    )
    regs = (
        ranked.groupBy("reg")
        .agg(F.max("rank").alias("max_rank"))
        .select(F.col("reg").cast("long"), F.col("max_rank").cast("long"))
    )
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))) + _HLL_M - F.count("*")
    )
    summ = regs.agg(
        F.count("*").cast("long").alias("n_hit"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("n_zero"),
        raw.alias("raw"),
    ).select(
        "n_hit",
        "n_zero",
        F.round("raw", 4).alias("raw_est"),
        F.round(
            F.when(
                (F.col("raw") <= 2.5 * _HLL_M) & (F.col("n_zero") > 0),
                F.lit(float(_HLL_M)) * F.log(F.lit(_HLL_M) / F.col("n_zero").cast("double")),
            ).otherwise(F.col("raw")),
            4,
        ).alias("est"),
    )
    exact = li.agg(F.countDistinct("l_partkey").cast("long").alias("exact_distinct"))
    return (
        regs.crossJoin(F.broadcast(summ))
        .crossJoin(F.broadcast(exact))
        .select(
            "reg",
            "max_rank",
            "n_hit",
            "n_zero",
            "raw_est",
            "est",
            "exact_distinct",
            F.round(F.abs(F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("reg")
    )


@REGISTRY.register(
    name="a11_percentiles",
    survey_ref="§2.4 extras (holistic)",
    doc="exact quartiles of l_extendedprice per returnflag — the "
    "holistic-aggregate surface (percentile = sort-based, no map-side "
    "combine; the approx_percentile twin in a8's family is the "
    "scale path when exactness can be traded). One scalar column per "
    "quartile (q25/q50/q75), never an array output.",
    oracle="""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS q25,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 4) AS q50,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS q75,
               ROUND(MEDIAN(l_quantity), 4) AS median_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("q25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("q50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("q75"),
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
    )


@REGISTRY.register(
    name="a12_moment_stats",
    survey_ref="§2.4 extras (moments)",
    doc="second-moment statistics per returnflag: sample stddev/variance "
    "and quantity↔price correlation/covariance. Distributed as "
    "one-pass partial moments merged exactly the way DuckDB computes "
    "them sequentially; rounded to absorb last-ulp merge-order drift.",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qty_price
        FROM lineitem GROUP BY l_returnflag
    """,
)
def a12_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
    )


@REGISTRY.register(
    name="a13_pivot_matrix",
    survey_ref="§2.4 extras (pivot)",
    doc="user × event_type count matrix via pivot with an EXPLICIT "
    "value list — at scale pivot must never infer its columns (that's "
    "an extra distinct scan over 100 TB and an unstable schema); with "
    "the list it compiles to one pass of conditional aggregates.",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY user_id
    """,
)
def a13_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# ---------------------------------------------------------------------------
# a11b: mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

_HIST_BINS = 64
_HIST_LO = 0.0
_HIST_HI = 110_000.0  # l_extendedprice upper bound (TPC-H price model);
# fixed a-priori bounds are the equi-width sketch's contract — values
# outside clamp into the edge bins
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS
_HIST_PS = (0.25, 0.50, 0.75, 0.95)


def price_histogram(df: DataFrame) -> DataFrame:
    """(l_returnflag, bin, cnt): the mergeable sketch. The ONLY
    corpus-touching step — one partial-agg shuffle of ≤ groups×bins
    rows; per-shard histograms merge by integer addition, so the
    sketch is exactly incremental (new partition = new histogram +
    elementwise sum), unlike the holistic a11 it approximates."""
    bin_col = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - _HIST_LO) / _HIST_W), F.lit(0)),
        F.lit(_HIST_BINS - 1),
    ).cast("int")
    return df.groupBy("l_returnflag", bin_col.alias("bin")).agg(
        F.count("*").alias("cnt")
    )


@REGISTRY.register(
    name="a11b_histogram_quantiles",
    survey_ref="§2.4 extras (mergeable sketch; approximates a11)",
    doc=f"approximate quartiles+p95 of l_extendedprice per returnflag "
    f"from a {_HIST_BINS}-bin equi-width histogram with linear "
    "interpolation — the MERGEABLE quantile sketch (per-shard "
    "histograms sum elementwise; a8b's HLL is the cardinality "
    "sibling). Error is bounded by one bin width "
    f"({_HIST_W:.0f}), asserted against exact a11 in tests. The "
    "histogram is deterministic, so unlike t-digest the sketch is "
    "exactly SQL-replayable and hash-checked.",
    oracle=f"""
        WITH hist AS (
            SELECT l_returnflag,
                   CAST(LEAST(GREATEST(FLOOR((l_extendedprice - {_HIST_LO}) / {_HIST_W}), 0),
                              {_HIST_BINS - 1}) AS INT) AS bin,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ), cum AS (
            SELECT l_returnflag, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
            FROM hist
        )
        SELECT l_returnflag,
        {",".join(
            f'''       (SELECT ROUND({_HIST_LO} + c.bin * {_HIST_W} + {_HIST_W}
                         * (({p} * c2.n - (c.cum - c.cnt)) / c.cnt), 4)
                 FROM cum c WHERE c.l_returnflag = c2.l_returnflag
                   AND c.cum >= {p} * c2.n
                 ORDER BY c.bin LIMIT 1) AS q{int(p * 100)}'''
            for p in _HIST_PS
        )}
        FROM (SELECT DISTINCT l_returnflag, n FROM cum) c2
    """,
)
def a11b_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir)
    hist = price_histogram(li)
    w_cum = W.partitionBy("l_returnflag").orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy("l_returnflag").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "l_returnflag",
        "bin",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    out = None
    for p in _HIST_PS:
        target = F.lit(p) * F.col("n")
        q = F.round(
            F.lit(_HIST_LO)
            + F.col("bin") * F.lit(_HIST_W)
            + F.lit(_HIST_W) * ((target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")),
            4,
        )
        picked = (
            cum.filter(F.col("cum") >= target)
            .groupBy("l_returnflag")
            .agg(F.min_by(q, F.col("bin")).alias(f"q{int(p * 100)}"))
        )
        out = picked if out is None else out.join(picked, "l_returnflag")
    return out


@REGISTRY.register(
    name="q6_forecast_revenue",
    survey_ref="TPC-H q6 (pushdown showcase)",
    doc="TPC-H q6 revenue-change forecast: one scan, three pushed "
    "predicates (shipdate year, discount band, quantity cap), a "
    "two-column projection, and a single partial-aggregated SUM — the "
    "canonical proof that filters and pruning reach the parquet "
    "reader (PushedFilters + ReadSchema in the plan audit). Revenue "
    "summed as DECIMAL for exact engine-portable addition, emitted as "
    "a rounded double.",
    oracle="""
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 2)
                   AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# a15: frequent-items sketch (DataSketches approx_top_k)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="a15_frequent_tokens",
    survey_ref="§2.4 extra (mergeable frequent-items sketch)",
    doc="heavy-hitter tokens via Spark 4's built-in approx_top_k "
    "(DataSketches frequent-items): the third mergeable-sketch family "
    "member after a8b's HLL and a11b's histogram — per-partition "
    "sketches merge, so the corpus token stream never shuffles, only "
    "sketch partials do. The sketch is EXACT whenever distinct items "
    "fit its tracked capacity (the DataSketches guarantee; the "
    "fixture vocabulary is 31 ≪ 10k), which is what licenses a full "
    "SQL oracle here — at web scale the same query is approximate "
    "with bounded error and the report schema is unchanged.",
    oracle="""
        SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    """,
)
def a15_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    sk = toks.agg(F.expr("approx_top_k(tok, 50, 10000)").alias("top"))
    return sk.select(F.explode("top").alias("t")).select(
        F.col("t.item").alias("token"), F.col("t.count").cast("bigint").alias("cnt")
    )


# ---------------------------------------------------------------------------
# a16: count-min sketch — mergeable frequency table with probe audit
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 64
_CMS_PROBES = ("spark", "merge", "stream", "table", "window")


def cms_bucket(tok: Column, row: Column) -> Column:
    """Row-salted md5 bucket in [0, width): the engine-portable stand-in
    for the d pairwise-independent hash functions (production: xxhash64
    with integer seeds — same semantics, no hex round-trip)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), tok)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH
    )


_CMS_BUCKET_SQL = (
    "(('0x' || SUBSTR(MD5(CAST({row} AS VARCHAR) || ':' || {tok}), 1, 8))::BIGINT"
    f" % {_CMS_WIDTH})"
)


def countmin_sketch(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Build the (row, bucket, cnt) count-min table over a token frame:
    d×w counters (256 cells here), built with ONE shuffle on the
    (row, bucket) key after a d-way map-side fan-out. The table is
    MERGEABLE (cell-wise sum — pinned by test), so at 100 TB each
    partition/day sketches independently and the union groupBy-sums:
    the token stream itself never moves twice."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("row")
    fanned = tokens.select(F.col(tok_col).alias("tok"), rows)
    return (
        fanned.select("row", cms_bucket(F.col("tok"), F.col("row")).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


@REGISTRY.register(
    name="a16_countmin_probe",
    survey_ref="§2.4 extra (mergeable count-min frequency sketch)",
    doc=f"count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) "
    f"— {_CMS_DEPTH}×{_CMS_WIDTH} md5-salted "
    "counters) over the corpus token stream, probed for a fixed term "
    "set: estimate = min over rows of the hashed cell, reported next "
    "to the exact count and the overestimate the collision structure "
    "produced. Count-min never underestimates (property-tested over "
    "every token) and cell-wise summing two shard sketches equals the "
    "union sketch (mergeability test) — the sketch family member for "
    "frequencies a15's top-k tracker doesn't cover: point-queryable, "
    "fixed 256-cell memory at ANY vocabulary size, and the right "
    "answer when 100 TB token streams need per-shard sketching with "
    "one tiny merge. Deterministic hashing makes the whole pipeline "
    "SQL-replayable, so this is hash-oracled, not rows-only.",
    oracle=f"""
        WITH words AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
        ), fanned AS (
            SELECT tok, UNNEST(GENERATE_SERIES(0, {_CMS_DEPTH - 1})) AS row
            FROM words
        ), sketch AS (
            SELECT row, {_CMS_BUCKET_SQL.format(row="row", tok="tok")} AS bucket,
                   COUNT(*) AS cnt
            FROM fanned GROUP BY 1, 2
        ), probes AS (
            SELECT UNNEST({list(_CMS_PROBES)!r}) AS token
        ), pcells AS (
            SELECT p.token, s.cnt
            FROM probes p
            JOIN sketch s
              ON s.bucket = {_CMS_BUCKET_SQL.format(row="s.row", tok="p.token")}
        ), est AS (
            SELECT token, MIN(cnt) AS estimate FROM pcells GROUP BY token
        ), exact AS (
            SELECT tok AS token, COUNT(*) AS exact_cnt
            FROM words GROUP BY tok
        )
        SELECT e.token,
               CAST(e.estimate AS BIGINT) AS estimate,
               CAST(COALESCE(x.exact_cnt, 0) AS BIGINT) AS exact_cnt,
               CAST(e.estimate - COALESCE(x.exact_cnt, 0) AS BIGINT)
                   AS overestimate
        FROM est e LEFT JOIN exact x USING (token)
    """,
)
def a16_countmin_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    sketch = countmin_sketch(toks)
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "token string")
    pbuckets = probes.select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("row"),
    ).select("token", "row", cms_bucket(F.col("token"), F.col("row")).alias("bucket"))
    pcells = F.broadcast(pbuckets).join(sketch, ["row", "bucket"])
    est = pcells.groupBy("token").agg(F.min("cnt").alias("estimate"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    return (
        est.join(
            F.broadcast(exact.withColumnRenamed("tok", "token")), "token", "left"
        )
        .select(
            "token",
            F.col("estimate").cast("bigint").alias("estimate"),
            F.coalesce("exact_cnt", F.lit(0)).cast("bigint").alias("exact_cnt"),
            (F.col("estimate") - F.coalesce("exact_cnt", F.lit(0)))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


@REGISTRY.register(
    name="q14_promo_revenue",
    survey_ref="§7 (TPC-H Q14)",
    doc="TPC-H Q14-shaped promotion effect: the share of one month's "
    "lineitem revenue on PROMO-type parts — lineitem(month) ⋈ "
    "broadcast part, one conditional-sum agg, a 1-row percentage. "
    "The date filter pushes to the lineitem scan; part is dim-sized "
    "so the join never shuffles the fact; the CASE-sum and total-sum "
    "come from the SAME aggregate pass (no second scan). Decimal "
    "casts follow q3's rule so both engines sum identically.",
    oracle="""
        SELECT CAST(ROUND(
            100.0 * SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                  * CAST(1 - l_discount AS DECIMAL(3,2))
                             ELSE 0 END)
            / SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l_discount AS DECIMAL(3,2))), 4) AS DOUBLE)
            AS promo_revenue_pct,
        CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-02-01 00:00:00").cast("timestamp")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev),
            4,
        )
        .cast("double")
        .alias("promo_revenue_pct"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


@REGISTRY.register(
    name="a17_mode_entropy",
    survey_ref="§2.4 extra (distributional per-group features)",
    doc="per-user behavioral distribution features: modal event type "
    "(deterministic tie-break by type name) and Shannon entropy of "
    "the user's event-type distribution in bits — the diversity "
    "feature behavioral models consume, and the classic two-level "
    "aggregation: (user, type) partial counts first (map-side "
    "combine), then per-user mode via max-struct and entropy via "
    "Σ −p·log2(p) — the corpus shuffles once into compact count "
    "rows, never raw events twice.",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY user_id, event_type
        ), tot AS (
            SELECT user_id, SUM(c) AS n FROM counts GROUP BY user_id
        )
        SELECT c.user_id,
               MAX(CASE WHEN r.rn = 1 THEN c.event_type END) AS modal_type,
               CAST(MAX(CASE WHEN r.rn = 1 THEN c.c END) AS BIGINT) AS modal_count,
               ROUND(SUM(-(CAST(c.c AS DOUBLE) / t.n)
                         * LOG2(CAST(c.c AS DOUBLE) / t.n)), 6) AS entropy_bits
        FROM counts c
        JOIN tot t ON t.user_id = c.user_id
        JOIN (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY c DESC, event_type) AS rn
            FROM counts
        ) r ON r.user_id = c.user_id AND r.event_type = c.event_type
        GROUP BY c.user_id
    """,
)
def a17_mode_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    joined = counts.join(tot, "user_id")
    p = F.col("c").cast("double") / F.col("n")
    # mode via max(struct(count, reversed-name)): count desc, then the
    # LEXICOGRAPHICALLY SMALLEST type — negate by using min over
    # struct(-c, type)
    agg = joined.groupBy("user_id").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("event_type").alias("t"))).alias("m"),
        F.round(F.sum(-p * F.log2(p)), 6).alias("entropy_bits"),
    )
    return agg.select(
        "user_id",
        F.col("m.t").alias("modal_type"),
        (-F.col("m.nc")).cast("bigint").alias("modal_count"),
        "entropy_bits",
    )


@REGISTRY.register(
    name="a18_gini_concentration",
    survey_ref="§2.4 extra (inequality/concentration metric)",
    doc="Gini coefficient of revenue concentration across customers "
    "(0 = equal, →1 = concentrated) from the rank formula "
    "G = Σ(2i−n−1)·x_i / (n·Σx) over per-customer revenue sorted "
    "ascending — the customer-concentration risk metric, and for "
    "training data the source-imbalance metric (same query over "
    "per-source token counts). The corpus reduces to per-customer "
    "revenue first (ONE fact shuffle); the rank window then orders "
    "only the customer-sized table — at 100 TB swap that tail for "
    "the binned approximation over a11b's histogram, same report.",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
                   COUNT(*) OVER () AS n
            FROM per_cust
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
               ROUND(SUM(rev), 2) AS total_revenue,
               ROUND(SUM((2.0 * i - n - 1) * rev) / (MAX(n) * SUM(rev)), 6) AS gini
        FROM ranked
    """,
)
def a18_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("rev")
    )
    w = W.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count("*").over(W.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("rev"))
            / (F.max("n") * F.sum("rev")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# A20: join-cardinality estimation before the shuffle
# ---------------------------------------------------------------------------

_A20_TOPN = 20  # heavy hitters priced exactly; the tail is assumed uniform


@REGISTRY.register(
    name="a20_join_cardinality",
    survey_ref="§2.4 extras (planning statistics; a14's output-size twin)",
    doc="join-output cardinality estimation for the l_partkey "
    "self-join (the M:N co-purchase pair explosion a14 warns about): "
    "the EXACT output size Σ c(k)² comes from one key-count groupBy — "
    "no join executed — and the ESTIMATE prices the top-20 heavy "
    "hitters exactly plus a uniform tail (rows²/keys), which is "
    "precisely the histogram a cost-based planner keeps per column. "
    "Output: exact vs estimate vs relative error, plus the share of "
    "pairs owned by the top-20 keys — the number that decides "
    "broadcast vs shuffle vs salt before ANY data moves. One "
    "uniform-key shuffle; everything downstream is a ≤20-row "
    "arithmetic table.",
    oracle=f"""
        WITH c AS (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY l_partkey
        ), ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, l_partkey) AS rn
            FROM c
        ), whole AS (
            SELECT CAST(SUM(c * c) AS BIGINT) AS exact_pairs,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM c
        ), tops AS (
            SELECT CAST(SUM(CASE WHEN rn <= {_A20_TOPN} THEN c * c ELSE 0 END)
                        AS BIGINT) AS top_sq,
                   CAST(SUM(CASE WHEN rn > {_A20_TOPN} THEN c ELSE 0 END)
                        AS BIGINT) AS tail_rows,
                   CAST(SUM(CASE WHEN rn > {_A20_TOPN} THEN 1 ELSE 0 END)
                        AS BIGINT) AS tail_keys
            FROM ranked
        )
        SELECT w.exact_pairs, w.n_keys,
               ROUND(t.top_sq + CASE WHEN t.tail_keys = 0 THEN 0.0
                     ELSE CAST(t.tail_rows AS DOUBLE) * t.tail_rows / t.tail_keys
                     END, 2) AS est_pairs,
               ROUND(ABS(t.top_sq
                         + CASE WHEN t.tail_keys = 0 THEN 0.0
                           ELSE CAST(t.tail_rows AS DOUBLE) * t.tail_rows / t.tail_keys END
                         - w.exact_pairs) / w.exact_pairs, 6) AS rel_error,
               ROUND(t.top_sq / CAST(w.exact_pairs AS DOUBLE), 6) AS top20_share
        FROM whole w CROSS JOIN tops t
    """,
)
def a20_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # persist the O(keys) count table: three tiny consumers below
    c = li.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("c")).transform(persist_once)
    whole = c.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_pairs"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("total_rows"),
    )
    # heavy hitters via TakeOrderedAndProject (never a global window —
    # at real key cardinality a partitionless row_number is the exact
    # bottleneck this estimator exists to predict); the tail terms are
    # whole-minus-top arithmetic
    top = (
        c.orderBy(F.desc("c"), F.asc("l_partkey"))
        .limit(_A20_TOPN)
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("top_sq"),
            F.sum("c").cast("bigint").alias("top_rows"),
            F.count("*").cast("bigint").alias("top_keys"),
        )
    )
    tops = whole.crossJoin(F.broadcast(top)).select(
        "exact_pairs",
        "n_keys",
        "top_sq",
        (F.col("total_rows") - F.col("top_rows")).alias("tail_rows"),
        (F.col("n_keys") - F.col("top_keys")).alias("tail_keys"),
    )
    est = F.col("top_sq") + F.when(F.col("tail_keys") == 0, F.lit(0.0)).otherwise(
        F.col("tail_rows").cast("double") * F.col("tail_rows") / F.col("tail_keys")
    )
    return tops.select(
        "exact_pairs",
        "n_keys",
        F.round(est, 2).alias("est_pairs"),
        F.round(F.abs(est - F.col("exact_pairs")) / F.col("exact_pairs"), 6).alias(
            "rel_error"
        ),
        F.round(F.col("top_sq") / F.col("exact_pairs").cast("double"), 6).alias(
            "top20_share"
        ),
    )


# ---------------------------------------------------------------------------
# A21: approx-percentile accuracy audit — the license for every
# "swap exact → approx_percentile at 100 TB" note in SCALE.md
# ---------------------------------------------------------------------------

_A21_ACCURACY = 10_000  # rank error <= 1/accuracy
_A21_TOL = 0.01         # the audited value-error bound (1%)


@REGISTRY.register(
    name="a21_approx_quantile_audit",
    survey_ref="§2.4 extras (mergeable-sketch accuracy audit; a11's "
    "scale-path license)",
    doc="approx_percentile accuracy audit: a11's exact q50/q95 per "
    "returnflag next to the mergeable Greenwald-Khanna sketch at "
    f"accuracy {_A21_ACCURACY}, with the within-1% verdicts computed "
    "in-query — the measured license for every 'swap exact → approx "
    "at 100 TB' note this engine's scale plan makes (a11, u15, u20, "
    "t59). The sketch values themselves are partition-order-dependent "
    "and so deliberately NOT output columns; the audit exports the "
    "exact values (hash-checked) plus the tolerance verdicts, which "
    "are engine-stable because the measured error (~2e-4) sits two "
    "orders under the bar. Sketch partials merge map-side — the exact "
    "holistic sort is the only corpus-wide cost, and it's the thing "
    "the audit retires.",
    oracle=f"""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 4) AS exact_q50,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS exact_q95,
               TRUE AS q50_within_1pct,
               TRUE AS q95_within_1pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a21_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.50)).alias("ex50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("ex95"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.50), F.lit(_A21_ACCURACY)
        ).alias("ap50"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.95), F.lit(_A21_ACCURACY)
        ).alias("ap95"),
    )
    return agg.select(
        "l_returnflag",
        F.round("ex50", 4).alias("exact_q50"),
        F.round("ex95", 4).alias("exact_q95"),
        (F.abs(F.col("ap50") / F.col("ex50") - 1) <= _A21_TOL).alias(
            "q50_within_1pct"
        ),
        (F.abs(F.col("ap95") / F.col("ex95") - 1) <= _A21_TOL).alias(
            "q95_within_1pct"
        ),
    ).orderBy("l_returnflag")


# --- A22: KMV sketch + set-overlap estimation (the intersection sketch) --

_KMV_K = 64


@REGISTRY.register(
    name="a22_kmv_overlap",
    survey_ref="§2.4 sketches (a8/a8c estimate ONE set's cardinality; "
    "KMV estimates INTERSECTIONS — the question HLL cannot answer "
    "without inclusion-exclusion error blowup)",
    doc=f"k-minimum-values sketch (Bar-Yossef et al. 2002) over each "
    f"event type's distinct USER-DAY set (k={_KMV_K} smallest md5 "
    "hashes, deterministic — user-days, because every user touches "
    "every type over the corpus and plain user sets have Jaccard "
    "1.0): for every type pair, the union sketch "
    f"is the {_KMV_K} smallest of the merged sketches, Jaccard is "
    "estimated as the fraction of the union sketch present in BOTH "
    "input sketches, and the estimate stands NEXT TO the exact "
    "Jaccard with its absolute error — the sketch audited the a21 "
    "way. Scale: per-type sketch = one distinct reduction + "
    "per-type top-k (TakeOrdered partials — sketches MERGE, which "
    "is the entire point at 100 TB: each partition sends k rows); "
    "pair comparison touches 2k-row frames only.",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT event_type,
                   CAST(user_id AS VARCHAR) || ':' ||
                       CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
            FROM events
        ), hashed AS (
            SELECT event_type, elem, MD5(elem) AS h FROM du
        ), sk AS (
            SELECT event_type, elem, h FROM (
                SELECT event_type, elem, h,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY h) AS rn
                FROM hashed) WHERE rn <= {_KMV_K}
        ), pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM du) a
            JOIN (SELECT DISTINCT event_type FROM du) b
              ON a.event_type < b.event_type
        ), merged AS (
            SELECT p.type_a, p.type_b, s.elem, s.h,
                   s.event_type = p.type_a AS from_a
            FROM pairs p
            JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
        ), union_sk AS (
            SELECT type_a, type_b, elem,
                   COUNT(*) AS n_sides
            FROM (
                SELECT type_a, type_b, elem, h, from_a,
                       DENSE_RANK() OVER (PARTITION BY type_a, type_b
                                          ORDER BY h) AS rk
                FROM merged) WHERE rk <= {_KMV_K}
            GROUP BY type_a, type_b, elem
        ), est AS (
            SELECT type_a, type_b,
                   ROUND(SUM(CASE WHEN n_sides = 2 THEN 1.0 ELSE 0.0 END)
                         / COUNT(*), 6) AS est_jaccard
            FROM union_sk GROUP BY type_a, type_b
        ), exact AS (
            SELECT type_a, type_b,
                   ROUND(SUM(CASE WHEN n = 2 THEN 1.0 ELSE 0.0 END)
                         / COUNT(*), 6) AS exact_jaccard
            FROM (SELECT p.type_a, p.type_b, d.elem, COUNT(*) AS n
                  FROM pairs p JOIN du d
                    ON d.event_type IN (p.type_a, p.type_b)
                  GROUP BY p.type_a, p.type_b, d.elem) x
            GROUP BY type_a, type_b
        )
        SELECT e.type_a, e.type_b, s.est_jaccard, e.exact_jaccard,
               ROUND(ABS(s.est_jaccard - e.exact_jaccard), 6) AS abs_err
        FROM exact e JOIN est s USING (type_a, type_b)
        ORDER BY e.type_a, e.type_b
    """,
)
def a22_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    du = ev.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("ts").cast("date").cast("string"),
        ).alias("elem"),
    ).distinct()
    hashed = du.select("event_type", "elem", F.md5("elem").alias("h"))
    w_sk = W.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w_sk))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "elem", "h")
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    merged = pairs.join(
        sk,
        (sk.event_type == F.col("type_a")) | (sk.event_type == F.col("type_b")),
    ).select(
        "type_a", "type_b", "elem", "h",
        (F.col("event_type") == F.col("type_a")).alias("from_a"),
    )
    w_u = W.partitionBy("type_a", "type_b").orderBy("h")
    union_sk = (
        merged.withColumn("rk", F.dense_rank().over(w_u))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("type_a", "type_b", "elem")
        .agg(F.count("*").alias("n_sides"))
    )
    est = union_sk.groupBy("type_a", "type_b").agg(
        F.round(
            F.sum(F.when(F.col("n_sides") == 2, 1.0).otherwise(0.0)) / F.count("*"),
            6,
        ).alias("est_jaccard")
    )
    both = pairs.join(
        du,
        (du.event_type == F.col("type_a")) | (du.event_type == F.col("type_b")),
    ).select("type_a", "type_b", "elem")
    exact = (
        both.groupBy("type_a", "type_b", "elem")
        .agg(F.count("*").alias("n"))
        .groupBy("type_a", "type_b")
        .agg(
            F.round(
                F.sum(F.when(F.col("n") == 2, 1.0).otherwise(0.0)) / F.count("*"),
                6,
            ).alias("exact_jaccard")
        )
    )
    return (
        exact.join(est, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "est_jaccard",
            "exact_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("type_a", "type_b")
    )


# --- A23: trimmed & winsorized means (the robust-location pair) ---------

_A23_TRIM = 0.05  # fraction clipped from EACH tail


@REGISTRY.register(
    name="a23_robust_means",
    survey_ref="§2.4 robust aggregation; t59 QUARANTINES outliers — "
    "these absorb them: the location estimates a metrics pipeline "
    "publishes when it cannot afford row-level triage",
    doc=f"trimmed and winsorized means per event_type at "
    f"{_A23_TRIM:.0%} per tail: the trimmed mean drops values "
    "outside the exact [p5, p95] fences, the winsorized mean CLAMPS "
    "them to the fences (keeping the row count), both beside the "
    "raw mean so the contamination delta is visible per type. "
    "Fences are a11's exact per-type percentile surface (broadcast "
    "back); the second pass is map-side clamp/filter + one "
    "partial-agg shuffle — at 100 TB the fences swap to "
    "approx_percentile exactly as a21 prices.",
    oracle=f"""
        WITH vals AS (
            SELECT event_type, value FROM events WHERE value IS NOT NULL
        ), fences AS (
            SELECT event_type,
                   QUANTILE_CONT(value, {_A23_TRIM}) AS lo,
                   QUANTILE_CONT(value, {1 - _A23_TRIM}) AS hi
            FROM vals GROUP BY event_type
        )
        SELECT v.event_type,
               ROUND(AVG(v.value), 4) AS raw_mean,
               ROUND(AVG(CASE WHEN v.value >= f.lo AND v.value <= f.hi
                              THEN v.value END), 4) AS trimmed_mean,
               ROUND(AVG(LEAST(GREATEST(v.value, f.lo), f.hi)), 4)
                   AS winsorized_mean,
               ROUND(f.lo, 4) AS fence_lo,
               ROUND(f.hi, 4) AS fence_hi
        FROM vals v JOIN fences f USING (event_type)
        GROUP BY v.event_type, f.lo, f.hi
        ORDER BY v.event_type
    """,
)
def a23_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    fences = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(_A23_TRIM)).alias("lo"),
        F.percentile("value", F.lit(1 - _A23_TRIM)).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    inside = (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.round(F.avg(F.when(inside, F.col("value"))), 4).alias("trimmed_mean"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.first("lo"), 4).alias("fence_lo"),
            F.round(F.first("hi"), 4).alias("fence_hi"),
        )
        .orderBy("event_type")
    )


# --- A24: market-basket association rules (pairwise Apriori) -------------

_A24_MIN_SUPPORT = 2  # baskets containing the pair: the fixture
# assigns parts ~uniformly, so even support 2 is a birthday-problem
# coincidence (support 20 returns zero rows at every SF — verified)
_A24_TOPK = 15


@REGISTRY.register(
    name="a24_market_basket",
    survey_ref="§2.4 extra (association mining); j5 links ADJACENT "
    "lineitems — this mines CO-OCCURRENCE across the whole basket, "
    "the Apriori level-2 pass every recommender bootstrap runs",
    doc="pairwise association rules over order baskets: distinct parts "
    "per order, within-basket pairs via the sorted self-join (a<b — "
    "each unordered pair once), then support (baskets with both), "
    "confidence P(b|a), and lift = support·N/(n_a·n_b), top "
    f"{_A24_TOPK} by lift at min support {_A24_MIN_SUPPORT}. Lift > "
    "1 is the 'frequently bought together' signal; confidence alone "
    "rewards popular parts (the classic beginner mistake — lift "
    "corrects for the base rate). Pair explosion is bounded by "
    "items-per-basket² (TPC-H ≤ 7 items → ≤ 21 pairs/order), "
    "support counts are ONE (a, b)-keyed wordcount, and the "
    "single-item counts broadcast back.",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem
        ), nb AS (
            SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS n FROM baskets
        ), singles AS (
            SELECT part, CAST(COUNT(*) AS DOUBLE) AS n_part
            FROM baskets GROUP BY part
        ), pairs AS (
            SELECT a.part AS part_a, b.part AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS support
            FROM baskets a JOIN baskets b
              ON b.okey = a.okey AND b.part > a.part
            GROUP BY a.part, b.part
            HAVING COUNT(*) >= {_A24_MIN_SUPPORT}
        )
        SELECT p.part_a, p.part_b, p.support,
               ROUND(p.support / sa.n_part, 4) AS confidence_a_to_b,
               ROUND(p.support * n.n / (sa.n_part * sb.n_part), 4) AS lift
        FROM pairs p
        JOIN singles sa ON sa.part = p.part_a
        JOIN singles sb ON sb.part = p.part_b
        CROSS JOIN nb n
        ORDER BY lift DESC, p.part_a, p.part_b
        LIMIT {_A24_TOPK}
    """,
)
def a24_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    nb = baskets.agg(F.countDistinct("okey").cast("double").alias("n"))
    singles = baskets.groupBy("part").agg(
        F.count("*").cast("double").alias("n_part")
    )
    a = baskets.select("okey", F.col("part").alias("part_a"))
    b = baskets.select("okey", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("part_b") > F.col("part_a"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= _A24_MIN_SUPPORT)
    )
    sa = singles.select(F.col("part").alias("part_a"), F.col("n_part").alias("na"))
    sb = singles.select(F.col("part").alias("part_b"), F.col("n_part").alias("nb_"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.col("na"), 4).alias("confidence_a_to_b"),
            F.round(
                F.col("support") * F.col("n") / (F.col("na") * F.col("nb_")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(_A24_TOPK)
    )
