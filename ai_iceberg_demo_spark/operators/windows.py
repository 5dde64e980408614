"""Window functions — SURVEY.md §2.5 (W1–W4 + frame extras).

Reference shapes: last-node-per-conversation top-1
(`neo4j_memory.py:629-639`), per-conversation sequential numbering
(`neo4j_memory.py:327-339`), predecessor linkage for NEXT edges
(`neo4j_memory.py:341-356`), ranked similarity (`neo4j_rag.py:264-265`).

Scale notes: every window here partitions by a high-cardinality key
(orderkey ~1.5M/sf → no skew) so a single hash shuffle distributes
state; per-partition sort is bounded by group size (~7 rows). The
reference's read-MAX-then-write sequence allocation is racy under
concurrency (`neo4j_memory.py:327-339`); `row_number()` at write time
is the deterministic replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()


# --- W1: last-row-per-group (top-1) -------------------------------------
@REGISTRY.register(
    name="w1_last_per_group",
    survey_ref="W1",
    doc="last node in conversation: ORDER BY sequence DESC LIMIT 1 per group "
    "(neo4j_memory.py:629-639).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey FROM (
            SELECT l_orderkey, l_linenumber, l_partkey,
                   ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber DESC, l_partkey DESC) AS rn
            FROM lineitem
        ) WHERE rn = 1
    """,
    bench=True,
)
def w1_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # top-1-per-group as MAX of a lexicographic struct, not a
    # row_number window: the hash aggregate combines map-side, so the
    # shuffle carries one candidate row per (partition, group) instead
    # of every fact row, and no per-partition sort happens at all.
    # (l_linenumber ties exist in the fixtures -> partkey tiebreak is
    # part of the struct ordering.) Measured ~35% faster at sf0.1; the
    # gap widens with group fan-in at cluster scale. The window form
    # stays the right tool when ALL rows are kept (see w2/w4).
    top = li.groupBy("l_orderkey").agg(
        F.max(F.struct("l_linenumber", "l_partkey")).alias("last")
    )
    return top.select(
        "l_orderkey",
        F.col("last.l_linenumber").alias("l_linenumber"),
        F.col("last.l_partkey").alias("l_partkey"),
    )


# --- W2: sequential numbering -------------------------------------------
@REGISTRY.register(
    name="w2_sequence_numbering",
    survey_ref="W2",
    doc="monotonic per-conversation sequence — row_number() replaces the "
    "reference's racy MAX+1 (neo4j_memory.py:327-339).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS BIGINT) AS seq
        FROM lineitem
    """,
)
def w2_sequence_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


# --- W3: predecessor linkage (lag) --------------------------------------
@REGISTRY.register(
    name="w3_lag_predecessor",
    survey_ref="W3",
    doc="find node at sequence-1 to create NEXT edge (neo4j_memory.py:341-356) — "
    "lag() formulation: one shuffle, no self-join (cf. j5_adjacent_sequence).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey,
               LAG(l_partkey) OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey) AS prev_partkey
        FROM lineitem
    """,
)
def w3_lag_predecessor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.lag("l_partkey").over(w).alias("prev_partkey"),
    )


# --- W4: ranked top-k per group -----------------------------------------
@REGISTRY.register(
    name="w4_ranked_topk",
    survey_ref="W4",
    doc="ORDER BY score DESC take k (neo4j_rag.py:264-265) as top-3 per group "
    "with a total tiebreak for determinism.",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
            FROM lineitem
        ) WHERE rn <= 3
    """,
)
def w4_ranked_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


# --- frame spec: moving aggregate (engine extra) ------------------------
@REGISTRY.register(
    name="w5_moving_window_frame",
    survey_ref="§2.5 extras",
    doc="rowsBetween frame (moving sum over last 3 orders per customer) — "
    "analytic frames the reference lacks; standard engine surface.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_total
        FROM orders
    """,
)
def w5_moving_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("moving_total"),
    )


@REGISTRY.register(
    name="w6_distribution_ranks",
    survey_ref="§2.5 extras (rank family)",
    doc="the full rank-function family in one pass: ntile quartiles, "
    "percent_rank, cume_dist and the group's first/nth value over "
    "order totalprice within status — one window spec, one shuffle, "
    "every function shares the same sort.",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w6_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w_full).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


# ---------------------------------------------------------------------------
# W7: cumulative distinct users (growth accounting)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="w7_cumulative_uniques",
    survey_ref="W-family extra (cumulative distinct)",
    doc="daily actives + cumulative unique users: COUNT(DISTINCT) "
    "over an expanding window is unshuffleable at scale, so the "
    "cumulative series uses the FIRST-SEEN trick — min(day) per user "
    "(one user-keyed partial agg), count first-appearances per day, "
    "running-sum the corpus-independent day table. The running window "
    "orders ~365 rows, never events (t13's tiny-table discipline); "
    "the alternative exact spelling shuffles the full (day × user) "
    "prefix per day. Mergeable-sketch variant: a8b's HLL unions give "
    "the same series approximately with incremental dailies.",
    oracle="""
        WITH days AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
            FROM events GROUP BY 1
        ), first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events
            GROUP BY user_id
        ), news AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_seen
            GROUP BY day
        )
        SELECT CAST(d.day AS VARCHAR) AS day, d.n_events, d.n_active,
               CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0))
                    OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_cumulative
        FROM days d LEFT JOIN news n ON d.day = n.day
    """,
)
def w7_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    day = F.col("ts").cast("date")
    days = ev.groupBy(day.alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_active"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    news = first_seen.groupBy("day").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(news, "day", "left")
        .select(
            "day",
            "n_events",
            "n_active",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn("n_cumulative", F.sum("n_new").over(w).cast("bigint"))
        .withColumn("day", F.col("day").cast("string"))
    )


# ---------------------------------------------------------------------------
# W8: gaps-and-islands — longest consecutive-day activity streak
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="w8_activity_streaks",
    survey_ref="W-family extra (gaps-and-islands)",
    doc="longest consecutive-day activity streak per user — the "
    "canonical gaps-and-islands window: distinct active days, then "
    "day − ROW_NUMBER() (as a date offset) is CONSTANT within each "
    "unbroken run, so one groupBy on (user, island key) measures every "
    "streak and a max-struct agg keeps the longest (ties to the "
    "earliest start). Two window/agg passes over per-user compact "
    "day rows — no self-join, no sequence explode; at 100 TB the "
    "per-user day lists are tiny regardless of event volume because "
    "the distinct-day reduction happens FIRST (partial-aggregable).",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), islands AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                            AS INTEGER) AS isl
            FROM days
        ), streaks AS (
            SELECT user_id, isl,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(d) AS streak_start
            FROM islands GROUP BY user_id, isl
        )
        SELECT user_id,
               MAX(len) AS longest_streak,
               CAST(MIN(streak_start) FILTER (
                   WHERE len = (SELECT MAX(s2.len) FROM streaks s2
                                WHERE s2.user_id = streaks.user_id)
               ) AS VARCHAR) AS streak_start,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM streaks
        GROUP BY user_id
    """,
)
def w8_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "isl", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count("*").cast("bigint").alias("len"),
        F.min("d").alias("streak_start"),
    )
    # longest streak w/ earliest-start tiebreak: max(struct(len, -epoch))
    best = streaks.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.col("len"),
                (-F.unix_date(F.col("streak_start"))).alias("neg_start"),
            )
        ).alias("b"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )
    return best.select(
        "user_id",
        F.col("b.len").alias("longest_streak"),
        F.date_from_unix_date(-F.col("b.neg_start")).cast("string").alias("streak_start"),
        "n_streaks",
    )


# ---------------------------------------------------------------------------
# W9: month-over-month growth per segment
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="w9_mom_growth",
    survey_ref="W-family extra (period-over-period reporting)",
    doc="month-over-month revenue growth per market segment: lineitem "
    "revenue rolls up to (segment, ship-month) — the corpus' ONE "
    "shuffle — then a lag window over the tiny month table computes "
    "the delta and pct change (NULL on each segment's first month, "
    "both engines). The canonical period-over-period report shape: "
    "heavy data reduces before any window sees it.",
    oracle="""
        WITH monthly AS (
            SELECT c.c_mktsegment AS segment,
                   STRFTIME(CAST(l.l_shipdate AS DATE), '%Y-%m') AS month,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS DOUBLE)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
        -- revenue/delta stay UNROUNDED: they are sums of exact
        -- DECIMAL(12,2)×DECIMAL(3,2) products (4 decimal places), so
        -- the doubles are bit-identical on both engines, while
        -- ROUND(x, 2) would land exactly on half-cent ties where
        -- HALF_UP (Spark) and HALF_EVEN (DuckDB) diverge (q1's rule)
        SELECT segment, month, revenue,
               revenue - LAG(revenue) OVER w AS delta,
               ROUND((revenue - LAG(revenue) OVER w)
                     / LAG(revenue) OVER w * 100, 4) AS pct_change
        FROM monthly
        WINDOW w AS (PARTITION BY segment ORDER BY month)
    """,
)
def w9_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM").alias("month"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("segment").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "segment",
        "month",
        "revenue",
        (F.col("revenue") - prev).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# w10: trailing time-RANGE frame (interval windows without self-joins)
# ---------------------------------------------------------------------------

_W10_WINDOW_US = 7 * 86400 * 1_000_000  # trailing 7 days, in microseconds


@REGISTRY.register(
    name="w10_trailing_time_window",
    survey_ref="§2.5 extras (time-RANGE frame); w5's time-based sibling",
    doc="trailing-7-day per-user activity: running event count and "
    "value sum over a RANGE frame keyed on integer event-time "
    "MICROSECONDS — the time-based frame w5's ROWS frame can't "
    "express (a row frame counts events, not elapsed time), and the "
    "scale-correct spelling of every 'last N days per entity' metric: "
    "the self-join spelling pairs each event with its trailing window "
    "(quadratic on hot users), the RANGE frame is one user-keyed "
    "shuffle + per-partition sort. Integer microseconds (unix_micros/"
    "epoch_us) keep the frame boundary arithmetic EXACT on both "
    "engines — fractional-second doubles would tie-break "
    "inconsistently; value sums go through DECIMAL so frame sums are "
    "order-independent.",
    oracle=f"""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   AS trailing_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {_W10_WINDOW_US} PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
)
def w10_trailing_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_iceberg_demo_spark.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_W10_WINDOW_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_trailing"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# W11: OHLC time-bucket rollup (open/high/low/close)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="w11_ohlc_rollup",
    survey_ref="W family (time-bucket first/last rollup); w1's bucketed sibling",
    doc="OHLC candlestick rollup — per (event_type, day): open = value "
    "of the first event, close = value of the last, high/low = "
    "max/min, plus the tick count. First/last are deterministic via "
    "the (ts, event_id) tuple order (event_id breaks same-timestamp "
    "ties), spelled as partial-aggregable min/max(struct) so the "
    "whole rollup is ONE map-side-combining shuffle on the uniform "
    "(type, day) key — no window function, no per-group sort; the "
    "classic spelling every metrics store (candlesticks, sensor "
    "rollups, billing meters) runs at ingest time.",
    oracle="""
        WITH ticks AS (
            SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
                   ROUND(value, 6) AS v
            FROM events WHERE value IS NOT NULL
        ), ordered AS (
            SELECT event_type, day, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type, day
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY event_type, day
                                      ORDER BY ts DESC, event_id DESC) AS rn_z
            FROM ticks
        )
        SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day,
               MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
               MAX(v) AS high, MIN(v) AS low,
               MAX(CASE WHEN rn_z = 1 THEN v END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_ticks
        FROM ordered
        GROUP BY event_type, day
        ORDER BY event_type, day
    """,
)
def w11_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_iceberg_demo_spark.tables import load_table

    ticks = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "ts",
            "event_id",
            F.round("value", 6).alias("v"),
        )
    )
    return (
        ticks.groupBy("event_type", "day")
        .agg(
            F.min(F.struct("ts", "event_id", "v")).alias("first"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.struct("ts", "event_id", "v")).alias("last"),
            F.count("*").cast("bigint").alias("n_ticks"),
        )
        .select(
            "event_type", "day",
            F.col("first.v").alias("open"),
            "high", "low",
            F.col("last.v").alias("close"),
            "n_ticks",
        )
        .orderBy("event_type", "day")
    )


# --- W12: rolling cross-series correlation -------------------------------


@REGISTRY.register(
    name="w12_rolling_correlation",
    survey_ref="W-family extra (cross-series relationship); w5 rolls "
    "ONE series' moments — this rolls the RELATIONSHIP between two, "
    "the lead-indicator check (do clicks still convert?)",
    doc="trailing-7-day Pearson correlation between the daily click "
    "and purchase counts: both series come from ONE (day, type) "
    "partial agg pivoted to columns, and CORR runs as a window "
    "aggregate over the trailing frame — days with fewer than 7 "
    "observations emit NULL (a 2-day correlation is noise wearing a "
    "number). A sustained drop in r7 while both volumes hold is the "
    "classic funnel-decoupling alarm. Event volume reduces to the "
    "calendar-bounded day table before any window.",
    oracle="""
        WITH days AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS DOUBLE) AS clicks,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS DOUBLE) AS purchases
            FROM events GROUP BY 1
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(clicks AS BIGINT) AS clicks,
               CAST(purchases AS BIGINT) AS purchases,
               CASE WHEN ROW_NUMBER() OVER (ORDER BY day) >= 7
                    THEN ROUND(CORR(clicks, purchases) OVER (
                         ORDER BY day ROWS BETWEEN 6 PRECEDING
                         AND CURRENT ROW), 6)
               END AS r7
        FROM days ORDER BY day
    """,
)
def w12_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    days = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    w = W.orderBy("day")
    return days.select(
        F.col("day").cast("string").alias("day"),
        F.col("clicks").cast("bigint").alias("clicks"),
        F.col("purchases").cast("bigint").alias("purchases"),
        F.when(
            F.row_number().over(w) >= 7,
            F.round(F.corr("clicks", "purchases").over(w7), 6),
        ).alias("r7"),
    ).orderBy("day")
