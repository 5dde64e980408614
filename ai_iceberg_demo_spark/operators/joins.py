"""Joins — SURVEY.md §2.3 (J1–J7, plus J8 as-of / J9 interval extras).

The reference's joins are Cypher traversals: parent→children 1-hop
(`neo4j_memory.py:327-333,703-721`), union of two relationship types
(`:329,705`), existence semi-joins (`:605-614`), insert-guard anti
joins (`ui/backend/main.py:296-309`), adjacent-sequence NEXT linkage
(`neo4j_memory.py:341-356`), cosine similarity theta-join
(`neo4j_rag.py:258-279`) and the implicit star shape of the graph
model. Spark-first: equi-joins with broadcast for small sides, window
`lag` instead of self-join shuffles where it wins, LSH for the
similarity join at scale (see vector.similarity).

Scale notes:
- orders⋈lineitem is the big fact-fact join; both sides are bucketed
  by orderkey in the Iceberg layout so it's a co-located sort-merge
  join with no shuffle. Locally Catalyst picks SMJ + AQE.
- dimension joins (nation/region/supplier/part/customer at TPC-H
  scale ratios) are broadcast — `F.broadcast` hints make that
  explicit rather than relying on the size estimator.
- the adjacent-sequence join is expressed with `lag()` over
  (orderkey, linenumber) — one shuffle on orderkey, no second join
  pass over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

REGISTRY = Registry()


# --- J1: equi inner join (1-hop traversal) + per-parent agg -------------
@REGISTRY.register(
    name="j1_parent_children_join",
    survey_ref="J1",
    doc="(c:Conversation)-[:HAS_MESSAGE]->(n): parent joined to children "
    "(neo4j_memory.py:327-333). orders=conversations, lineitem=children.",
    oracle="""
        SELECT o.o_orderkey, o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    bench=True,
)
def j1_parent_children_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # Aggregation is pushed BELOW the join (Catalyst doesn't do this
    # rewrite itself): the fact table collapses to one row per parent
    # before joining, so the shuffle carries ~|orders| partial rows
    # instead of the full joined fact stream, and no post-join groupBy
    # remains. Valid because the grouping key is the join key and
    # o_orderstatus is functionally dependent on it. Orders without
    # children drop out either way (inner join).
    #
    # The agg-below-join is the part that survives scale-up. No
    # broadcast hint on orders: it is the parent/fact-sized side, so a
    # forced broadcast would OOM on a real cluster — the size threshold
    # / AQE picks broadcast at fixture scale and sort-merge at 100 TB.
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("total_price"),
    )
    return (
        orders.select("o_orderkey", "o_orderstatus")
        .join(per_order, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .select("o_orderkey", "o_orderstatus", "n_items", "total_price")
    )


# --- J2: multi-edge union join ------------------------------------------
@REGISTRY.register(
    name="j2_union_edge_join",
    survey_ref="J2",
    doc="Traversal over HAS_MESSAGE|HAS_RESULT unions two child types before the "
    "join (neo4j_memory.py:329,705). Children split by returnflag play the two labels.",
    oracle="""
        WITH children AS (
            SELECT l_orderkey AS okey, 'result' AS kind FROM lineitem WHERE l_returnflag = 'R'
            UNION ALL
            SELECT l_orderkey AS okey, 'message' AS kind FROM lineitem WHERE l_returnflag <> 'R'
        )
        SELECT o.o_orderkey, c.kind, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN children c ON o.o_orderkey = c.okey
        GROUP BY o.o_orderkey, c.kind
    """,
)
def j2_union_edge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    results = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey"), F.lit("result").alias("kind")
    )
    messages = li.filter(F.col("l_returnflag") != "R").select(
        F.col("l_orderkey").alias("okey"), F.lit("message").alias("kind")
    )
    children = results.unionByName(messages)
    return (
        orders.join(children, orders.o_orderkey == children.okey, "inner")
        .groupBy("o_orderkey", "kind")
        .agg(F.count("*").alias("n"))
    )


# --- J3: left semi join (existence) -------------------------------------
@REGISTRY.register(
    name="j3_semi_join_exists",
    survey_ref="J3",
    doc="'is this Result already linked?' existence check (neo4j_memory.py:605-614).",
    oracle="""
        SELECT o_orderkey, o_orderstatus FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49.0)
    """,
)
def j3_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 49.0)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


# --- J4: left anti join (insert guard / dedup) --------------------------
@REGISTRY.register(
    name="j4_anti_join_guard",
    survey_ref="J4",
    doc="'has this question already been saved?' insert-only-if-absent "
    "(ui/backend/main.py:296-309).",
    oracle="""
        SELECT o_orderkey, o_orderstatus FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
    """,
)
def j4_anti_join_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


# --- J5: self-join on adjacent sequence (NEXT linkage) ------------------
@REGISTRY.register(
    name="j5_adjacent_sequence",
    survey_ref="J5",
    doc="NEXT edge: node at sequence joined to node at sequence-1 "
    "(neo4j_memory.py:341-356). Expressed as an explicit self-join; the "
    "window-lag formulation is w3_lag_predecessor.",
    oracle="""
        SELECT a.l_orderkey, a.l_linenumber, a.l_partkey,
               b.l_partkey AS prev_partkey
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber + 1
    """,
)
def j5_adjacent_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    a = li.alias("a")
    b = li.select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("prev_partkey")).alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber") + 1),
        "inner",
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.col("a.l_partkey").alias("l_partkey"),
        F.col("b.prev_partkey").alias("prev_partkey"),
    )


# --- J7: multi-way star join --------------------------------------------
@REGISTRY.register(
    name="j7_star_join",
    survey_ref="J7",
    doc="Star join over the graph model's Conversation->Message->... chains "
    "(neo4j_memory.py:703-751) as a TPC-H-Q5-shaped revenue-by-nation query. "
    "Dimensions broadcast; fact-fact join co-located by orderkey.",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY n.n_name
    """,
    bench=True,
)
def j7_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") != "F")
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def asof_attach(
    ev: DataFrame, left_type: str = "purchase", right_type: str = "click"
) -> DataFrame:
    """Each `left_type` row picks up the same user's most recent
    `right_type` row at-or-before its timestamp (left-join semantics:
    no prior right row → nulls). The single-shuffle window form —
    see the j8 registration doc for why not a range join.

    Clicks sort before purchases at equal ts (kind asc) -> "<=" as-of
    semantics; event_id is the final tiebreak so the result is total-
    order deterministic even with duplicate (user, ts) pairs.
    """
    tagged = ev.filter(F.col("event_type").isin(right_type, left_type)).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == right_type, 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "kind",
        F.last(F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_event_id"),
        F.last(F.when(F.col("kind") == 0, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("click_value"),
    )
    return win.filter(F.col("kind") == 1).drop("kind")


# --- J8: as-of join (union + ordered-window composition) -----------------
@REGISTRY.register(
    name="j8_asof_join",
    bench=True,
    survey_ref="§2.3 extras (as-of)",
    doc="As-of join — SURVEY.md §2.3 notes the reference has none; a "
    "training-data pipeline needs it constantly (attach the latest "
    "snapshot/label at-or-before each fact row). Each purchase event "
    "picks up the user's most recent click at-or-before its timestamp. "
    "Spark-first shape: NOT a range join — tag both streams, union, one "
    "window over (user_id, ts) with last(ignorenulls) — a single shuffle "
    "on user_id regardless of time span, no candidate-pair blowup.",
    oracle="""
        WITH tagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
            FROM events WHERE event_type IN ('click', 'purchase')
        ), win AS (
            SELECT user_id, ts, event_id, kind,
                   LAST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id,
                   LAST_VALUE(CASE WHEN kind = 0 THEN value END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
            FROM tagged
        )
        SELECT event_id, user_id, ts, click_event_id, click_value
        FROM win WHERE kind = 1
    """,
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_attach(load_table(spark, "events", sf_dir))


# --- J9: interval/range join (range-frame window composition) ------------
@REGISTRY.register(
    name="j9_interval_join",
    survey_ref="§2.3 extras (interval)",
    doc="Interval join — per purchase, how many clicks the same user made "
    "in the preceding hour. Spark-first shape: a RANGE-frame window over "
    "epoch seconds, not a theta self-join — candidate pairs never "
    "materialize, one shuffle on user_id, O(rows) work per partition. "
    "The theta-join spelling (e.ts BETWEEN p.ts - 1h AND p.ts) explodes "
    "quadratically on hot users at 100 TB.",
    oracle="""
        WITH tagged AS (
            SELECT user_id, event_id,
                   CAST(EPOCH(ts) AS BIGINT) AS sec,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
            FROM events WHERE event_type IN ('click', 'purchase')
        ), win AS (
            SELECT user_id, event_id, is_click,
                   CAST(COALESCE(SUM(is_click) OVER (
                       PARTITION BY user_id ORDER BY sec
                       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 0) AS BIGINT)
                     AS clicks_last_hour
            FROM tagged
        )
        SELECT event_id, user_id, clicks_last_hour
        FROM win WHERE is_click = 0
    """,
)
def j9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    win = tagged.select(
        "event_id",
        "user_id",
        "is_click",
        F.coalesce(F.sum("is_click").over(w), F.lit(0)).cast("bigint").alias("clicks_last_hour"),
    )
    return win.filter(F.col("is_click") == 0).drop("is_click")


# --- standard surface: TPC-H-shaped multi-way joins ---------------------
# The fixture tables are TPC-H-ish (TESTDATA.md), so the engine carries
# the two canonical join-planning benchmarks: Q3 (fact⋈fact⋈dim with
# date pruning) and Q5 (a 6-table snowflake). They exist to prove the
# planner-facing claims in the module docstring: dims broadcast, fact
# joins shuffle on their keys once, filters reach the scans.


@REGISTRY.register(
    name="q3_shipping_priority",
    survey_ref="§7 (TPC-H Q3)",
    doc="TPC-H Q3-shaped shipping priority: customer(BUILDING) ⋈ orders "
    "⋈ lineitem with date pruning on both facts, revenue agg per order, "
    "top-10. customer is broadcast (dim-sized at TPC-H ratios after the "
    "segment filter); orders⋈lineitem shuffles on orderkey once and the "
    "date filters reach the parquet scans (PushedFilters).",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@REGISTRY.register(
    name="q5_local_supplier_volume",
    survey_ref="§7 (TPC-H Q5)",
    doc="TPC-H Q5-shaped snowflake: 6-table join where the order's "
    "customer and the lineitem's supplier must share a nation inside "
    "one region. supplier/nation/region broadcast (dims); "
    "customer⋈orders and orders⋈lineitem shuffle on their keys; the "
    "region filter prunes through the broadcast chain before the fact "
    "shuffle happens.",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)") * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H q4: order-priority checking (correlated EXISTS as semi-join)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q4_order_priority",
    survey_ref="J3/A2 composition (TPC-H q4)",
    doc="TPC-H q4's shape on the fixture's columns: orders placed in "
    "1996-Q1 with at least one lineitem shipped more than 90 days "
    "after the order date, counted per priority — the canonical "
    "correlated-EXISTS benchmark (the fixture carries l_shipdate, "
    "not commit/receipt dates, so lateness is ship-vs-order). "
    "Spark-first: EXISTS is a LEFT SEMI join with the correlated "
    "date condition in the join predicate (the lineitem side never "
    "widens the row), the quarter filter prunes the orders scan "
    "BEFORE the join, and the priority rollup is a tiny partial agg. "
    "At 100 TB both sides are date-partitioned and prune to a few "
    "partitions each.",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


@REGISTRY.register(
    name="q10_returned_items",
    survey_ref="§7 (TPC-H Q10)",
    doc="TPC-H Q10-shaped returned-item report: customers ranked by "
    "revenue lost to returns in one quarter — lineitem(R-flag) ⋈ "
    "orders(quarter) ⋈ customer ⋈ nation, revenue agg per customer, "
    "top-20. Both date and return-flag predicates push to the scans; "
    "customer and nation broadcast; the one shuffle is "
    "orders⋈lineitem on orderkey + the customer-keyed agg. The "
    "decimal revenue arithmetic follows q3's casting so both engines "
    "sum identical decimals before the final double.",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@REGISTRY.register(
    name="q18_large_volume_customers",
    survey_ref="§7 (TPC-H Q18)",
    doc="TPC-H Q18-shaped large-volume customers: orders whose total "
    "lineitem quantity exceeds 250, joined to their customers, top-20 "
    "by quantity. The HAVING pre-aggregation runs BEFORE any join "
    "(one orderkey-keyed partial agg over lineitem) and survivors are "
    "a tiny set — so the orders/customer joins are broadcast-sized "
    "and the fact table is touched exactly once. The classic "
    "semi-join-through-aggregation shape.",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 250
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
               CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(14,2)), 2) AS DOUBLE)
                   AS o_totalprice,
               b.total_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY b.total_qty DESC, o.o_orderkey
        LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.round(F.col("o_totalprice").cast("decimal(14,2)"), 2)
            .cast("double")
            .alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J10: blocked fuzzy join (entity resolution without all-pairs)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="j10_blocked_fuzzy_join",
    survey_ref="J6's lexical sibling (entity resolution); F28's join form",
    doc="entity resolution as a BLOCKED fuzzy join: a dirty registry "
    "(every 25th customer re-enters with a transposed name, "
    "'Custmoer#…' — edit distance 2, t20's planting pattern) is "
    "matched back to the clean table by levenshtein ≤ 2, but ONLY "
    "within blocks sharing the record's stable key digits — the "
    "discipline that makes fuzzy matching survive scale: levenshtein "
    "prices in-block pairs, never the n² cross. In production the "
    "block key is a phonetic/q-gram/LSH bucket; here the numeric "
    "suffix plays that role so the result is exactly the planted "
    "matches (self-pairs excluded by the dirty-side marker). Both "
    "sides' planting is in-query, so the whole resolver hash-checks.",
    oracle="""
        WITH dirty AS (
            SELECT c_custkey,
                   REPLACE(c_name, 'Customer#', 'Custmoer#') AS dirty_name,
                   REGEXP_EXTRACT(c_name, '[0-9]+') AS blk
            FROM customer WHERE c_custkey % 25 = 0
        ), clean AS (
            SELECT c_custkey AS clean_key, c_name AS clean_name,
                   REGEXP_EXTRACT(c_name, '[0-9]+') AS blk
            FROM customer
        )
        SELECT d.c_custkey AS dirty_key, d.dirty_name,
               c.clean_key, c.clean_name,
               CAST(levenshtein(d.dirty_name, c.clean_name) AS INT) AS distance
        FROM dirty d JOIN clean c ON d.blk = c.blk
        WHERE levenshtein(d.dirty_name, c.clean_name) <= 2
        ORDER BY dirty_key, clean_key
    """,
)
def j10_blocked_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    blk = F.regexp_extract(F.col("c_name"), "[0-9]+", 0)
    dirty = cust.filter(F.col("c_custkey") % 25 == 0).select(
        F.col("c_custkey").alias("dirty_key"),
        F.regexp_replace("c_name", "Customer#", "Custmoer#").alias("dirty_name"),
        blk.alias("blk"),
    )
    clean = cust.select(
        F.col("c_custkey").alias("clean_key"),
        F.col("c_name").alias("clean_name"),
        blk.alias("blk"),
    )
    dist = F.levenshtein(F.col("dirty_name"), F.col("clean_name"))
    return (
        dirty.join(clean, "blk")
        .filter(dist <= 2)
        .select(
            "dirty_key",
            "dirty_name",
            "clean_key",
            "clean_name",
            dist.cast("int").alias("distance"),
        )
        .orderBy("dirty_key", "clean_key")
    )


# ---------------------------------------------------------------------------
# J11: numeric band join (|a-b| <= eps) via epsilon-bucket probing
# ---------------------------------------------------------------------------

_J11_EPS = 0.02  # price tolerance


@REGISTRY.register(
    name="j11_band_join",
    survey_ref="J-family extra (the numeric-tolerance join); j8/j9 "
    "handle TIME proximity with windows — this is proximity on a "
    "VALUE axis, where the window trick doesn't apply and the naive "
    "spelling is a theta join",
    doc="find near-identical charge amounts across different orders "
    f"(|price_a − price_b| ≤ {_J11_EPS}, the duplicate-transaction "
    "screen an audit runs): each distinct price buckets to "
    f"FLOOR(v/{_J11_EPS}) and candidates come from an EQUI-join on "
    "bucket plus the +1 neighbor (two bucket keys cover every "
    "±ε pair exactly once after the a<b dedup) — never the "
    "|a−b|≤ε theta join, which Spark can only execute as a "
    "nested-loop cross. Output: per-bucket-pair verified matches "
    "rolled up to match count, distinct prices involved, and mean "
    "gap. Scale: distinct-price reduction first (one shuffle), "
    "bucket equi-joins on uniform keys; candidate volume is bounded "
    "by pairs-per-2ε-cell, never rows².",
    oracle=f"""
        WITH prices AS (
            SELECT DISTINCT ROUND(CAST(l_extendedprice AS DOUBLE), 2) AS v
            FROM lineitem
        ), buck AS (
            SELECT v, CAST(FLOOR(v / {_J11_EPS}) AS BIGINT) AS b FROM prices
        ), cand AS (
            SELECT a.v AS va, x.v AS vb
            FROM buck a JOIN buck x ON x.b = a.b AND x.v > a.v
            UNION ALL
            SELECT a.v, x.v
            FROM buck a JOIN buck x ON x.b = a.b + 1 AND x.v > a.v
        ), verified AS (
            SELECT va, vb, vb - va AS gap FROM cand
            WHERE vb - va <= {_J11_EPS}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT va) AS BIGINT) AS n_lower_prices,
               ROUND(AVG(gap), 6) AS mean_gap,
               ROUND(MAX(gap), 6) AS max_gap,
               MAX(gap) <= {_J11_EPS} AS all_within_band
        FROM verified
    """,
)
def j11_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    prices = li.select(
        F.round(F.col("l_extendedprice").cast("double"), 2).alias("v")
    ).distinct()
    buck = prices.select("v", F.floor(F.col("v") / _J11_EPS).cast("bigint").alias("b"))
    a = buck.select(F.col("v").alias("va"), F.col("b").alias("ba"))
    x = buck.select(F.col("v").alias("vb"), F.col("b").alias("bb"))
    same = a.join(x, (F.col("bb") == F.col("ba")) & (F.col("vb") > F.col("va")))
    nxt = a.join(x, (F.col("bb") == F.col("ba") + 1) & (F.col("vb") > F.col("va")))
    cand = same.unionAll(nxt).select("va", "vb")
    verified = cand.filter(F.col("vb") - F.col("va") <= _J11_EPS).select(
        "va", "vb", (F.col("vb") - F.col("va")).alias("gap")
    )
    return verified.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("va").cast("bigint").alias("n_lower_prices"),
        F.round(F.avg("gap"), 6).alias("mean_gap"),
        F.round(F.max("gap"), 6).alias("max_gap"),
        (F.max("gap") <= _J11_EPS).alias("all_within_band"),
    )


# ---------------------------------------------------------------------------
# J12: Fellegi–Sunter probabilistic record linkage (scored ER decisions)
# ---------------------------------------------------------------------------

# Per-field agreement/disagreement log-odds weights (log2(m/u) in the
# Fellegi–Sunter model). Constants here — production estimates them by
# EM over the comparison-vector counts; the scoring/blocking plan is
# identical either way.
_FS_NAME_AGREE, _FS_NAME_DIS = 4.0, -2.0
_FS_BAL_AGREE, _FS_BAL_DIS = 2.5, -1.5
_FS_SEG_AGREE = 0.5  # block key: always agrees inside a block
_FS_BAL_EPS = 0.02
_FS_MATCH_T, _FS_POSSIBLE_T = 6.0, 1.0


@REGISTRY.register(
    name="j12_entity_resolution",
    survey_ref="J6/j10's probabilistic sibling (Fellegi–Sunter linkage)",
    doc="probabilistic record linkage: a CRM-style second source "
    "(planted in-query: every even customer re-enters at id+1e6 with "
    "an upper-cased name and a deterministically jittered balance) is "
    "linked back to the master by the Fellegi–Sunter score — per-field "
    "agree/disagree log-odds summed over (normalized-name equality, "
    "balance within ±0.02, segment block agreement), thresholded into "
    "match / possible / non_match. Pairs exist ONLY inside "
    "(nationkey, mktsegment) blocks (j10's discipline: score in-block "
    "pairs, never n²) and the output keeps scored candidates "
    "(score ≥ possible), so result size is O(true links), not "
    "O(block²). Scoring is pure map-side arithmetic on the joined row; "
    "at 100 TB both sides bucket by the block key so the join is "
    "co-located. Weights are fixed log2(m/u) constants; production "
    "learns them by EM over the same comparison vectors.",
    oracle=f"""
        WITH crm AS (
            SELECT c_custkey + 1000000 AS b_id,
                   UPPER(c_name) AS b_name,
                   c_acctbal + (c_custkey % 3) * 0.005 AS b_bal,
                   c_nationkey, c_mktsegment
            FROM customer WHERE c_custkey % 2 = 0
        ), scored AS (
            SELECT a.c_custkey AS a_id, b.b_id,
                   CASE WHEN LOWER(a.c_name) = LOWER(b.b_name)
                        THEN 1 ELSE 0 END AS name_agree,
                   CASE WHEN ABS(a.c_acctbal - b.b_bal) <= {_FS_BAL_EPS}
                        THEN 1 ELSE 0 END AS bal_agree
            FROM customer a
            JOIN crm b ON a.c_nationkey = b.c_nationkey
                      AND a.c_mktsegment = b.c_mktsegment
        ), weighted AS (
            SELECT a_id, b_id, name_agree, bal_agree,
                   ROUND(CASE WHEN name_agree = 1 THEN {_FS_NAME_AGREE}
                              ELSE {_FS_NAME_DIS} END
                       + CASE WHEN bal_agree = 1 THEN {_FS_BAL_AGREE}
                              ELSE {_FS_BAL_DIS} END
                       + {_FS_SEG_AGREE}, 2) AS score
            FROM scored
        )
        SELECT a_id, b_id, name_agree, bal_agree, score,
               CASE WHEN score >= {_FS_MATCH_T} THEN 'match'
                    WHEN score >= {_FS_POSSIBLE_T} THEN 'possible'
                    ELSE 'non_match' END AS decision
        FROM weighted WHERE score >= {_FS_POSSIBLE_T}
    """,
)
def j12_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A kept pair (score >= possible) must agree on name OR balance:
    # both-disagree scores _FS_NAME_DIS + _FS_BAL_DIS + _FS_SEG_AGREE
    # = -3.0 < _FS_POSSIBLE_T. So candidate generation decomposes into
    # two LINEAR channels — a (block, normalized-name) equi-join and a
    # (block, eps-bucket) band join (j11's discipline) — instead of
    # scoring every in-block pair. The r7 spelling joined on the block
    # key alone; blocks are (nation, segment) = 125 total, so in-block
    # pairs grew quadratically with the corpus (measured 49.5x wall at
    # the 10x sf1 rehearsal). Output is unchanged: the oracle's
    # blocked-cross SQL keeps exactly the union of the two channels.
    assert _FS_NAME_DIS + _FS_BAL_DIS + _FS_SEG_AGREE < _FS_POSSIBLE_T
    cust = load_table(spark, "customer", sf_dir)
    block = ["c_nationkey", "c_mktsegment"]
    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.lower("c_name").alias("a_name"),
        F.col("c_acctbal").alias("a_bal"),
        *block,
    )
    b = cust.filter(F.col("c_custkey") % 2 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("b_id"),
        F.lower(F.upper("c_name")).alias("b_name"),
        (F.col("c_acctbal") + (F.col("c_custkey") % 3) * 0.005).alias("b_bal"),
        *block,
    )
    pair_cols = ["a_id", "b_id", "a_name", "b_name", "a_bal", "b_bal"]
    block_eq = [a[k] == b[k] for k in block]
    cand_name = a.join(
        b, block_eq + [a["a_name"] == b["b_name"]]
    ).select(*pair_cols)
    # balance band: bucket to eps-wide cells; probing the bucket and
    # both neighbors covers every |a_bal - b_bal| <= eps pair
    bucket = lambda c: F.floor(c / _FS_BAL_EPS).cast("long")
    b_banded = b.withColumn(
        "bb",
        F.explode(
            F.array(
                bucket(F.col("b_bal")) - 1,
                bucket(F.col("b_bal")),
                bucket(F.col("b_bal")) + 1,
            )
        ),
    )
    a_banded = a.withColumn("bb", bucket(F.col("a_bal")))
    cand_bal = (
        a_banded.join(
            b_banded,
            [a_banded[k] == b_banded[k] for k in block]
            + [a_banded["bb"] == b_banded["bb"]],
        )
        .filter(F.abs(F.col("a_bal") - F.col("b_bal")) <= _FS_BAL_EPS)
        .select(*pair_cols)
    )
    cand = cand_name.unionByName(cand_bal).dropDuplicates(["a_id", "b_id"])
    name_agree = F.when(F.col("a_name") == F.col("b_name"), 1).otherwise(0)
    bal_agree = F.when(
        F.abs(F.col("a_bal") - F.col("b_bal")) <= _FS_BAL_EPS, 1
    ).otherwise(0)
    score = F.round(
        F.when(F.col("name_agree") == 1, F.lit(_FS_NAME_AGREE)).otherwise(
            F.lit(_FS_NAME_DIS)
        )
        + F.when(F.col("bal_agree") == 1, F.lit(_FS_BAL_AGREE)).otherwise(
            F.lit(_FS_BAL_DIS)
        )
        + F.lit(_FS_SEG_AGREE),
        2,
    )
    return (
        cand.select(
            "a_id",
            "b_id",
            name_agree.alias("name_agree"),
            bal_agree.alias("bal_agree"),
        )
        .withColumn("score", score)
        .withColumn(
            "decision",
            F.when(F.col("score") >= _FS_MATCH_T, "match")
            .when(F.col("score") >= _FS_POSSIBLE_T, "possible")
            .otherwise("non_match"),
        )
        .filter(F.col("score") >= _FS_POSSIBLE_T)
    )


# ---------------------------------------------------------------------------
# J13: as-of join DIRECTION variants — forward / nearest with tolerance
# ---------------------------------------------------------------------------

_J13_TOL_US = 3_600_000_000  # 1 hour, whole microseconds (t89's discipline)


@REGISTRY.register(
    name="j13_asof_directions",
    survey_ref="§2.3 extras (as-of; j8's direction/tolerance completion)",
    doc="the full pandas-merge_asof surface over the j8 substrate: per "
    "purchase, the user's nearest click BACKWARD (at-or-before, j8's "
    "direction), FORWARD (strictly after — ties sort click-before-"
    "purchase), and NEAREST (smaller absolute gap, ties to backward), "
    "each under a 1-hour tolerance (outside it the match nulls out, "
    "pandas semantics). Same single-shuffle shape as j8: tag, union, "
    "TWO frames of one (user_id, ts) window — backward last_value + "
    "forward first_value — never a candidate-pair join; gap "
    "arithmetic in whole microseconds on both engines.",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
            FROM events WHERE event_type IN ('click', 'purchase')
        ), win AS (
            SELECT user_id, ts, event_id, kind,
                   LAST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                       OVER back AS b_id,
                   LAST_VALUE(CASE WHEN kind = 0 THEN EPOCH_US(ts) END IGNORE NULLS)
                       OVER back AS b_us,
                   FIRST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                       OVER fwd AS f_id,
                   FIRST_VALUE(CASE WHEN kind = 0 THEN EPOCH_US(ts) END IGNORE NULLS)
                       OVER fwd AS f_us
            FROM tagged
            WINDOW back AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   fwd AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        ), gated AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN EPOCH_US(ts) - b_us <= {_J13_TOL_US} THEN b_id END AS back_id,
                   CASE WHEN EPOCH_US(ts) - b_us <= {_J13_TOL_US}
                        THEN EPOCH_US(ts) - b_us END AS back_gap_us,
                   CASE WHEN f_us - EPOCH_US(ts) <= {_J13_TOL_US} THEN f_id END AS fwd_id,
                   CASE WHEN f_us - EPOCH_US(ts) <= {_J13_TOL_US}
                        THEN f_us - EPOCH_US(ts) END AS fwd_gap_us
            FROM win WHERE kind = 1
        )
        SELECT event_id, user_id, back_id, fwd_id,
               CASE WHEN back_id IS NOT NULL
                         AND (fwd_id IS NULL OR back_gap_us <= fwd_gap_us)
                    THEN back_id ELSE fwd_id END AS nearest_id,
               CAST(CASE WHEN back_id IS NOT NULL
                         AND (fwd_id IS NULL OR back_gap_us <= fwd_gap_us)
                    THEN back_gap_us ELSE fwd_gap_us END AS BIGINT) AS nearest_gap_us
        FROM gated
    """,
)
def j13_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return asof_directions(ev)


def asof_directions(ev: DataFrame, tol_us: int = _J13_TOL_US) -> DataFrame:
    """j13's core over any (user_id, ts, event_id, event_type) frame."""
    from pyspark.sql import Window as W

    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("event_id")]
    back = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fwd = W.partitionBy("user_id").orderBy(*order).rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    click = F.when(F.col("kind") == 0, F.col("event_id"))
    click_us = F.when(F.col("kind") == 0, F.unix_micros("ts"))
    win = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(click, ignorenulls=True).over(back).alias("b_id"),
        F.last(click_us, ignorenulls=True).over(back).alias("b_us"),
        F.first(click, ignorenulls=True).over(fwd).alias("f_id"),
        F.first(click_us, ignorenulls=True).over(fwd).alias("f_us"),
    ).filter(F.col("kind") == 1)
    now_us = F.unix_micros("ts")
    b_ok = (now_us - F.col("b_us")) <= tol_us
    f_ok = (F.col("f_us") - now_us) <= tol_us
    gated = win.select(
        "event_id",
        "user_id",
        F.when(b_ok, F.col("b_id")).alias("back_id"),
        F.when(b_ok, now_us - F.col("b_us")).alias("back_gap_us"),
        F.when(f_ok, F.col("f_id")).alias("fwd_id"),
        F.when(f_ok, F.col("f_us") - now_us).alias("fwd_gap_us"),
    )
    pick_back = F.col("back_id").isNotNull() & (
        F.col("fwd_id").isNull() | (F.col("back_gap_us") <= F.col("fwd_gap_us"))
    )
    return gated.select(
        "event_id",
        "user_id",
        "back_id",
        "fwd_id",
        F.when(pick_back, F.col("back_id")).otherwise(F.col("fwd_id")).alias("nearest_id"),
        F.when(pick_back, F.col("back_gap_us"))
        .otherwise(F.col("fwd_gap_us"))
        .cast("bigint")
        .alias("nearest_gap_us"),
    )
