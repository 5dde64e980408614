"""TPC-H completion — the 14 queries (q2, q7–q9, q11–q13, q15–q17,
q19–q22) that round out the §7 relational benchmark face to all 22.

The reference's query surface is Cypher + SQL-ish activity reads; the
engine's SURVEY §7 grades it against TPC-H shapes. q1/q3/q4/q5/q6/
q10/q14/q18 landed in aggregates.py / joins.py in earlier rounds;
this module adds the rest as *fixture-faithful adaptations*: the
driver's tables carry no `partsupp`, no ship modes, no commit/receipt
dates, no phone numbers and no comment columns, so q2/q11/q16/q20
derive the part↔supplier relation from `lineitem` history, q12 buckets
by ship lateness instead of ship mode, q21 defines "kept waiting" as
ship > order + 60 days, and q13/q22 substitute priority/nation-key
predicates for the comment/phone-prefix filters. Every adaptation
keeps the ORIGINAL query's plan shape — that is what is being graded:
correlated EXISTS/NOT-EXISTS, scalar-subquery HAVING, min-per-group
join-back, disjunctive pushable predicates, left-outer count
distributions.

House rules (shared with q1/q3/q14):
- revenue/value sums go through DECIMAL casts so both engines sum
  exactly and order-independently (`CAST(l_extendedprice AS
  DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))`);
- ratios ROUND to 4dp then CAST AS DOUBLE on both sides;
- scalar subqueries (global totals, maxima, averages) are computed by
  RE-AGGREGATING the grouped partials and broadcast as 1-row joins —
  never a driver-side collect, never a second scan of the fact;
- dimensions broadcast; the fact shuffles at most once per query.

Scale notes (100 TB): every query here shuffles lineitem at most once
on a join/group key; the q2/q15/q17 min/max/avg-per-group join-backs
reuse the SAME grouped table for the scalar side (partial-agg
re-aggregation, exchange reuse); q21's triple-EXISTS is folded into
ONE per-(order,supplier) aggregation + a per-order rollup instead of
three self-joins of the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table, persist_once

REGISTRY = Registry()

def _rev():
    """q3's decimal-exact revenue expression (Spark side). A function,
    not a module constant: Column construction needs a live
    SparkContext, and this module imports before any session exists."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")

#: and its oracle spelling
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(3,2))"
)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# q2: minimum-cost supplier (min-per-group + join-back)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q2_min_cost_supplier",
    survey_ref="§7 (TPC-H Q2, partsupp-adapted)",
    doc="TPC-H Q2-shaped minimum-cost supplier: for every STANDARD-type "
    "part of one size band, the EUROPE supplier offering the lowest "
    "observed unit price — the canonical correlated-MIN + join-back "
    "shape. No partsupp in the fixture, so the part↔supplier offer "
    "relation is derived from lineitem history (unit price = "
    "l_extendedprice / l_quantity, exact IEEE division both engines). "
    "Spark-first: the (part, supplier) offer table is built ONCE, the "
    "per-part MIN re-aggregates those partials (exchange reuse, no "
    "second fact scan), and the min joins back by exact double "
    "equality. Dims (part-filtered, supplier, nation, region) all "
    "broadcast; lineitem shuffles once on partkey.",
    oracle=f"""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY l_partkey, l_suppkey
        ), best AS (
            SELECT l_partkey, MIN(unit_cost) AS best_cost
            FROM offers GROUP BY l_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               o.unit_cost AS unit_cost
        FROM offers o
        JOIN best b ON o.l_partkey = b.l_partkey AND o.unit_cost = b.best_cost
        JOIN part     ON o.l_partkey = p_partkey
        JOIN supplier ON o.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    # the (part, supplier) offer table feeds BOTH the per-part MIN and
    # the join-back: persist the diamond — column-pruning differences
    # between the branches defeat Catalyst's exchange reuse, and an
    # unpersisted diamond would scan lineitem twice (released by the
    # harness clearCache between queries)
    offers = (
        li.join(F.broadcast(euro_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .transform(persist_once)
    )
    best = offers.groupBy(F.col("l_partkey").alias("best_pk")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        offers.join(
            best,
            (offers.l_partkey == best.best_pk)
            & (offers.unit_cost == best.best_cost),
        )
        .drop("best_pk")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == euro_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q7_volume_shipping",
    survey_ref="§7 (TPC-H Q7)",
    doc="TPC-H Q7-shaped volume shipping: revenue flowing between "
    "NATION_1 and NATION_2 in either direction, by (supplier nation, "
    "customer nation, ship year). The nation pair predicate is an "
    "OR-of-ANDs evaluated AFTER broadcast nation lookups on both "
    "sides; lineitem⋈orders is the one fact shuffle (orderkey); "
    "supplier/customer/nation broadcast. Ship-year from l_shipdate "
    "(the fixture's only line date).",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY sn.n_name, cn.n_name, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q8: national market share
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q8_market_share",
    survey_ref="§7 (TPC-H Q8)",
    bench=True,
    doc="TPC-H Q8-shaped market share: NATION_3 suppliers' share of "
    "AMERICA-region ECONOMY-part revenue per order year. The share's "
    "CASE-sum and total come from ONE aggregate pass (q14's rule); "
    "part/supplier-nation/customer-region chains broadcast; the "
    "fact shuffles once on orderkey.",
    oracle=f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(ROUND(
                   SUM(CASE WHEN sn.n_name = 'NATION_3'
                            THEN {_REV_SQL} ELSE 0 END)
                   / SUM({_REV_SQL}), 4) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    cust_in_region = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0)))
                / F.sum(_rev()),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9: product-type profit
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q9_product_profit",
    survey_ref="§7 (TPC-H Q9, partsupp-adapted)",
    doc="TPC-H Q9-shaped product profit: per (supplier nation, order "
    "year), profit on parts whose name contains 'red'. No "
    "ps_supplycost in the fixture, so cost is the documented proxy "
    "0.5 × p_retailprice × l_quantity, computed ALL-DECIMAL so the "
    "sum is exact and order-independent on both engines. Part and "
    "supplier-nation broadcast; lineitem⋈orders is the one shuffle.",
    oracle=f"""
        SELECT sn.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM({_REV_SQL}
                        - CAST(p_retailprice AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2))
                          * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    profit = _rev() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit(0.5).cast("decimal(2,1)")
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q11: important parts (scalar-subquery HAVING)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q11_important_parts",
    survey_ref="§7 (TPC-H Q11, partsupp-adapted)",
    doc="TPC-H Q11-shaped important stock: parts whose shipped value "
    "from NATION_0's suppliers exceeds 0.1% of that nation's total — "
    "the scalar-subquery-HAVING shape. Value = retailprice × quantity "
    "(all-decimal, no partsupp in the fixture). Spark-first: the "
    "global total RE-AGGREGATES the per-part partials and broadcasts "
    "as a 1-row join — the fact is scanned and shuffled exactly once.",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   SUM(CAST(p_retailprice AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2))) AS val
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_0'
            GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        FROM per_part
        WHERE val > (SELECT SUM(val) * 0.001 FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_0")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_retailprice")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    val = F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
        .transform(persist_once)  # diamond: threshold branch + output branch (pruning
        # differences defeat exchange reuse; without this the fact scans twice)
    )
    total = per_part.agg((F.sum("val") * F.lit(0.001)).alias("cut"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("cut"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# q12: lateness-bucket priority counts (ship-mode adapted)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q12_lateness_priority",
    survey_ref="§7 (TPC-H Q12, ship-mode adapted)",
    doc="TPC-H Q12's shape on the fixture's columns: per ship-lateness "
    "bucket (<=30d FAST / <=90d MEDIUM / else SLOW — the fixture has "
    "no l_shipmode), how many 1996 order lines carried URGENT/HIGH "
    "priority vs lower — the canonical two-class CASE-sum per "
    "category. One orderkey shuffle; the date filter pushes to the "
    "orders scan.",
    oracle="""
        SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
                    WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'MEDIUM'
                    ELSE 'SLOW' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY ship_bucket
        ORDER BY ship_bucket
    """,
)
def q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    bucket = (
        F.when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "FAST",
        )
        .when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "MEDIUM",
        )
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# q13: customer order-count distribution (left outer + double groupBy)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q13_customer_distribution",
    survey_ref="§7 (TPC-H Q13)",
    doc="TPC-H Q13-shaped customer distribution: how many customers "
    "placed exactly k qualifying orders, INCLUDING k=0 — the classic "
    "left-outer-join + double-aggregation shape (an inner join would "
    "silently drop the zero-order customers, the whole point of the "
    "query). The comment NOT LIKE filter becomes a priority exclusion "
    "(no o_comment in the fixture). customer⋈orders shuffles on "
    "custkey once; the second groupBy is over the tiny count table.",
    oracle="""
        WITH c_orders AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                 AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q15: top supplier (scalar MAX + equality join-back)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q15_top_supplier",
    survey_ref="§7 (TPC-H Q15)",
    doc="TPC-H Q15-shaped top supplier: supplier(s) with the maximum "
    "1996-Q1 revenue — the revenue-view + scalar-MAX shape. The max "
    "RE-AGGREGATES the per-supplier partials and broadcasts as a "
    "1-row join; equality compares the EXACT decimal sums (cast to "
    "double only at output), so float ties can't split the answer.",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM({_REV_SQL}) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
        .transform(persist_once)  # diamond: MAX branch + join-back branch
    )
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16: parts/supplier relationship (anti-join + count distinct)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q16_parts_suppliers",
    survey_ref="§7 (TPC-H Q16, partsupp-adapted)",
    doc="TPC-H Q16-shaped parts/supplier count: distinct suppliers per "
    "(brand, type, size) for selected sizes, excluding one brand, the "
    "PROMO type, and suppliers with negative account balance (the "
    "fixture's stand-in for the complaints filter) — NOT-IN dimension "
    "predicates + anti-join + COUNT DISTINCT. The part↔supplier "
    "relation comes from distinct lineitem pairs (no partsupp); the "
    "distinct-pair reduction happens BEFORE the count shuffle.",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(bad_supp, pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue (correlated AVG)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q17_small_quantity_revenue",
    survey_ref="§7 (TPC-H Q17)",
    doc="TPC-H Q17-shaped small-quantity revenue: weekly-equivalent "
    "revenue lost if Brand#2 small-size orders below 20% of the "
    "part's average quantity were no longer taken — the correlated- "
    "AVG shape. The per-part average re-aggregates the SAME joined "
    "relation (quantities are integral doubles, so the avg is exact "
    "on both engines); broadcast join-back; one partkey shuffle.",
    oracle="""
        WITH sel AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#2' AND p_size <= 10
        ), avgq AS (
            SELECT l_partkey, AVG(l_quantity) AS aq FROM sel GROUP BY l_partkey
        )
        SELECT CAST(ROUND(SUM(CAST(s.l_extendedprice AS DECIMAL(12,2))) / 7.0, 4)
                    AS DOUBLE) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM sel s JOIN avgq a ON s.l_partkey = a.l_partkey
        WHERE s.l_quantity < 0.2 * a.aq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10)
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    sel = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).transform(persist_once)  # diamond: per-part AVG branch + the filtered-sum branch
    avgq = sel.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        sel.join(F.broadcast(avgq), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) / 7.0, 4)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q19: discounted revenue (disjunctive pushable predicate)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q19_discounted_revenue",
    survey_ref="§7 (TPC-H Q19)",
    doc="TPC-H Q19-shaped discounted revenue: one revenue number over "
    "an OR of three (brand, size-range, quantity-range) arms — the "
    "disjunctive-predicate benchmark (no l_shipmode/container in the "
    "fixture, so the arms pair brand+size with quantity bands). The "
    "whole disjunction evaluates AFTER the broadcast part join in one "
    "pass; no UNION of three scans.",
    oracle=f"""
        SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, "lineitem", sf_dir)
    arm = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q20: excess shippers (nested semi-join chain)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q20_excess_shippers",
    survey_ref="§7 (TPC-H Q20, partsupp-adapted)",
    doc="TPC-H Q20-shaped potential stock shedders: NATION_5 suppliers "
    "for whom some SMALL-type part's 1997 shipments exceeded half of "
    "that (supplier, part)'s all-time shipments — the nested "
    "semi-join shape (supplier ← qualifying pairs ← part filter). No "
    "ps_availqty in the fixture, so 'excess' compares the 1997 slice "
    "against the pair's own history, computed in ONE conditional "
    "aggregation (no second fact scan). Quantities are integral "
    "doubles — both sums exact.",
    oracle="""
        WITH pair_qty AS (
            SELECT l_suppkey, l_partkey,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                            THEN l_quantity ELSE 0 END) AS qty_1997,
                   SUM(l_quantity) AS qty_all
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'SMALL'
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
          AND s_suppkey IN (SELECT l_suppkey FROM pair_qty
                            WHERE qty_1997 > 0.5 * qty_all)
        ORDER BY s_suppkey
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "SMALL")
    li = load_table(spark, "lineitem", sf_dir)
    in_1997 = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    pair_qty = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias("qty_1997"),
            F.sum("l_quantity").alias("qty_all"),
        )
    )
    qualifying = (
        pair_qty.filter(F.col("qty_1997") > 0.5 * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS folded to aggs)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q21_waiting_suppliers",
    survey_ref="§7 (TPC-H Q21, ship-date adapted)",
    bench=True,
    doc="TPC-H Q21-shaped waiting suppliers: for finished ('F') "
    "multi-supplier orders, the supplier who was the ONLY one to ship "
    "late (> order date + 60 days; the fixture has no commit/receipt "
    "dates), counted per supplier, top 10. The classic EXISTS + "
    "NOT-EXISTS pair is folded into ONE per-(order, supplier) "
    "aggregation plus a per-order rollup — 1 fact shuffle instead of "
    "three lineitem self-joins, and exactly the reformulation a 100 TB "
    "plan needs (the self-join spelling is the oracle).",
    oracle="""
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS is_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        ), per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
            FROM per_os GROUP BY l_orderkey
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_os
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        per_os.join(per_order, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q22: global sales opportunity (scalar AVG + anti-join)
# ---------------------------------------------------------------------------


@REGISTRY.register(
    name="q22_sales_opportunity",
    survey_ref="§7 (TPC-H Q22, phone-prefix adapted)",
    doc="TPC-H Q22-shaped sales opportunity: per selected nation (the "
    "fixture's stand-in for phone country codes), how many "
    "above-average-balance customers are dormant (no order since "
    "2000 — the fixture's every customer HAS ordered, so 'never "
    "ordered' is vacuous and the anti-join keys on recent orders), "
    "and their total balance — scalar-AVG broadcast + anti-join. Balances cast "
    "to DECIMAL(12,2) before summing so the totals are exact and "
    "order-independent; the anti-join shuffles custkeys only.",
    oracle="""
        WITH pool AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_nationkey IN (10, 11, 12, 13, 14, 15, 16)
        ), cut AS (
            SELECT AVG(c_acctbal) AS avg_bal FROM pool WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM pool, cut
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = load_table(spark, "customer", sf_dir).filter(
        F.col("c_nationkey").isin(10, 11, 12, 13, 14, 15, 16)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    cut = pool.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
