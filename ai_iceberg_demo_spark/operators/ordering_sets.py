"""Sorts, limits, pagination, top-k, set operations — SURVEY.md §2.6–2.7.

Reference shapes: newest-first conversation listing
(`neo4j_memory.py:281-285`), in-order replay (`:703-721`), SKIP/LIMIT
pagination (`:284-289`), top-k by score (`neo4j_rag.py:261-265`),
heterogeneous Message∪Result timeline (`neo4j_memory.py:703-752`),
list concat (`research_manager.py:125-129`).

Scale notes: global ORDER BY + LIMIT compiles to Catalyst's
TakeOrderedAndProject — per-partition top-k then a driver merge of k
rows, not a full sort. Pagination of deep offsets is the known
anti-pattern at scale; the engine keys pagination on a total order so
it can be rewritten as a keyset predicate (`WHERE key > last_seen`)
— both forms are provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table, persist_once

REGISTRY = Registry()


# --- O1: sort descending by timestamp (newest first) --------------------
@REGISTRY.register(
    name="o1_newest_first",
    survey_ref="O1",
    doc="ORDER BY created_at DESC listing (neo4j_memory.py:281-285); orderkey "
    "tiebreak for total determinism.",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_orderstatus FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 20
    """,
)
def o1_newest_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
        .limit(20)
    )


# --- O2: in-order replay ------------------------------------------------
@REGISTRY.register(
    name="o2_ordered_replay",
    survey_ref="O2",
    doc="replay conversation by sequence (neo4j_memory.py:703-721) for one key; "
    "point-lookup + sort, no shuffle of the fact table.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        FROM lineitem WHERE l_orderkey = 100
        ORDER BY l_linenumber
    """,
)
def o2_ordered_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") == 100)
        .orderBy("l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


# --- O3: pagination (SKIP/LIMIT) ----------------------------------------
@REGISTRY.register(
    name="o3_pagination",
    survey_ref="O3",
    doc="SKIP $offset LIMIT $limit with defaults 50/0 (neo4j_memory.py:284-289). "
    "Total order on the key makes the page deterministic.",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 50
    """,
)
def o3_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .offset(50)
        .limit(50)
    )


# --- O3b: keyset pagination (the 100 TB form) ---------------------------
@REGISTRY.register(
    name="o3_keyset_pagination",
    survey_ref="O3",
    doc="same page as o3_pagination expressed as a keyset predicate "
    "(WHERE key > last_seen) — O(page) instead of O(offset) at scale, "
    "and the predicate pushes down to the scan.",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey > 50
        ORDER BY o_orderkey LIMIT 50
    """,
)
def o3_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") > 50)
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(50)
    )


# --- O4: global top-k ----------------------------------------------------
@REGISTRY.register(
    name="o4_topk_by_score",
    survey_ref="O4",
    doc="vector-search style ORDER BY score DESC LIMIT k (neo4j_rag.py:261-265) "
    "on price — compiles to TakeOrderedAndProject (no full sort).",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
)
def o4_topk_by_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(5)
    )


# --- O5: limited replay --------------------------------------------------
@REGISTRY.register(
    name="o5_limited_replay",
    survey_ref="O5",
    doc="get_messages(limit=n) ordered + limited (neo4j_memory.py:702-712).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 100
    """,
)
def o5_limited_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "lineitem", sf_dir)
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .limit(100)
    )


# --- U1: heterogeneous union timeline -----------------------------------
@REGISTRY.register(
    name="u1_union_timeline",
    survey_ref="U1",
    doc="interleave Message and Result nodes into one tagged timeline "
    "(neo4j_memory.py:703-752): unionByName with missing columns + type tag.",
    oracle="""
        SELECT user_id, event_id, kind, payload FROM (
            SELECT user_id, event_id, 'error' AS kind, CAST(value AS DOUBLE) AS payload
            FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT user_id, event_id, 'activity' AS kind, CAST(NULL AS DOUBLE) AS payload
            FROM events WHERE event_type <> 'error'
        )
    """,
)
def u1_union_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.lit("error").alias("kind"), F.col("value").alias("payload")
    )
    activity = ev.filter(F.col("event_type") != "error").select(
        "user_id", "event_id", F.lit("activity").alias("kind")
    )
    # allowMissingColumns fills the absent payload with NULL — the
    # engine's analog of the reference's optional node properties.
    return activity.unionByName(errors, allowMissingColumns=True).select(
        "user_id", "event_id", "kind", "payload"
    )


# --- U2: concat datasets -------------------------------------------------
@REGISTRY.register(
    name="u2_concat_datasets",
    survey_ref="U2",
    doc="all_results = [kg_context] + search_results (research_manager.py:125-129).",
    oracle="""
        SELECT r_name AS name, 'region' AS src FROM region
        UNION ALL
        SELECT n_name AS name, 'nation' AS src FROM nation
    """,
)
def u2_concat_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir).select(
        F.col("r_name").alias("name"), F.lit("region").alias("src")
    )
    nation = load_table(spark, "nation", sf_dir).select(
        F.col("n_name").alias("name"), F.lit("nation").alias("src")
    )
    return region.union(nation)


# --- U3: intersect (engine extra) ---------------------------------------
@REGISTRY.register(
    name="u3_intersect",
    survey_ref="§2.7 extras",
    doc="INTERSECT — nations having both customers and suppliers.",
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# --- U4: except (engine extra) ------------------------------------------
@REGISTRY.register(
    name="u4_except",
    survey_ref="§2.7 extras",
    doc="EXCEPT — finalized orders with no returned lineitem "
    "(non-empty on the fixture: ~1.3k keys at sf0.01).",
    oracle="""
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return o.subtract(li)  # EXCEPT DISTINCT semantics, matching the SQL oracle


# ---------------------------------------------------------------------------
# O6: z-order (Morton) layout keys — multi-dimensional clustering
# ---------------------------------------------------------------------------

_Z_BITS = 8  # 8 bits per dimension → 16-bit interleaved key
_Z_FILE_SPAN = 256  # z-values per target file


def zorder_key(x, y, bits: int = _Z_BITS):
    """Morton/z-order interleave of two bucketed dimensions:
    z = Σ_i bit_i(x)·2^(2i) + bit_i(y)·2^(2i+1).

    Spelled with div/mod arithmetic (not bitwise ops) so the exact
    expression is portable to any ANSI engine — the oracle replays it
    verbatim. Map-only and branch-free: 2·bits terms folded by
    Catalyst into one projection, whole-stage-codegen'd.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + ((x / (1 << i)).cast("bigint") % 2) * (1 << (2 * i))
        z = z + ((y / (1 << i)).cast("bigint") % 2) * (1 << (2 * i + 1))
    return z


def zorder_layout_write(keyed: DataFrame, path: str, n_files: int = 64) -> None:
    """The layout-write half of OPTIMIZE ZORDER: range-partition the
    rows by their Morton key and write one file per partition, so each
    file covers a compact (x, y) box and per-file column min/max stats
    prune box scans in EITHER dimension. ``keyed`` must carry the
    zvalue column (o6's projection). At 100 TB this is the same
    one-shuffle write, just with Iceberg's write.distribution-mode=
    range on a z sort order; tests/test_zorder_layout.py measures the
    resulting file-skipping on disk against a linear layout."""
    keyed.repartitionByRange(n_files, "zvalue").write.mode("overwrite").parquet(path)


def _zorder_sql(x: str, y: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@REGISTRY.register(
    name="o6_zorder_key",
    survey_ref="O-family extra (multi-dimensional clustering layout)",
    doc="z-order layout keys over events: user bucket (user_id%256) "
    "and day-of-year bucket interleaved into a 16-bit Morton key, "
    "plus the target file (z // 256) a clustering write would place "
    "the row in. This is the key-computation half of OPTIMIZE ZORDER "
    "/ Iceberg sort-order z-ordering: rows close in BOTH dimensions "
    "share files, so a (user range × date range) box query prunes to "
    "O(perimeter) files instead of scanning one full dimension. "
    "Map-only projection; the layout write is one "
    "repartitionByRange(z) at write time and queries never pay it.",
    oracle=f"""
        WITH b AS (
            SELECT event_id, user_id % 256 AS xb,
                   DAYOFYEAR(CAST(ts AS DATE)) % 256 AS yb
            FROM events
        )
        SELECT event_id, xb, yb,
               {_zorder_sql("xb", "yb")} AS zvalue,
               {_zorder_sql("xb", "yb")} // {_Z_FILE_SPAN} AS zfile
        FROM b
    """,
)
def o6_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    xb = (F.col("user_id") % 256).alias("xb")
    yb = (F.dayofyear(F.col("ts").cast("date")) % 256).alias("yb")
    b = ev.select("event_id", xb, yb)
    z = zorder_key(F.col("xb"), F.col("yb"))
    return b.select(
        "event_id",
        "xb",
        "yb",
        z.alias("zvalue"),
        (z / _Z_FILE_SPAN).cast("bigint").alias("zfile"),
    )


# ---------------------------------------------------------------------------
# O7: consistent-hash sharding + elasticity audit
# ---------------------------------------------------------------------------

_CH_WORKERS = 8


def ring_position(key: Column) -> Column:
    """Position on the 2^48 hash ring (md5-derived, engine-portable)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


@REGISTRY.register(
    name="o7_consistent_hashing",
    survey_ref="O-family extra (elastic shard assignment)",
    doc=f"consistent-hash sharding: docs map to {_CH_WORKERS} workers "
    "by ring position (first worker mark at-or-after the key, "
    "wrapping) — and the elasticity audit: re-sharding to "
    f"{_CH_WORKERS + 1} workers moves ONLY the keys landing in the "
    "new worker's ring arc (~1/(N+1) of the corpus), where modulo "
    "sharding would reshuffle nearly everything. Output: per-worker "
    "load under both ring sizes + moved-key count per worker. Plan: "
    "map-side ring position + broadcast worker-mark array folded per "
    "row (array_min over HOF — no join, no shuffle beyond the tiny "
    "load agg). Single-mark rings have high arc-length variance "
    "(visible in the per-worker loads); production smooths with "
    "~100 virtual nodes per worker — same expression, longer mark "
    "list.",
    oracle=f"""
        WITH marks AS (
            SELECT w,
                   ('0x' || SUBSTR(MD5('worker_' || CAST(w AS VARCHAR)), 1, 12))::BIGINT
                       AS pos
            FROM UNNEST(GENERATE_SERIES(0, {_CH_WORKERS})) AS t(w)
        ), keyed AS (
            SELECT doc_id,
                   ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       AS kpos
            FROM documents
        ), assign8 AS (
            SELECT k.doc_id,
                   COALESCE(
                     (SELECT m.w FROM marks m
                      WHERE m.w < {_CH_WORKERS} AND m.pos >= k.kpos
                      ORDER BY m.pos, m.w LIMIT 1),
                     (SELECT m.w FROM marks m WHERE m.w < {_CH_WORKERS}
                      ORDER BY m.pos, m.w LIMIT 1)) AS worker
            FROM keyed k
        ), assign9 AS (
            SELECT k.doc_id,
                   COALESCE(
                     (SELECT m.w FROM marks m WHERE m.pos >= k.kpos
                      ORDER BY m.pos, m.w LIMIT 1),
                     (SELECT m.w FROM marks m ORDER BY m.pos, m.w LIMIT 1)) AS worker
            FROM keyed k
        )
        SELECT a8.worker AS worker,
               CAST(COUNT(*) AS BIGINT) AS load_n,
               CAST(COUNT(*) FILTER (WHERE a9.worker <> a8.worker) AS BIGINT)
                   AS moved_out
        FROM assign8 a8 JOIN assign9 a9 ON a8.doc_id = a9.doc_id
        GROUP BY a8.worker
    """,
)
def o7_consistent_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    docs = load_table(spark, "documents", sf_dir)

    def marks(n: int) -> list[tuple[int, int]]:
        # same md5-ring positions the oracle derives in SQL
        return sorted(
            (
                int(hashlib.md5(f"worker_{w}".encode()).hexdigest()[:12], 16),
                w,
            )
            for w in range(n)
        )

    def assign(n: int) -> Column:
        ms = marks(n)
        kpos = ring_position(F.col("doc_id"))
        # first mark at-or-after the key, wrap to the smallest mark:
        # folded as nested whens over the (tiny, sorted) mark list —
        # a broadcast-free per-row expression
        expr = F.lit(ms[0][1])  # wrap default: smallest position's worker
        for pos, w in reversed(ms):
            expr = F.when(kpos <= pos, F.lit(w)).otherwise(expr)
        return expr

    a8 = assign(_CH_WORKERS)
    a9 = assign(_CH_WORKERS + 1)
    return (
        docs.select(a8.alias("worker"), a9.alias("w9"))
        .groupBy("worker")
        .agg(
            F.count("*").cast("bigint").alias("load_n"),
            F.sum(F.when(F.col("w9") != F.col("worker"), 1).otherwise(0))
            .cast("bigint")
            .alias("moved_out"),
        )
    )


# --- O8: sampled range-partitioner audit ---------------------------------

_O8_PARTS = 8
_O8_SAMPLE_MOD = 20  # 5% deterministic key sample


@REGISTRY.register(
    name="o8_range_partitioner_audit",
    survey_ref="O-family extra (the mechanism behind every global "
    "sort): Spark's RangePartitioner derives cut points from a key "
    "SAMPLE — this measures how balanced the resulting partitions "
    "actually are, the number that decides whether a sorted write "
    "needs a bigger sample",
    doc=f"range-partitioner simulation: cut points = the "
    f"{_O8_PARTS - 1} equally-spaced percentiles of a DETERMINISTIC "
    f"5% key sample (md5(key)%{_O8_SAMPLE_MOD}==0 — u5's "
    "hash-sample trick, so the 'random' sample replays in SQL), "
    "then the FULL table buckets against the sampled cuts and the "
    "audit reports per-partition counts, the max/ideal skew ratio, "
    "and the within-10% balance verdict. This is exactly what a "
    "sorted/range-bucketed Iceberg write does at plan time; a "
    "skewed readout means a bigger sample or explicit cuts. One "
    "sample agg (broadcast cuts) + one map-side bucket count.",
    oracle=f"""
        WITH sample AS (
            SELECT l_extendedprice AS k FROM lineitem
            WHERE ('0x' || SUBSTR(MD5(CAST(l_orderkey AS VARCHAR)
                        || ':' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                  % {_O8_SAMPLE_MOD} = 0
        ), cuts AS (
            SELECT QUANTILE_CONT(k,
                {[i / _O8_PARTS for i in range(1, _O8_PARTS)]}) AS cs
            FROM sample
        ), bucketed AS (
            SELECT LEN(LIST_FILTER(c.cs, x -> x < l.l_extendedprice)) AS part
            FROM lineitem l CROSS JOIN cuts c
        ), counts AS (
            SELECT part, CAST(COUNT(*) AS BIGINT) AS n
            FROM bucketed GROUP BY part
        ), tot AS (
            SELECT SUM(n) AS nt, MAX(n) AS nmax, COUNT(*) AS np FROM counts
        )
        SELECT CAST(c.part AS INT) AS part, c.n,
               ROUND(c.n / (t.nt / CAST(t.np AS DOUBLE)), 4) AS vs_ideal,
               ROUND(t.nmax / (t.nt / CAST(t.np AS DOUBLE)), 4) AS max_skew,
               t.nmax / (t.nt / CAST(t.np AS DOUBLE)) <= 1.1 AS balanced
        FROM counts c CROSS JOIN tot t
        ORDER BY part
    """,
)
def o8_range_partitioner_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    sample = li.filter(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % _O8_SAMPLE_MOD
        == 0
    ).select(F.col("l_extendedprice").alias("k"))
    fr = [i / _O8_PARTS for i in range(1, _O8_PARTS)]
    cuts = sample.agg(
        F.percentile("k", F.array(*[F.lit(x) for x in fr])).alias("cs")
    )
    bucketed = li.crossJoin(F.broadcast(cuts)).select(
        F.size(
            F.filter(F.col("cs"), lambda x: x < F.col("l_extendedprice"))
        ).alias("part")
    )
    counts = bucketed.groupBy("part").agg(F.count("*").cast("bigint").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("nt"),
        F.max("n").alias("nmax"),
        F.count("*").alias("np"),
    )
    ideal = F.col("nt") / F.col("np").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("part").cast("int").alias("part"),
            "n",
            F.round(F.col("n") / ideal, 4).alias("vs_ideal"),
            F.round(F.col("nmax") / ideal, 4).alias("max_skew"),
            (F.col("nmax") / ideal <= 1.1).alias("balanced"),
        )
        .orderBy("part")
    )


# --- O9: pagination drift under concurrent inserts -----------------------

_O9_PAGE = 20


@REGISTRY.register(
    name="o9_pagination_drift",
    survey_ref="O-family extra (why o3_keyset exists, measured): OFFSET "
    "pagination re-reads rows when inserts land before the cursor — "
    "this audit produces the duplicate count instead of citing lore",
    doc=f"pagination-stability audit: page 1 ({_O9_PAGE} rows by "
    "o_orderkey) is read from the corpus, then 10 new orders are "
    "PLANTED with keys below page 1's last key (the concurrent "
    "insert every paginating consumer eventually meets), and page 2 "
    "is fetched both ways from the grown table — OFFSET page 2 "
    "re-serves rows already seen on page 1 (duplicates counted), "
    "keyset page 2 (key > last seen) serves zero duplicates and "
    "exactly the rows OFFSET pushed out. One ordered TakeOrdered "
    "per page read; the comparison joins two page-sized frames. The "
    "verdict row is what goes in the API style guide.",
    oracle=f"""
        WITH v1 AS (
            SELECT o_orderkey AS k FROM orders
        ), page1 AS (
            SELECT k FROM v1 ORDER BY k LIMIT {_O9_PAGE}
        ), last1 AS (
            SELECT MAX(k) AS lastk FROM page1
        ), planted AS (
            SELECT -1 - UNNEST(GENERATE_SERIES(0, 9)) AS k
        ), v2 AS (
            SELECT k FROM v1 UNION ALL SELECT k FROM planted
        ), off2 AS (
            SELECT k FROM v2 ORDER BY k LIMIT {_O9_PAGE} OFFSET {_O9_PAGE}
        ), key2 AS (
            SELECT k FROM v2 WHERE k > (SELECT lastk FROM last1)
            ORDER BY k LIMIT {_O9_PAGE}
        )
        SELECT CAST((SELECT COUNT(*) FROM off2 o
                     JOIN page1 p ON p.k = o.k) AS BIGINT)
                   AS offset_page2_dups,
               CAST((SELECT COUNT(*) FROM key2 x
                     JOIN page1 p ON p.k = x.k) AS BIGINT)
                   AS keyset_page2_dups,
               (SELECT COUNT(*) FROM key2 x JOIN page1 p ON p.k = x.k) = 0
                   AS keyset_stable
    """,
)
def o9_pagination_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    v1 = orders.select(F.col("o_orderkey").alias("k"))
    page1 = v1.orderBy("k").limit(_O9_PAGE).transform(persist_once)
    lastk = page1.agg(F.max("k").alias("lastk"))
    planted = orders.sparkSession.range(0, 10).select((-1 - F.col("id")).alias("k"))
    v2 = v1.unionAll(planted)
    # OFFSET spelling: take the first 2 pages, drop page 1 by rank —
    # the rank window runs over a 2-page (40-row) frame, never the corpus
    off2 = (
        v2.orderBy("k")
        .limit(2 * _O9_PAGE)
        .withColumn("_rn", F.row_number().over(W.orderBy("k")))
        .filter(F.col("_rn") > _O9_PAGE)
        .select("k")
    )
    key2 = (
        v2.crossJoin(F.broadcast(lastk))
        .filter(F.col("k") > F.col("lastk"))
        .orderBy("k")
        .limit(_O9_PAGE)
        .select("k")
    )
    off_dups = off2.join(page1, "k").count()
    key_dups = key2.join(page1, "k").count()
    return orders.sparkSession.createDataFrame(
        [(off_dups, key_dups, key_dups == 0)],
        "offset_page2_dups bigint, keyset_page2_dups bigint, keyset_stable boolean",
    )
