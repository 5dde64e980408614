"""Skew handling — salting patterns for hot keys at 100 TB.

The fixtures are uniform, but production key distributions never are:
one conversation with millions of messages, one user with millions of
events, one dedup bucket holding half the corpus. Two mitigations and
when each applies:

- **AQE skew-join** (on in session.py): splits oversized shuffle
  partitions at runtime. Handles *join* skew transparently — prefer it.
- **Salting** (this module): needed where AQE can't help —
  (a) holistic aggregations with no map-side combine (collect_list,
  exact distinct) where one group's state explodes on a single reducer;
  (b) broadcast-impossible joins against a hot key set.

Pattern (a): two-phase aggregation. Phase 1 groups by (key, salt) so
the hot group's state is split S ways across reducers; phase 2 merges
the S partials per key. The salt must be derived from a column that
varies WITHIN the group (any per-row attribute) so it's deterministic —
rand() salts break retry/replay determinism (Spark task retries would
resalt rows differently).

Pattern (b): salted join. The big side salts each row into one of S
buckets; the (too-big-to-broadcast, but replicable) other side is
exploded S ways so every (key, salt) pair still meets its match. The
hot key's rows now land on S reducers instead of one. Cost: the small
side shuffles S× — use only on keys measured hot.

The reference never handles skew (its per-conversation fan-in is
tiny, `neo4j_memory.py:327-339`); this is part of the engine's
100 TB surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table, persist_once

REGISTRY = Registry()

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, from_cols: list[str], n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Append a deterministic `_salt` in [0, n_salts) derived from
    columns that vary within the hot group (NOT the group key)."""
    if "_salt" in df.columns:
        raise ValueError("input already has a `_salt` column — rename it before salting")
    return df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    replicated: DataFrame,
    on: Column,
    salt_from: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over n_salts
    reducers; `replicated` is exploded n_salts× so every salted row
    still finds its match. For the supported join types the result is
    identical to big.join(replicated, on, how) minus the `_salt`
    bookkeeping column. Join types that preserve unmatched rows of the
    REPLICATED side (right/full outer) are rejected: the explode
    duplicates those rows n_salts× and nothing collapses the unmatched
    copies — salt the other side instead."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of the "
            "replicated side would be emitted n_salts times; swap sides or use AQE skew-join"
        )
    if "_salt" in replicated.columns:
        raise ValueError("replicated side already has a `_salt` column — rename it before salting")
    salted_big = with_salt(big, salt_from, n_salts)
    exploded = replicated.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    joined = salted_big.join(exploded, on & (salted_big["_salt"] == exploded["_salt"]), how)
    return joined.drop("_salt")


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    salt_from: list[str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """collect_list with the holistic state split S ways: phase 1
    collects per (key, salt), phase 2 flattens the S partial lists.
    The final list's order is nondeterministic (as is unsalted
    collect_list's) — sort it downstream if order matters."""
    phase1 = (
        with_salt(df, salt_from, n_salts)
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return phase1.groupBy(key).agg(F.flatten(F.collect_list("_part")).alias(f"{value}_list"))


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    salt_from: list[str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Top-k rows per key, skew-proof: a plain
    ``row_number() over (partition by key)`` funnels every row of a hot
    key through one reducer's sort. Phase 1 ranks per (key, salt) and
    keeps k — parallel S ways, so a key with a billion rows sorts
    ~1B/S per task; phase 2 ranks the ≤ S·k survivors per key. Result
    (including the `rn` column) is identical to the unsalted window
    provided `order` is a total order (include a tiebreaker column).
    """
    from pyspark.sql import Window

    if "_rn1" in df.columns:
        raise ValueError("input already has a `_rn1` column — rename it before salted_topk")
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    pruned = (
        with_salt(df, salt_from, n_salts)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return pruned.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)


@REGISTRY.register(
    name="a9_skew_salted_agg",
    bench=True,
    survey_ref="§2.4 extras (skew)",
    doc="Two-phase salted aggregation over the 3 heavy l_returnflag "
    "groups (~200k rows each at sf0.1): phase 1 by (flag, salt-from-"
    "orderkey) splits each group's state 16 ways, phase 2 merges "
    "sums/counts exactly. Result equals the direct aggregate; the "
    "shape is what holistic aggs need when one key owns a reducer.",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
               ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / COUNT(*), 4) AS avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def a9_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    phase1 = (
        with_salt(li, ["l_orderkey"])
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("_sum"),
        )
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("_n").alias("n_items"),
        F.sum("_sum").cast("double").alias("total"),
        F.round(F.sum("_sum") / F.sum("_n"), 4).cast("double").alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# a14: join-key skew diagnostics
# ---------------------------------------------------------------------------

_SKEW_TOPK = 5


@REGISTRY.register(
    name="a14_skew_report",
    survey_ref="§2.4 extras (skew diagnostics)",
    doc="the 'should I salt this join' audit: for each candidate join "
    "key of the fact tables (lineitem.l_orderkey, lineitem.l_suppkey, "
    "events.user_id), the distinct-key count, mean and max rows per "
    "key, the max/mean ratio (the skew factor AQE or salting must "
    "absorb), and the share of the table owned by the hottest "
    f"{_SKEW_TOPK} keys. One partial-agg pass per key (the per-key "
    "count table), then a 1-row rollup — the report is three tiny "
    "rows however large the facts are.",
    oracle=f"""
        WITH stats AS (
            SELECT 'lineitem.l_orderkey' AS key_name, COUNT(*) AS n_keys,
                   SUM(c) AS n_rows, MAX(c) AS max_rows,
                   SUM(c) FILTER (WHERE r <= {_SKEW_TOPK}) AS top_rows
            FROM (SELECT COUNT(*) AS c,
                         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_orderkey) AS r
                  FROM lineitem GROUP BY l_orderkey)
            UNION ALL
            SELECT 'lineitem.l_suppkey', COUNT(*), SUM(c), MAX(c),
                   SUM(c) FILTER (WHERE r <= {_SKEW_TOPK})
            FROM (SELECT COUNT(*) AS c,
                         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_suppkey) AS r
                  FROM lineitem GROUP BY l_suppkey)
            UNION ALL
            SELECT 'events.user_id', COUNT(*), SUM(c), MAX(c),
                   SUM(c) FILTER (WHERE r <= {_SKEW_TOPK})
            FROM (SELECT COUNT(*) AS c,
                         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS r
                  FROM events GROUP BY user_id)
        )
        SELECT key_name,
               CAST(n_keys AS BIGINT) AS n_keys,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(max_rows AS BIGINT) AS max_rows,
               ROUND(CAST(max_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4) AS skew_factor,
               ROUND(CAST(top_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 4) AS top{_SKEW_TOPK}_share
        FROM stats
    """,
)
def a14_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(table: str, key: str) -> DataFrame:
        df = load_table(spark, table, sf_dir)
        # diamond: the per-key count table feeds both the rollup and
        # the top-k — persist so the fact scan+agg runs once
        counts = df.groupBy(key).agg(F.count("*").alias("c")).transform(persist_once)
        base = counts.agg(
            F.lit(f"{table}.{key}").alias("key_name"),
            F.count("*").alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_rows"),
        )
        # top-k share via TakeOrderedAndProject (map-side partial
        # top-k) — NOT a global row_number window, which would funnel
        # the n_keys-sized count table through one task at scale; the
        # (c DESC, key ASC) tie-break matches the oracle's ROW_NUMBER
        top = (
            counts.orderBy(F.desc("c"), F.asc(key))
            .limit(_SKEW_TOPK)
            .agg(F.sum("c").alias("top_rows"))
        )
        return base.crossJoin(F.broadcast(top))

    stats = (
        one("lineitem", "l_orderkey")
        .unionByName(one("lineitem", "l_suppkey"))
        .unionByName(one("events", "user_id"))
    )
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return stats.select(
        "key_name",
        "n_keys",
        "n_rows",
        "max_rows",
        F.round(F.col("max_rows").cast("double") / mean, 4).alias("skew_factor"),
        F.round(F.col("top_rows").cast("double") / F.col("n_rows").cast("double"), 4).alias(
            f"top{_SKEW_TOPK}_share"
        ),
    )
