"""Salting preserves semantics: salted ops equal their plain twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_iceberg_demo_spark.operators.skew import salted_collect_list, salted_join
from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_orderstatus")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus"
    )
    salted = salted_join(
        li,
        orders,
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        salt_from=["l_linenumber", "l_partkey"],
        n_salts=8,
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_collect_list_equals_plain(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("l_partkey_list"))
        .collect()
    )
    salted = (
        salted_collect_list(
            li, "l_returnflag", "l_partkey", salt_from=["l_orderkey", "l_linenumber"], n_salts=8
        )
        .select("l_returnflag", F.sort_array("l_partkey_list").alias("l_partkey_list"))
        .collect()
    )
    assert {r["l_returnflag"]: r["l_partkey_list"] for r in plain} == {
        r["l_returnflag"]: r["l_partkey_list"] for r in salted
    }


def test_salted_agg_splits_state(spark):
    """Phase-1 output really is split: >1 partial row per group."""
    from ai_iceberg_demo_spark.operators.skew import with_salt

    li = load_table(spark, "lineitem", SF_DIR)
    parts = (
        with_salt(li, ["l_orderkey"])
        .groupBy("l_returnflag", "_salt")
        .count()
        .groupBy("l_returnflag")
        .count()
    )
    assert all(r["count"] > 1 for r in parts.collect())


def test_salted_topk_equals_plain_window(spark):
    """salted_topk == plain row_number window (rn included) when the
    order is total."""
    from pyspark.sql import Window

    from ai_iceberg_demo_spark.operators.skew import salted_topk

    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = Window.partitionBy("l_returnflag").orderBy(*order)
    plain = li.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    salted = salted_topk(
        li, ["l_returnflag"], order, k=5, salt_from=["l_orderkey", "l_linenumber"], n_salts=8
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_join_cardinality_exact_and_estimate_agree_on_shape(spark):
    """a20: exact_pairs must equal the brute-force self-join count (at
    fixture scale the join is actually executable), the estimate must
    land within 25% (the fixture's partkey counts are near-uniform, so
    the uniform-tail assumption is good here), the plan must use
    TakeOrderedAndProject (never a global-window rank), and top20_share
    must be a valid fraction."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.operators.aggregates import a20_join_cardinality
    from ai_iceberg_demo_spark.plans import explain_str
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    df = a20_join_cardinality(spark, SF_DIR)
    plan = explain_str(df, "formatted")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    r = df.first()
    li = load_table(spark, "lineitem", SF_DIR).select("l_partkey")
    brute = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert r["exact_pairs"] == brute
    assert 0 < r["top20_share"] <= 1.0
    assert r["rel_error"] < 0.25
    assert abs(r["est_pairs"] / r["exact_pairs"] - 1) < 0.25


def test_approx_quantile_audit_verdicts_hold_and_are_tight(spark):
    """a21: every within-1% verdict must be True AND the underlying
    sketch must actually be much tighter (< 0.2% here) — if the sketch
    ever degrades toward the bar, this canary trips before the oracle
    verdicts would."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.operators.aggregates import (
        _A21_ACCURACY,
        a21_approx_quantile_audit,
    )
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = a21_approx_quantile_audit(spark, SF_DIR).collect()
    assert rows
    assert all(r["q50_within_1pct"] and r["q95_within_1pct"] for r in rows)
    li = load_table(spark, "lineitem", SF_DIR)
    tight = li.groupBy("l_returnflag").agg(
        (
            PF.abs(
                PF.percentile_approx("l_extendedprice", PF.lit(0.5), PF.lit(_A21_ACCURACY))
                / PF.percentile("l_extendedprice", PF.lit(0.5))
                - 1
            )
        ).alias("e50")
    )
    assert all(r["e50"] < 0.002 for r in tight.collect())
