"""Window-family invariants (operators/windows.py)."""

from __future__ import annotations


def test_ohlc_bounds_and_determinism(spark):
    """w11: every candle must satisfy low <= open/close <= high with
    positive tick counts, cover every (type, day) with non-null values,
    and be replay-stable (same-timestamp ties broken by event_id)."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.operators.windows import w11_ohlc_rollup
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = w11_ohlc_rollup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"], r
        assert r["low"] <= r["close"] <= r["high"], r
        assert r["n_ticks"] > 0
    n_groups = (
        load_table(spark, "events", SF_DIR)
        .filter(PF.col("value").isNotNull())
        .select("event_type", PF.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .count()
    )
    assert len(rows) == n_groups
    assert rows == w11_ohlc_rollup(spark, SF_DIR).collect()
