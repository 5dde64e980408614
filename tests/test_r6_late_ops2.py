"""Named invariants for the last r6 additions (band join, PSI, PRF,
UDTF, apportionment, feature-store TTL, experiment card)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_DIR


def test_j11_matches_brute_force_pair_count(spark):
    """The bucket+neighbor equi-join finds EXACTLY the pairs the O(n²)
    brute force finds — an independent pandas spelling."""
    from ai_iceberg_demo_spark.operators.joins import _J11_EPS, j11_band_join

    got = j11_band_join(spark, SF_DIR).toPandas().iloc[0]
    prices = sorted(
        pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        .l_extendedprice.astype(float)
        .round(2)
        .unique()
    )
    brute = 0
    for i, a in enumerate(prices):
        for b in prices[i + 1 :]:
            if b - a > _J11_EPS:
                break
            brute += 1
    assert got.n_pairs == brute
    assert bool(got.all_within_band)


def test_t84_planted_type_is_the_argmax_psi(spark):
    from ai_iceberg_demo_spark.streaming.events import t84_psi_drift

    out = t84_psi_drift(spark, SF_DIR).toPandas()
    assert out.loc[out.psi.idxmax(), "event_type"] == "error"
    assert out[out.event_type == "error"].verdict.iloc[0] == "act"


def test_t85_expansion_excludes_base_terms_and_ranks_descend(spark):
    from ai_iceberg_demo_spark.functions.retrieval import (
        QUERY_TERMS,
        t85_prf_expansion,
    )

    out = t85_prf_expansion(spark, SF_DIR).toPandas()
    exp = set(out.expansion_terms.iloc[0].split(","))
    assert exp.isdisjoint(set(QUERY_TERMS))
    assert len(exp) == 3
    assert (out.score.diff().dropna() <= 1e-9).all()


def test_x6_udtf_rowcount_matches_explode_arithmetic(spark):
    from ai_iceberg_demo_spark.functions.udf_surface import x6_python_udtf
    from ai_iceberg_demo_spark.tables import load_table

    out = x6_python_udtf(spark, SF_DIR).toPandas()
    docs = load_table(spark, "documents", SF_DIR).toPandas()
    expect = sum(
        -(-len(t.split(" ")) // 16) for t in docs.text  # ceil(len/16)
    )
    assert len(out) == expect
    assert (out.n_tokens <= 16).all()


def test_u39_allocations_hit_the_budget_exactly(spark):
    from ai_iceberg_demo_spark.operators.sampling import (
        _U39_BUDGET,
        u39_hamilton_allocation,
    )

    out = u39_hamilton_allocation(spark, SF_DIR).toPandas()
    assert out.allocated.sum() == _U39_BUDGET
    assert out.sum_check.all()
    # every allocation is floor(quota) or floor(quota)+1
    assert ((out.allocated - out.quota.apply(math.floor)).isin([0, 1])).all()


def test_t89_ttl_is_enforced_and_age_null_iff_no_prior(spark):
    from ai_iceberg_demo_spark.streaming.events import (
        _T89_TTL_S,
        t89_feature_store_join,
    )

    out = t89_feature_store_join(spark, SF_DIR).toPandas()
    fresh = out[out.feature_value.notna()]
    assert (fresh.feature_age_s <= _T89_TTL_S).all()
    stale = out[out.is_stale]
    assert (stale.feature_age_s > _T89_TTL_S).all()
    assert stale.feature_value.isna().all()
    no_prior = out[out.feature_age_s.isna()]
    assert (~no_prior.is_stale).all() and no_prior.feature_value.isna().all()


def test_t80_verdict_is_consistent_and_rates_are_proportions(spark):
    from ai_iceberg_demo_spark.streaming.events import t80_power_analysis

    out = t80_power_analysis(spark, SF_DIR).toPandas()
    # the verdict IS the comparison (no drift between columns)
    assert (
        out.adequately_powered
        == (out.n_per_arm_current >= out.n_per_arm_required)
    ).all()
    assert (out.target_rate > out.baseline_rate).all()
    assert (out.target_rate <= 0.999).all(), "p1 must stay a proportion"


def test_pipeline_experiment_has_the_three_families(spark):
    from ai_iceberg_demo_spark.pipeline.curation import pipeline_experiment

    out = pipeline_experiment(spark, SF_DIR).toPandas()
    assert out.family.value_counts().to_dict() == {
        "design": 3,
        "readout": 4,
        "causal": 4,
    }
    # composition consistency: the card's recovered flag is t74's
    assert out.set_index(["family", "metric"]).loc[
        ("causal", "recovered"), "value"
    ] == 1.0
