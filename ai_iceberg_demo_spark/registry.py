"""Query registry — pairs every implemented operator with its oracle.

Each operator from SURVEY.md §2 is registered as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are ANSI-SQL-expressible) an equivalent DuckDB SQL string. The driver
runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash; queries without oracle SQL get a
rows-only check.

Conventions that keep the two sides hash-identical:
- alias every computed column identically in Spark and SQL;
- ``round(x, n)`` any floating aggregate on BOTH sides (summation
  order differs between engines; rounding removes last-bit noise);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT);
- give every LIMIT/OFFSET query a total deterministic ORDER BY;
- session timezone pinned to UTC on the Spark side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey_ref: str = ""  # e.g. "J1", "V3" — row in SURVEY.md §2
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


@dataclass
class Registry:
    specs: dict[str, QuerySpec] = field(default_factory=dict)

    def register(
        self,
        name: str,
        *,
        oracle: str | None,
        survey_ref: str = "",
        doc: str = "",
        bench: bool = False,
    ) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if name in self.specs:
                raise ValueError(f"duplicate query name {name!r}")
            self.specs[name] = QuerySpec(
                name=name,
                fn=fn,
                oracle=oracle,
                survey_ref=survey_ref,
                doc=doc or (fn.__doc__ or ""),
                bench=bench,
            )
            return fn

        return deco

    def merge(self, other: "Registry") -> None:
        for name, spec in other.specs.items():
            if name in self.specs:
                raise ValueError(f"duplicate query name {name!r} on merge")
            self.specs[name] = spec

    def queries(self) -> dict[str, QueryFn]:
        return {n: s.fn for n, s in self.specs.items()}

    def oracle_sql(self) -> dict[str, str]:
        return {n: s.oracle for n, s in self.specs.items() if s.oracle is not None}


# The driver's correctness gate checks the FIRST 50 queries in
# registration order per round. Full rotation history + queue policy:
# ROTATION.md (kept out of this module per the r7 verdict).
#
# POLICY (r6 + r7 verdicts):
#   1. All 50 names must carry full hash oracles — rows-only names
#      never take a slot (enforced by tests/test_registry.py); they
#      are covered by the per-round pytest sweep and hash-oracled
#      twins.
#   2. Semantic changes / oracle upgrades JUMP THE QUEUE: a name whose
#      code changed semantics ranks at the head of the next window —
#      its old green row validated different code.
#   3. Then never-driver-checked names in registration order; then
#      staleness tiers.
#
# Round 8 window (this list): the 6 post-change re-pins FIRST —
# d3/d7/d14/d8 changed semantics in r7 (shingle-unit MinHash,
# corpus-sized SemDeDup k), f27/v9 upgraded rows-only → hash oracle —
# then the first 44 of the r7 post-d20 overflow in registration order.
#
# r9 draft (full list in ROTATION.md): the 46 remaining never-windowed
# hash-oracled names (s19, j11–j13, g7/g8, a24, w12, o8/o9, u39–u46,
# m18–m20, t77–t99 cohort, x6/x7, d26–d28, v33–v36, pipeline_
# experiment/forecast/storage, t93) + the head of the r2-core cohort
# (42 names, newest row r2) fills the last 4 slots; r8 registrations
# and any r8 semantic changes jump to the head per policy #2.
_DRIVER_WINDOW_PRIORITY = [
    # 6 post-change re-pins (policy #2): r7 semantic changes + oracle upgrades
    "d3_minhash_lsh",
    "d7_incremental_dedup",
    "d14_minhash_calibration",
    "d8_semdedup",
    "f27_markdown_html",
    "v9_print_layout",
    # first 44 of the r7 post-d20 overflow, registration order
    "d21_bloom_dedup_probe",
    "a8c_hll_register_core",
    "g4_link_prediction",
    "v29_binary_quantize",
    "pipeline_dedup_cascade",
    "v30_product_quantization",
    "g5_modularity",
    "d22_bag_of_words_dedup",
    "w11_ohlc_rollup",
    "t59_mad_outliers",
    "t56_tokenizer_fertility",
    "f42_mojibake_repair",
    "pipeline_quality_report",
    "s16_partition_plan",
    "s17_props_schema_drift",
    "a20_join_cardinality",
    "v31_tombstone_search",
    "t62_watermark_tuning",
    "a21_approx_quantile_audit",
    "pipeline_erasure",
    "t63_kaplan_meier",
    "t64_calibration_bins",
    "t65_roc_auc",
    "t66_markov_transitions",
    "t67_pmi_collocations",
    "t68_skipgram_pairs",
    "t69_chi2_terms",
    "t70_js_divergence",
    "v3e_ivf_probe_det",
    "u38_temperature_resample",
    "f43_script_profile",
    "f44_readability",
    "pipeline_model_eval",
    "v32_ivf_pq",
    "t71_inverted_index",
    "m16_bitemporal",
    "a22_kmv_overlap",
    "s18_zonemap_audit",
    "t74_diff_in_diff",
    "g6_personalized_pagerank",
    "t75_forecast_features",
    "a23_robust_means",
    "f47_token_chunks",
    "m17_dp_release",
]


def all_registries() -> Registry:
    """Import every operator module and merge their registries."""
    # Imports are local so a failure in one module surfaces loudly at
    # entry build time rather than at package import.
    from ai_iceberg_demo_spark.functions import (
        embedding,
        retrieval,
        scalar,
        text,
        udf_surface,
    )
    from ai_iceberg_demo_spark.multimodal import artifacts
    from ai_iceberg_demo_spark.operators import (
        aggregates,
        graph,
        joins,
        mutations,
        ordering_sets,
        sampling,
        scans_filters,
        skew,
        timeline,
        tpch,
        windows,
    )
    from ai_iceberg_demo_spark.pipeline import curation, index_maintenance, research
    from ai_iceberg_demo_spark.streaming import events as streaming_events
    from ai_iceberg_demo_spark.streaming import incremental as streaming_incremental
    from ai_iceberg_demo_spark.streaming import stateful as streaming_stateful
    from ai_iceberg_demo_spark.vector import clustering, dedup, similarity

    merged = Registry()
    for mod in (
        scans_filters,
        joins,
        graph,
        skew,
        aggregates,
        windows,
        ordering_sets,
        sampling,
        timeline,
        tpch,
        mutations,
        scalar,
        text,
        embedding,
        retrieval,
        udf_surface,
        similarity,
        dedup,
        clustering,
        streaming_events,
        streaming_stateful,
        artifacts,
        research,
        curation,
        streaming_incremental,
        index_maintenance,
    ):
        merged.merge(mod.REGISTRY)

    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in merged.specs]
    if missing:
        raise ValueError(f"_DRIVER_WINDOW_PRIORITY names not registered: {missing}")
    ordered = Registry()
    ordered.specs = {n: merged.specs[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.specs.update(
        (n, s) for n, s in merged.specs.items() if n not in ordered.specs
    )
    return ordered
