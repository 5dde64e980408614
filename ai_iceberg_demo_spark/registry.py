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
# Round 11 window (this list, per the r10 verdict's marching order
# #1): the 7 r10 registrations as first-ever pins (the capped k-NN
# graph twin + its three re-based consumers, the chrF/Heaps-law text
# ops, and the composed graph-governance pipeline — the only
# registered queries without driver rows), then the 40-name r3
# staleness cohort in name order (8 rounds stale by r11; the tier's
# rows-only names a8b/v3b/v3c/v11b excluded per policy #1 — each has
# a hash-oracled twin/core with driver history), then the first 3 of
# the r4 staleness tier in name order. 7 + 40 + 3 = 50. r12 draft:
# any r11 registrations first, then the remaining 47-name r4 tier —
# see ROTATION.md.
_DRIVER_WINDOW_PRIORITY = [
    # 7 r10 registrations (first-ever rows), verdict order
    "v18c_knn_graph_capped",
    "d26b_mutual_knn_capped",
    "v33b_knn_classifier_capped",
    "v24c_label_noise_capped",
    "t106_chrf_eval",
    "t107_vocab_growth",
    "pipeline_graph_quality",
    # r3 staleness cohort (newest driver row r3), name order
    "d2b_lsh_seeded_jaccard",
    "f10_text_assembly",
    "f11_template_enrich",
    "f12_date_format",
    "f14_arithmetic",
    "f16_label_dispatch",
    "f17_status_derive",
    "f1_title_extract",
    "f20_json_extract",
    "f21_struct_flatten",
    "f22_any_match",
    "f23_map_lookup",
    "f24_posexplode",
    "f3_path_normalize",
    "f4_trim_lower",
    "f5_truncate",
    "f6_split_tokens",
    "f9_key_synthesis",
    "pipeline_training_prep",
    "t10_session_window",
    "t11_attribution_join",
    "t12_stream_dedup",
    "t15_resample_gap_fill",
    "t17_decontamination",
    "t18_repetition",
    "t19_unigram_logprob",
    "t1_event_envelope",
    "t20_boilerplate_ngrams",
    "t5_stateful_session",
    "t8_tumbling_window",
    "t9_sliding_window",
    "u10b_mixture_apply",
    "u12_stratified_sample",
    "u9_sequence_packing",
    "v11_kmeans_assign",
    "v8b_image_resize",
    "v8c_frame_sample",
    "v8d_audio_features",
    "x1_registered_struct_udf",
    "x5_error_classification",
    # first 3 of the r4 staleness tier, name order
    "a10_cube",
    "a12_moment_stats",
    "a13_pivot_matrix",
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
