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
# Round 10 window (this list, per the r9 verdict's marching order #1):
# the 9 r9 overflows first (in registration order), then the 3 r9
# registrations as post-change/first-ever pins (d9b, t105, d28b —
# d28b's slot also re-pins the r10 shuffle_hash hints on its path
# self-join and closure join, plan-only), then u19_packing_split
# (its only driver row, r5, predates its hash oracle — policy #2),
# then the 37-name r2-core staleness cohort in name order (8 rounds
# stale; a8 excluded per policy #1 — rows-only; its hash-oracled core
# a8c holds an r8 row). 9 + 3 + 1 + 37 = 50. r11 draft: the r10
# registrations (v18c/d26b/v33b/v24c) first, then the r3 staleness
# tier — see ROTATION.md.
_DRIVER_WINDOW_PRIORITY = [
    # 9 r9 overflows, registration order
    "t89_feature_store_join",
    "t90_eb_shrinkage",
    "t91_uplift_by_segment",
    "t92_lift_chart",
    "t94_msprt_sequential",
    "pipeline_experiment",
    "pipeline_forecast",
    "pipeline_storage",
    "t93_streaming_topk",
    # r9 registrations (first-ever rows; d28b doubles as the r10
    # join-hint re-pin) + the u19 oracle-upgrade re-pin
    "d9b_canonical_at_scale",
    "t105_bleu_eval",
    "d28b_transitivity_at_scale",
    "u19_packing_split",
    # r2-core staleness cohort (newest driver row r2), name order
    "a11_percentiles",
    "d1_exact_dedup",
    "d1b_drop_duplicates",
    "d4_simhash",
    "d5_embedding_dedup",
    "f25_base64_roundtrip",
    "f26_html_escape",
    "f28_fuzzy_match",
    "f29_pii_redaction",
    "flagship_timeline",
    "j6_similarity_join",
    "m1_merge_upsert",
    "m2_point_update",
    "m3_append_insert",
    "m4_insert_if_absent",
    "pipeline_curation",
    "pipeline_interactive",
    "pipeline_run_direct",
    "t16_winnowing_fingerprint",
    "t1_token_counting",
    "t2_quality_score",
    "t2_topic_routing",
    "t3_langid",
    "t3_stream_filter",
    "t4_fingerprint",
    "u4_except",
    "u5_hash_sample",
    "u6_train_test_split",
    "u7_class_weights",
    "u8_source_cap",
    "v10_text_stats",
    "v1_hash_embedding",
    "v2_chunking",
    "v3_cosine_topk",
    "v4_semantic_cache_gate",
    "v5_context_retrieval",
    "v8_artifact_metadata",
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
