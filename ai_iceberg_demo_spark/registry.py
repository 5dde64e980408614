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
# registration order per round. Window history: r1 = relational core
# (CORRECTNESS_r01.json); r2 = dedup/vector/mutation/pipeline/streaming
# (r02); r3 = the 36 never-checked (scalar folds, corpus stats, ANN,
# multimodal) + the 6 new r3 operators + the events-consumer re-pins
# (r03: 44 hash-pass, 6 rows-only, 0 fail). Round 4 rotates by
# staleness, per the r3 verdict: the 48 relational-core queries whose
# ONLY driver evidence is r1 — now two fixture regenerations old — get
# fresh rows, plus the two queries whose code changes this round
# (u11's epoch became a parameter; u10 now derives its rate via the
# shared mixture_rates helper). Everything rotated out stays covered by
# the full-surface pytest oracle sweep (tests/test_queries_oracle.py,
# all registered queries, every round). u10b's same-output
# mixture_rates refactor and the new r4 registrations
# (u11b_epoch_shuffle_2, pipeline_incremental_curation) ride the
# pytest oracle this round and take window slots in r5. Names not
# listed keep their module registration order after these.
#
# r5 slot queue (registered this round, pytest-oracle-verified, no
# driver row yet): u11b_epoch_shuffle_2, pipeline_incremental_curation,
# t17b_semantic_decontamination, t21_bigram_merge_stats,
# d10_exact_substring_removal, v12_pca_project, t22_bm25_topk,
# t23_hybrid_rrf, u13_data_card, u6b_group_split, v13_standardize,
# t13_watermark_audit, v8e_phash_dedup, d11_source_overlap,
# g1_pagerank, t14_funnel, t14b_retention, a11b_histogram_quantiles,
# m6_scd2_upsert, v14_mmr_rerank, v15_topic_terms, and the operators
# registered later in r4 (u17_weighted_sample, u15_quality_calibration,
# m8_snapshot_diff, m9_compaction_plan, o6_zorder_key, v18_knn_graph,
# v19_contrastive_mining, g2_label_propagation, m10_wap_audit,
# t27_ab_test, t28_streaming_wap, u18_upsample_mix, m11_orphan_files,
# v20_quantize_embeddings, m12_maintenance_plan, u19_packing_split,
# w7_cumulative_uniques, f31_pretokenize, v21_cluster_quality,
# t30_rate_limit, v8f_scene_cut, u20_quality_deciles,
# s10_column_profile) — plus any r2-core queries whose newest driver
# row is then 3 rounds old.
_DRIVER_WINDOW_PRIORITY = [
    # --- the 48 r1-core queries, stalest first-evidence in the fleet ---
    "s1_full_scan",
    "s2_point_lookup",
    "s3_filtered_count",
    "p1_projection_rename",
    "p2_threshold_filter",
    "p3_notnull_filter",
    "p4_compound_predicate",
    "p5_category_equality",
    "p6_substring_routing",
    "p7_status_not_in",
    "p8_drop_null_rows",
    "j1_parent_children_join",
    "j2_union_edge_join",
    "j3_semi_join_exists",
    "j4_anti_join_guard",
    "j5_adjacent_sequence",
    "j7_star_join",
    "j8_asof_join",
    "j9_interval_join",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "a9_skew_salted_agg",
    "a1_max_per_group",
    "a2_predicated_count",
    "a3_progress_counters",
    "a4_collect_list_fanin",
    "a5_next_sequence",
    "a6_usage_accumulation",
    "q1_pricing_summary",
    "a7_rollup",
    "a10_cube",
    "a12_moment_stats",
    "a13_pivot_matrix",
    "w1_last_per_group",
    "w2_sequence_numbering",
    "w3_lag_predecessor",
    "w4_ranked_topk",
    "w5_moving_window_frame",
    "w6_distribution_ranks",
    "o1_newest_first",
    "o2_ordered_replay",
    "o3_pagination",
    "o3_keyset_pagination",
    "o4_topk_by_score",
    "o5_limited_replay",
    "u1_union_timeline",
    "u2_concat_datasets",
    "u3_intersect",
    # (a8_approx_distinct / a11_percentiles were in the r1 window too,
    # but re-earned r2 rows — only 1 round stale, no slot needed.)
    # --- code changed this round → re-pin ---
    "u11_epoch_shuffle",
    "u10_mixture_plan",
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
        windows,
    )
    from ai_iceberg_demo_spark.pipeline import curation, research
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
