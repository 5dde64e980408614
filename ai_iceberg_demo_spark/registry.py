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
# registration order per round. Round 1 covered the relational core
# (48/50 green, CORRECTNESS_r01.json); round 2 covered the
# dedup/vector/mutation/pipeline/streaming surface (49/50 green, the one
# red being t10's ts-type breakage, CORRECTNESS_r02.json). Round 3
# rotates in the 36 queries the driver has NEVER seen (scalar folds,
# t17–t20 corpus stats, d2b/d8, v11/v11b, u9/u10, x1/x5, multimodal
# variants, f27/v9), then re-pins t10 (fixed this round) and every other
# events-table consumer — the ts normalization (tables.normalize_schema)
# changed their input type, so their green rows should be re-earned —
# plus the four round-1 output-shape fixes. Names not listed keep their
# module registration order after these.
_DRIVER_WINDOW_PRIORITY = [
    # --- the 36 never-driver-checked queries ---
    # scalar function folds (F1-F24)
    "f1_title_extract",
    "f3_path_normalize",
    "f4_trim_lower",
    "f5_truncate",
    "f6_split_tokens",
    "f9_key_synthesis",
    "f10_text_assembly",
    "f11_template_enrich",
    "f12_date_format",
    "f14_arithmetic",
    "f16_label_dispatch",
    "f17_status_derive",
    "f20_json_extract",
    "f21_struct_flatten",
    "f22_any_match",
    "f23_map_lookup",
    "f24_posexplode",
    # corpus statistics / decontamination
    "t17_decontamination",
    "t18_repetition",
    "t19_unigram_logprob",
    "t20_boilerplate_ngrams",
    # UDF surface
    "x1_registered_struct_udf",
    "x5_error_classification",
    # clustering / ANN / dedup variants
    "v11_kmeans_assign",
    "v11b_kmeans_train",
    "d8_semdedup",
    "d2b_lsh_seeded_jaccard",
    "v3b_ann_topk",
    "v3c_ivf_topk",
    # sampling extras
    "u9_sequence_packing",
    "u10_mixture_plan",
    # multimodal variants + rendering
    "v8b_image_resize",
    "v8c_frame_sample",
    "v8d_audio_features",
    "f27_markdown_html",
    "v9_print_layout",
    # --- new round-3 operators ---
    "d9_quality_canonical",
    "u11_epoch_shuffle",
    "u12_stratified_sample",
    "u10b_mixture_apply",
    "a8b_hll_mergeable",
    "pipeline_training_prep",
    # --- re-pins ---
    # fixed this round (r2's one red row)
    "t10_session_window",
    # NOT re-pinned: a8/a11/v1/t16 (r1's output-shape fixes) earned
    # green r2 rows and neither their code nor their input tables
    # changed since — their slots go to the six new r3 operators above;
    # likewise t2/t3 routing/filter (ts-independent semantics).
    # events-table consumers whose INPUT TYPE changed under
    # normalize_schema; t2/t3 (routing/filter never touch ts) cede
    # their slots to new operators
    "t1_event_envelope",
    "t8_tumbling_window",
    "t9_sliding_window",
    "t11_attribution_join",
    "t12_stream_dedup",
    "t15_resample_gap_fill",
    "t5_stateful_session",
]


def all_registries() -> Registry:
    """Import every operator module and merge their registries."""
    # Imports are local so a failure in one module surfaces loudly at
    # entry build time rather than at package import.
    from ai_iceberg_demo_spark.functions import embedding, scalar, text, udf_surface
    from ai_iceberg_demo_spark.multimodal import artifacts
    from ai_iceberg_demo_spark.operators import (
        aggregates,
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
    from ai_iceberg_demo_spark.streaming import stateful as streaming_stateful
    from ai_iceberg_demo_spark.vector import clustering, dedup, similarity

    merged = Registry()
    for mod in (
        scans_filters,
        joins,
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
        udf_surface,
        similarity,
        dedup,
        clustering,
        streaming_events,
        streaming_stateful,
        artifacts,
        research,
        curation,
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
