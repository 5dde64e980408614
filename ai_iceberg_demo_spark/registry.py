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
    from ai_iceberg_demo_spark.vector import dedup, similarity

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
        streaming_events,
        streaming_stateful,
        artifacts,
        research,
        curation,
    ):
        merged.merge(mod.REGISTRY)
    return merged
