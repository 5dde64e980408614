"""Driver-canonicalizer conformance: every registered query's output
schema is scalar-only.

The driver canonicalizes results via pandas ``sort_values`` + hashing;
ArrayType/MapType/StructType cells arrive as Python lists/dicts/Rows —
unhashable — and kill the row with ``TypeError: unhashable type``
(CORRECTNESS_r01: a8_approx_distinct, a11_percentiles). This test makes
that failure class impossible to reintroduce: any query that wants to
expose a collection must explode it to rows or project scalar columns.

Schema-only (plan analysis, no execution), so the whole sweep is fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from ai_iceberg_demo_spark.registry import all_registries
from tests.conftest import SF_DIR

SPECS = all_registries().specs

_FORBIDDEN = (ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_output_schema_is_scalar_only(spark, name):
    schema = SPECS[name].fn(spark, SF_DIR).schema
    bad = [f"{f.name}: {f.dataType.simpleString()}" for f in schema.fields
           if isinstance(f.dataType, _FORBIDDEN)]
    assert not bad, (
        f"query {name!r} emits non-scalar column(s) {bad} — the driver's "
        "pandas canonicalizer cannot hash these; explode to rows or "
        "project scalar columns instead"
    )


def test_eval_prep_excludes_all_contamination_and_fills_quota(spark):
    """No benchmark or contaminated doc reaches the eval set; the
    per-cell quota holds; both split halves are populated."""
    from pyspark.sql import functions as F

    from ai_iceberg_demo_spark.functions.text import t17_decontamination
    from ai_iceberg_demo_spark.pipeline.curation import (
        _EVAL_PER_CELL,
        pipeline_eval_prep,
    )
    from ai_iceberg_demo_spark.vector.similarity import t17b_semantic_decontamination
    from tests.conftest import SF_DIR

    rows = pipeline_eval_prep(spark, SF_DIR).collect()
    assert rows
    ids = {r["doc_id"] for r in rows}
    assert not any(i % 10 == 3 for i in ids), "benchmark doc leaked into eval"
    lex = {r["doc_id"] for r in t17_decontamination(spark, SF_DIR).collect()}
    assert not ids & lex, "lexically contaminated doc leaked"
    sem = {
        r["vec_id"]
        for r in t17b_semantic_decontamination(spark, SF_DIR).collect()
        if r["vec_id"] < 1_000_000  # planted twins aren't real corpus rows
    }
    assert not ids & sem, "semantically contaminated doc leaked"
    per_cell: dict = {}
    for r in rows:
        per_cell[r["cell_id"]] = per_cell.get(r["cell_id"], 0) + 1
    assert all(n <= _EVAL_PER_CELL for n in per_cell.values())
    assert len(per_cell) >= 2, "eval set must span multiple cells"
    assert {r["split"] for r in rows} == {"val", "test"}


def test_fk_profiler_certifies_real_keys_and_flags_the_planted_non_key(spark):
    """s11: the five real star-schema FKs report inclusion 1.0/is_fk;
    the deliberately planted non-key pair reports partial containment."""
    from ai_iceberg_demo_spark.operators.scans_filters import s11_fk_inclusion
    from tests.conftest import SF_DIR

    rows = {(r["child"], r["parent"]): r
            for r in s11_fk_inclusion(spark, SF_DIR).collect()}
    assert len(rows) == 6
    for key, r in rows.items():
        if key == ("orders.o_orderkey", "customer.c_custkey"):
            assert not r["is_fk"] and r["inclusion"] < 1.0
        else:
            assert r["is_fk"] and r["inclusion"] == 1.0
        assert r["n_matched"] <= r["n_child"]


def test_consistent_hashing_moves_only_the_split_arc(spark):
    """o7: growing the ring by one worker moves keys out of EXACTLY
    one existing worker (the one whose arc the new mark splits), the
    loads partition the corpus, and nothing else changes."""
    from ai_iceberg_demo_spark.operators.ordering_sets import (
        o7_consistent_hashing,
    )
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    rows = o7_consistent_hashing(spark, SF_DIR).collect()
    total = sum(r["load_n"] for r in rows)
    assert total == load_table(spark, "documents", SF_DIR).count()
    movers = [r for r in rows if r["moved_out"] > 0]
    assert len(movers) == 1
    assert movers[0]["moved_out"] < movers[0]["load_n"]
