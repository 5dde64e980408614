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
