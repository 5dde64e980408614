"""Capture .explain('formatted') output for named queries.

Usage: python tools/capture_plans.py <outdir> <suffix> [name ...]

Writes <outdir>/<name>_<suffix>.txt for each query (default: every
bench-flagged query). Explain only — nothing is executed, so this can
run alongside other work without perturbing timings.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from ai_iceberg_demo_spark.registry import all_registries
    from ai_iceberg_demo_spark.session import get_spark

    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("capture_plans")
    reg = all_registries()
    if not names:
        names = [n for n, s in reg.specs.items() if s.bench]

    for name in names:
        spec = reg.specs[name]
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
