"""Flag unpersisted fan-outs: queries whose physical plan scans one
parquet table far more often than its logical role needs.

The round-8 lesson (v32, d26, f32, d3, d2b): a frame consumed by N
downstream branches without a persist re-executes its whole upstream
chain N times — invisible at oracle SF, a silent multiplier at 100 TB.
This audit makes the detection continuous, like plan_audit's table:
for every registered query, count physical `Scan parquet` occurrences
PER TABLE and flag any table scanned >= THRESHOLD times with no
InMemoryTableScan/ReusedExchange absorbing the repetition.

A flagged query is not automatically wrong (g1/g6-style unrolled
iterations legitimately re-reference a persisted-at-runtime frame
whose first plan still shows the scans; 1-row broadcast probes are
noise) — the point is a short, reviewable list instead of a 388-query
manual sweep.

    python tools/fanout_audit.py [sf_dir] [threshold]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from ai_iceberg_demo_spark.registry import all_registries
    from ai_iceberg_demo_spark.session import get_spark

    spark = get_spark("fanout_audit")
    flagged = 0
    checked = 0
    for name, spec in all_registries().specs.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming-only bodies etc.
            print(f"SKIP  {name}: {str(exc)[:60]}")
            continue
        finally:
            spark.catalog.clearCache()
        checked += 1
        per_table = Counter()
        for scan in re.findall(r"Scan parquet[^\n]*", plan):
            for t in TABLES:
                if f"{t}.parquet" in scan or f"/{t}]" in scan:
                    per_table[t] += 1
                    break
        inmem = plan.count("InMemoryTableScan")
        reused = plan.count("ReusedExchange")
        worst = per_table.most_common(1)
        if worst and worst[0][1] >= threshold and inmem == 0 and reused == 0:
            flagged += 1
            print(
                f"FANOUT {name}: {worst[0][0]} scanned {worst[0][1]}x "
                f"(inmem={inmem} reused={reused})"
            )
    print(f"{checked} checked, {flagged} flagged (threshold {threshold})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
