"""Run EVERY registered query at a scale factor and report timings.

The oracle gate runs at sf0.01 and the bench covers 16 headline
queries — this sweep is the third leg: every query executes at the
target SF (default sf0.1), so a pathological plan that only blows up
beyond oracle scale gets caught before the driver does. Exits nonzero
on any failure.

Usage: python tools/sweep.py [sf_dir] [slow_threshold_sec]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from ai_iceberg_demo_spark.registry import all_registries
    from ai_iceberg_demo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    slow_s = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

    spark = get_spark("sweep")
    failed: list[tuple[str, str]] = []
    timings: list[tuple[float, str]] = []
    for name, spec in sorted(all_registries().specs.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings.append((time.perf_counter() - t0, name))
        except Exception as exc:  # noqa: BLE001
            failed.append((name, str(exc).splitlines()[0][:100]))
    for dt, name in sorted(timings, reverse=True):
        if dt > slow_s:
            print(f"SLOW {dt:6.1f}s  {name}")
    print(f"{len(timings)} ran, {len(failed)} failed, "
          f"{sum(t for t, _ in timings):.1f}s total at {sf_dir}")
    for name, err in failed:
        print(f"FAIL {name}: {err}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
