"""Scale-rehearsal runner: time named queries at a derived fixture.

The three-decade discipline (SCALE.md): after correctness is green at
the driver SFs, run the round's new/changed plans at 10x-100x the
bench fixture (tools/gen_scale_fixture.py) and look at the RATIO, not
the wall — at-or-below linear (ratio <= data multiple) passes; a
superlinear ratio is a real defect to fix same-round (d13's broadcast
OOM, v18's bucket occupancy, d5's label blocking were all caught
here, never by the sf0.1 bench).

    python tools/rehearse.py /tmp/sf10 name [name ...]

Prints per-query best-of-2 seconds through a noop sink (the full plan
executes without a collect). NOTE: clearCache() runs between the two
timed attempts and there is no untimed warm pass, so both readings are
cold-ish — NOT comparable to bench floors (which use a warm pre-run).
That is fine for this tool's only job: rehearsal RATIOS across
fixtures, which only need internal consistency.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf_dir, names = sys.argv[1], sys.argv[2:]

    from ai_iceberg_demo_spark.registry import all_registries
    from ai_iceberg_demo_spark.session import get_spark

    spark = get_spark("rehearse")
    specs = all_registries().specs
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    failed = []
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}: {str(exc).splitlines()[0][:160]}")
                failed.append(name)
                break
            finally:
                spark.catalog.clearCache()
        if best is not None:
            print(f"{best:8.2f}s  {name}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
