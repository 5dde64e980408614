"""ONE command that runs every round-end check and fails loudly.

The r8 verdict's marching order #6: fanout_audit and plan_audit caught
12 real silent multipliers but ran ad hoc — a future round could skip
a step. This gate makes skipping impossible: it runs, in order,

  1. oracle type-lint        (oracle_check.py --lint-types, sf0.001)
  2. full oracle sweep       (oracle_check.py, sf0.01 — the driver
                              gate's replica over EVERY registered
                              query, hash-compared against DuckDB)
  3. all-queries perf sweep  (sweep.py, sf0.1 — executes every query
                              beyond oracle scale + bench-floor guard)
  4. fan-out persist audit   (fanout_audit.py — unpersisted N×
                              re-execution multipliers)
  5. plan regeneration       (plan_audit.py → PLANS.md; FAILS if any
                              table row shows a CartesianProduct or a
                              bare scalar-Python mark, and prints the
                              git diff stat so a changed plan is
                              reviewed, never silent)
  6. pytest tests/ -q

and exits nonzero if ANY step does. Expect ~30 min on an idle 32-cpu
host (steps 2/3/6 dominate). Usage:

    python tools/round_gate.py            # everything
    python tools/round_gate.py --fast     # skip sweep + pytest (inner-
                                          # loop use; NOT a round gate)
    python tools/round_gate.py --sf-dir D # oracle-sweep fixture dir
                                          # (or $ROUND_GATE_SF_DIR);
                                          # default /root/testdata/sf0.01
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

def _run(label: str, cmd: list[str], timeout: int = 3600, tail_n: int = 6) -> tuple[str, bool, float]:
    t0 = time.time()
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, timeout=timeout, capture_output=True, text=True
        )
    except subprocess.TimeoutExpired:
        print(f"--- {label}: TIMEOUT after {timeout}s")
        return label, False, time.time() - t0
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-tail_n:])
    print(tail)
    ok = proc.returncode == 0
    if not ok:
        err_tail = "\n".join((proc.stderr or "").strip().splitlines()[-15:])
        print(f"--- {label}: FAILED (rc={proc.returncode})\n{err_tail}")
    return label, ok, time.time() - t0


def _check_plans_md() -> bool:
    # check TABLE ROWS only — the file's prose legitimately names the
    # forbidden nodes when explaining the columns. A row is bad when
    # its Joins cell names CartesianProduct or its Py cell is the bare
    # "✓" (plan_audit writes that only for BatchEvalPython; Arrow seams
    # print "arrow").
    bad = []
    for line in (REPO / "PLANS.md").read_text().splitlines():
        if not line.startswith("| ") or line.startswith("| Query"):
            continue
        cells = [c.strip() for c in line.split("|")]
        # ['', name, exch, joins, agg, topk, push, py, '']
        if len(cells) >= 9 and (
            "CartesianProduct" in cells[3] or cells[7] == "✓"
        ):
            bad.append(cells[1])
    if bad:
        print(f"--- PLANS.md rows with forbidden plan nodes: {bad}")
        return False
    diff = subprocess.run(
        ["git", "diff", "--stat", "PLANS.md"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    if diff:
        print(f"--- PLANS.md changed (review + commit the regeneration):\n{diff}")
    else:
        print("--- PLANS.md unchanged")
    return True


def main() -> int:
    import os

    argv = sys.argv[1:]
    fast = "--fast" in argv
    # oracle-sweep fixture dir: --sf-dir PATH > $ROUND_GATE_SF_DIR >
    # the driver's default — fail loudly if it does not exist rather
    # than letting the sweep die with an opaque read error
    sf_dir = os.environ.get("ROUND_GATE_SF_DIR", "/root/testdata/sf0.01")
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        if i + 1 >= len(argv):
            print("round_gate: --sf-dir requires a PATH argument")
            print("usage: round_gate.py [--fast] [--sf-dir PATH]")
            return 2
        sf_dir = argv[i + 1]
    if not Path(sf_dir).is_dir():
        print(f"round_gate: oracle-sweep fixture dir missing: {sf_dir}")
        print("pass --sf-dir PATH or set ROUND_GATE_SF_DIR")
        return 2
    py = sys.executable
    steps: list[tuple[str, bool, float]] = []

    steps.append(
        _run("type-lint", [py, "tools/oracle_check.py", "--lint-types"], 600)
    )
    steps.append(
        _run(f"oracle-sweep {Path(sf_dir).name}", [py, "tools/oracle_check.py", sf_dir], 3000)
    )
    if not fast:
        steps.append(_run("perf-sweep sf0.1", [py, "tools/sweep.py"], 3000))
    steps.append(_run("fanout-audit", [py, "tools/fanout_audit.py"], 1800, tail_n=60))
    steps.append(_run("plan-audit", [py, "tools/plan_audit.py"], 1800))
    steps.append(("plans-md-gate", _check_plans_md(), 0.0))
    if not fast:
        steps.append(
            _run("pytest", [py, "-m", "pytest", "tests/", "-q", "--tb=line"], 3000)
        )

    print("\n=== round_gate summary")
    failed = [s for s in steps if not s[1]]
    for label, ok, dt in steps:
        print(f"  {'PASS' if ok else 'FAIL'}  {label:22s} {dt:7.1f}s")
    if fast:
        print("  (--fast: perf-sweep and pytest SKIPPED — not a round gate)")
    print(f"round_gate: {'FAIL' if failed else 'PASS'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
