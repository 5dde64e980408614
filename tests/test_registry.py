"""Registry invariants the driver contract depends on."""

from __future__ import annotations

from ai_iceberg_demo_spark.registry import _DRIVER_WINDOW_PRIORITY, all_registries


def test_driver_window_is_exactly_50_unique_registered_names():
    # The driver's correctness gate reads the FIRST 50 registered
    # queries; the priority list must fill the window exactly — a short
    # list silently cedes slots to module order, a long one silently
    # drops its tail out of the window.
    assert len(_DRIVER_WINDOW_PRIORITY) == 50
    assert len(set(_DRIVER_WINDOW_PRIORITY)) == 50
    reg = all_registries()
    assert list(reg.specs)[:50] == _DRIVER_WINDOW_PRIORITY


def test_driver_window_slots_are_all_hash_oracled():
    # Policy (r6 verdict): rows-only names never take a window slot —
    # window slots are the scarcest evidence in the loop, so every slot
    # must be able to go hash-green. Rows-only queries are covered by
    # the per-round pytest sweep and (where approximate) by their
    # hash-oracled exact twins (v24 → v24b precedent).
    reg = all_registries()
    rows_only = [n for n in _DRIVER_WINDOW_PRIORITY if reg.specs[n].oracle is None]
    assert rows_only == [], f"rows-only names holding driver slots: {rows_only}"


def test_query_names_are_wellformed_and_documented():
    import re

    reg = all_registries()
    for name, spec in reg.specs.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert spec.doc.strip(), f"{name} has no doc"
        assert callable(spec.fn), name


def test_bench_set_is_headline_sized_and_fully_oracled():
    # the bench headline set feeds BENCH_r{N}.json — every member must
    # be hash-checkable (a perf number for a query whose answer can't
    # be verified is worthless), and the set stays headline-sized so
    # round-over-round totals remain comparable. Approximate operators
    # may join the set ONLY via the explicit exception list below, and
    # each must be (a) invariant-tested against an exact twin and
    # (b) floor-guarded, so the perf number still describes a verified
    # computation.
    APPROX_BENCH_OK = {
        # recall@3 ≥ 0.8 vs brute force: tests/test_similarity.py
        "v18_knn_graph",
    }
    reg = all_registries()
    bench = {n: s for n, s in reg.specs.items() if s.bench}
    # upper bound raised 25 → 28 in r6 when the dedup cascade and PQ
    # joined the headline set (both hash-oracled + floor-guarded);
    # 30 → 32 in r10 when d9b/t105 joined per the r9 verdict #4;
    # 32 → 34 in r11 when pipeline_graph_quality (r10 verdict #3) and
    # g10_kcore (heaviest r11 plan, d9b precedent) joined — both
    # hash-oracled and floor-guarded;
    # 34 → 36 in r12 when pipeline_eval_card and pipeline_drift_card
    # joined per the r11 verdict #6 (the two heaviest never-floored
    # plans) — both hash-oracled and floor-guarded
    assert 10 <= len(bench) <= 36
    unoracled = [n for n, s in bench.items()
                 if s.oracle is None and n not in APPROX_BENCH_OK]
    assert unoracled == [], f"bench queries without oracle: {unoracled}"

    import json
    from pathlib import Path

    floors = json.loads(
        (Path(__file__).resolve().parent.parent / "tools" / "bench_floor.json")
        .read_text()
    )["queries"]
    for name in APPROX_BENCH_OK:
        assert name in floors, f"{name} bench-flagged without a floor guard"
