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


def test_every_oracle_belongs_to_a_query_and_no_duplicate_names():
    reg = all_registries()
    assert set(reg.oracle_sql()) <= set(reg.queries())
    # names must be unique post-merge (merge() raises on collision, but
    # pin the invariant in case merge semantics ever change)
    names = list(reg.specs)
    assert len(names) == len(set(names))


def test_bench_set_is_stable_and_oracled():
    # every bench query should also be correctness-checkable (oracle or
    # deliberate rows-only), and the set should stay headline-sized
    reg = all_registries()
    bench = [n for n, s in reg.specs.items() if s.bench]
    assert 10 <= len(bench) <= 25
