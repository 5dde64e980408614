"""X-surface tests: retry wrapper semantics + registered struct UDF."""

from __future__ import annotations

import pytest

from ai_iceberg_demo_spark.functions.udf_surface import (
    BACKOFF_MAX,
    NonRetryableError,
    register_struct_udf,
    with_retries,
)


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("connection reset")
        return "ok"

    assert with_retries(flaky, sleep=sleeps.append)() == "ok"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # backoff ×2.0 from 1s (run_worker.py:54-59)


def test_retry_backoff_caps_at_five_seconds():
    sleeps = []

    def always_fails():
        raise RuntimeError("transient")

    with pytest.raises(RuntimeError):
        with_retries(always_fails, max_attempts=6, sleep=sleeps.append)()
    assert sleeps == [1.0, 2.0, 4.0, 5.0, 5.0]
    assert max(sleeps) == BACKOFF_MAX


def test_non_retryable_aborts_immediately():
    calls = {"n": 0}

    def policy_violation():
        calls["n"] += 1
        raise RuntimeError("Content_Policy_Violation: rejected")

    with pytest.raises(NonRetryableError):
        with_retries(policy_violation, sleep=lambda s: None)()
    assert calls["n"] == 1


def test_struct_udf_in_sql(spark):
    register_struct_udf(spark)
    df = spark.createDataFrame(
        [(1, "# The Title\n\nbody words here")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("x1_t")
    row = spark.sql("SELECT parse_report(text) AS r FROM x1_t").first().r
    assert row.title == "The Title"
    assert row.n_words == 6
    assert row.n_chars == len("# The Title\n\nbody words here")


def test_unicode_fold_parity_and_salt_fires(spark):
    """The pandas-UDF fold must agree with DuckDB's utf8proc fold on
    the salt repertoire, and exactly the doc_id%11 rows change."""
    import duckdb

    from ai_iceberg_demo_spark.functions.text import _F30_SALT, f30_unicode_fold
    from tests.conftest import SF_DIR

    duck = duckdb.sql(
        "select strip_accents(nfc_normalize(?))", params=[_F30_SALT]
    ).fetchone()[0]
    import unicodedata

    nfd = unicodedata.normalize("NFD", _F30_SALT)
    py = unicodedata.normalize(
        "NFC", "".join(c for c in nfd if unicodedata.category(c) != "Mn")
    )
    assert py == duck

    rows = f30_unicode_fold(spark, SF_DIR).collect()
    for r in rows:
        assert r["changed"] == (1 if r["doc_id"] % 11 == 0 else 0), r["doc_id"]
        if r["changed"]:
            assert r["folded"].endswith(py)
