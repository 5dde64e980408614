

def test_json_contract_all_failure_classes_fire(spark):
    """f36: each planted corruption class must appear with its exact
    verdict, clean rows must all be valid, and verdicts must be a
    function of event_id%31 (deterministic quarantine predicate)."""
    from ai_iceberg_demo_spark.functions.scalar import f36_json_contract
    from tests.conftest import SF_DIR

    rows = f36_json_contract(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        m = r["event_id"] % 31
        want = {1: "malformed", 2: "missing_key", 3: "bad_type"}.get(m, "valid")
        assert r["verdict"] == want, (r["event_id"], r["verdict"])
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"valid", "malformed", "missing_key", "bad_type"}
