"""Quality-gate pipeline (SURVEY.md §3.2 order) + state store."""

from __future__ import annotations

import pytest

from datalakequality_spark.plans.quality_gate import run_quality_gate
from datalakequality_spark.sources.state import StateStore


@pytest.fixture()
def state(tmp_path):
    return StateStore(str(tmp_path / "state"))


CONTRACT = {
    "dataset_name": "customers",
    "required_columns": ["customer_id", "email", "signup_date", "age", "amount"],
    "column_types": {"customer_id": "integer", "email": "string", "amount": "number"},
    "unique_keys": ["customer_id"],
    "policy": {
        "quality_threshold": 80,
        "fail_on": {
            "missing_ratio_gt": 0.05,
            "contract_violations_gt": 0,
            "overall_outlier_ratio_gt": 0.10,
            "has_drift": True,
            "psi_severity_in": ["severe"],
        },
    },
}


def test_full_report_shape_and_lifecycle(spark, messy_pdf, messy_sdf, state):
    state.save_contract(CONTRACT)
    r1 = run_quality_gate(messy_sdf, "customers", state)

    # report surface matches the reference's DataQualityReport fields
    for key in [
        "dataset_name", "quality_score", "quality_label", "status",
        "pipeline_passed", "policy_failures", "summary", "basic_profile",
        "contract", "pii", "outliers", "drift", "schema_changes",
        "explanations", "insights", "autofix_steps", "autofix_script",
        "alerts", "generated_at", "history",
    ]:
        assert key in r1, key
    assert r1["drift"]["baseline_created"] is True
    assert r1["quality_label"] in ("GREEN", "YELLOW", "RED")
    assert r1["summary"]["contract_violations"] >= 1  # dup customer_ids
    assert not r1["pipeline_passed"]  # contract_violations_gt: 0

    # second run: drifted age → severe PSI, policy fails on drift too
    drifted = messy_pdf.copy()
    drifted["age"] = drifted["age"] + 30.0
    r2 = run_quality_gate(spark.createDataFrame(drifted), "customers", state)
    assert r2["summary"]["has_drift"]
    assert any("psi_severity 'severe'" in f for f in r2["policy_failures"])
    assert any("requires no drift" in f for f in r2["policy_failures"])
    assert len(r2["history"]["points"]) == 2
    # history points are time-sorted with the reference's projection keys
    p = r2["history"]["points"][0]
    assert set(p) == {"timestamp", "overall_score", "missing_ratio", "outlier_ratio"}

    # schema unchanged between runs
    assert r2["schema_changes"]["status"] == "no_change"


def test_gate_without_contract_warns(messy_sdf, state):
    r = run_quality_gate(messy_sdf, "unknown_dataset", state, save_history=False)
    assert r["contract"]["contract_name"] is None
    assert r["contract"]["passed"] is False
    assert r["summary"]["contract_violations"] == 0
    assert r["pipeline_passed"]  # no contract → nothing to enforce
    assert any("No data contract" in e for e in r["explanations"])


def test_state_store_contract_roundtrip(state):
    first = state.save_contract({"dataset_name": "d", "required_columns": ["a"]})
    assert first["saved"]
    second = state.save_contract({"dataset_name": "d", "required_columns": ["b"]})
    assert not second["saved"]  # refuses overwrite
    assert state.load_contract("d")["required_columns"] == ["a"]
    forced = state.save_contract(
        {"dataset_name": "d", "required_columns": ["b"]}, overwrite=True
    )
    assert forced["saved"]
    assert state.load_contract("d")["required_columns"] == ["b"]


def test_state_store_corrupt_baseline_recovers(state, tmp_path):
    state.save_drift_baseline("d", {"x": {"mean": 1.0}})
    path = state._path("baselines", "d.json")
    with open(path, "w") as f:
        f.write("{not json")
    assert state.load_drift_baseline("d") is None  # corrupt → absent
