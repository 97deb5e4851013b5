"""PII / outliers / drift / scoring / contracts / schema-change kernels
(SURVEY.md §2.3–§2.8) vs independent pandas/numpy oracles."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from datalakequality_spark.operators.contracts import (
    evaluate_policy,
    suggest_contract,
    unique_key_duplicates,
    validate_contract,
)
from datalakequality_spark.operators.drift import (
    analyze_drift_against_baseline,
    build_numeric_baseline,
    compute_psi,
    psi_severity,
)
from datalakequality_spark.operators.outliers import detect_outliers
from datalakequality_spark.operators.pii import EMAIL_RE, ID_RE, PHONE_RE, detect_pii
from datalakequality_spark.operators.schema_change import detect_schema_changes
from datalakequality_spark.operators.scoring import compute_quality_score
from datalakequality_spark.operators.profiling import profile_dataset


# ------------------------------------------------------------------------ PII


def test_pii_detection(messy_pdf, messy_sdf):
    result = detect_pii(messy_sdf)
    # pandas oracle: full scan with Python re over object columns
    expected = []
    for col in messy_pdf.columns:
        if not pd.api.types.is_object_dtype(messy_pdf[col]):
            continue
        vals = messy_pdf[col].dropna().astype(str)
        found = [
            t
            for t, pat in [("email", EMAIL_RE), ("phone", PHONE_RE), ("id_number", ID_RE)]
            if any(re.search(pat, v) for v in vals)
        ]
        if found:
            expected.append({"column": col, "detected_types": found})
    assert result["pii_columns"] == expected
    assert result["has_pii"] and result["pii_column_count"] == len(expected)


def test_pii_empty_and_no_strings(spark):
    df = spark.createDataFrame([(1,), (2,)], "a int")
    r = detect_pii(df)
    assert r == {"pii_columns": [], "pii_column_count": 0, "has_pii": False}


# -------------------------------------------------------------------- outliers


def test_outliers_match_numpy(messy_pdf, messy_sdf):
    r = detect_outliers(messy_sdf)
    by_col = {c["column"]: c for c in r["columns"]}
    for col in ["customer_id", "age", "amount"]:
        vals = messy_pdf[col].dropna().to_numpy(float)
        mean, std = vals.mean(), vals.std(ddof=0)
        expected = int((np.abs((vals - mean) / std) > 3.0).sum()) if std else 0
        assert by_col[col]["outlier_count"] == expected, col
        assert by_col[col]["value_count"] == len(vals)
        assert by_col[col]["mean"] == pytest.approx(mean, rel=1e-9)


def test_outliers_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    r = detect_outliers(df)
    assert r["columns"][0]["outlier_count"] == 0
    assert r["columns"][0]["severity"] == "none"


def test_outlier_severity_bands():
    from datalakequality_spark.operators.outliers import _severity

    assert _severity(0.0) == "none"
    assert _severity(0.005) == "low"
    assert _severity(0.03) == "medium"
    assert _severity(0.08) == "high"


# ----------------------------------------------------------------------- drift


def test_baseline_matches_numpy(messy_pdf, messy_sdf):
    base = build_numeric_baseline(messy_sdf)
    for col in ["age", "amount", "customer_id"]:
        vals = messy_pdf[col].dropna().to_numpy(float)
        lo, hi = vals.min(), vals.max()
        if lo == hi:
            lo, hi = lo - 0.5, hi + 0.5
        edges = np.linspace(lo, hi, 6)
        counts, _ = np.histogram(vals, bins=edges)
        expected_percents = [c / counts.sum() for c in counts]
        b = base[col]
        assert b["value_count"] == len(vals)
        assert b["bins"] == pytest.approx(list(edges), rel=1e-12)
        assert b["percents"] == pytest.approx(expected_percents, abs=1e-12)
        assert b["mean"] == pytest.approx(vals.mean(), rel=1e-9)
        assert b["std"] == pytest.approx(vals.std(ddof=0), rel=1e-9)


def test_drift_detects_mean_shift(spark, messy_pdf, messy_sdf):
    base = build_numeric_baseline(messy_sdf)
    shifted = messy_pdf.copy()
    shifted["age"] = shifted["age"] + 30.0
    r = analyze_drift_against_baseline(spark.createDataFrame(shifted), base)
    age = next(c for c in r["columns"] if c["column"] == "age")
    assert age["drift"] and age["psi"] > 0.25 and age["psi_severity"] == "severe"
    assert r["has_drift"]
    # numpy cross-check of the PSI value
    vals = shifted["age"].dropna().to_numpy(float)
    counts, _ = np.histogram(vals, bins=np.array(base["age"]["bins"]))
    cur = [c / counts.sum() for c in counts] if counts.sum() else [0.0] * 5
    assert age["psi"] == pytest.approx(compute_psi(base["age"]["percents"], cur))


def test_drift_identical_data_none(spark, messy_sdf):
    base = build_numeric_baseline(messy_sdf)
    r = analyze_drift_against_baseline(messy_sdf, base)
    assert not r["has_drift"]
    for c in r["columns"]:
        assert c["psi"] == pytest.approx(0.0, abs=1e-12)
        assert c["relative_change"] == pytest.approx(0.0, abs=1e-12)


def test_drift_column_absent_from_baseline(spark, messy_sdf):
    r = analyze_drift_against_baseline(messy_sdf, {})
    for c in r["columns"]:
        assert c["psi"] is None and not c["drift"]


def test_psi_severity_bands():
    assert psi_severity(0.05) == "none"
    assert psi_severity(0.2) == "moderate"
    assert psi_severity(0.3) == "severe"


# --------------------------------------------------------------------- scoring


def test_scoring_formula():
    r = compute_quality_score(0.0, 0.0, 0, 0, 0.0, False)
    assert r == {"score": 100.0, "label": "GREEN"}
    r = compute_quality_score(0.1, 0.05, 2, 1, 0.02, True)
    # 100 − 3 − 1 − 10 − 5 − 0.3 − 10
    assert r["score"] == pytest.approx(70.7)
    assert r["label"] == "YELLOW"
    r = compute_quality_score(1.0, 1.0, 10, 10, 1.0, True)
    assert r["score"] == 0.0 and r["label"] == "RED"


# ------------------------------------------------------------------- contracts


def test_unique_key_duplicates_pandas_semantics(spark):
    # pandas duplicated(): NaNs are duplicates of each other
    pdf = pd.DataFrame({"k": ["a", "a", "b", None, None, None]})
    df = spark.createDataFrame(pdf)
    dups = unique_key_duplicates(df, ["k"])
    assert dups["k"] == int(pdf["k"].duplicated().sum()) == 3


def test_validate_contract(messy_sdf):
    contract = {
        "dataset_name": "customers",
        "required_columns": ["customer_id", "email", "nonexistent"],
        "column_types": {"customer_id": "integer", "age": "string"},
        "unique_keys": ["customer_id", "email"],
    }
    r = validate_contract(messy_sdf, contract)
    assert r["required_columns"]["missing"] == ["nonexistent"]
    assert r["type_mismatches"] == [
        {"column": "age", "expected": "string", "actual": "number"}
    ]
    assert {v["column"] for v in r["unique_violations"]} == {"customer_id", "email"}
    assert not r["passed"]


def test_suggest_contract(messy_sdf):
    c = suggest_contract("customers", messy_sdf)
    assert "customer_id" in c["required_columns"]
    assert c["column_types"]["age"] == "number"
    # no column is fully unique after the duplicated rows were appended
    assert c["unique_keys"] == []


def test_policy_gate():
    contract = {
        "policy": {
            "quality_threshold": 80,
            "fail_on": {
                "missing_ratio_gt": 0.05,
                "has_drift": True,
                "psi_severity_in": ["severe"],
            },
        }
    }
    summary = {"missing_ratio": 0.1, "has_drift": True}
    drift = {
        "columns": [
            {"column": "a", "psi_severity": "severe", "psi": 0.5},
            {"column": "b", "psi_severity": "severe", "psi": 0.9},
        ]
    }
    r = evaluate_policy(contract, 75.0, summary, drift)
    assert not r["pipeline_passed"]
    # first matching PSI column only (reference breaks after one)
    psi_failures = [f for f in r["failures"] if "psi_severity" in f]
    assert len(psi_failures) == 1 and "'a'" in psi_failures[0]
    # no contract / no policy → auto-pass
    assert evaluate_policy(None, 0.0, {}, {})["pipeline_passed"]
    assert evaluate_policy({"policy": []}, 0.0, {}, {})["pipeline_passed"]


# ---------------------------------------------------------------- schema diff


def test_schema_change_lifecycle(messy_sdf):
    prof = profile_dataset(messy_sdf)
    pii = detect_pii(messy_sdf)
    r1, current = detect_schema_changes(prof, pii, baseline=None)
    assert r1["status"] == "baseline_created"

    r2, _ = detect_schema_changes(prof, pii, baseline=current)
    assert r2["status"] == "no_change" and not r2["is_breaking"]

    # drop a column + change a dtype → breaking
    mutated = {
        k: dict(v) for k, v in current.items() if k != "phone"
    }
    mutated["age"]["dtype"] = "string"
    r3, _ = detect_schema_changes(prof, pii, baseline=mutated)
    assert r3["status"] == "changed"
    assert r3["added_columns"] == ["phone"]
    assert r3["type_changes"] == [
        {"column": "age", "before": "string", "after": "number"}
    ]
    assert r3["is_breaking"]

    # newly-gained PII is breaking even without type changes
    no_pii_base = {k: {**v, "has_pii": False, "pii_types": []} for k, v in current.items()}
    r4, _ = detect_schema_changes(prof, pii, baseline=no_pii_base)
    assert r4["is_breaking"] and r4["pii_changes"]


def test_csv_roundtrip(spark, tmp_path):
    """Reference-parity CSV I/O: header'd export, nulls as empty string,
    schema'd re-read recovers the exact frame."""
    from pyspark.sql import functions as F

    from datalakequality_spark.sources.csvio import export_csv, read_csv_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -2.0)],
        "id int, name string, score double",
    )
    single = export_csv(df, str(tmp_path / "out.csv"), single_file=True)
    back = read_csv_table(spark, single, schema="id int, name string, score double")
    assert sorted(back.collect()) == sorted(df.collect())
    # inferred-schema read recovers the 4-type logical system's types
    inferred = read_csv_table(spark, single)
    assert dict(inferred.dtypes) == {"id": "int", "name": "string", "score": "double"}
    # distributed layout writes a directory of parts
    multi = export_csv(df.repartition(2), str(tmp_path / "out_dir"))
    back2 = read_csv_table(spark, multi, schema="id int, name string, score double")
    assert back2.count() == 3


def test_pii_seeded_sample(spark):
    """Seeded sample: deterministic across runs, caps the scanned rows,
    and still fires when PII density is high."""
    from datalakequality_spark.operators.pii import detect_pii

    rows = [(f"user{i}@example.com" if i % 2 else f"plain {i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "contact string")
    a = detect_pii(df, sample_rows=50, sample_seed=42)
    b = detect_pii(df, sample_rows=50, sample_seed=42)
    assert a == b  # deterministic
    assert a["has_pii"] and a["pii_columns"][0]["detected_types"] == ["email"]
    # different seed → still deterministic, possibly different rows
    c = detect_pii(df, sample_rows=50, sample_seed=7)
    assert c["has_pii"]
