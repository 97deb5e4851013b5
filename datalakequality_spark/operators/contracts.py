"""Contract validation & policy gate — SURVEY.md §2.3 (C1–C6).

Re-expression of /root/reference/backend/app/core/contracts.py:52-318.
Schema-level checks (required columns, type mismatches) are pure driver
walks over ``df.schema`` — no data pass. The unique-key check is the
only data operator: one batched aggregation counting, per key column,
rows beyond the first occurrence of each value. pandas ``duplicated()``
treats NaNs as equal to each other and Spark ``groupBy`` also groups
nulls into one group, so semantics match (SURVEY.md §2.3 C3).

Contract YAML I/O and persistence live in sources/state.py.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profiling import infer_simple_type


def unique_key_duplicates(df: DataFrame, key_cols: list[str]) -> dict[str, int]:
    """Per key column: count of duplicated entries (rows beyond the
    first occurrence per value), all columns in ONE Spark job via
    per-column distinct counts: dup_count = count(rows incl. nulls) −
    exact distinct (nulls as a group)."""
    cols = [c for c in key_cols if c in df.columns]
    if not cols:
        return {}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        # distinct including the null group: count_distinct ignores
        # nulls, so add 1 when any null exists
        aggs.append(F.countDistinct(F.col(c)).alias(f"uniq::{c}"))
        aggs.append(F.max(F.col(c).isNull()).alias(f"hasnull::{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__rows"])
    out = {}
    for c in cols:
        distinct_with_null = int(row[f"uniq::{c}"]) + (1 if row[f"hasnull::{c}"] else 0)
        out[c] = n - distinct_with_null
    return out


def validate_contract(df: DataFrame, contract: dict[str, Any]) -> dict[str, Any]:
    """C1–C4: required columns, type mismatches, unique keys, pass flag.
    Result shape matches the reference (contracts.py:91-106)."""
    required: list[str] = contract.get("required_columns", [])
    column_types: dict[str, str] = contract.get("column_types", {})
    unique_keys: list[str] = contract.get("unique_keys", [])

    existing = set(df.columns)
    missing_required = [c for c in required if c not in existing]
    present_required = [c for c in required if c in existing]

    dtype_by_col = {f.name: infer_simple_type(f.dataType) for f in df.schema.fields}
    type_mismatches = [
        {"column": c, "expected": exp, "actual": dtype_by_col[c]}
        for c, exp in column_types.items()
        if c in dtype_by_col and dtype_by_col[c] != exp
    ]

    dups = unique_key_duplicates(df, unique_keys)
    unique_violations = [
        {"column": c, "duplicate_count": int(d)} for c, d in dups.items() if d > 0
    ]

    passed = not missing_required and not type_mismatches and not unique_violations
    return {
        "contract_name": contract.get("dataset_name"),
        "required_columns": {"present": present_required, "missing": missing_required},
        "type_mismatches": type_mismatches,
        "unique_violations": unique_violations,
        "passed": passed,
    }


def suggest_contract(
    dataset_name: str,
    df: DataFrame,
    profile: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """C5 — required = columns with <50% missing; types from the schema;
    unique_keys = first ≤2 columns whose non-null distinct count equals
    the row count. Reuses an existing profile's agg results when given
    (quality-gate path: zero extra jobs)."""
    if profile is None:
        from .profiling import profile_dataset

        profile = profile_dataset(df)
    summary = profile["summary"]
    basic = profile["basic_profile"]
    n_rows = summary["row_count"]

    required = [
        c
        for c in df.columns
        if (basic["missing_by_column"][c] / n_rows if n_rows > 0 else 0.0) < 0.5
    ]
    column_types = dict(basic["inferred_types"])
    unique_keys: list[str] = []
    for c in df.columns:
        stats = basic["column_stats"][c]
        non_null = n_rows - stats["missing_count"]
        if n_rows == 0 or non_null == 0:
            continue
        if stats["unique_count"] == n_rows:
            unique_keys.append(c)
            if len(unique_keys) >= 2:
                break
    return {
        "dataset_name": dataset_name,
        "required_columns": required,
        "column_types": column_types,
        "unique_keys": unique_keys,
    }


def evaluate_policy(
    contract: dict[str, Any] | None,
    quality_score: float,
    summary: dict[str, Any],
    drift: dict[str, Any],
) -> dict[str, Any]:
    """C6 — the pipeline gate. Driver-side scalar comparisons over the
    metrics report, reproducing the reference's failure messages and
    the first-matching-column-only PSI rule (contracts.py:294-312)."""
    if not isinstance(contract, dict):
        return {"pipeline_passed": True, "failures": []}
    raw_policy = contract.get("policy")
    if not isinstance(raw_policy, dict):
        return {"pipeline_passed": True, "failures": []}

    fail_on: dict[str, Any] = raw_policy.get("fail_on", {}) or {}
    failures: list[str] = []

    qt = raw_policy.get("quality_threshold")
    if qt is not None and quality_score < float(qt):
        failures.append(
            f"quality_score {quality_score:.1f} < quality_threshold {float(qt):.1f}"
        )

    missing_ratio = float(summary.get("missing_ratio", 0.0))
    duplicate_ratio = float(summary.get("duplicate_ratio", 0.0))
    contract_violations = int(summary.get("contract_violations", 0))
    overall_outlier_ratio = float(summary.get("overall_outlier_ratio", 0.0))
    has_drift = bool(summary.get("has_drift", False))

    thr = fail_on.get("missing_ratio_gt")
    if thr is not None and missing_ratio > float(thr):
        failures.append(f"missing_ratio {missing_ratio:.3f} > {float(thr):.3f}")
    thr = fail_on.get("duplicate_ratio_gt")
    if thr is not None and duplicate_ratio > float(thr):
        failures.append(f"duplicate_ratio {duplicate_ratio:.3f} > {float(thr):.3f}")
    thr = fail_on.get("contract_violations_gt")
    if thr is not None and contract_violations > int(thr):
        failures.append(f"contract_violations {contract_violations} > {int(thr)}")
    thr = fail_on.get("overall_outlier_ratio_gt")
    if thr is not None and overall_outlier_ratio > float(thr):
        failures.append(
            f"overall_outlier_ratio {overall_outlier_ratio:.3f} > {float(thr):.3f}"
        )
    if fail_on.get("has_drift") is True and has_drift:
        failures.append("has_drift is True but policy requires no drift")

    sev_in = fail_on.get("psi_severity_in")
    if sev_in:
        allowed = {str(x) for x in sev_in}
        for col_info in drift.get("columns", []) or []:
            sev = str(col_info.get("psi_severity", "none"))
            if sev in allowed:
                name = col_info.get("column", "unknown")
                psi_val = col_info.get("psi")
                if psi_val is not None:
                    failures.append(
                        f"column '{name}' has psi_severity '{sev}' (psi={psi_val:.4f})"
                    )
                else:
                    failures.append(f"column '{name}' has psi_severity '{sev}'")
                break  # first matching column fails the rule

    return {"pipeline_passed": not failures, "failures": failures}
