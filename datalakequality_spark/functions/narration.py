"""Narration — explanations, insights, alerts (SURVEY.md §2.10 N1–N3).

Metric → text, pure driver logic over the metrics report. This module
consolidates the reference's explain.py/insights.py/alerts.py and is
deliberately the closest thing to a port in the repo: the OUTPUT
STRINGS are carried verbatim (they are the reference's observable
report surface, required for parity), and ``build_explanations``
mirrors the reference's threshold-if-chain structurally because the
band boundaries and their ordering ARE the semantics. ``build_alerts``
uses a rule table; the explanation path does not, since several of its
branches interpolate differently per band.
"""

from __future__ import annotations

from typing import Any

MISSING_WARN = 0.05
OUTLIER_WARN = 0.05
DUPLICATE_WARN = 0.02


# ----------------------------------------------------------------- N1 explain


def build_explanations(
    summary: dict[str, Any],
    contract: dict[str, Any],
    pii: dict[str, Any],
    outliers: dict[str, Any],
    drift: dict[str, Any],
) -> list[str]:
    out: list[str] = []
    rows = summary.get("row_count", 0)
    cols = summary.get("column_count", 0)
    miss = summary.get("missing_ratio", 0.0)
    dup = summary.get("duplicate_ratio", 0.0)
    n_pii = summary.get("pii_column_count", 0)
    out_ratio = summary.get("overall_outlier_ratio", 0.0)

    out.append(f"Dataset has {rows} rows and {cols} columns.")

    if miss == 0:
        out.append("No missing values detected in the dataset.")
    elif miss < 0.01:
        out.append(f"Missing values are low ({miss*100:.1f}% of all cells).")
    elif miss < 0.05:
        out.append(
            f"Missing values are moderate ({miss*100:.1f}% of all cells). "
            "You may want to impute or drop them."
        )
    else:
        out.append(
            f"Missing values are high ({miss*100:.1f}% of all cells). "
            "This significantly reduces data quality."
        )

    if dup == 0:
        out.append("No duplicate rows detected.")
    elif dup < 0.01:
        out.append(f"A small fraction of rows are duplicates ({dup*100:.1f}%).")
    else:
        out.append(
            f"A noticeable fraction of rows are duplicates ({dup*100:.1f}%). "
            "Consider deduplicating."
        )

    if contract.get("contract_name") is None:
        out.append("No data contract found for this dataset. Schema is not enforced.")
    elif contract.get("passed"):
        out.append("Dataset satisfies the defined data contract.")
    else:
        missing_req = contract.get("required_columns", {}).get("missing", [])
        mismatches = [m["column"] for m in contract.get("type_mismatches", [])]
        uviol = [u["column"] for u in contract.get("unique_violations", [])]
        if missing_req:
            out.append(
                f"Data contract: missing required columns: {', '.join(missing_req)}."
            )
        if mismatches:
            out.append(
                f"Data contract: type mismatches in columns: {', '.join(mismatches)}."
            )
        if uviol:
            out.append(
                f"Data contract: uniqueness violations in key columns: {', '.join(uviol)}."
            )

    if n_pii == 0:
        out.append("No PII-like columns detected.")
    else:
        names = [c["column"] for c in pii.get("pii_columns", [])]
        if names:
            out.append(f"Detected PII-like patterns in columns: {', '.join(names)}.")
        else:
            out.append(f"Detected PII-like patterns in {n_pii} columns.")

    if out_ratio == 0:
        out.append("No numeric outliers detected using z-score heuristic.")
    elif out_ratio < 0.01:
        out.append(
            f"Only a small fraction of numeric values are outliers ({out_ratio*100:.2f}%)."
        )
    elif out_ratio < 0.05:
        out.append(
            f"A moderate fraction of numeric values are outliers ({out_ratio*100:.2f}%)."
        )
    else:
        out.append(
            f"A high fraction of numeric values are outliers ({out_ratio*100:.2f}%), "
            "which strongly affects data quality."
        )

    if drift.get("baseline_created"):
        out.append(
            "Baseline created for this dataset. Future uploads will be compared "
            "against it for drift."
        )
    elif summary.get("has_drift", False):
        drifted = [c["column"] for c in drift.get("columns", []) if c.get("drift")]
        if drifted:
            out.append(
                "Detected significant distribution drift in numeric columns: "
                f"{', '.join(drifted)}."
            )
        else:
            out.append(
                "Some numeric columns show changes compared to baseline, but no "
                "column crossed the drift threshold."
            )
    else:
        out.append("No significant drift detected compared to baseline.")

    return out


# ---------------------------------------------------------------- N2 insights


def generate_insights(payload: dict[str, Any]) -> list[dict[str, str]]:
    items: list[dict[str, str]] = []

    def add(category: str, severity: str, message: str) -> None:
        items.append({"category": category, "severity": severity, "message": message})

    miss = float(payload.get("missing_ratio", 0.0) or 0.0)
    outr = float(payload.get("outlier_ratio", 0.0) or 0.0)
    has_pii = bool(payload.get("has_pii", False))
    pii_columns = payload.get("pii_columns") or []
    drift_sev = (payload.get("drift_severity") or "").lower()
    schema_status = (payload.get("schema_change_status") or "").lower()
    score = float(payload.get("overall_score", 0.0) or 0.0)
    policy_ok = bool(payload.get("policy_passed", True))

    if score >= 95:
        add("overall", "info",
            "Dataset quality is excellent. It is safe to onboard this dataset into downstream analytics.")
    elif score >= 80:
        add("overall", "warning",
            "Dataset quality is good, but addressing a few issues now will prevent future pipeline noise.")
    else:
        add("overall", "critical",
            "Dataset quality is below recommended thresholds. Review missing data, outliers, and PII before using it in production.")

    if miss > 0.3:
        add("missing", "critical",
            f"About {miss*100:.1f}% of cells are missing. Consider imputing or dropping heavily affected columns before modelling.")
    elif miss > 0.05:
        add("missing", "warning",
            f"Missing data ({miss*100:.1f}%) is moderate. Imputing key feature columns will stabilise model performance.")

    if outr > 0.15:
        add("outliers", "warning",
            "A high fraction of numeric values are flagged as outliers. Winsorisation or robust scaling is recommended.")

    if has_pii and pii_columns:
        names = ", ".join(c.get("column", "?") for c in pii_columns[:4])
        more = "..." if len(pii_columns) > 4 else ""
        add("pii", "warning",
            f"Potential PII detected in columns: {names}{more}. Mask or tokenize these fields before sharing outside secure environments.")

    if drift_sev in {"moderate", "severe"}:
        add("drift", "warning" if drift_sev == "moderate" else "critical",
            f"Data drift is {drift_sev}. Validate that recent data still matches business assumptions and retrain models if needed.")

    if schema_status == "breaking":
        add("schema", "critical",
            "Breaking schema changes detected. Downstream pipelines that rely on the old schema may fail.")
    elif schema_status == "non_breaking":
        add("schema", "info",
            "Non-breaking schema changes detected. Update documentation and data contracts if necessary.")

    if not policy_ok:
        add("policy", "critical",
            "Dataset failed configured policy checks. Fix violations or relax policy thresholds before promotion.")

    return items


# ------------------------------------------------------------------ N3 alerts


def build_alerts(report: dict[str, Any]) -> list[dict[str, str]]:
    alerts: list[dict[str, str]] = []

    def add(level: str, code: str, message: str) -> None:
        alerts.append({"level": level, "code": code, "message": message})

    summary = report.get("summary") or {}

    def _f(x: Any) -> float:
        try:
            return float(x) if x is not None else 0.0
        except (TypeError, ValueError):
            return 0.0

    miss = _f(report.get("missing_ratio", summary.get("missing_ratio", 0.0)))
    outr = _f(report.get("outlier_ratio", report.get("overall_outlier_ratio", 0.0)))
    dup = _f(summary.get("duplicate_ratio", 0.0))

    if miss > MISSING_WARN:
        add("warning", "HIGH_MISSING_RATIO",
            f"Overall missing ratio is {miss:.1%}, which is above the {MISSING_WARN:.0%} threshold.")
    if outr > OUTLIER_WARN:
        add("warning", "HIGH_OUTLIER_RATIO",
            f"Overall outlier ratio is {outr:.1%}, which is above the {OUTLIER_WARN:.0%} threshold.")
    if dup > DUPLICATE_WARN:
        add("warning", "HIGH_DUPLICATE_RATIO",
            f"Duplicate row ratio is {dup:.1%}, which is above the {DUPLICATE_WARN:.0%} threshold.")

    for col in report.get("columns") or []:
        name = col.get("name") or col.get("column") or "<unknown>"
        sev = col.get("drift_severity")
        if sev in {"moderate", "severe"}:
            msg = f"Drift detected on column '{name}' (severity = {sev}"
            if col.get("psi") is not None:
                msg += f", PSI = {_f(col['psi']):.3f}"
            msg += ")."
            add("error" if sev == "severe" else "warning", "DRIFT_DETECTED", msg)
        if col.get("pii_type"):
            add("warning", "PII_DETECTED_COLUMN",
                f"PII of type '{col['pii_type']}' detected in column '{name}'.")
        cmr = col.get("missing_ratio")
        if cmr is not None and _f(cmr) > MISSING_WARN:
            add("warning", "COLUMN_MISSING_HIGH",
                f"Column '{name}' has missing ratio {_f(cmr):.1%}.")

    pii_columns = report.get("pii_columns") or []
    has_pii = bool(
        report.get("has_pii")
        or (report.get("pii_column_count") or 0) > 0
        or pii_columns
    )
    if has_pii:
        names = sorted({c["column"] for c in pii_columns if c.get("column")})
        if names:
            add("warning", "PII_DETECTED",
                "PII patterns detected in columns: " + ", ".join(names))
        else:
            add("warning", "PII_DETECTED", "PII patterns detected in this dataset.")

    failures = report.get("policy_failures") or []
    for pf in failures:
        if isinstance(pf, str):
            code, message = "UNKNOWN", pf
        else:
            code = str(pf.get("code", "UNKNOWN"))
            message = str(pf.get("message", "Policy failure"))
        add("error", f"POLICY_{code.upper()}", message)
    if not bool(report.get("policy_passed", True)) and not failures:
        add("error", "PIPELINE_FAILED",
            "Pipeline did not pass the policy engine, but no specific failures were listed.")

    sc = report.get("schema_changes") or {}
    if sc:
        counts = (
            f"(added={len(sc.get('added_columns') or [])}, "
            f"removed={len(sc.get('removed_columns') or [])}, "
            f"type_changes={len(sc.get('type_changes') or [])}, "
            f"pii_changes={len(sc.get('pii_changes') or [])})."
        )
        if sc.get("is_breaking"):
            add("error", "BREAKING_SCHEMA_CHANGE",
                "Breaking schema changes detected " + counts)
        elif sc.get("status") == "changed":
            add("warning", "SCHEMA_CHANGED",
                "Non-breaking schema changes detected " + counts)
        elif sc.get("status") == "baseline_created":
            add("info", "SCHEMA_BASELINE_CREATED",
                "Schema baseline created from this run.")

    if not alerts:
        add("info", "ALL_GOOD",
            "No significant data quality issues detected in this run.")
    return alerts
