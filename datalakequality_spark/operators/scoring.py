"""Quality scoring — SURVEY.md §2.8 (SCR1–SCR2).

Re-expression of the reference's transparent heuristic score
(/root/reference/backend/app/core/scoring.py:16-44) as a data-driven
deduction table: each metric contributes ``min(value * weight, cap)``
off a 100-point base, drift is a flat deduction, and the final score is
clamped to [0, 100] and banded. The weights/caps/bands are the public
spec being re-implemented; the fold below is the engine's own shape.
Pure driver arithmetic over the metrics report — exact float parity
with the reference is trivial and tested.
"""

from __future__ import annotations

from typing import Any

# (metric key, multiplier applied to the raw value, deduction cap)
DEDUCTIONS: list[tuple[str, float, float]] = [
    ("missing_ratio", 100 * 0.3, 30.0),
    ("duplicate_ratio", 100 * 0.2, 20.0),
    ("contract_violations", 5.0, 25.0),
    ("pii_column_count", 5.0, 20.0),
    ("overall_outlier_ratio", 100 * 0.15, 15.0),
]

DRIFT_DEDUCTION = 10.0

# (inclusive lower bound, label) — scanned in order
SCORE_BANDS: list[tuple[float, str]] = [(80.0, "GREEN"), (50.0, "YELLOW")]
DEFAULT_BAND = "RED"


def score_label(score: float) -> str:
    for lo, label in SCORE_BANDS:
        if score >= lo:
            return label
    return DEFAULT_BAND


def compute_quality_score(
    missing_ratio: float,
    duplicate_ratio: float,
    contract_violations: int,
    pii_column_count: int,
    overall_outlier_ratio: float,
    has_drift: bool,
) -> dict[str, Any]:
    metrics = {
        "missing_ratio": missing_ratio,
        "duplicate_ratio": duplicate_ratio,
        "contract_violations": contract_violations,
        "pii_column_count": pii_column_count,
        "overall_outlier_ratio": overall_outlier_ratio,
    }
    score = 100.0
    for key, weight, cap in DEDUCTIONS:
        score -= min(metrics[key] * weight, cap)
    if has_drift:
        score -= DRIFT_DEDUCTION
    score = max(0.0, min(100.0, score))
    return {"score": score, "label": score_label(score)}
