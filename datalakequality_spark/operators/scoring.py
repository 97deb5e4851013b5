"""Quality scoring — SURVEY.md §2.8 (SCR1–SCR2).

Re-expression of the reference's transparent heuristic score
(/root/reference/backend/app/core/scoring.py:16-44). Pure driver
arithmetic over the metrics report — exact float parity with the
reference is trivial and tested.
"""

from __future__ import annotations

from typing import Any


def compute_quality_score(
    missing_ratio: float,
    duplicate_ratio: float,
    contract_violations: int,
    pii_column_count: int,
    overall_outlier_ratio: float,
    has_drift: bool,
) -> dict[str, Any]:
    score = 100.0
    score -= min(missing_ratio * 100 * 0.3, 30.0)
    score -= min(duplicate_ratio * 100 * 0.2, 20.0)
    score -= min(contract_violations * 5.0, 25.0)
    score -= min(pii_column_count * 5.0, 20.0)
    score -= min(overall_outlier_ratio * 100 * 0.15, 15.0)
    if has_drift:
        score -= 10.0
    score = max(0.0, min(100.0, score))

    if score >= 80:
        label = "GREEN"
    elif score >= 50:
        label = "YELLOW"
    else:
        label = "RED"
    return {"score": score, "label": label}
