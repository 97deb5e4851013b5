"""Schema-change detection — SURVEY.md §2.7 (SC1–SC7).

Re-expression of /root/reference/backend/app/core/schema.py:45-231.
All operators are driver-side set/dict diffs over the logical schema
extracted from a profile + PII result; baseline persistence lives in
sources/state.py (callers pass the loaded baseline dict and persist the
returned ``current_schema`` themselves — the engine never hides I/O
inside an analysis kernel).
"""

from __future__ import annotations

from typing import Any, Mapping


def extract_current_schema(
    profile: Mapping[str, Any], pii_result: Mapping[str, Any]
) -> dict[str, Any]:
    """SC1 — per column {dtype, has_pii, pii_types}; PII columns absent
    from the profile get dtype 'unknown'."""
    basic = profile.get("basic_profile") or {}
    inferred = basic.get("inferred_types") or {}
    column_stats = basic.get("column_stats") or {}

    schema: dict[str, dict[str, Any]] = {}
    for col in set(inferred) | set(column_stats):
        stats = column_stats.get(col) or {}
        dtype = inferred.get(col) or stats.get("inferred_type") or "unknown"
        schema[col] = {"dtype": str(dtype), "has_pii": False, "pii_types": []}

    for item in pii_result.get("pii_columns") or []:
        col = item.get("column")
        if not col:
            continue
        detected = list(item.get("detected_types") or [])
        if col not in schema:
            schema[col] = {"dtype": "unknown", "has_pii": True, "pii_types": detected}
        else:
            schema[col]["has_pii"] = True
            schema[col]["pii_types"] = detected

    return schema


def diff_schemas(
    baseline: Mapping[str, Any], current: Mapping[str, Any]
) -> dict[str, Any]:
    """SC3–SC7 — structured diff + breaking classification."""
    added = sorted(set(current) - set(baseline))
    removed = sorted(set(baseline) - set(current))

    type_changes: list[dict[str, Any]] = []
    pii_changes: list[dict[str, Any]] = []
    for col in sorted(set(current) & set(baseline)):
        before = baseline.get(col) or {}
        after = current.get(col) or {}
        if before.get("dtype") != after.get("dtype"):
            type_changes.append(
                {"column": col, "before": before.get("dtype"), "after": after.get("dtype")}
            )
        b_pii = {
            "has_pii": bool(before.get("has_pii")),
            "pii_types": sorted(set(before.get("pii_types") or [])),
        }
        a_pii = {
            "has_pii": bool(after.get("has_pii")),
            "pii_types": sorted(set(after.get("pii_types") or [])),
        }
        if b_pii != a_pii:
            pii_changes.append({"column": col, "before": b_pii, "after": a_pii})

    if not (added or removed or type_changes or pii_changes):
        return {
            "status": "no_change",
            "added_columns": [],
            "removed_columns": [],
            "type_changes": [],
            "pii_changes": [],
            "is_breaking": False,
        }

    is_breaking = bool(removed or type_changes) or any(
        not ch["before"]["has_pii"] and ch["after"]["has_pii"] for ch in pii_changes
    )
    return {
        "status": "changed",
        "added_columns": added,
        "removed_columns": removed,
        "type_changes": type_changes,
        "pii_changes": pii_changes,
        "is_breaking": is_breaking,
    }


def detect_schema_changes(
    profile: Mapping[str, Any],
    pii_result: Mapping[str, Any],
    baseline: Mapping[str, Any] | None,
) -> tuple[dict[str, Any], dict[str, Any]]:
    """SC2 + SC3–SC7 composed. Returns ``(result, current_schema)``;
    the caller persists ``current_schema`` as the new baseline on first
    run (status 'baseline_created')."""
    current = extract_current_schema(profile, pii_result)
    if not baseline:
        return (
            {
                "status": "baseline_created",
                "added_columns": [],
                "removed_columns": [],
                "type_changes": [],
                "pii_changes": [],
                "is_breaking": False,
            },
            current,
        )
    return diff_schemas(baseline, current), current
