"""Cross-run state — contracts, drift/schema baselines, run history.

Engine-side counterpart of the reference's state files (SURVEY.md §2.1
S5–S9): YAML contracts (contracts.py:11-22), per-dataset drift baseline
JSON (drift.py:114-134), schema baseline JSON (schema.py:100-115), and
an append-only run history (history.py:115-167). Differences from the
reference, deliberate:

- every write is atomic (temp file + rename) so a crash never leaves a
  corrupt baseline — the reference merely *tolerates* corrupt files by
  recreating them, which silently resets the baseline;
- corrupt/unreadable files are still treated as absent on read (same
  recovery behavior);
- all state lives under one ``state_dir`` (typically
  ``<table>/metadata/state`` next to the snapshots it describes).

Everything here is metadata-scale driver I/O: O(#columns) JSON per
dataset, never data-scale.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is present in this env
    yaml = None


def _utcnow_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _safe_name(name: str) -> str:
    return name.replace("/", "_").replace("\\", "_")


class StateStore:
    def __init__(self, state_dir: str):
        self.dir = os.path.abspath(state_dir)

    def _path(self, *parts: str) -> str:
        return os.path.join(self.dir, *parts)

    def _write_atomic(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.rename(tmp, path)

    def _read_json(self, path: str) -> Any | None:
        try:
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        except (OSError, ValueError):
            return None  # absent or corrupt → recreate (drift.py:114-126)

    # -------------------------------------------------------------- contracts

    def load_contract(self, dataset: str) -> dict[str, Any] | None:
        path = self._path("contracts", f"{_safe_name(dataset)}.yaml")
        try:
            with open(path, encoding="utf-8") as f:
                return yaml.safe_load(f)
        except OSError:
            return None

    def save_contract(
        self, contract: dict[str, Any], overwrite: bool = False
    ) -> dict[str, Any]:
        """S6 — refuses to overwrite an existing contract unless asked,
        returning the existing YAML instead (contracts.py:158-196)."""
        dataset = contract.get("dataset_name", "dataset")
        path = self._path("contracts", f"{_safe_name(dataset)}.yaml")
        if os.path.exists(path) and not overwrite:
            return {
                "saved": False,
                "path": path,
                "contract_yaml": open(path, encoding="utf-8").read(),
                "note": "Contract file already exists; returning existing contract without overwriting.",
            }
        text = yaml.safe_dump(contract, sort_keys=False)
        self._write_atomic(path, text)
        return {
            "saved": True,
            "path": path,
            "contract_yaml": text,
            "note": "Contract file created/overwritten on disk.",
        }

    # --------------------------------------------------------- drift baseline

    def load_drift_baseline(self, dataset: str) -> dict[str, Any] | None:
        return self._read_json(
            self._path("baselines", f"{_safe_name(dataset)}.json")
        )

    def save_drift_baseline(self, dataset: str, columns: dict[str, Any]) -> None:
        payload = {
            "dataset_name": dataset,
            "created_at": _utcnow_iso(),
            "columns": columns,
        }
        self._write_atomic(
            self._path("baselines", f"{_safe_name(dataset)}.json"),
            json.dumps(payload, ensure_ascii=False, indent=2),
        )

    # -------------------------------------------------------- schema baseline

    def load_schema_baseline(self, dataset: str) -> dict[str, Any]:
        return (
            self._read_json(
                self._path("baselines", f"schema_{_safe_name(dataset)}.json")
            )
            or {}
        )

    def save_schema_baseline(self, dataset: str, schema: dict[str, Any]) -> None:
        self._write_atomic(
            self._path("baselines", f"schema_{_safe_name(dataset)}.json"),
            json.dumps(schema, indent=2, default=str),
        )

    # ----------------------------------------------------------- run history

    def save_run(self, dataset: str, report: dict[str, Any]) -> str:
        """S9 — one JSON per run; filename carries timestamp + run id so
        a lexicographic glob sort is a time sort."""
        ts = report.get("timestamp") or _utcnow_iso()
        rid = report.get("run_id") or uuid.uuid4().hex
        payload = {**report, "timestamp": ts, "run_id": rid}
        safe_ts = ts.replace(":", "").replace(".", "-").replace("Z", "").replace("+", "")
        path = self._path(
            "history", _safe_name(dataset), f"run-{safe_ts}-{rid}.json"
        )
        self._write_atomic(path, json.dumps(payload, indent=2, default=str))
        return path

    def load_history(self, dataset: str) -> list[dict[str, Any]]:
        d = self._path("history", _safe_name(dataset))
        runs = []
        if os.path.isdir(d):
            for name in sorted(os.listdir(d)):
                if name.startswith("run-") and name.endswith(".json"):
                    data = self._read_json(os.path.join(d, name))
                    if data:
                        runs.append(data)
        return runs

    def history_points(self, dataset: str) -> list[dict[str, Any]]:
        """Time-series projection sorted by timestamp
        (history.py:94-108)."""
        points = [
            {
                "timestamp": r.get("timestamp") or _utcnow_iso(),
                "overall_score": r.get("overall_score"),
                "missing_ratio": r.get("missing_ratio"),
                "outlier_ratio": r.get("outlier_ratio"),
            }
            for r in self.load_history(dataset)
        ]
        points.sort(key=lambda x: x["timestamp"])
        return points
