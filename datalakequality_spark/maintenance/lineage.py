"""Per-partition lineage log → resumable maintenance jobs (north_rule).

Every maintenance job (compact / cluster / merge) is planned into tasks;
each task records, in ``<table>/metadata/jobs/<job_id>/``:

    plan.json            — the full task list, pinned at planning time
    intent-<task>.json   — written BEFORE the task's snapshot commit
                           (output files + counts)
    done-<task>.json     — written AFTER the commit succeeds

Resume logic (generalizing the reference's append-only run history,
/root/reference/backend/app/utils/history.py:115-128):
- ``done`` → skip (commit applied).
- ``intent`` but no ``done`` → the process died between commit and
  acknowledgment; if a retained snapshot carries this job/task's tags
  (``commit_landed``) or the task's input files are no longer live, the
  commit DID land → mark done and skip; otherwise re-run (the staged
  output files are orphans, swept later by reachability GC).
- neither → run.

This makes every task idempotent: re-running a job with the same job_id
never processes a partition twice (tested in tests/test_maintenance.py).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any


class JobLog:
    def __init__(self, table_root: str, job_id: str):
        self.dir = os.path.join(table_root, "metadata", "jobs", job_id)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _write_json(self, name: str, payload: dict[str, Any]) -> None:
        tmp = self._path(f".tmp-{name}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.rename(tmp, self._path(name))

    # ------------------------------------------------------------------ plan

    def write_plan(self, tasks: list[dict[str, Any]]) -> None:
        if not os.path.exists(self._path("plan.json")):
            self._write_json("plan.json", {"tasks": tasks})

    def load_plan(self) -> list[dict[str, Any]] | None:
        try:
            return json.load(open(self._path("plan.json")))["tasks"]
        except OSError:
            return None

    # ----------------------------------------------------------------- tasks

    def mark_intent(self, task_id: str, record: dict[str, Any]) -> None:
        self._write_json(f"intent-{task_id}.json", record)

    def intent(self, task_id: str) -> dict[str, Any] | None:
        try:
            return json.load(open(self._path(f"intent-{task_id}.json")))
        except OSError:
            return None

    def mark_done(self, task_id: str, record: dict[str, Any]) -> None:
        self._write_json(f"done-{task_id}.json", record)

    def is_done(self, task_id: str) -> bool:
        return os.path.exists(self._path(f"done-{task_id}.json"))

    def done_records(self) -> dict[str, dict[str, Any]]:
        out = {}
        for p in glob.glob(self._path("done-*.json")):
            tid = os.path.basename(p)[len("done-") : -len(".json")]
            out[tid] = json.load(open(p))
        return out


def run_tasks(
    tasks: list[dict[str, Any]],
    exec_one,
    max_concurrent: int = 1,
) -> list[Any]:
    """Execute lineage tasks via ``exec_one(task)`` — sequentially when
    ``max_concurrent <= 1``, else from a bounded thread pool (the shape
    of Iceberg RewriteDataFiles' max-concurrent-file-group-rewrites).

    Tasks are independent by construction (disjoint input-file groups,
    per-task lineage records, optimistic snapshot commits that retry on
    lost races), so concurrent submission only overlaps their Spark
    jobs' barriers — per-shard sample pass, write tail, commit — which
    otherwise leave the cluster idle between serial shards. Results come
    back in task order; on failure every in-flight task settles first
    (landed commits stand — resume skips them) and the first error, in
    task order, propagates.
    """
    if max_concurrent <= 1 or len(tasks) <= 1:
        return [exec_one(t) for t in tasks]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(
        max_workers=min(max_concurrent, len(tasks))
    ) as pool:
        futures = [pool.submit(exec_one, t) for t in tasks]
        results: list[Any] = []
        first_err: BaseException | None = None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as e:  # noqa: BLE001 — re-raised below
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err
        return results


def commit_landed(table, job_id: str, task_id: str) -> bool:
    """True if a retained snapshot was committed by this job/task —
    every maintenance commit tags its snapshot summary with
    ``maint_job_id``/``maint_task_id``, making crash-between-commit-and-
    ack detection exact instead of inferred from file liveness.
    O(#retained snapshots) driver-side; snapshot expiration can drop old
    tags, so callers keep the input-files-no-longer-live heuristic as a
    fallback."""
    for snap in table.snapshots():
        if (
            snap.summary.get("maint_job_id") == job_id
            and snap.summary.get("maint_task_id") == task_id
        ):
            return True
    return False
