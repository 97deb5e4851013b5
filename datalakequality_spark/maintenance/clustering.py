"""Z-order / Hilbert clustering rewrite (north_star M4).

Reads the live snapshot, computes the space-filling-curve key
(functions/spacecurves.py — one Arrow UDF), then
``repartitionByRange(num_files, key).sortWithinPartitions(key)``:
the range exchange gives globally ordered, equal-sized output files and
the within-partition sort gives tight per-file (source, n_tok, doc_id)
min/max stats, which is exactly what manifest-level pruning
(IceMiniTable.prune_entries) needs.

Scale: one shuffle (range exchange with sampled bounds — skew-resistant
by construction since bounds come from sampling the key itself), one
sort, one write. At 10^12 rows this is the dominant maintenance cost;
it parallelizes perfectly because the key is computed map-side.

Resumable: clustering commits per source-partition group when
``group_by_source=True`` (each group = one lineage task), else a single
task.
"""

from __future__ import annotations

import uuid
from typing import Any

from ..functions.spacecurves import with_cluster_key
from ..sources.icemini import IceMiniTable, SEQUENCES_SCHEMA
from .lineage import JobLog


def rewrite_sorted(
    table: IceMiniTable,
    method: str = "zorder",
    target_rows_per_file: int = 250_000,
    job_id: str | None = None,
    quality_gate: bool = False,
    gate_thresholds: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Fused bin-packing compaction + space-curve clustering — ONE data
    pass over the live snapshot (the same shape as Iceberg's
    RewriteDataFiles with a sort strategy: small files are packed AND
    every output file is curve-ordered in a single rewrite).

    Running ``compact_table`` then ``cluster_table`` reads and writes the
    full table twice; at 10^12 rows the second rewrite doubles the
    dominant cost (shuffle + parquet encode + disk). This fusion keeps
    both operators' semantics — output files are ~target-sized (the
    packing) and globally range-ordered on the (source, n_tok, doc_id)
    curve key with tight per-file min/max stats (the clustering) — for
    one read, one range exchange, one sorted write, one commit.

    With ``quality_gate=True`` the per-file gate runs over the inputs
    first (same grouped aggregation as compaction's gate_batch) and
    failing files are quarantined out of the rewrite and the live set.

    Resumable: one lineage task; a re-run with the same job_id after a
    crash either acks the landed commit or redoes the pass (staged
    orphans are swept by reachability GC).
    """
    from .compaction import gate_batch

    job_id = job_id or f"rewrite-{uuid.uuid4().hex[:12]}"
    log = JobLog(table.root, job_id)

    tasks = log.load_plan()
    if tasks is None:
        entries = table.live_entries()
        total_rows = sum(e.rows for e in entries)
        num_files = max(1, -(-total_rows // target_rows_per_file))
        tasks = [
            {
                "task_id": "rewrite-sorted",
                "input_files": [e.path for e in entries],
                "num_files": num_files,
                "method": method,
            }
        ]
        log.write_plan(tasks)

    result = {
        "job_id": job_id,
        "tasks": 0,
        "skipped": 0,
        "new_files": 0,
        "quarantined_files": 0,
    }
    for task in tasks:
        tid = task["task_id"]
        inputs = task["input_files"]
        if log.is_done(tid):
            result["skipped"] += 1
            continue
        intent = log.intent(tid)
        if intent is not None and not (set(inputs) & table.live_paths()):
            log.mark_done(tid, intent)
            result["skipped"] += 1
            continue

        by_path = {e.path: e for e in table.live_entries()}
        live_inputs = [by_path[p] for p in inputs if p in by_path]
        quarantine: list[dict[str, Any]] = []
        if quality_gate and live_inputs:
            clean_bins, quarantine = gate_batch(table, [live_inputs], gate_thresholds)
            live_inputs = clean_bins[0] if clean_bins else []

        if live_inputs:
            paths = [table._abs(e.path) for e in live_inputs]
            df = table.spark.read.schema(SEQUENCES_SCHEMA).parquet(*paths)
            keyed = with_cluster_key(df, method=task.get("method", method))
            clustered = (
                keyed.repartitionByRange(task["num_files"], "__cluster_key")
                .sortWithinPartitions("__cluster_key")
                .drop("__cluster_key")
            )
            new_entries = table.write_data_files(clustered)
        else:
            new_entries = []
        record = {
            "task_id": tid,
            "input_files": inputs,
            "output_files": [e.path for e in new_entries],
            "rows": sum(e.rows for e in new_entries),
            "tokens": sum(e.token_count for e in new_entries),
            "quarantined": [q["path"] for q in quarantine],
        }
        log.mark_intent(tid, record)
        table.commit(
            "rewrite-sorted",
            added=new_entries,
            removed_paths=inputs,
            required_paths=inputs,
            quarantine=quarantine,
        )
        log.mark_done(tid, record)
        result["tasks"] += 1
        result["new_files"] += len(new_entries)
        result["quarantined_files"] += len(quarantine)
    return result


def cluster_table(
    table: IceMiniTable,
    method: str = "zorder",
    target_rows_per_file: int = 250_000,
    job_id: str | None = None,
) -> dict[str, Any]:
    job_id = job_id or f"cluster-{uuid.uuid4().hex[:12]}"
    log = JobLog(table.root, job_id)

    tasks = log.load_plan()
    if tasks is None:
        entries = table.live_entries()
        total_rows = sum(e.rows for e in entries)
        num_files = max(1, -(-total_rows // target_rows_per_file))
        tasks = [
            {
                "task_id": "cluster-all",
                "input_files": [e.path for e in entries],
                "num_files": num_files,
                "method": method,
            }
        ]
        log.write_plan(tasks)

    result = {"job_id": job_id, "tasks": 0, "skipped": 0, "new_files": 0}
    for task in tasks:
        tid = task["task_id"]
        inputs = task["input_files"]
        if log.is_done(tid):
            result["skipped"] += 1
            continue
        intent = log.intent(tid)
        if intent is not None and not (set(inputs) & table.live_paths()):
            log.mark_done(tid, intent)
            result["skipped"] += 1
            continue

        paths = [table._abs(p) for p in inputs]
        df = table.spark.read.schema(SEQUENCES_SCHEMA).parquet(*paths)
        keyed = with_cluster_key(df, method=task.get("method", method))
        clustered = (
            keyed.repartitionByRange(task["num_files"], "__cluster_key")
            .sortWithinPartitions("__cluster_key")
            .drop("__cluster_key")
        )
        new_entries = table.write_data_files(clustered)
        record = {
            "task_id": tid,
            "input_files": inputs,
            "output_files": [e.path for e in new_entries],
            "rows": sum(e.rows for e in new_entries),
            "tokens": sum(e.token_count for e in new_entries),
        }
        log.mark_intent(tid, record)
        table.commit(
            "cluster", added=new_entries, removed_paths=inputs, required_paths=inputs
        )
        log.mark_done(tid, record)
        result["tasks"] += 1
        result["new_files"] += len(new_entries)
    return result
