"""Bin-packing compaction of small Parquet files (north_star M4).

Planning is manifest-level (driver, O(#files) — the same cost class as
Iceberg's RewriteDataFiles planning): files smaller than
``small_file_bytes`` are packed first-fit-decreasing into bins of
``target_bytes``; files already ≥ the threshold are left untouched, so a
steady-state table converges and compaction is incremental.

Execution is ONE Spark job per batch of bins: the file→bin assignment is
broadcast and joined on ``input_file_name()`` (no shuffle for the map
side), then a single hash repartition on ``bin_id`` + ``partitionBy``
write produces exactly one output file per bin. Batches (≤
``bins_per_batch`` bins) are the resumability unit: each batch is its
own snapshot commit + lineage record, so a killed job restarts from the
last committed batch (see maintenance/lineage.py).

Quality gates can run inside each batch pass (plans/quality_gate.py):
per-input-file metrics come from the same frame already materialized,
and failing files are quarantined out of the commit.
"""

from __future__ import annotations

import os
import uuid
from typing import Any

from pyspark.sql import functions as F

from ..sources.icemini import FileEntry, IceMiniTable
from .lineage import JobLog


def plan_bins(
    entries: list[FileEntry],
    target_bytes: int,
    small_file_bytes: int | None = None,
    delete_entries: list[FileEntry] | None = None,
) -> list[list[FileEntry]]:
    """First-fit-decreasing packing of small files into ~target_bytes
    bins. Returns only bins worth rewriting (≥2 files, or 1 undersized
    file that fits nothing else).

    Files may only share a bin when the SAME pending equality deletes
    apply to them (``applicable_delete_paths``): the compacted file
    preserves the min member seq without applying deletes, so mixing a
    pre-delete file with a post-delete file would make the delete
    wrongly suppress the newer rows. Within a class the min seq is
    provably safe; the classes collapse to one once deletes are shed."""
    from ..sources.icemini import applicable_delete_paths

    small_file_bytes = small_file_bytes or int(target_bytes * 0.75)
    dels = delete_entries or []
    classes: dict[frozenset, list[FileEntry]] = {}
    for e in entries:
        if e.size_bytes < small_file_bytes:
            classes.setdefault(applicable_delete_paths(e, dels), []).append(e)
    out: list[list[FileEntry]] = []
    for members_cls in classes.values():
        small = sorted(members_cls, key=lambda e: e.size_bytes, reverse=True)
        bins: list[tuple[int, list[FileEntry]]] = []
        for e in small:
            for i, (used, members) in enumerate(bins):
                if used + e.size_bytes <= target_bytes:
                    bins[i] = (used + e.size_bytes, members + [e])
                    break
            else:
                bins.append((e.size_bytes, [e]))
        out.extend(members for _, members in bins if len(members) >= 2)
    return out


def rewrite_bins(
    table: IceMiniTable,
    bins: list[list[FileEntry]],
    max_concurrency: int | None = None,
) -> list[FileEntry]:
    """Rewrite each bin to exactly one file — one SINGLE-TASK Spark job
    per bin, submitted concurrently from a thread pool (the same shape
    as Iceberg's RewriteDataFiles file groups).

    No shuffle: a bin's rows only ever move from its member files into
    its one output file, so ``coalesce(1)`` over the member files into
    the streaming writer (``write_data_files``) is the whole plan —
    stats AND the key-Bloom sidecar are computed from the same Arrow
    stream the writer is already consuming, no extra pass. Concurrency
    = min(#bins, cores) single-task jobs keeps every core busy; on a
    multi-executor cluster raise ``max_concurrency`` to the cluster's
    total task slots.

    The output PRESERVES the members' minimum data sequence number
    (Iceberg RewriteDataFiles semantics): compaction carries rows 1:1
    without applying pending equality deletes — keeping the oldest seq
    means those deletes still apply to the compacted file at scan time,
    so no MoR-deleted row is ever resurrected by a pure bin-pack."""
    from concurrent.futures import ThreadPoolExecutor

    spark = table.spark
    prefix = uuid.uuid4().hex
    sc_cores = spark.sparkContext.defaultParallelism
    workers = max(1, min(len(bins), max_concurrency or sc_cores))

    def one(b: int, members: list[FileEntry]) -> FileEntry:
        paths = [os.path.join(table.root, e.path) for e in members]
        df = (
            spark.read.schema(table.schema())  # evolved columns survive
            .parquet(*paths)
            .coalesce(1)
        )
        [entry] = table.write_data_files(df, prefix=f"{prefix}-{b:05d}")
        entry.seq = min((e.seq or 0) for e in members)
        return entry

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(lambda ib: one(*ib), enumerate(bins)))


def gate_batch(
    table: IceMiniTable, bins: list[list[FileEntry]], thresholds: dict[str, Any] | None
) -> tuple[list[list[FileEntry]], list[dict[str, Any]]]:
    """Run the per-file quality gate (plans/quality_gate.gate_files) over
    one batch's input files — ONE grouped aggregation — and split out
    quarantined files. Returns (clean bins, quarantine records)."""
    import math

    from ..plans.quality_gate import gate_files, parquet_null_counts

    entries = [e for b in bins for e in b]
    paths = [table._abs(e.path) for b in bins for e in b]
    tokens_nulls = parquet_null_counts(paths, "tokens")
    # global z-score stats from manifest moments (Σn_tok, Σn_tok² are in
    # the file stats) — saves the gate's global-agg data pass. The
    # denominator must count non-null n_tok only (Spark aggs skip
    # nulls), so the n_tok null totals come from parquet footers; any
    # entry from a pre-moments manifest falls back to the in-pass agg.
    global_stats = None
    if entries and all(e.sum_sq_n_tok is not None for e in entries):
        ntok_nulls = parquet_null_counts(paths, "n_tok")
        n = sum(e.rows for e in entries) - sum(ntok_nulls.values())
        if n > 0:
            mean = sum(e.token_count for e in entries) / n
            var = sum(e.sum_sq_n_tok for e in entries) / n - mean * mean
            global_stats = (mean, math.sqrt(max(var, 0.0)))
    # scan only the light columns (doc_id for PII, n_tok for outliers);
    # the tokens array's null counts come from parquet footer stats
    df = (
        table.spark.read.schema(table.schema())
        .parquet(*paths)
        .select(
            "doc_id",
            "n_tok",
            F.expr(
                "replace(replace(input_file_name(), 'file://', ''), 'file:', '')"
            ).alias("__file"),
        )
    )
    metrics = gate_files(df, thresholds, tokens_nulls, global_stats)
    bad = {
        os.path.relpath(p, table.root): m
        for p, m in metrics.items()
        if m["quarantined"]
    }
    if not bad:
        return bins, []
    clean_bins = [
        [e for e in b if e.path not in bad] for b in bins
    ]
    clean_bins = [b for b in clean_bins if b]
    records = [
        {"path": rel, "reasons": m["reasons"], "rows": m["rows"], "tokens": m["tokens"]}
        for rel, m in sorted(bad.items())
    ]
    return clean_bins, records


def compact_table(
    table: IceMiniTable,
    target_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
    bins_per_batch: int = 64,
    job_id: str | None = None,
    quality_gate: bool = False,
    gate_thresholds: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Plan + execute + commit compaction, resumable via the job log.

    With ``quality_gate=True`` each batch first runs the per-file gate;
    failing files are excluded from the rewrite, dropped from the live
    set, and listed in the commit's quarantine metadata (north_star M5).
    """
    job_id = job_id or f"compact-{uuid.uuid4().hex[:12]}"
    log = JobLog(table.root, job_id)

    tasks = log.load_plan()
    if tasks is None:
        bins = plan_bins(
            table.live_entries(),
            target_bytes,
            small_file_bytes,
            delete_entries=table.live_delete_entries(),
        )
        tasks = []
        for i in range(0, len(bins), bins_per_batch):
            batch = bins[i : i + bins_per_batch]
            tasks.append(
                {
                    "task_id": f"batch-{i // bins_per_batch:05d}",
                    "bins": [[e.to_dict() for e in b] for b in batch],
                }
            )
        log.write_plan(tasks)

    result = {
        "job_id": job_id,
        "batches": 0,
        "skipped": 0,
        "rewritten_files": 0,
        "new_files": 0,
        "quarantined_files": 0,
    }
    for task in tasks:
        tid = task["task_id"]
        bins = [[FileEntry.from_dict(d) for d in b] for b in task["bins"]]
        inputs = [e.path for b in bins for e in b]
        if log.is_done(tid):
            result["skipped"] += 1
            continue
        intent = log.intent(tid)
        if intent is not None and not (set(inputs) & table.live_paths()):
            # crashed between commit and ack — the commit landed
            log.mark_done(tid, intent)
            result["skipped"] += 1
            continue
        quarantine: list[dict[str, Any]] = []
        if quality_gate:
            bins, quarantine = gate_batch(table, bins, gate_thresholds)
        new_entries = rewrite_bins(table, bins) if bins else []
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
            "compact",
            added=new_entries,
            removed_paths=inputs,
            required_paths=inputs,
            quarantine=quarantine,
        )
        log.mark_done(tid, record)
        result["batches"] += 1
        result["rewritten_files"] += len(inputs)
        result["new_files"] += len(new_entries)
        result["quarantined_files"] += len(quarantine)
    return result
