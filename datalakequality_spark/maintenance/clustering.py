"""Z-order / Hilbert clustering rewrite (north_star M4).

Reads the live snapshot, computes the space-filling-curve key
(functions/spacecurves.py — one Arrow UDF), assigns each row a range
bucket from pre-sampled key quantiles, hash-exchanges on the bucket id
and sorts within partitions; the fanout writer
(IceMiniTable.write_data_files split_col) cuts one file per bucket.
Output files are globally range-ordered on the curve key with tight
per-file (source, n_tok, doc_id) min/max stats, which is exactly what
manifest-level pruning (IceMiniTable.prune_entries) needs.

Why not ``repartitionByRange`` directly: Spark's range exchange runs a
separate sampling job over the FULL child plan — here that means
decoding every token array and evaluating the curve UDF over all rows
twice. Sampling the three light key dims first (column pruning keeps
the tokens column untouched) and bucketing by the sampled quantile
bounds gets the same layout for one heavy pass plus one ~1% sample
pass. Bucket sizes stay balanced because bounds come from quantiles of
the key itself (skew-resistant by construction), and AQE is free to
coalesce the hash exchange into fewer, fuller write tasks without
changing the file count.

Scale: one sample pass (light columns), one shuffle, one sort, one
write. At 10^12 rows this is the dominant maintenance cost; it
parallelizes perfectly because the key is computed map-side.

Resumable: one lineage task per rewrite; a re-run with the same job_id
after a crash either acks the landed commit or redoes the pass.
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spacecurves import with_cluster_bucket, with_cluster_key
from ..sources.icemini import IceMiniTable, SEQUENCES_SCHEMA
from .lineage import JobLog


def _cluster_and_bucket(
    spark,
    paths: list[str],
    method: str,
    num_files: int,
    total_rows: int,
) -> DataFrame:
    """Read ``paths``, add the curve key, and return a DataFrame hash-
    partitioned on a ``__pid`` range-bucket column and sorted by
    (``__pid``, key) within partitions — ready for the fanout writer
    (``write_data_files(..., split_col="__pid")``).

    Bucket bounds are ``num_files``-quantiles of the curve key over a
    seeded sample of the three key dims only (pruned scan: token arrays
    are never decoded in the sample pass).
    """
    df = spark.read.schema(SEQUENCES_SCHEMA).parquet(*paths)
    bounds: list[int] = []
    if num_files > 1:
        # ~500 sampled keys per bucket bounds the bucket-size error well
        # below the parquet row-group size; cap the sample at full scan
        frac = min(1.0, (num_files * 500) / max(total_rows, 1))
        dims = df.select("source", "n_tok", "doc_id").sample(frac, seed=42)
        skeys = with_cluster_key(dims, method=method)
        qs = [i / num_files for i in range(1, num_files)]
        raw = skeys.approxQuantile("__cluster_key", qs, 0.25 / num_files)
        bounds = sorted({int(b) for b in raw})
    # key + bucket id in ONE Arrow pass (np.searchsorted over the
    # closure-captured bounds — O(log #buckets)/row; a Column-expression
    # linear scan over the bounds array would be O(#buckets)/row, which
    # at 10^12 rows / ~400k output files is intractable)
    keyed = with_cluster_bucket(df, bounds, method=method)
    return (
        keyed.repartition("__pid")
        .sortWithinPartitions("__pid", "__cluster_key")
        .drop("__cluster_key")
    )


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
            clustered = _cluster_and_bucket(
                table.spark,
                paths,
                task.get("method", method),
                task["num_files"],
                sum(e.rows for e in live_inputs),
            )
            new_entries = table.write_data_files(clustered, split_col="__pid")
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
        by_path = {e.path: e for e in table.live_entries()}
        total_rows = sum(by_path[p].rows for p in inputs if p in by_path)
        clustered = _cluster_and_bucket(
            table.spark,
            paths,
            task.get("method", method),
            task["num_files"],
            total_rows,
        )
        new_entries = table.write_data_files(clustered, split_col="__pid")
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
