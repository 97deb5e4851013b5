"""MERGE INTO — copy-on-write upsert keyed on doc_id (north_star M4).

Semantics (matching Iceberg's `MERGE INTO t USING s ON t.doc_id =
s.doc_id WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`):

1. Find *affected* target files — files containing at least one matched
   key — with one distributed semi-join over ``input_file_name()``.
   Manifest-level pruning on per-file doc_id min/max runs first, so a
   clustered table touches only the overlapping key range.
2. Rewrite only those files: their rows anti-joined against source keys
   (rows that survive) unioned with ALL source rows (updates + inserts).
3. Commit: remove affected files, add rewritten files. ``required_paths``
   = affected files ⇒ a concurrent commit that rewrote any of them
   aborts this merge with CommitConflict — Iceberg's conflict-detection
   behavior, exercised in tests/test_maintenance.py.

Skew handling: the join key is doc_id (near-unique, no intrinsic skew),
but heavy ``source`` prefixes can skew the *file* distribution; AQE
skew-join splitting is enabled session-wide, and ``salt_partitions``
optionally pre-repartitions the source by a salted key for extreme
cases (SURVEY.md §4.2).
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.icemini import IceMiniTable, SEQUENCES_SCHEMA
from .lineage import JobLog


def merge_into(
    table: IceMiniTable,
    source: DataFrame,
    key: str = "doc_id",
    salt_partitions: int | None = None,
    job_id: str | None = None,
) -> dict[str, Any]:
    spark = table.spark
    job_id = job_id or f"merge-{uuid.uuid4().hex[:12]}"
    log = JobLog(table.root, job_id)

    # last-writer-wins dedup of the source on the merge key; persist —
    # the source plan is evaluated up to 4 times below (key bounds,
    # affected-file semi-join, anti-join, rewrite union) and an
    # expensive upstream plan would otherwise recompute each time
    source = source.dropDuplicates([key])
    if salt_partitions:
        # deterministic salt — xxhash64(key, seed) spreads near-unique
        # keys evenly without breaking run-to-run reproducibility
        source = source.repartition(salt_partitions, F.xxhash64(key, F.lit(42)))
    source = source.persist()
    n_src = source.count()  # materializes the persist; exact key count

    entries = table.live_entries()
    src_keys = source.select(key)
    # Catalyst cannot see that only the key column of the persisted
    # source feeds the joins below — InMemoryRelation stats are not
    # column-pruned, so the 4-column source (token arrays included)
    # looks far too big to broadcast and both joins degrade to
    # sort-merge, shuffling the FULL target token payload. The key set's
    # true size is n_src × ~48 B; hint broadcast when it fits the
    # session threshold. At 10^12-row scale with ~10^11-key sources the
    # hint correctly stays off and SMJ + AQE skew handling take over.
    import re

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    m = re.fullmatch(r"(-?\d+)\s*([bkmg]?)b?", thr.strip().lower())
    thr_bytes = int(m.group(1)) * {
        "": 1, "b": 1, "k": 1024, "m": 1024**2, "g": 1024**3
    }[m.group(2)] if m else -1
    if thr_bytes > 0 and n_src * 48 <= thr_bytes:
        src_keys = F.broadcast(src_keys)

    # manifest-level pruning: only files whose [min,max] doc_id range can
    # intersect the source keys need scanning to find matches
    bounds = src_keys.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
    candidates = [
        e
        for e in entries
        if e.min_doc_id is None
        or bounds["lo"] is None
        or not (e.max_doc_id < bounds["lo"] or e.min_doc_id > bounds["hi"])
    ]

    affected_paths: list[str] = []
    if candidates:
        cand_abs = [table._abs(e.path) for e in candidates]
        tgt = (
            spark.read.schema(SEQUENCES_SCHEMA)
            .parquet(*cand_abs)
            .withColumn(
                "____file",
                F.expr("replace(replace(input_file_name(), 'file://', ''), 'file:', '')"),
            )
        )
        hit_files = (
            tgt.join(src_keys, key, "left_semi")
            .select("____file")
            .distinct()
            .collect()
        )
        import os

        affected_paths = sorted(
            os.path.relpath(r["____file"], table.root) for r in hit_files
        )

    if not affected_paths:
        # pure insert — append-only commit
        new_entries = table.write_data_files(source)
        snap = table.commit("merge", added=new_entries)
        record = {
            "input_files": [],
            "output_files": [e.path for e in new_entries],
            "rows": sum(e.rows for e in new_entries),
            "tokens": sum(e.token_count for e in new_entries),
            "matched_files": 0,
        }
        log.write_plan([{"task_id": "merge", **record}])
        log.mark_done("merge", record)
        source.unpersist()
        return {"job_id": job_id, "snapshot_id": snap.snapshot_id, **record}

    affected_abs = [table._abs(p) for p in affected_paths]
    survivors = (
        spark.read.schema(SEQUENCES_SCHEMA)
        .parquet(*affected_abs)
        .join(src_keys, key, "left_anti")
    )
    rewritten = survivors.select(*SEQUENCES_SCHEMA.fieldNames()).unionByName(
        source.select(*SEQUENCES_SCHEMA.fieldNames())
    )
    new_entries = table.write_data_files(rewritten)
    record = {
        "input_files": affected_paths,
        "output_files": [e.path for e in new_entries],
        "rows": sum(e.rows for e in new_entries),
        "tokens": sum(e.token_count for e in new_entries),
        "matched_files": len(affected_paths),
    }
    log.write_plan([{"task_id": "merge", **record}])
    log.mark_intent("merge", record)
    snap = table.commit(
        "merge",
        added=new_entries,
        removed_paths=affected_paths,
        required_paths=affected_paths,
    )
    log.mark_done("merge", record)
    source.unpersist()
    return {"job_id": job_id, "snapshot_id": snap.snapshot_id, **record}
