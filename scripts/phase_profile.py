"""Diagnostic: sub-phase timings of the maintenance cycle at one
parallelism level. Run at two levels and diff — sub-phases whose wall
time does NOT shrink with cores are the serial floor that caps N->4N
scaling efficiency.

Usage: python scripts/phase_profile.py --cpus 8 --rows 500000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIMES: dict[str, float] = {}
COUNTS: dict[str, int] = {}


def _patch(obj, name: str, label: str):
    orig = getattr(obj, name)

    def wrapped(*a, **kw):
        t0 = time.time()
        out = orig(*a, **kw)
        TIMES[label] = TIMES.get(label, 0.0) + (time.time() - t0)
        COUNTS[label] = COUNTS.get(label, 0) + 1
        return out

    setattr(obj, name, wrapped)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=500_000)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    os.environ["BENCH_ROWS"] = str(args.rows)
    os.environ.setdefault("BENCH_MEAN_TOKENS", "128")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

    import bench
    from datalakequality_spark.session import get_spark
    from datalakequality_spark.sources import icemini
    from datalakequality_spark.maintenance import compaction, merge as merge_mod

    bench.CPUS = args.cpus
    bench.N_ROWS = args.rows

    _patch(icemini.IceMiniTable, "compute_file_stats", "file_stats_job")
    _patch(icemini.IceMiniTable, "write_data_files", "write_data_files_total")
    _patch(icemini.IceMiniTable, "commit", "commit_meta")
    _patch(icemini.IceMiniTable, "expire_snapshots", "expire")
    _patch(compaction, "gate_batch", "quality_gate")

    # time the pieces of merge_into around write_data_files
    orig_merge = merge_mod.merge_into

    def timed_merge(table, source, **kw):
        t0 = time.time()
        out = orig_merge(table, source, **kw)
        TIMES["merge_total"] = time.time() - t0
        return out

    merge_mod.merge_into = timed_merge

    spark = get_spark("profile", master=f"local[{args.cpus}]")
    bench._warm_python_workers(spark)

    t0 = time.time()
    out = bench.run_maintenance(spark)
    wall = time.time() - t0

    report = {
        "cpus": args.cpus,
        "rows": args.rows,
        "cycle_wall": round(out["maintain_sec"], 2),
        "rewrite_sorted": out["rewrite_sorted_sec"],
        "merge": out["merge_sec"],
        "expire_reported": out["expire_sec"],
        "sub": {k: round(v, 2) for k, v in sorted(TIMES.items())},
        "calls": COUNTS,
        "outer_wall_incl_datagen": round(wall, 2),
    }
    print("PHASE_PROFILE " + json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
