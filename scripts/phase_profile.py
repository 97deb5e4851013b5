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
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/dlq_spark_local")

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

    # host CPU-mode mix per sub-phase: rewrite vs merge (the sampled
    # /proc/stat deltas attribute kernel-time blowups to a phase)
    from datalakequality_spark.maintenance import clustering as clustering_mod

    def _stat():
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    def _mix(b, a):
        d = [x - y for x, y in zip(a, b)]
        tot = sum(d) or 1
        return {
            "user": round(100 * (d[0] + d[1]) / tot, 1),
            "sys": round(100 * (d[2] + d[5] + d[6]) / tot, 1),
            "idle": round(100 * d[3] / tot, 1),
            "steal": round(100 * d[7] / tot, 1) if len(d) > 7 else 0.0,
        }

    MIX: dict[str, list] = {}

    def _mix_patch(mod, name, label):
        orig = getattr(mod, name)

        def wrapped(*a, **kw):
            b = _stat()
            out = orig(*a, **kw)
            MIX.setdefault(label, []).append(_mix(b, _stat()))
            return out

        setattr(mod, name, wrapped)

    # bench imports these function-locally at call time, so patching the
    # module attributes is sufficient
    _mix_patch(clustering_mod, "rewrite_sorted", "rewrite_mix")
    _mix_patch(merge_mod, "merge_into", "merge_mix")
    _mix_patch(clustering_mod, "_cluster_and_bucket", "bucket_plan_mix")
    _mix_patch(compaction, "gate_batch", "gate_mix")
    _mix_patch(icemini.IceMiniTable, "write_data_files", "write_mix")

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
        "cpu_mix": MIX,
        "calls": COUNTS,
        "outer_wall_incl_datagen": round(wall, 2),
    }
    print("PHASE_PROFILE " + json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
