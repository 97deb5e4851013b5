"""Diagnostic: per-Spark-job wall times for the maintenance cycle at one
parallelism level, from the event log. Jobs whose wall does not shrink
with cores are the serial floor capping N->4N scaling efficiency.

Usage: python scripts/job_profile.py --cpus 8 --rows 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    os.environ["BENCH_ROWS"] = str(args.rows)
    os.environ.setdefault("BENCH_MEAN_TOKENS", "128")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/dlq_spark_local")

    evt_dir = tempfile.mkdtemp(prefix="spark-events-", dir="/dev/shm")

    import bench
    from datalakequality_spark.session import get_spark

    bench.CPUS = args.cpus
    bench.N_ROWS = args.rows

    spark = get_spark(
        "jobprof",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.eventLog.enabled": "true", "spark.eventLog.dir": evt_dir},
    )
    bench._warm_python_workers(spark)

    t0 = time.time()
    out = bench.run_maintenance(spark)
    wall = time.time() - t0
    spark.stop()
    time.sleep(1.0)

    jobs = {}
    stages = {}
    paths = []
    for dirpath, _dirnames, filenames in os.walk(evt_dir):
        for fn in filenames:
            if "appstatus" not in fn:
                paths.append(os.path.join(dirpath, fn))
    def _lines(path):
        if path.endswith(".zstd"):
            import pyarrow as pa

            with pa.CompressedInputStream(pa.OSFile(path), "zstd") as f:
                data = f.read()
            return data.decode().splitlines()
        return open(path)

    for path in sorted(paths):
        if True:
            for line in _lines(path):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    desc = props.get("spark.job.description") or props.get(
                        "callSite.short", ""
                    )
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": (desc or "")[:90],
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", "")[:70],
                        "tasks": si.get("Number of Tasks", 0),
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    st = stages.setdefault(sid, {"name": "?", "tasks": 0})
                    info = ev.get("Task Info", {})
                    st["task_time_ms"] = st.get("task_time_ms", 0) + (
                        info.get("Finish Time", 0) - info.get("Launch Time", 0)
                    )
                    mx = ev.get("Task Metrics") or {}
                    st["cpu_ms"] = st.get("cpu_ms", 0) + mx.get(
                        "Executor CPU Time", 0
                    ) // 1_000_000
                    st["run_ms"] = st.get("run_ms", 0) + mx.get("Executor Run Time", 0)

    print(f"\n== cycle wall {wall:.1f}s cpus={args.cpus} rows={args.rows} "
          f"rewrite={out['rewrite_sorted_sec']} merge={out['merge_sec']}")
    print(f"{'job':>4} {'wall_s':>7} {'desc'}")
    total_job_wall = 0.0
    prev_end = None
    gap_total = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        w = (j["end"] - j["start"]) / 1000.0
        total_job_wall += w
        if prev_end is not None and j["start"] > prev_end:
            gap_total += (j["start"] - prev_end) / 1000.0
        prev_end = max(prev_end or 0, j["end"])
        stage_bits = []
        for sid in j["stages"]:
            s = stages.get(sid)
            if s and "task_time_ms" in s:
                stage_bits.append(
                    f"s{sid}:{s['tasks']}t/{s['task_time_ms']/1000:.1f}tt/{s.get('run_ms',0)/1000:.1f}run"
                )
        print(f"{jid:>4} {w:>7.2f} {j['desc']}  [{' '.join(stage_bits)}]")
    print(f"sum job wall {total_job_wall:.1f}s; driver gaps between jobs {gap_total:.1f}s")


if __name__ == "__main__":
    main()
