"""Two-parallelism-level scaling evidence (BASELINE.md north rule).

No real cluster exists in this sandbox, so the N→4N executor scaling
criterion is evidenced by running the SAME maintenance cycle on the
SAME deterministic input at local[8] and local[32] (per the driver
instruction), each in a fresh JVM, with shuffle partitions scaled to
the core count. Efficiency = T_8 / (4 × T_32) — 1.0 means perfect 4×
speed-up from 4× cores.

Usage:  python scripts/scaling_bench.py [--rows N] [--out BENCH/BASELINE.md]
Worker: python scripts/scaling_bench.py --worker --cpus 8 --rows N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, rows: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ["BENCH_ROWS"] = str(rows)
    import bench

    bench.CPUS = cpus
    bench.N_ROWS = rows
    from datalakequality_spark.session import get_spark

    spark = get_spark("scaling", master=f"local[{cpus}]")
    out = bench.run_maintenance(spark)
    out["cpus"] = cpus
    out["rows"] = rows
    out["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
    print("SCALING_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=2,
                    help="runs per parallelism level; best (min) wall is kept "
                         "to damp shared-host noise")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    if args.worker:
        worker(args.cpus, args.rows)
        return

    results = {}
    for cpus in (8, 32):
        best = None
        for rep in range(args.repeats):
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", "--cpus", str(cpus),
                 "--rows", str(args.rows)],
                capture_output=True, text=True, timeout=3600,
            )
            line = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("SCALING_RESULT ")),
                None,
            )
            if line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
                raise SystemExit(f"worker local[{cpus}] produced no result")
            r = json.loads(line[len("SCALING_RESULT "):])
            print(f"local[{cpus}] run {rep + 1}: {r['maintain_sec']}s")
            if best is None or r["maintain_sec"] < best["maintain_sec"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['maintain_sec']}s "
              f"({best['sequences_per_sec']} seq/s)")

    t8, t32 = results[8]["maintain_sec"], results[32]["maintain_sec"]
    eff = t8 / (4 * t32)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — maintenance-cycle throughput & scaling efficiency

Metric (BASELINE.json): sequences/sec maintained (compact + cluster +
merge) on the synthetic tokenized-sequence table; scaling efficiency
N→4N ≥ 0.8. Sandbox proxy per the driver instruction: same job, same
deterministic input (seed=42, {args.rows:,} rows ≈
{results[32]['maintain_rows']:,} rows after merge), at local[8] vs
local[32]; shuffle partitions = 2× cores; AQE on at both sizes; best of
{args.repeats} runs per level (shared-host noise damping).

| parallelism | shuffle partitions | cycle wall (s) | sequences/sec | compact | cluster | merge |
|---|---|---|---|---|---|---|
| local[8]  | {results[8]['shuffle_partitions']} | {t8} | {results[8]['sequences_per_sec']} | {results[8]['compact_sec']} | {results[8]['cluster_sec']} | {results[8]['merge_sec']} |
| local[32] | {results[32]['shuffle_partitions']} | {t32} | {results[32]['sequences_per_sec']} | {results[32]['compact_sec']} | {results[32]['cluster_sec']} | {results[32]['merge_sec']} |

**Scaling efficiency** = T_8 / (4 × T_32) = {t8} / (4 × {t32}) =
**{eff:.3f}** (target ≥ 0.8; >1 means better-than-linear, usually from
fixed driver/JVM overheads amortizing).

Config: `datalakequality_spark.session.get_spark` defaults — AQE +
coalescePartitions + skewJoin enabled, Arrow on, zstd parquet,
broadcast threshold 64 MB. Cycle = bin-packing compaction with
quality gate → Z-order clustering → MERGE INTO (10% updates + 10%
inserts) → snapshot expire, via the same entry points `bench.py` uses.

Reproduce: `python scripts/scaling_bench.py --rows {args.rows}`
""")
    print(f"efficiency: {eff:.3f} → {args.out}")


if __name__ == "__main__":
    main()
