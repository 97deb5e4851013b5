"""SparkSession factory tuned for the engine.

Defaults follow the environment contract: local mode with AQE, Arrow,
UTC timestamps (duckdb-oracle comparability) and shuffle parallelism
matched to cores instead of the 200 default. On a real cluster the same
builder is used by ``spark-submit --py-files``; only master/memory
change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datalakequality_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to 2x the local
    parallelism — enough to keep AQE coalescing useful without
    over-scheduling tiny tasks.
    """
    # bound nested thread pools in the python workers: each worker
    # process otherwise sizes its pyarrow CPU pool (and any BLAS) to the
    # HOST core count, so N workers spawn N×cores threads that fault
    # pages concurrently and serialize on per-process mmap_lock.
    # Measured (16-core cycle, 5M rows): fused-rewrite wall 38-51 s →
    # 23-27 s, rewrite-phase kernel share 37% → 19%. A Spark task is
    # already the unit of parallelism — one compute thread per worker is
    # the correct sizing on any cluster. setdefault: callers can
    # override; executorEnv below propagates the same to real executors.
    _worker_env = {
        "OMP_NUM_THREADS": "1",          # pyarrow CPU pool + OpenMP BLAS
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
        "ARROW_IO_THREADS": "2",
    }
    for k, v in _worker_env.items():
        os.environ.setdefault(k, v)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(8, 2 * int(master[6:-1]))
        elif master.startswith("local-cluster["):
            n, cores = master[14:-1].split(",")[:2]
            shuffle_partitions = max(8, 2 * int(n) * int(cores))
        else:
            shuffle_partitions = 2 * (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the engine always reads EXPLICIT file lists resolved from its
        # own manifests — there is no directory discovery to distribute,
        # so keep file listing on the driver (a stat per path) instead of
        # Spark's default of launching a cluster job per read above 32
        # paths: those 100+-task listing jobs are pure dispatch overhead
        # (measured: 75 task-seconds for 97 tmpfs paths, ~0 run time)
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
    )
    # spark.local.dir stays on Spark's default (real disk) unless the
    # caller opts in: RAM-backed tmpfs local dirs cap shuffle/spill at
    # the tmpfs quota (typically RAM/2) and fail instead of spilling, so
    # they are a bench/sandbox tuning, not a library default. bench.py
    # and scripts/scaling_bench.py set SPARK_GRAFT_LOCAL_DIR explicitly
    # because this sandbox's single virtio disk (~20-25 MB/s sustained)
    # would serialize every shuffle — a wall a real cluster's
    # per-executor NVMe local dirs do not have.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k in _worker_env:
        builder = builder.config(f"spark.executorEnv.{k}", os.environ[k])
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # multi-executor masters (local-cluster pseudo-cluster, standalone,
    # YARN, k8s): executor python workers do not share the driver's
    # sys.path, so cloudpickled UDFs referencing this package raise
    # ModuleNotFoundError unless the package is shipped — the
    # spark-submit --py-files contract. When the caller did not submit
    # with --py-files (no spark.submit.pyFiles), ship a freshly zipped
    # copy of the package via addPyFile.
    if not master.startswith("local[") and not spark.conf.get(
        "spark.submit.pyFiles", ""
    ):
        spark.sparkContext.addPyFile(_package_zip())
    return spark


def _package_zip() -> str:
    """Zip this package into the session temp dir (once per process)."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(
        tempfile.gettempdir(), f"dlq_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    p = os.path.join(root, f)
                    rel = os.path.join(
                        "datalakequality_spark", os.path.relpath(p, pkg_dir)
                    )
                    z.write(p, rel)
    return out
