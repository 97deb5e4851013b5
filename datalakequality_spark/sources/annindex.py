"""IVF ANN index as a table layout: the coarse-quantizer cell id is a
materialized column, the table is clustered on it, and probes read ONLY
the files owning the probed cells (manifest min/max pruning — the same
file-skipping shape IceMiniTable.prune_entries gives n_tok scans).

This is the thing that makes ANN viable on a 100 TB embedding corpus:
brute force scans everything per query; hyperplane-LSH bucketing prunes
compute but still *reads* everything; an IVF-clustered layout prunes
I/O — a probe touches ``n_probe / n_centroids`` of the bytes.

Build (one pass + one shuffle):
1. train a spherical k-means codebook on a bounded driver-side sample
   (``train_kmeans`` — deterministic Lloyd's, numpy);
2. assign every vector its cell via ONE Arrow-batched matmul
   (vectorized pandas UDF, no per-row Python);
3. hash-exchange on the cell id (each cell lands wholly in one task)
   and write with ``partitionBy(cell)`` — one parquet file per cell,
   so per-file cell stats are exact (min==max==cell);
4. record {file → cell, rows} plus the codebook in ``manifest.json``.

Probe: rank codebook cells against the query (driver-side, K floats),
prune the manifest to the top ``n_probe`` cells' files, scan only
those, exact-cosine re-rank JVM-side.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

import numpy as np
import pandas as pd  # module scope: pandas_udf resolves stringified hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def train_kmeans(
    vecs: np.ndarray, k: int, iters: int = 15, seed: int = 42
) -> np.ndarray:
    """Spherical k-means (Lloyd's on the unit sphere — the cosine
    geometry): deterministic, driver-side numpy on a bounded sample.
    Returns (k, dim) unit-norm centroids."""
    v = np.asarray(vecs, dtype=np.float64)
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    if len(v) <= k:
        # degenerate sample: pad with random unit directions
        pad = rng.standard_normal((k - len(v) + 1, v.shape[1]))
        pad /= np.linalg.norm(pad, axis=1, keepdims=True)
        v = np.vstack([v, pad])
    cents = v[rng.choice(len(v), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(v @ cents.T, axis=1)
        for j in range(k):
            members = v[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n
            else:
                cents[j] = v[rng.integers(len(v))]  # reseed an empty cell
    return cents


def cell_assign_udf(centroids: np.ndarray):
    """Vectorized cell assignment: one BLAS matmul per Arrow batch.
    Centroids live in the UDF closure — zero plan literals (the same
    posture as dedup's hyperplane UDFs)."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def _cell(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)  # (batch, dim)
        sims = mat @ cents.T  # centroids unit-norm ⇒ argmax == cosine argmax
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return _cell


class AnnIvfIndex:
    """IVF-clustered embedding layout rooted at ``root``:

        <root>/manifest.json                     codebook + file list
        <root>/data/__cell=<c>/part-*.parquet    vectors of cell c
    """

    def __init__(self, spark: SparkSession, root: str, manifest: dict[str, Any]):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.manifest = manifest
        self.centroids = np.asarray(manifest["centroids"], dtype=np.float64)

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        root: str,
        n_centroids: int = 16,
        sample_rows: int = 4096,
        iters: int = 15,
        seed: int = 42,
    ) -> "AnnIvfIndex":
        root = os.path.abspath(root)
        data_dir = os.path.join(root, "data")
        # bounded driver-side training sample via limit(): scale-safe
        # (short-circuits the scan) but partition-biased on pre-sorted
        # inputs — acceptable for a coarse quantizer, where sample bias
        # costs recall, never correctness (probes re-rank exactly and
        # tests pin recall ≥ the random-codebook baseline)
        sample = df.select(vec_col).limit(sample_rows).toPandas()
        cents = train_kmeans(
            np.asarray(sample[vec_col].tolist(), dtype=np.float64),
            n_centroids,
            iters=iters,
            seed=seed,
        )
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            cell_assign_udf(cents)(F.col(vec_col)).alias("__cell"),
        )
        # hash exchange on the cell id: every cell lands wholly inside
        # one task, so partitionBy emits exactly one file per cell and
        # per-file cell stats are exact. At 10^12 scale the exchange
        # moves each vector once; probes then skip whole files.
        (
            assigned.repartition(n_centroids, "__cell")
            .write.mode("overwrite")
            .partitionBy("__cell")
            .parquet(data_dir)
        )
        files = []
        for p in sorted(glob.glob(os.path.join(data_dir, "__cell=*", "*.parquet"))):
            cell = int(os.path.basename(os.path.dirname(p)).split("=", 1)[1])
            files.append(
                {
                    "path": os.path.relpath(p, root),
                    "cell": cell,
                    "size_bytes": os.path.getsize(p),
                }
            )
        manifest = {
            "id_col": id_col,
            "vec_col": vec_col,
            # column types pinned at build time so the empty-probe
            # DataFrame's schema matches the data files exactly (a
            # hardcoded LongType id diverged for string-id indexes and
            # broke downstream unions; ADVICE r4)
            "id_type": df.schema[id_col].dataType.simpleString(),
            "vec_type": df.schema[vec_col].dataType.simpleString(),
            "n_centroids": n_centroids,
            "centroids": cents.tolist(),
            "files": files,
        }
        tmp = os.path.join(root, ".tmp-manifest.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(root, "manifest.json"))
        return cls(spark, root, manifest)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "AnnIvfIndex":
        with open(os.path.join(root, "manifest.json")) as f:
            return cls(spark, root, json.load(f))

    # ------------------------------------------------------------------ probe

    def probe_cells(self, query: list[float], n_probe: int) -> list[int]:
        q = np.asarray(query, dtype=np.float64)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        sims = self.centroids @ q
        return [int(c) for c in np.argsort(-sims)[:n_probe]]

    def prune_files(self, cells: list[int]) -> list[str]:
        """Manifest-level file skipping on the cell column — returns
        only files whose cell is probed (relative paths)."""
        want = set(cells)
        return [f["path"] for f in self.manifest["files"] if f["cell"] in want]

    def scan_cells(self, cells: list[int]) -> DataFrame:
        """Scan ONLY the probed cells' files (the pruned I/O path)."""
        paths = [os.path.join(self.root, p) for p in self.prune_files(cells)]
        if not paths:
            # empty-result schema from the manifest's pinned column
            # types (pre-pinning manifests fall back to the old
            # long-id/double-vec assumption)
            return self.spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(
                            self.manifest["id_col"],
                            T.DataType.fromDDL(
                                self.manifest.get("id_type", "bigint")
                            ),
                        ),
                        T.StructField(
                            self.manifest["vec_col"],
                            T.DataType.fromDDL(
                                self.manifest.get("vec_type", "array<double>")
                            ),
                        ),
                    ]
                ),
            )
        return self.spark.read.parquet(*paths).select(
            self.manifest["id_col"], self.manifest["vec_col"]
        )

    def topk(self, query: list[float], k: int = 10, n_probe: int = 4) -> DataFrame:
        """IVF probe: prune to n_probe cells' files, exact-cosine
        re-rank inside them (JVM expression — no Python in the ranking
        path)."""
        from ..operators.similarity import cosine_topk

        cells = self.probe_cells(query, n_probe)
        return cosine_topk(
            self.scan_cells(cells),
            self.manifest["id_col"],
            self.manifest["vec_col"],
            query,
            k,
        )
