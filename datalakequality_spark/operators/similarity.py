"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (and the DuckDB
oracle); the scale path is hyperplane-LSH bucketing with multi-probe
(exact re-ranking inside candidate buckets). Dot products run JVM-side
via zip_with/aggregate — no Python in the data path.

Scale notes: brute force is a full scan per query — fine for batched
scoring (the scan is embarrassingly parallel, no shuffle). The LSH and
IVF paths prune the *compute* to matching buckets/cells; the *I/O*
pruning — reading only matching files — is sources/annindex.AnnIvfIndex,
which materializes the IVF cell id as a table column, clusters files on
it, and manifest-prunes probes (tested: probed files < total files).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module scope: pandas_udf resolves stringified hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import embedding_lsh_bucket, lsh_planes


def _lit_array(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def cosine_to_query(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of an embedding column against one query
    vector, as a single JVM expression."""
    q = _lit_array(query)
    qnorm = float(np.linalg.norm(query))
    dot = F.aggregate(
        F.zip_with(vec, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    vnorm = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return dot / (vnorm * F.lit(qnorm))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k by cosine similarity; deterministic tie-break
    on the id column. One scan, a TakeOrdered at the end — no shuffle
    of the data itself."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_codebook(n_centroids: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic random-projection codebook (unit Gaussian
    centroids) — the untrained baseline a trained quantizer must beat
    (tests/test_training_ops.py recall comparison)."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    train_sample_rows: int = 4096,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors into ``n_centroids``
    cells, probe the ``n_probe`` cells nearest the query, exact-rank
    inside them.

    The coarse quantizer defaults to spherical k-means trained on a
    bounded driver-side sample (sources/annindex.train_kmeans —
    deterministic Lloyd's); pass ``centroids`` to reuse a codebook
    (e.g. ``random_codebook`` for the untrained baseline). Assignment
    is one Arrow-batched numpy matmul per partition (vectorized pandas
    UDF, centroids closure-captured — no plan literals); ranking reuses
    the JVM cosine expression.

    This is the compute-only shape: every row is still scanned to be
    assigned. The I/O-pruned shape — the one that matters at 100 TB —
    is sources/annindex.AnnIvfIndex, which materializes the cell id as
    a table column, clusters files on it, and reads only the probed
    cells' files via manifest pruning.
    """
    from ..sources.annindex import cell_assign_udf, train_kmeans

    if centroids is None:
        sample = df.select(vec_col).limit(train_sample_rows).toPandas()
        centroids = train_kmeans(
            np.asarray(sample[vec_col].tolist(), dtype=np.float64),
            n_centroids,
            seed=seed,
        )
    cents = np.asarray(centroids, dtype=np.float64)

    q = np.asarray(query, dtype=np.float64)
    qsims = cents @ (q / np.linalg.norm(q))
    probe_cells = [int(c) for c in np.argsort(-qsims)[:n_probe]]

    candidates = df.select(
        F.col(id_col),
        F.col(vec_col),
        cell_assign_udf(cents)(F.col(vec_col)).alias("__cell"),
    ).where(F.col("__cell").isin(probe_cells))
    return cosine_topk(candidates, id_col, vec_col, query, k)


def ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket + multi-probe.

    Candidates = rows whose bucket id is within ``max_hamming`` sign
    flips of the query's bucket (probing all near buckets recovers most
    of the recall LSH loses); exact cosine re-ranks the candidates.
    """
    dim = len(query)
    planes = lsh_planes(n_planes, dim, seed)
    signs = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qbits = int((signs << np.arange(n_planes)).sum())

    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        embedding_lsh_bucket(F.col(vec_col), dim, n_planes, seed).alias("__b"),
    )
    candidates = bucketed.where(
        F.bit_count(F.col("__b").bitwiseXOR(F.lit(qbits))) <= max_hamming
    )
    return cosine_topk(candidates, id_col, vec_col, query, k)
