"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (and the DuckDB
oracle); the scale path is hyperplane-LSH bucketing with multi-probe
(exact re-ranking inside candidate buckets). Dot products run JVM-side
via zip_with/aggregate — no Python in the data path.

Scale notes: brute force is a full scan per query — fine for batched
scoring (the scan is embarrassingly parallel, no shuffle). The LSH
path prunes the scan to matching buckets; bucket ids can be written as
a table column and used for manifest-level pruning so ANN probes read
only matching files.
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


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors into ``n_centroids``
    cells, probe the ``n_probe`` cells nearest the query, exact-rank
    inside them.

    The coarse quantizer is a deterministic random-projection codebook
    (unit Gaussian centroids, seeded) rather than trained k-means —
    assignment quality is what LSH gives, but the *query path* is the
    IVF shape: at scale the cell id is materialized as a table column,
    the table is clustered on it, and a probe reads only
    n_probe/n_centroids of the files via manifest pruning (the same
    file-skipping path IceMiniTable.prune_entries implements for
    n_tok). Assignment is one Arrow-batched numpy matmul per partition
    (vectorized pandas UDF); ranking reuses the JVM cosine expression.
    """
    from pyspark.sql import types as T

    dim = len(query)
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def _cell(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)  # (batch, dim)
        sims = mat @ cents.T  # cosine ∝ dot: centroids are unit-norm
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(sims, norms, out=sims, where=norms > 0)
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    q = np.asarray(query, dtype=np.float64)
    qsims = cents @ (q / np.linalg.norm(q))
    probe_cells = [int(c) for c in np.argsort(-qsims)[:n_probe]]

    candidates = (
        df.select(F.col(id_col), F.col(vec_col), _cell(F.col(vec_col)).alias("__cell"))
        .where(F.col("__cell").isin(probe_cells))
    )
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
