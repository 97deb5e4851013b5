"""Deduplication operators for training-data pipelines.

Beyond the reference's whole-row duplicate count (SURVEY.md §2.2 P3),
a 100 TB corpus needs near-duplicate detection. All variants are
DataFrame-first; Python only ever touches data through one Arrow
pandas_udf (SimHash bit-packing).

- **Exact**: hash-groupBy on the chosen key columns — one shuffle.
- **MinHash + LSH**: shingle → minhash → band → bucket-join. The
  signature is computed MAP-SIDE with ``array_min(transform(...))``
  over the shingle array (no explode, no shuffle until the band join);
  only candidate pairs from shared LSH buckets are verified with exact
  Jaccard. This is the standard web-scale dedup shape: the shuffle
  volume is #docs × #bands tiny rows, never #docs × #shingles.
- **SimHash**: token hashes JVM-side, 64-bit sign-sum packed in one
  vectorized pandas_udf (np.add.reduceat over the Arrow batch).
- **N-gram Jaccard**: exact pairwise similarity via shingle explode +
  self-join — the verification oracle for the approximate variants.
- **Embedding cosine**: random-hyperplane LSH buckets (deterministic,
  seeded) + exact cosine verification; brute-force path for oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------ shingles


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a text column, JVM-side:
    split → sliding window via sequence+slice → concat_ws."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(toks)
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] — texts
    # shorter than k tokens must yield an empty shingle set instead
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )).otherwise(F.array().cast("array<string>"))


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan has fewer partitions than cores —
    a small table read from one parquet file would otherwise pin every
    map-side UDF/shingle pass to a single task. A real warehouse-scale
    input already has ≥cores partitions, so this is a no-op (no shuffle)
    there."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --------------------------------------------------------------------- exact


def exact_dedup_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Single row (row_count, distinct_count, duplicate_count) over the
    key columns (all columns when None) — one hash aggregation."""
    keyed = df.select(*cols) if cols else df
    total = df.agg(F.count(F.lit(1)).alias("row_count"))
    distinct = keyed.dropDuplicates().agg(F.count(F.lit(1)).alias("distinct_count"))
    return total.crossJoin(distinct).select(
        "row_count",
        "distinct_count",
        (F.col("row_count") - F.col("distinct_count")).alias("duplicate_count"),
    )


def exact_dedup(df: DataFrame, keys: list[str], order_by: str) -> DataFrame:
    """Keep exactly one row per key (smallest ``order_by`` wins) — a
    single shuffle on the keys; deterministic under re-runs."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.asc(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------- MinHash + LSH


_MAX_LONG = (1 << 63) - 1
_MERSENNE31 = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> np.ndarray:
    """Seeded ODD multipliers for multiply-shift hashing: h_i(x) =
    (a_i·x mod 2⁶⁴) >> 33 — one wrap-around multiply + one shift per
    (shingle, permutation), ~2× cheaper than mod-prime and still a
    universal family (Dietzfelbinger multiply-shift)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * 2 + 1


def minhash_signature(
    col: Column, num_perm: int = 64, k: int = 3, impl: str = "arrow"
) -> Column:
    """num_perm-wide MinHash signature computed entirely map-side.

    ``impl="arrow"`` (default, the bench winner): shingles are hashed to
    64 bits JVM-side (one xxhash64 per shingle), then ONE Arrow
    pandas_udf derives all permutations with universal hashing —
    sig[i] = min over shingles of (a_i·h + b_i) mod 2³¹−1 — as a single
    ``minimum.reduceat`` over the whole batch. Catalyst never sees an
    O(num_perm) expression tree, and the numpy inner loop is ~C speed.

    ``impl="expr"`` keeps the pure-JVM fold: ONE ``aggregate`` over the
    shingle array with an array accumulator, sig[i] = min xxhash64(s, i)
    (64 separate array_min(transform(...)) exprs would inline and
    recompute the shingling per permutation — a 64× blowup Catalyst
    does not eliminate). Correct but interpreter-bound at ~num_perm ×
    #shingles expression evaluations per row.

    Rows with no shingles get the sentinel all-_MAX_LONG signature in
    both impls (callers filter empty shingle sets before LSH anyway).
    """
    if impl == "expr":
        sh = word_shingles(col, k)
        perms = F.sequence(F.lit(0), F.lit(num_perm - 1))
        init = F.array_repeat(F.lit(_MAX_LONG), num_perm)
        return F.aggregate(
            sh,
            init,
            lambda acc, s: F.zip_with(
                acc, perms, lambda m, i: F.least(m, F.xxhash64(s, i))
            ),
        )

    shingle_hashes = F.transform(word_shingles(col, k), lambda s: F.xxhash64(s))
    return minhash_signature_from_hashes(shingle_hashes, num_perm)


def minhash_signature_from_hashes(hashes: Column, num_perm: int = 64) -> Column:
    """Arrow-path signature over an existing array<long> of shingle
    hashes — lets callers that also need the shingle set for exact
    verification compute the (expensive) shingling exactly once."""
    a = _minhash_params(num_perm)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        lens = hashes.map(len).to_numpy(dtype=np.int64)
        out = np.full((len(hashes), num_perm), _MAX_LONG, dtype=np.int64)
        nz_idx = np.flatnonzero(lens)
        # chunk by shingle count so the (shingles × num_perm) working
        # matrix stays ~tens of MB regardless of Arrow batch size
        chunk_budget = 1 << 17
        start = 0
        while start < nz_idx.size:
            end, tot = start, 0
            while end < nz_idx.size and (tot == 0 or tot + lens[nz_idx[end]] <= chunk_budget):
                tot += lens[nz_idx[end]]
                end += 1
            rows = nz_idx[start:end]
            concat = np.concatenate(
                [np.asarray(hashes.iat[i], dtype=np.int64) for i in rows]
            ).view(np.uint64)
            # multiply-shift: wrap-around uint64 multiply, keep top 31
            vals = (concat[:, None] * a[None, :]) >> np.uint64(33)
            offsets = np.zeros(rows.size, dtype=np.int64)
            np.cumsum(lens[rows][:-1], out=offsets[1:])
            out[rows] = np.minimum.reduceat(vals, offsets, axis=0).astype(np.int64)
            start = end
        return pd.Series(list(out))

    return _sig(hashes)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard) with jaccard ≥
    threshold, found via banded MinHash-LSH then verified exactly.

    Plan shape: one map-side pass builds (id, shingles, signature); the
    band explode shuffles #docs × bands tiny rows; the bucket self-join
    emits candidates; exact Jaccard verification joins the (small)
    candidate set back to the shingle arrays. With bands=16 over 64
    perms (r=4), P(candidate | j=0.7) ≈ 1−(1−0.7⁴)¹⁶ ≈ 0.99.
    """
    r = num_perm // bands
    df = _spread_small_input(df)
    # shingle ONCE, as 64-bit hashes: the hash array serves BOTH the
    # signature UDF and the exact-Jaccard verification (Jaccard over
    # distinct shingle hashes ≡ Jaccard over shingles, collisions
    # vanishingly unlikely), and an array<long> is far cheaper to
    # persist/join than the shingle strings
    hashed = df.select(
        F.col(id_col).alias("__id"),
        F.transform(word_shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias(
            "__sh"
        ),
    ).where(F.size("__sh") > 0)
    base = hashed.select(
        "__id", "__sh", minhash_signature_from_hashes(F.col("__sh"), num_perm).alias("__sig")
    )
    # the frame feeds THREE plan branches (band explode + both sides of
    # the verification join); persist EAGERLY — Spark's lazy cache fills
    # per-partition, so concurrent downstream stages of one action would
    # otherwise each recompute the signature UDF before the cache lands.
    # At warehouse scale a pipeline would materialize signatures to a
    # table, which this persist stands in for.
    base = base.persist()
    base.count()

    # all band hashes in ONE expression over the signature (16 separate
    # slice exprs would inline and re-evaluate the signature per band),
    # then posexplode → (band index, band hash)
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(F.slice("__sig", b * r + 1, r)),
    )
    banded = base.select(
        "__id", F.posexplode(band_arr).alias("band", "bh")
    )

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )

    sh = base.select("__id", "__sh")
    verified = (
        candidates.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


# ------------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 3,
    max_docs: int | None = 20_000,
) -> DataFrame:
    """EXACT pairwise Jaccard over word k-gram shingles — shingle
    explode + self-join + per-pair intersection count. Quadratic in
    co-bucketed docs; this is the oracle/verification path, the scale
    path is minhash_dedup_pairs.

    ``max_docs`` guards the quadratic blowup: inputs above it raise
    (pass ``max_docs=None`` to force an unbounded run). The default of
    20k docs bounds the candidate space at ~2×10⁸ comparisons."""
    if max_docs is not None:
        n_docs = df.count()
        if n_docs > max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs is the exact QUADRATIC oracle path and got "
                f"{n_docs} docs (> max_docs={max_docs}). Use minhash_dedup_pairs "
                f"for large corpora, or pass max_docs=None to force."
            )
    sh = _spread_small_input(df).select(
        F.col(id_col).alias("__id"), word_shingles(F.col(text_col), k).alias("__sh")
    ).where(F.size("__sh") > 0)
    sh = sh.persist()  # explode + sizes + two join sides reuse it
    sh.count()
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    ex = sh.select("__id", F.explode("__sh").alias("s"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"__id": "id_a", "__n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"__id": "id_b", "__n": "n_b"}), "id_b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -------------------------------------------------------------------- SimHash


@F.pandas_udf(T.LongType())
def _pack_simhash(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-token 64-bit hashes: per bit, sign of the
    Σ(±1) vote. Vectorized over the whole Arrow batch with reduceat."""
    lens = hashes.map(len).to_numpy(dtype=np.int64)
    out = np.zeros(len(hashes), dtype=np.uint64)
    nz = lens > 0
    if nz.any():
        concat = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in hashes[nz]]
        ).view(np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((concat[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1
        offsets = np.zeros(nz.sum(), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=offsets[1:])
        votes = np.add.reduceat(bits, offsets, axis=0)  # (docs, 64)
        packed = (votes > 0).astype(np.uint64) << shifts
        out[nz] = packed.sum(axis=1, dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def simhash(col: Column) -> Column:
    """SimHash column expression: token hashes JVM-side (split +
    transform(xxhash64)), one Arrow UDF packs the 64 bit-votes."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _pack_simhash(hashes)


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: 4 rotations of ``prefix_bits``-bit prefixes (any pair
    within Hamming 3 of each other shares at least one of 4 disjoint
    16-bit blocks unchanged — pigeonhole) → bucket join → exact
    popcount filter via bit_count(xor)."""
    base = _spread_small_input(df).select(
        F.col(id_col).alias("__id"), simhash(F.col(text_col)).alias("__sh")
    )
    # feeds both sides of the bucket self-join → eager persist so the
    # token hashing + SimHash UDF runs once per row (lazy cache would
    # race between the join's two scan stages)
    base = base.persist()
    base.count()
    blocks = base.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("__sh", b * prefix_bits)
                        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                        .alias("key"),
                    )
                    for b in range(64 // prefix_bits)
                ]
            )
        ).alias("bb"),
    ).select("__id", "__sh", "bb.blk", "bb.key")
    pairs = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# ------------------------------------------------------- embedding near-dups


def lsh_planes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Seeded random hyperplanes, shared by the bucket UDF and by
    driver-side query bucketing (similarity.ann_topk)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def embedding_lsh_bucket(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (sign bits packed to a long);
    deterministic via seeded plane generation.

    One Arrow pandas_udf computes sign(X @ P.T) bit-packed for the whole
    batch — the planes live in the UDF closure, so the Catalyst plan
    carries ZERO plane literals and the cost is one (batch × dim) @
    (dim × n_planes) BLAS matmul. (The previous expression-tree variant
    inlined O(n_planes × dim) literals + per-plane aggregate folds,
    which blows up the plan at real embedding dims of 768–4096.)"""
    if not 0 < n_planes <= 62:
        raise ValueError("n_planes must be in 1..62 to pack into a long")
    planes_t = lsh_planes(n_planes, dim, seed).T  # (dim, n_planes)
    weights = np.left_shift(np.uint64(1), np.arange(n_planes, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def _bucket(vs: pd.Series) -> pd.Series:
        n = len(vs)
        out = np.empty(n, dtype=np.int64)
        vals = vs.to_numpy()
        # chunk rows so the dense X matrix stays ~32 MB even at dim=4096
        step = max(1, (1 << 22) // max(dim, 1))
        for s in range(0, n, step):
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in vals[s : s + step]])
            bits = (X @ planes_t) > 0
            out[s : s + step] = (bits * weights).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return _bucket(vec)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    brute_force: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold.

    Default: hyperplane-LSH bucket join (collision prob for cosine 0.95
    on 12 planes ≈ (1−θ/π)¹² ≈ 0.67, so run with brute_force=True when
    recall must be exact — that is also the DuckDB-oracle path)."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = _spread_small_input(df).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), norm.alias("__n")
    )
    if not brute_force:
        base = base.withColumn(
            "__b", embedding_lsh_bucket(F.col("__v"), dim, n_planes)
        ).persist()  # both sides of the bucket self-join reuse it
        base.count()
        joined = base.alias("a").join(
            base.alias("b"),
            (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__id") < F.col("b.__id")),
        )
    else:
        joined = base.alias("a").join(
            base.alias("b"), F.col("a.__id") < F.col("b.__id")
        )
    dot = F.aggregate(
        F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (dot / (F.col("a.__n") * F.col("b.__n"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
