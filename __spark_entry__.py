"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one named DataFrame query per implemented operator
(SURVEY.md §2); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query. Column names
and rounding are aligned on both sides; the driver compares row count,
schema and an order-insensitive value hash at sf0.01.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


LINEITEM_NUM_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


# --------------------------------------------------------------------- queries


def q_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.profiling import profile_summary_df

    return profile_summary_df(_t(spark, sf_dir, "events"))


def q_missing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.profiling import missing_by_column_df

    return missing_by_column_df(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "value")
    )


def q_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.profiling import numeric_stats_df

    return numeric_stats_df(
        _t(spark, sf_dir, "lineitem").select(*LINEITEM_NUM_COLS)
    )


def q_unique_key_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SURVEY.md §2.3 C3 — pandas-duplicated() semantics: rows beyond the
    # first occurrence per value; the null group counts as one value.
    df = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return df.agg(
        (
            n
            - F.countDistinct("l_orderkey")
            - F.least(n - F.count("l_orderkey"), F.lit(1))
        )
        .cast("long")
        .alias("duplicate_count")
    ).select(F.lit("l_orderkey").alias("column_name"), "duplicate_count")


def q_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.outliers import outlier_counts_df

    return outlier_counts_df(
        _t(spark, sf_dir, "lineitem").select(*LINEITEM_NUM_COLS)
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.drift import histogram_df

    return histogram_df(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


def q_pii_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.pii import pii_flags_df

    d = _t(spark, sf_dir, "documents").select(
        "text",
        F.concat(
            F.lit("contact: user"), F.col("doc_id").cast("string"), F.lit("@example.org")
        ).alias("synth_contact"),
        F.concat(
            F.lit("acct "),
            F.lpad((F.col("doc_id") + F.lit(10_000_000_000)).cast("string"), 12, "0"),
        ).alias("synth_account"),
    )
    return pii_flags_df(d)


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D1–D5 end-to-end: baseline from even orderkeys, current = odd;
    # PSI under np.histogram bucket semantics (drift.py kernels)
    from datalakequality_spark.operators.drift import (
        analyze_drift_against_baseline,
        build_numeric_baseline,
    )

    li = _t(spark, sf_dir, "lineitem")
    base = li.where(F.col("l_orderkey") % 2 == 0).select("l_quantity")
    cur = li.where(F.col("l_orderkey") % 2 == 1).select("l_quantity")
    baseline = build_numeric_baseline(base, ["l_quantity"])
    res = analyze_drift_against_baseline(cur, baseline)
    row = res["columns"][0]
    return spark.createDataFrame(
        [(row["column"], round(row["psi"], 6), row["psi_severity"])],
        "column_name string, psi double, psi_severity string",
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1-shaped aggregation — wide grouped agg, map-side combine.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join chain with a broadcast-able dimension: customer ⋈ orders ⋈
    # lineitem, revenue top-10; deterministic tie-break on c_custkey.
    # No forced broadcast hint: customer is only "small" at bench SFs —
    # at 100× a hard hint would OOM the driver. AQE's size-gated
    # runtime re-plan broadcasts it when (and only when) it fits
    # (tests/test_plans.py pins that it DOES broadcast at test SF).
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


def q_autofix_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 (median impute) + A2 (IQR clip on the imputed series) end to
    # end through the real operator; nulls planted deterministically so
    # the impute path is exercised (events.value has none natively).
    # Reference semantics: backend/app/main.py:146-165.
    from datalakequality_spark.operators.autofix import AutofixOptions, apply_autofix

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    fixed = apply_autofix(
        ev,
        AutofixOptions(
            fill_categorical_missing=False, parse_dates=False, mask_pii=False
        ),
    )
    # apply_autofix promotes every numeric column to double for the IQR
    # clip; event_id is a key, not a measure — restore its storage type
    # so the result schema matches the oracle's BIGINT
    return fixed.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.round(F.col("value").cast("double"), 6).alias("fixed_value"),
    )


def q_contract_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C5 — contract suggestion inputs: required = missing_ratio < 0.5,
    # unique-key candidate = non-null distinct == row count (reference
    # backend/app/core/contracts.py:114-155). Nulls planted on `value`
    # so the required/unique flags vary across columns.
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    )
    # ONE wide agg + stack (the profiling.py pattern) — a per-column
    # agg-union would scan events once per column
    cols = ["event_id", "event_type", "user_id", "value"]
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"cnt::{c}"))
        aggs.append(F.countDistinct(c).alias(f"uniq::{c}"))
    wide = ev.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `cnt::{c}`, `uniq::{c}`" for c in cols)
    long = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (column_name, cnt, uniq)", "`__total`"
    )
    return long.select(
        "column_name",
        F.round((F.col("__total") - F.col("cnt")) / F.col("__total"), 6).alias(
            "missing_ratio"
        ),
        ((F.col("__total") - F.col("cnt")) / F.col("__total") < 0.5)
        .cast("int")
        .alias("is_required"),
        (F.col("uniq") == F.col("__total")).cast("int").alias("is_unique_key"),
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # grouping-sets surface (SURVEY §2.11): ROLLUP over
    # (l_returnflag, l_linestatus) with subtotal rows tagged by
    # grouping id — one shuffle, map-side partial aggregation.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full grouping-sets surface (SURVEY §2.11): CUBE over
    # (l_returnflag, l_linestatus) — all four grouping sets incl. the
    # per-linestatus-only marginals ROLLUP lacks — subtotals tagged by
    # grouping id; still one shuffle with map-side partial aggregation.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


# ----------------------------------------------- training-data pipeline ops


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-duplicates of the first 20 docs (deterministic
    suffix edit) — gives the dedup operators true positives to find."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (
        d.where(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" near duplicate suffix")))
    )
    return d.unionByName(dup)


def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.dedup import exact_dedup_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.where(F.col("doc_id") < 15).withColumn(
        "doc_id", F.col("doc_id") + F.lit(2_000_000)
    )
    return exact_dedup_stats(d.unionByName(planted), cols=["text"])


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact quadratic oracle path — capped to a fixed 500-doc slice so
    # the benched cost is scale-invariant (the full set is a no-op at
    # sf0.01; the scale path for full corpora is minhash_dedup).
    from datalakequality_spark.operators.dedup import ngram_jaccard_pairs

    capped = _docs_with_planted_dups(spark, sf_dir).where(
        (F.col("doc_id") < 500) | (F.col("doc_id") >= 1_000_000)
    )
    return ngram_jaccard_pairs(capped, "doc_id", "text", threshold=0.6, k=3)


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FULL-corpus banded MinHash-LSH run (the compute is unchanged from
    # the rows-only era), with the result restricted to the same capped
    # doc set the exact ngram_jaccard oracle covers: pair discovery is
    # per-pair (shared LSH bucket), so the restriction of the full run
    # equals a capped run, and the DuckDB exact-Jaccard truth set is the
    # oracle — hash_match=true certifies BOTH recall=1.0 and precision=
    # 1.0 on the capped slice, plus bitwise-equal jaccard values.
    from datalakequality_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        _docs_with_planted_dups(spark, sf_dir), "doc_id", "text", threshold=0.6
    )
    capped = lambda c: (F.col(c) < 500) | (F.col(c) >= 1_000_000)  # noqa: E731
    out = pairs.where(capped("id_a") & capped("id_b"))
    out._dlq_persisted = getattr(pairs, "_dlq_persisted", [])  # keep release()able
    return out


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # INCREMENTAL dedup against a persisted signature store
    # (sources/sigstore.MinHashStore): batch A (even doc_ids) is signed
    # once into the store; batch B (odd doc_ids + planted near-dups of
    # A docs) is deduped against it WITHOUT recomputing any stored
    # signature — the store side is pure JVM over persisted sig/sh
    # columns. Output = verified pairs touching B, restricted to the
    # capped slice where the DuckDB exact-Jaccard truth is enumerable;
    # pairs re-ordered numerically (the store keys ids as strings).
    from datalakequality_spark.sources.sigstore import MinHashStore

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = d.where(F.col("doc_id") % 2 == 0)
    planted = a.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" near duplicate suffix")).alias("text"),
    )
    b = d.where(F.col("doc_id") % 2 == 1).unionByName(planted)

    root = _seq_table_tmpdir("dlq-sig-q-")
    store = MinHashStore.create(spark, root)
    store.add_batch(a, "doc_id", "text")
    pairs = store.dedup_batch(b, "doc_id", "text", threshold=0.6)
    ia, ib = F.col("id_a").cast("long"), F.col("id_b").cast("long")
    out = pairs.select(
        F.least(ia, ib).alias("id_a"),
        F.greatest(ia, ib).alias("id_b"),
        "jaccard",
    ).where(
        ((F.col("id_a") < 500) | (F.col("id_a") >= 1_000_000))
        & ((F.col("id_b") < 500) | (F.col("id_b") >= 1_000_000))
    )
    out._dlq_persisted = getattr(pairs, "_dlq_persisted", [])
    return out


def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FULL-corpus SimHash run; the oracle-checked slice is the planted
    # near-dup pairs over docs with ≥20 whitespace tokens — a 3-token
    # suffix on shorter docs is a >15% edit, outside SimHash's
    # hamming≤6 near-dup radius (measured: such pairs land at hamming
    # 7–9), so the ≥20-token planted set is exactly what a correct
    # SimHash MUST recover. The truth set is pure SQL over documents.
    from datalakequality_spark.operators.dedup import simhash_dup_pairs
    from datalakequality_spark.operators.textanalysis import token_count

    pairs = simhash_dup_pairs(
        _docs_with_planted_dups(spark, sf_dir), "doc_id", "text", max_hamming=6
    )
    long_docs = (
        _t(spark, sf_dir, "documents")
        .where((F.col("doc_id") < 20) & (token_count(F.col("text")) >= 20))
        .select(F.col("doc_id").alias("id_a"))
    )
    out = (
        pairs.where(F.col("id_b") == F.col("id_a") + 1_000_000)
        .join(long_docs, "id_a")
        .select("id_a", "id_b")
    )
    out._dlq_persisted = getattr(pairs, "_dlq_persisted", [])  # keep release()able
    return out


def q_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine hash differs from DuckDB's, but GROUP SIZES are
    # hash-independent: plant exact copies, count duplicate groups
    from datalakequality_spark.operators.textanalysis import content_fingerprint

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.where(F.col("doc_id") < 25).withColumn(
        "doc_id", F.col("doc_id") + F.lit(3_000_000)
    )
    both = d.unionByName(planted)
    groups = (
        both.select(content_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    return groups.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.sum("n").cast("long").alias("dup_rows"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.textanalysis import with_text_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_text_stats(d, "text").select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "avg_token_len",
        "digit_ratio",
        "stopword_ratio",
        "quality",
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.textanalysis import (
        bpe_ish_token_count,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_ish"),
    )


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.textanalysis import lang_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("pred_lang")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    return cosine_topk(emb, "vec_id", "embedding", query, k=10)


def q_embedding_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakequality_spark.operators.dedup import embedding_dup_pairs

    emb = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
    )
    planted = emb.withColumn("vec_id", F.col("vec_id") + F.lit(100_000))
    both = emb.unionByName(planted)
    return embedding_dup_pairs(
        both, "vec_id", "embedding", dim=64, threshold=0.99, brute_force=True
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANN over embeddings ∪ 10 planted near-neighbors of the query
    # (qv + 0.15·vec_j, cosine ≈ 0.989 — IEEE-double arithmetic DuckDB
    # reproduces bit-for-bit), so the true top-10 is dominated by
    # genuinely-near vectors that multi-probe LSH must recover; the
    # oracle is the brute-force SQL top-10 over the same augmented set.
    # hash_match=true certifies the ANN result EQUALS exact brute force.
    from datalakequality_spark.operators.similarity import ann_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qlit = F.array(*[F.lit(float(v)) for v in query])
    planted = (
        emb.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= 10))
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.zip_with(
                qlit, F.col("embedding"), lambda q, n: q + F.lit(0.15) * n
            ).alias("embedding"),
        )
    )
    both = emb.unionByName(planted)
    return ann_topk(both, "vec_id", "embedding", query, k=10, max_hamming=3)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gaps-and-islands sessionization (operators/sessions.py): one
    # shuffle on user_id, two window passes, microsecond-exact gaps.
    from datalakequality_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, "user_id", "ts", gap_seconds=1800).select(
        "user_id",
        "session_id",
        "n_events",
        F.round("span_seconds", 6).alias("span_seconds"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # as-of join via the union-and-carry-forward plan (ONE shuffle,
    # O(n) per key) — each purchase gets the latest click at-or-before
    # it for the same user; DuckDB's native ASOF JOIN is the oracle.
    from datalakequality_spark.operators.sessions import asof_join, ts_micros

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    j = asof_join(purchases, clicks, "user_id", "ts", ["click_id", "value"])
    return j.select(
        "event_id",
        "user_id",
        F.col("asof_click_id").alias("click_event_id"),
        F.round("asof_value", 6).alias("click_value"),
        (ts_micros(j, "ts") - ts_micros(j, "asof_ts")).alias("gap_us"),
    )


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-window context chunking (map-side explode, no shuffle);
    # window=16 so sf0.01 docs split into several chunks each.
    from datalakequality_spark.operators.textanalysis import pack_chunks, token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_toks")
    )
    out = pack_chunks(d, "doc_id", "n_toks", window=16)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )


def _mk(rows: DataFrame, raw_id, n_tok, mult: int, source) -> DataFrame:
    """Deterministic tokenized sequences from a `documents` projection —
    SQL-reproducible (tokens[i] = (raw_id*mult + i) % 50257), so DuckDB
    oracles can certify token arrays via their sum.

    NOTE: each select pre-projects `raw_id` under a name distinct
    from the output `doc_id` alias — Spark's lateral-column-alias
    resolution would otherwise bind `doc_id` inside the token lambda
    to the freshly aliased STRING column, silently shifting the
    insert ids (observed: tokens computed off raw_id + 2,000,000)."""
    base = rows.select(
        raw_id.cast("long").alias("raw_id"),
        n_tok.cast("int").alias("nt"),
        source.alias("src"),
    )
    return base.select(
        F.col("raw_id").cast("string").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.col("nt")),
            lambda i: ((F.col("raw_id") * mult + i) % 50257).cast("int"),
        ).alias("tokens"),
        F.col("nt").alias("n_tok"),
        F.col("src").alias("source"),
    )


def _seq_table_tmpdir(prefix: str) -> str:
    """Fresh temp table dir on tmpfs when present (the query measures
    plan execution, not the sandbox's single virtio disk); sweeps stale
    dirs from PRIOR invocations — the returned DataFrame still scans
    this dir, so it can only be reclaimed lazily."""
    import glob as _glob
    import shutil as _shutil
    import tempfile

    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    for stale in _glob.glob(os.path.join(tmp_base, f"{prefix}*")):
        _shutil.rmtree(stale, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=tmp_base)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # THE north_rule flagship op in the correctness gate: a REAL
    # copy-on-write MERGE INTO through IceMiniTable (manifest pruning,
    # affected-file discovery, conflict-checked commit), on sequences
    # derived deterministically from `documents` so plain SQL can
    # reproduce the merged state. tok_sum certifies the token arrays
    # element-wise (token-array-equality invariant, summed).
    from datalakequality_spark.maintenance.merge import merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 7919) % 509 + 1, 31, F.col("source")
    )
    updates = _mk(
        d.where(F.col("doc_id") % 3 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 7919) % 509 + 8,
        37,
        F.col("source"),
    )
    inserts = _mk(
        d.where(F.col("doc_id") < 50),
        F.col("doc_id") + 1_000_000,
        F.col("doc_id") % 97 + 1,
        41,
        F.lit("new"),
    )

    root = _seq_table_tmpdir("dlq-merge-q-")
    t = IceMiniTable.create(spark, root)
    n_docs = d.count()
    t.append(target, target_file_rows=max(1, n_docs // 8))
    # At the correctness-gate scale (sf0.01), max_batch_files=4 forces
    # the BATCHED commit path (per-batch lineage + key→batch side-table
    # + trailing insert commit) through the oracle — batched content
    # must equal the single-commit SQL. At bench scale the engine runs
    # its natural default (256 affected files per commit): a table this
    # size single-commits, exactly as a user's merge would.
    merge_into(
        t,
        updates.unionByName(inserts),
        max_batch_files=4 if n_docs <= 1000 else 256,
    )
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_maintain_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The OTHER north_rule flagship in the correctness gate: the fused
    # bin-packing compaction + Z-order clustering rewrite WITH the
    # per-file quality gate (maintenance/clustering.rewrite_sorted) on a
    # real IceMiniTable written as 48 small files. The rewrite must be
    # content-invariant — same rows, same token arrays, only layout
    # changes — so the oracle is simply the input relation re-derived in
    # SQL; tok_sum certifies the token arrays survived byte-for-byte
    # (token-array-equality invariant, summed).
    from datalakequality_spark.maintenance.clustering import rewrite_sorted
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 6151) % 421 + 1, 29, F.col("source")
    )
    n_docs = d.count()
    root = _seq_table_tmpdir("dlq-rewrite-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, n_docs // 48))
    # max_shard_rows forces ≥3 independently-committed shards, so the
    # oracle certifies the SHARDED rewrite path's content invariance
    rewrite_sorted(
        t,
        method="zorder",
        target_rows_per_file=max(1, n_docs // 6),
        quality_gate=True,
        max_shard_rows=max(1, n_docs // 3),
    )
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Copy-on-write DELETE in the correctness gate: takedown/
    # contamination removal (Iceberg DELETE FROM ... WHERE) on a real
    # IceMiniTable — affected-file discovery over input_file_name(),
    # survivors-only rewrite, conflict-checked commit. The oracle is
    # the complement re-derived in SQL; tok_sum certifies the surviving
    # token arrays (token-array-equality invariant, summed).
    from datalakequality_spark.maintenance.merge import delete_where
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 3571) % 347 + 1, 19, F.col("source")
    )
    root = _seq_table_tmpdir("dlq-delete-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    delete_where(t, "n_tok % 5 = 0")
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_delete_where_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MERGE-ON-READ DELETE in the correctness gate: the takedown writes
    # O(matched keys) equality-delete bytes — ZERO data files rewritten
    # (asserted here: the live data file set is unchanged) — and the
    # scan anti-joins the delete files out (sources/icemini.py
    # _read_with_deletes, seq-ordered). The oracle is the same SQL
    # complement as the copy-on-write path: both modes must produce
    # identical logical content; only the physical strategy differs.
    from datalakequality_spark.maintenance.merge import delete_where
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 2143) % 331 + 1, 13, F.col("source")
    )
    root = _seq_table_tmpdir("dlq-delmor-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    data_paths = t.live_paths()
    r = delete_where(t, "n_tok % 6 = 0", mode="merge_on_read")
    assert r["rewritten_files"] == 0 and t.live_paths() == data_paths
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MERGE-ON-READ MERGE in the correctness gate (the Flink-on-Iceberg
    # upsert shape): ONE commit of equality-delete files (the source
    # keys) + appended data files — ZERO target files rewritten
    # (asserted: every pre-merge data file is still live) — with the
    # matched rows suppressed at scan time by the seq-ordered
    # anti-join. The oracle is the SAME merged-state SQL as the
    # copy-on-write path: both modes must produce identical logical
    # content; only the physical strategy (O(source) appended bytes vs
    # affected-file rewrite) differs.
    from datalakequality_spark.maintenance.merge import merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 5519) % 443 + 1, 43, F.col("source")
    )
    updates = _mk(
        d.where(F.col("doc_id") % 4 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 5519) % 443 + 9,
        47,
        F.col("source"),
    )
    inserts = _mk(
        d.where(F.col("doc_id") < 60),
        F.col("doc_id") + 3_000_000,
        F.col("doc_id") % 83 + 1,
        53,
        F.lit("new"),
    )
    root = _seq_table_tmpdir("dlq-mergemor-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    data_paths = t.live_paths()
    r = merge_into(t, updates.unionByName(inserts), mode="merge_on_read")
    assert r["rewritten_files"] == 0 and data_paths <= t.live_paths()
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_compact_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DELETE-FILE COMPACTION in the correctness gate: two trickle
    # merge-on-read upserts (overlapping hot keys) plus a merge-on-read
    # DELETE build an equality-delete backlog; compact_delete_files
    # consolidates it (subsumption + Bloom-probed dead-key drop +
    # seq-lift) and the scan afterwards must equal the plain-SQL merged
    # state — the oracle certifies the consolidation changed NOTHING
    # logically while the assertion pins that it shrank the backlog.
    from datalakequality_spark.maintenance.compaction import (
        compact_delete_files,
    )
    from datalakequality_spark.maintenance.merge import delete_where, merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 6007) % 457 + 1, 59, F.col("source")
    )
    m1 = _mk(
        d.where(F.col("doc_id") % 10 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 6007) % 457 + 4,
        61,
        F.col("source"),
    )
    m2 = _mk(
        d.where(F.col("doc_id") % 5 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 6007) % 457 + 7,
        67,
        F.col("source"),
    )
    root = _seq_table_tmpdir("dlq-cdel-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    merge_into(t, m1, mode="merge_on_read")
    merge_into(t, m2, mode="merge_on_read")  # m1 ⊆ m2: m2 supersedes m1
    delete_where(t, "n_tok % 9 = 0", mode="merge_on_read")
    backlog = len(t.live_delete_entries())
    r = compact_delete_files(t)
    assert r["skipped"] == 0 and len(t.live_delete_entries()) < backlog
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_merge_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Iceberg-style conditional MERGE in the correctness gate:
    # WHEN MATCHED AND s.n_tok > t.n_tok THEN UPDATE SET ... /
    # WHEN MATCHED AND t.n_tok % 5 = 0 THEN DELETE /
    # WHEN NOT MATCHED AND n_tok % 3 != 0 THEN INSERT — first-true
    # clause per row, through the real table path with the BATCHED
    # commit plan (max_batch_files=4 at gate scale), so batched
    # conditional content must equal the plain-SQL merge semantics.
    from datalakequality_spark.maintenance.merge import merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 4967) % 389 + 1, 17, F.col("source")
    )
    updates = _mk(
        d.where(F.col("doc_id") % 2 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 3571) % 389 + 1,
        23,
        F.col("source"),
    )
    inserts = _mk(
        d.where(F.col("doc_id") < 40),
        F.col("doc_id") + 2_000_000,
        F.col("doc_id") % 89 + 1,
        29,
        F.lit("new"),
    )
    root = _seq_table_tmpdir("dlq-mergecond-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    merge_into(
        t,
        updates.unionByName(inserts),
        max_batch_files=4,
        matched=[
            {
                "action": "update",
                "condition": "s.n_tok > t.n_tok",
                "set": {
                    "n_tok": "s.n_tok",
                    "tokens": "s.tokens",
                    "source": "'upgraded'",
                },
            },
            {"action": "delete", "condition": "t.n_tok % 5 = 0"},
        ],
        not_matched_condition="n_tok % 3 != 0",
    )
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Copy-on-write UPDATE in the correctness gate: predicate-addressed
    # SET (re-tag matching rows' source) through the real table path —
    # affected-file discovery, CASE-WHEN rewrite of only those files,
    # conflict-checked commit. Oracle = the same CASE in SQL; tok_sum
    # certifies the token arrays were NOT touched by the update.
    from datalakequality_spark.maintenance.merge import update_where
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 2677) % 311 + 1, 17, F.col("source")
    )
    root = _seq_table_tmpdir("dlq-update-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    update_where(t, "n_tok % 4 = 0", {"source": F.lit("redacted")})
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema-evolving MERGE in the correctness gate (Iceberg's
    # merge-schema write option): the source batch carries a `quality`
    # column the table lacks; merge_into(merge_schema=True) first
    # evolves the schema (metadata-only set-schema commit), then the
    # copy-on-write merge lands with the column populated — pre-existing
    # rows read null. The oracle re-derives the merged state with the
    # evolved column in plain SQL.
    from datalakequality_spark.maintenance.merge import merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 3793) % 383 + 1, 83, F.col("source")
    )
    src = _mk(
        d.where(F.col("doc_id") % 6 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 3793) % 383 + 5,
        89,
        F.col("source"),
    ).withColumn("quality", (F.col("n_tok") % 97).cast("double") / 100.0)
    root = _seq_table_tmpdir("dlq-evolve-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    assert "quality" not in t.schema().fieldNames()
    merge_into(t, src, merge_schema=True)
    assert t.schema().fieldNames()[-1] == "quality"
    return t.scan().select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
        "quality",
    )


def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Iceberg-style incremental append read in the correctness gate:
    # append batch A, record the version, append batch B, then a
    # pure-insert MERGE (append-shaped), and incremental_scan(v_A) must
    # return EXACTLY batch B plus the merged inserts — the read a
    # training pipeline uses to pick up new sequences without
    # rescanning the table. Metadata-only file diff + one pruned scan;
    # tok_sum certifies the token arrays (token-array-equality
    # invariant, summed).
    from datalakequality_spark.maintenance.merge import merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    batch_a = _mk(
        d.where(F.col("doc_id") % 2 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 4931) % 389 + 1,
        23,
        F.col("source"),
    )
    batch_b = _mk(
        d.where(F.col("doc_id") % 2 == 1),
        F.col("doc_id"),
        (F.col("doc_id") * 4931) % 389 + 1,
        23,
        F.col("source"),
    )
    inserts = _mk(
        d.where(F.col("doc_id") < 40),
        F.col("doc_id") + 2_000_000,
        F.col("doc_id") % 89 + 1,
        43,
        F.lit("new"),
    )
    root = _seq_table_tmpdir("dlq-incscan-q-")
    t = IceMiniTable.create(spark, root)
    file_rows = max(1, d.count() // 8)
    t.append(batch_a, target_file_rows=file_rows)
    v_a = t.current_version()
    t.append(batch_b, target_file_rows=file_rows)
    merge_into(t, inserts)  # no matching keys -> append-shaped commit
    return t.incremental_scan(v_a).select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
    )


def q_changelog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Iceberg-style CHANGELOG (CDC) scan in the correctness gate:
    # append → merge-on-read MERGE → compaction → merge-on-read DELETE,
    # then changelog_scan over the whole range must emit exactly the
    # row-level diff — DELETE(old)+INSERT(new) for updated keys, INSERT
    # for new keys, DELETE for deleted rows — while the compaction
    # commit contributes NOTHING (content-preserving rewrites are
    # skipped metadata-only; asserted). The oracle re-derives the same
    # change set in plain SQL from the deterministic inputs; tok_sum
    # certifies the emitted rows' token arrays.
    from datalakequality_spark.maintenance.compaction import compact_table
    from datalakequality_spark.maintenance.merge import delete_where, merge_into
    from datalakequality_spark.sources.icemini import IceMiniTable

    d = _t(spark, sf_dir, "documents")
    target = _mk(
        d, F.col("doc_id"), (F.col("doc_id") * 4421) % 401 + 1, 71, F.col("source")
    )
    updates = _mk(
        d.where(F.col("doc_id") % 5 == 0),
        F.col("doc_id"),
        (F.col("doc_id") * 4421) % 401 + 6,
        73,
        F.col("source"),
    )
    inserts = _mk(
        d.where(F.col("doc_id") < 45),
        F.col("doc_id") + 4_000_000,
        F.col("doc_id") % 79 + 1,
        79,
        F.lit("new"),
    )
    root = _seq_table_tmpdir("dlq-cdc-q-")
    t = IceMiniTable.create(spark, root)
    t.append(target, target_file_rows=max(1, d.count() // 8))
    v1 = t.current_version()
    merge_into(t, updates.unionByName(inserts), mode="merge_on_read")
    v2 = t.current_version()
    compact_table(t, target_bytes=64 * 1024 * 1024)
    v3 = t.current_version()
    assert v3 > v2 and t.changelog_scan(v2, v3).count() == 0
    delete_where(t, "n_tok % 8 = 0", mode="merge_on_read")
    return t.changelog_scan(v1).select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_sum"),
        F.col("_change_type").alias("change_type"),
    )


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF ANN through the REAL index path in the correctness gate: a
    # spherical-k-means codebook (trained on a bounded sample), the
    # cell id materialized as a table column, files clustered on it,
    # and the probe reading ONLY the probed cells' files via manifest
    # pruning (sources/annindex.AnnIvfIndex) — then exact re-rank. Same
    # planted-neighbor construction as ann_topk; the oracle is
    # brute-force SQL top-10 — hash_match certifies IVF == exact.
    from datalakequality_spark.sources.annindex import AnnIvfIndex

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qlit = F.array(*[F.lit(float(v)) for v in query])
    planted = (
        emb.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= 10))
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.zip_with(
                qlit, F.col("embedding"), lambda q, n: q + F.lit(0.15) * n
            ).alias("embedding"),
        )
    )
    root = _seq_table_tmpdir("dlq-ivf-q-")
    # lifecycle path: build on the base corpus, then APPEND the planted
    # batch (cells assigned under the existing codebook, O(batch) new
    # files, zero rebuild) — the probe must find neighbors from both
    # generations for the oracle hash to match
    idx = AnnIvfIndex.build(
        spark, emb, "vec_id", "embedding", root, n_centroids=16
    )
    idx.append(planted)
    return idx.topk(query, k=10, n_probe=6)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multimodal plumbing in the correctness gate: binary payload →
    # mapInPandas Arrow batches → deterministic fake features (sha256
    # bytes). byte_sum reverses the /255 float scaling so the check is
    # integer-exact; DuckDB recomputes it from sha256 hex.
    from datalakequality_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    feats = extract_features(d, "payload", "doc_id")
    return feats.select(
        "doc_id",
        F.aggregate(
            F.transform("features", lambda x: F.round(x.cast("double") * 255).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("byte_sum"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_summary": q_profile_summary,
        "missing_distinct": q_missing_distinct,
        "numeric_stats": q_numeric_stats,
        "unique_key_violations": q_unique_key_violations,
        "outlier_counts": q_outlier_counts,
        "histogram": q_histogram,
        "pii_flags": q_pii_flags,
        "drift_psi": q_drift_psi,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "running_window": q_running_window,
        "autofix_numeric": q_autofix_numeric,
        "contract_suggest": q_contract_suggest,
        "rollup_revenue": q_rollup_revenue,
        "cube_revenue": q_cube_revenue,
        "dedup_exact_stats": q_dedup_exact_stats,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_dedup": q_minhash_dedup,
        "minhash_incremental": q_minhash_incremental,
        "simhash_dedup": q_simhash_dedup,
        "fingerprint_dupes": q_fingerprint_dupes,
        "text_stats": q_text_stats,
        "token_counts": q_token_counts,
        "lang_id_counts": q_lang_id_counts,
        "cosine_topk": q_cosine_topk,
        "embedding_dupes": q_embedding_dupes,
        "ann_topk": q_ann_topk,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "pack_chunks": q_pack_chunks,
        "merge_upsert": q_merge_upsert,
        "maintain_rewrite": q_maintain_rewrite,
        "delete_where": q_delete_where,
        "delete_where_mor": q_delete_where_mor,
        "merge_mor": q_merge_mor,
        "compact_deletes": q_compact_deletes,
        "merge_conditional": q_merge_conditional,
        "update_where": q_update_where,
        "merge_evolve": q_merge_evolve,
        "incremental_scan": q_incremental_scan,
        "changelog_scan": q_changelog_scan,
        "ivf_ann": q_ivf_ann,
        "media_features": q_media_features,
    }


# ---------------------------------------------------------------- oracle SQL

_EN_STOP = "['the','and','of','to','a','in','is','that','for','it']"

_TEXT_STATS_SQL = rf"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
             len(text) AS n_chars
      FROM documents
    ), m AS (
      -- empty text → 0 tokens (engine tokens_of semantics)
      SELECT doc_id, n_chars,
             CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
             len(list_filter(toks, x -> list_contains({_EN_STOP}, x))) AS stop_hits,
             len(regexp_extract_all(text, '[!-/:-@\[-`{{-~]')) AS n_punct,
             len(regexp_extract_all(text, '\d')) AS n_digit
      FROM t
    )
    SELECT doc_id, n_chars, n_tokens,
      round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6) AS avg_token_len,
      round(n_digit::DOUBLE / greatest(n_chars, 1), 6) AS digit_ratio,
      round(stop_hits::DOUBLE / greatest(n_tokens, 1), 6) AS stopword_ratio,
      round(
        least(n_tokens / 20.0, 1.0) * 0.3
        + CASE WHEN (n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1)
                    BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
        + least((stop_hits::DOUBLE / greatest(n_tokens, 1)) * 3.0, 1.0) * 0.2
        + (1.0 - least((n_punct::DOUBLE / greatest(n_chars, 1)) * 4.0, 1.0)) * 0.1
        + (1.0 - least((n_digit::DOUBLE / greatest(n_chars, 1)) * 4.0, 1.0)) * 0.1
      , 6) AS quality
    FROM m
"""

_DRIFT_PSI_SQL = r"""
    WITH b AS (SELECT l_quantity AS x FROM lineitem WHERE l_orderkey % 2 = 0),
    c AS (SELECT l_quantity AS x FROM lineitem WHERE l_orderkey % 2 = 1),
    s AS (SELECT min(x)::DOUBLE AS lo, max(x)::DOUBLE AS hi FROM b),
    bb AS (SELECT least(CAST(x >= lo + (hi-lo)/5*1 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*2 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*3 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*4 AS INT), 4) AS bin
           FROM b, s WHERE x >= lo AND x <= hi),
    cb AS (SELECT least(CAST(x >= lo + (hi-lo)/5*1 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*2 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*3 AS INT)
                      + CAST(x >= lo + (hi-lo)/5*4 AS INT), 4) AS bin
           FROM c, s WHERE x >= lo AND x <= hi),
    bins AS (SELECT unnest(generate_series(0, 4)) AS bin),
    qv AS (SELECT bins.bin, coalesce(t.cnt, 0)::DOUBLE / (SELECT count(*) FROM bb) AS q
           FROM bins LEFT JOIN (SELECT bin, count(*) AS cnt FROM bb GROUP BY 1) t USING (bin)),
    pv AS (SELECT bins.bin, coalesce(t.cnt, 0)::DOUBLE / (SELECT count(*) FROM cb) AS p
           FROM bins LEFT JOIN (SELECT bin, count(*) AS cnt FROM cb GROUP BY 1) t USING (bin)),
    psi_val AS (
      SELECT sum((greatest(p, 1e-6) - greatest(q, 1e-6))
                 * ln(greatest(p, 1e-6) / greatest(q, 1e-6))) AS psi
      FROM qv JOIN pv USING (bin))
    SELECT 'l_quantity' AS column_name, round(psi, 6) AS psi,
           CASE WHEN psi < 0.10 THEN 'none'
                WHEN psi < 0.25 THEN 'moderate'
                ELSE 'severe' END AS psi_severity
    FROM psi_val
"""

_LANG_ID_SQL = r"""
    WITH t AS (
      SELECT doc_id, text,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, text,
        len(list_intersect(toks, ['the','and','of','to','a','in','is','that','for','it'])) AS s_en,
        len(list_intersect(toks, ['el','la','de','que','y','en','los','del','las','por'])) AS s_es,
        len(list_intersect(toks, ['der','die','und','das','nicht','von','ist','mit','den','im'])) AS s_de,
        len(list_intersect(toks, ['le','la','les','de','et','des','un','une','du','est'])) AS s_fr,
        len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
        len(text) AS n
      FROM t
    )
    SELECT pred_lang, count(*) AS n_docs FROM (
      SELECT CASE
        WHEN cjk > n * 0.2 THEN 'zh'
        WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        ELSE 'fr' END AS pred_lang
      FROM s
    ) GROUP BY pred_lang ORDER BY pred_lang
"""


# exact word-3-gram Jaccard truth over the capped doc slice — the
# oracle for BOTH the explicit exact path (ngram_jaccard) and the
# banded MinHash-LSH path (minhash_dedup, restricted to the slice)
_NGRAM_TRUTH_SQL = r"""
    WITH docs2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 500
      UNION ALL
      SELECT doc_id + 1000000, text || ' near duplicate suffix'
      FROM documents WHERE doc_id < 20
    ),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in generate_series(1, len(toks)-2)]) AS s
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS toks
            FROM docs2)
      WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / len(list_distinct(a.s || b.s)), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
          / len(list_distinct(a.s || b.s)) >= 0.6
"""


def oracle_sql() -> dict[str, str]:
    events_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    miss_total = " + ".join(
        f"(count(*) - count({c}))" for c in events_cols
    )
    md_parts = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, count(*) - count({c}) AS missing_count, "
        f"count(DISTINCT {c}) AS distinct_count FROM events"
        for c in ["event_id", "event_type", "user_id", "value"]
    )
    ns_parts = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, round(CAST(min({c}) AS DOUBLE), 6) AS min_value, "
        f"round(CAST(max({c}) AS DOUBLE), 6) AS max_value, round(avg({c}), 6) AS mean_value, "
        f"round(stddev_pop({c}), 6) AS std_value FROM lineitem"
        for c in LINEITEM_NUM_COLS
    )
    oc_stats = ", ".join(
        f"avg(l.{c}) AS m_{c}, stddev_pop(l.{c}) AS s_{c}" for c in LINEITEM_NUM_COLS
    )
    oc_parts = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, "
        f"CAST(sum(CASE WHEN s.s_{c} IS NOT NULL AND s.s_{c} <> 0 "
        f"AND abs((l.{c} - s.m_{c}) / s.s_{c}) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count, "
        f"count(l.{c}) AS value_count FROM lineitem l, s"
        for c in LINEITEM_NUM_COLS
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\b(\+?\d[\d\s\-]{7,}\d)\b"
    id_re = r"\b\d{10,16}\b"

    def pii_col(c: str) -> str:
        return (
            f"SELECT '{c}' AS column_name, "
            f"max(CASE WHEN regexp_matches({c}, '{email_re}') THEN 1 ELSE 0 END) AS has_email, "
            f"max(CASE WHEN regexp_matches({c}, '{phone_re}') THEN 1 ELSE 0 END) AS has_phone, "
            f"max(CASE WHEN regexp_matches({c}, '{id_re}') THEN 1 ELSE 0 END) AS has_id FROM d"
        )

    return {
        "profile_summary": f"""
            SELECT count(*) AS row_count,
                   {miss_total} AS total_missing_cells,
                   count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM events)) AS duplicate_rows
            FROM events
        """,
        "missing_distinct": md_parts,
        "numeric_stats": ns_parts,
        "unique_key_violations": """
            SELECT 'l_orderkey' AS column_name,
                   count(*) - count(DISTINCT l_orderkey)
                   - least(count(*) - count(l_orderkey), 1) AS duplicate_count
            FROM lineitem
        """,
        "outlier_counts": f"WITH s AS (SELECT {oc_stats} FROM lineitem l) {oc_parts}",
        "histogram": """
            WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
                       FROM lineitem)
            SELECT bin_id, count(*) AS bin_count FROM (
              SELECT least(
                CAST(l_extendedprice >= lo + (hi - lo) / 5 * 1 AS INT)
              + CAST(l_extendedprice >= lo + (hi - lo) / 5 * 2 AS INT)
              + CAST(l_extendedprice >= lo + (hi - lo) / 5 * 3 AS INT)
              + CAST(l_extendedprice >= lo + (hi - lo) / 5 * 4 AS INT), 4) AS bin_id
              FROM lineitem, s
              WHERE l_extendedprice >= lo AND l_extendedprice <= hi
            ) GROUP BY bin_id
        """,
        "pii_flags": (
            "WITH d AS (SELECT text, "
            "'contact: user' || CAST(doc_id AS VARCHAR) || '@example.org' AS synth_contact, "
            "'acct ' || lpad(CAST(doc_id + 10000000000 AS VARCHAR), 12, '0') AS synth_account "
            "FROM documents) "
            + " UNION ALL ".join(
                pii_col(c) for c in ["synth_account", "synth_contact", "text"]
            )
        ),
        "drift_psi": _DRIFT_PSI_SQL,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 10
        """,
        "running_window": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
            FROM events
        """,
        "autofix_numeric": """
            WITH ev AS (SELECT event_id,
                               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
                        FROM events),
            s AS (SELECT quantile_cont(value, 0.5) AS med FROM ev),
            f AS (SELECT event_id, coalesce(value, med) AS v FROM ev, s),
            q AS (SELECT quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3 FROM f)
            SELECT event_id,
                   round(CASE WHEN q3 - q1 = 0 THEN v
                              ELSE least(greatest(v, q1 - 1.5 * (q3 - q1)),
                                         q3 + 1.5 * (q3 - q1)) END, 6) AS fixed_value
            FROM f, q
        """,
        "contract_suggest": """
            WITH ev AS (SELECT event_id, event_type, user_id,
                               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
                        FROM events)
            SELECT 'event_id' AS column_name,
                   round((count(*) - count(event_id))::DOUBLE / count(*), 6) AS missing_ratio,
                   CAST((count(*) - count(event_id))::DOUBLE / count(*) < 0.5 AS INT) AS is_required,
                   CAST(count(DISTINCT event_id) = count(*) AS INT) AS is_unique_key
            FROM ev
            UNION ALL
            SELECT 'event_type',
                   round((count(*) - count(event_type))::DOUBLE / count(*), 6),
                   CAST((count(*) - count(event_type))::DOUBLE / count(*) < 0.5 AS INT),
                   CAST(count(DISTINCT event_type) = count(*) AS INT)
            FROM ev
            UNION ALL
            SELECT 'user_id',
                   round((count(*) - count(user_id))::DOUBLE / count(*), 6),
                   CAST((count(*) - count(user_id))::DOUBLE / count(*) < 0.5 AS INT),
                   CAST(count(DISTINCT user_id) = count(*) AS INT)
            FROM ev
            UNION ALL
            SELECT 'value',
                   round((count(*) - count(value))::DOUBLE / count(*), 6),
                   CAST((count(*) - count(value))::DOUBLE / count(*) < 0.5 AS INT),
                   CAST(count(DISTINCT value) = count(*) AS INT)
            FROM ev
        """,
        "rollup_revenue": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS n_rows,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS n_rows,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "dedup_exact_stats": """
            WITH docs2 AS (SELECT text FROM documents
                           UNION ALL SELECT text FROM documents WHERE doc_id < 15)
            SELECT count(*) AS row_count,
                   (SELECT count(*) FROM (SELECT DISTINCT text FROM docs2)) AS distinct_count,
                   count(*) - (SELECT count(*) FROM (SELECT DISTINCT text FROM docs2))
                       AS duplicate_count
            FROM docs2
        """,
        "ngram_jaccard": _NGRAM_TRUTH_SQL,
        # the restriction of the full-corpus MinHash-LSH run to the
        # capped slice must EQUAL the exact truth set — certifies
        # recall 1.0, precision 1.0 and bitwise jaccard parity there
        "minhash_dedup": _NGRAM_TRUTH_SQL,
        # incremental-store pairs = exact truth over the capped slice
        # (even ids = stored batch A; odd + planted = new batch B),
        # restricted to pairs with at least one side in B
        "minhash_incremental": r"""
            WITH docs2 AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 500
              UNION ALL
              SELECT doc_id + 1000000, text || ' near duplicate suffix'
              FROM documents WHERE doc_id < 20 AND doc_id % 2 = 0
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(toks[i:i+2], ' ')
                                    for i in generate_series(1, len(toks)-2)]) AS s
              FROM (SELECT doc_id,
                           regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                    FROM docs2)
              WHERE len(toks) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE
                         / len(list_distinct(a.s || b.s)), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / len(list_distinct(a.s || b.s)) >= 0.6
              AND (a.doc_id % 2 = 1 OR a.doc_id >= 1000000
                   OR b.doc_id % 2 = 1 OR b.doc_id >= 1000000)
        """,
        "simhash_dedup": r"""
            SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
            FROM documents
            WHERE doc_id < 20
              AND (CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
                   END) >= 20
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            planted AS (
              SELECT vec_id + 100000 AS vec_id,
                     [qv[i] + 0.15 * (embedding::DOUBLE[])[i]
                      for i in generate_series(1, len(qv))] AS v
              FROM embeddings, q WHERE vec_id BETWEEN 1 AND 10),
            allv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                     UNION ALL SELECT vec_id, v FROM planted)
            SELECT vec_id,
                   round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cosine
            FROM allv, q ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "fingerprint_dupes": r"""
            WITH docs2 AS (SELECT text FROM documents
                           UNION ALL SELECT text FROM documents WHERE doc_id < 25),
            g AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                         count(*) AS n
                  FROM docs2 GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS dup_groups,
                   CAST(sum(n) AS BIGINT) AS dup_rows
            FROM g WHERE n > 1
        """,
        "text_stats": _TEXT_STATS_SQL,
        "token_counts": r"""
            -- empty/whitespace-only text → 0 tokens, matching the
            -- engine's tokens_of (plain split would yield [''] → 1)
            SELECT doc_id,
                   CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
                   END AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}'))
                      + len(regexp_extract_all(text, '\d'))
                      + len(regexp_extract_all(text, '[!-/:-@\[-`{-~]'))
                        AS BIGINT) AS n_bpe_ish
            FROM documents
        """,
        "lang_id_counts": _LANG_ID_SQL,
        "cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(embedding::DOUBLE[], qv)
                         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "embedding_dupes": """
            WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
                          FROM embeddings WHERE vec_id < 100),
            allv AS (SELECT * FROM base
                     UNION ALL SELECT vec_id + 100000, v FROM base)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
            FROM allv a JOIN allv b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.99
        """,
        "sessionize": """
            WITH s AS (
              SELECT user_id, epoch_us(ts) AS us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), g AS (
              SELECT user_id, us,
                     CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
              FROM s
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   round((max(us) - min(us)) / 1000000.0, 6) AS span_seconds
            FROM g GROUP BY user_id, session_id
        """,
        "asof_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS click_id, user_id, ts, value FROM events
                  WHERE event_type = 'click')
            SELECT p.event_id AS event_id, p.user_id AS user_id,
                   c.click_id AS click_event_id,
                   round(c.value, 6) AS click_value,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "pack_chunks": r"""
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN len(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(lower(trim(text)), '\s+'))
                     END AS n
              FROM documents
            ), e AS (
              SELECT doc_id, n,
                     unnest(generate_series(
                       0, CAST(greatest(ceil(n / 16.0), 1) AS BIGINT) - 1
                     )) AS chunk_id
              FROM d
            )
            SELECT doc_id, chunk_id,
                   least(n - chunk_id * 16, 16) AS chunk_tokens
            FROM e
        """,
        "merge_upsert": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 7919) % 509 + 1 AS n_tok, source,
                     doc_id AS raw_id, 31 AS mult
              FROM documents
            ), src AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 7919) % 509 + 8 AS n_tok, source,
                     doc_id AS raw_id, 37 AS mult
              FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT CAST(doc_id + 1000000 AS VARCHAR),
                     doc_id % 97 + 1, 'new', doc_id + 1000000, 41
              FROM documents WHERE doc_id < 50
            ), merged AS (
              SELECT * FROM src
              UNION ALL
              SELECT * FROM tgt
              WHERE doc_id NOT IN (SELECT doc_id FROM src)
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM merged
        """,
        "maintain_rewrite": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 6151) % 421 + 1 AS n_tok, source,
                     doc_id AS raw_id
              FROM documents
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * 29 + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM tgt
        """,
        "delete_where": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 3571) % 347 + 1 AS n_tok, source,
                     doc_id AS raw_id
              FROM documents
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * 19 + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM tgt WHERE NOT (n_tok % 5 = 0)
        """,
        "delete_where_mor": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 2143) % 331 + 1 AS n_tok, source,
                     doc_id AS raw_id
              FROM documents
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * 13 + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM tgt WHERE NOT (n_tok % 6 = 0)
        """,
        "merge_mor": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 5519) % 443 + 1 AS n_tok, source,
                     doc_id AS raw_id, 43 AS mult
              FROM documents
            ), src AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 5519) % 443 + 9 AS n_tok, source,
                     doc_id AS raw_id, 47 AS mult
              FROM documents WHERE doc_id % 4 = 0
              UNION ALL
              SELECT CAST(doc_id + 3000000 AS VARCHAR),
                     doc_id % 83 + 1, 'new', doc_id + 3000000, 53
              FROM documents WHERE doc_id < 60
            ), merged AS (
              SELECT * FROM src
              UNION ALL
              SELECT * FROM tgt
              WHERE doc_id NOT IN (SELECT doc_id FROM src)
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM merged
        """,
        "compact_deletes": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 6007) % 457 + 1 AS n_tok, source,
                     doc_id AS raw_id, 59 AS mult
              FROM documents
            ), m1 AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 6007) % 457 + 4 AS n_tok, source,
                     doc_id AS raw_id, 61 AS mult
              FROM documents WHERE doc_id % 10 = 0
            ), m2 AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 6007) % 457 + 7 AS n_tok, source,
                     doc_id AS raw_id, 67 AS mult
              FROM documents WHERE doc_id % 5 = 0
            ), upserted AS (
              SELECT * FROM m2
              UNION ALL
              SELECT * FROM m1 WHERE doc_id NOT IN (SELECT doc_id FROM m2)
            ), merged AS (
              SELECT * FROM upserted
              UNION ALL
              SELECT * FROM tgt
              WHERE doc_id NOT IN (SELECT doc_id FROM upserted)
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM merged WHERE NOT (n_tok % 9 = 0)
        """,
        "merge_conditional": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 4967) % 389 + 1 AS n_tok, source,
                     doc_id AS raw_id, 17 AS mult
              FROM documents
            ), src AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 3571) % 389 + 1 AS n_tok, source,
                     doc_id AS raw_id, 23 AS mult
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT CAST(doc_id + 2000000 AS VARCHAR),
                     doc_id % 89 + 1, 'new', doc_id + 2000000, 29
              FROM documents WHERE doc_id < 40
            ), merged AS (
              -- unmatched target rows pass through
              SELECT t.doc_id, t.n_tok, t.source, t.raw_id, t.mult
              FROM tgt t WHERE t.doc_id NOT IN (SELECT doc_id FROM src)
              UNION ALL
              -- clause 1 fires: conditional update
              SELECT t.doc_id, s.n_tok, 'upgraded', t.raw_id, s.mult
              FROM tgt t JOIN src s USING (doc_id) WHERE s.n_tok > t.n_tok
              UNION ALL
              -- neither clause fires: unchanged (clause 2 = DELETE drops
              -- the t.n_tok % 5 = 0 rows entirely)
              SELECT t.doc_id, t.n_tok, t.source, t.raw_id, t.mult
              FROM tgt t JOIN src s USING (doc_id)
              WHERE NOT (s.n_tok > t.n_tok) AND NOT (t.n_tok % 5 = 0)
              UNION ALL
              -- conditional inserts
              SELECT s.doc_id, s.n_tok, s.source, s.raw_id, s.mult
              FROM src s WHERE s.doc_id NOT IN (SELECT doc_id FROM tgt)
                AND s.n_tok % 3 != 0
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM merged
        """,
        "update_where": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 2677) % 311 + 1 AS n_tok, source,
                     doc_id AS raw_id
              FROM documents
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                   CASE WHEN n_tok % 4 = 0 THEN 'redacted' ELSE source END
                     AS source,
                   CAST(list_sum([(raw_id * 17 + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM tgt
        """,
        "incremental_scan": """
            WITH added AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 4931) % 389 + 1 AS n_tok, source,
                     doc_id AS raw_id, 23 AS mult
              FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT CAST(doc_id + 2000000 AS VARCHAR),
                     doc_id % 89 + 1, 'new', doc_id + 2000000, 43
              FROM documents WHERE doc_id < 40
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum
            FROM added
        """,
        "merge_evolve": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 3793) % 383 + 1 AS n_tok, source,
                     doc_id AS raw_id, 83 AS mult
              FROM documents
            ), src AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 3793) % 383 + 5 AS n_tok, source,
                     doc_id AS raw_id, 89 AS mult
              FROM documents WHERE doc_id % 6 = 0
            ), merged AS (
              SELECT *, CAST(n_tok % 97 AS DOUBLE) / 100 AS quality
              FROM src
              UNION ALL
              SELECT *, CAST(NULL AS DOUBLE) AS quality FROM tgt
              WHERE doc_id NOT IN (SELECT doc_id FROM src)
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum,
                   quality
            FROM merged
        """,
        "changelog_scan": """
            WITH tgt AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 4421) % 401 + 1 AS n_tok, source,
                     doc_id AS raw_id, 71 AS mult
              FROM documents
            ), src AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     (doc_id * 4421) % 401 + 6 AS n_tok, source,
                     doc_id AS raw_id, 73 AS mult
              FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT CAST(doc_id + 4000000 AS VARCHAR),
                     doc_id % 79 + 1, 'new', doc_id + 4000000, 79
              FROM documents WHERE doc_id < 45
            ), merged AS (
              SELECT * FROM src
              UNION ALL
              SELECT * FROM tgt
              WHERE doc_id NOT IN (SELECT doc_id FROM src)
            ), changes AS (
              SELECT *, 'INSERT' AS change_type FROM src
              UNION ALL
              SELECT *, 'DELETE' AS change_type FROM tgt
              WHERE doc_id IN (SELECT doc_id FROM src)
              UNION ALL
              SELECT *, 'DELETE' AS change_type FROM merged
              WHERE n_tok % 8 = 0
            )
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source,
                   CAST(list_sum([(raw_id * mult + i) % 50257
                                  for i in generate_series(1, n_tok)])
                        AS BIGINT) AS tok_sum,
                   change_type
            FROM changes
        """,
        "ivf_ann": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            planted AS (
              SELECT vec_id + 100000 AS vec_id,
                     [qv[i] + 0.15 * (embedding::DOUBLE[])[i]
                      for i in generate_series(1, len(qv))] AS v
              FROM embeddings, q WHERE vec_id BETWEEN 1 AND 10),
            allv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                     UNION ALL SELECT vec_id, v FROM planted)
            SELECT vec_id,
                   round(list_dot_product(v, qv)
                         / (sqrt(list_dot_product(v, v))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cosine
            FROM allv, q ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "media_features": """
            SELECT doc_id,
                   CAST(list_sum([
                     (strpos('0123456789abcdef',
                             substr(sha256(text), 2 * i - 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef',
                               substr(sha256(text), 2 * i, 1)) - 1)
                     for i in generate_series(1, 16)]) AS BIGINT) AS byte_sum
            FROM documents
        """,
    }


# --------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")
