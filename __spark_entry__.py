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
    # lineitem, revenue top-10. AQE broadcasts customer at sf<=0.1;
    # deterministic tie-break on c_custkey.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_summary": q_profile_summary,
        "missing_distinct": q_missing_distinct,
        "numeric_stats": q_numeric_stats,
        "unique_key_violations": q_unique_key_violations,
        "outlier_counts": q_outlier_counts,
        "histogram": q_histogram,
        "pii_flags": q_pii_flags,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "running_window": q_running_window,
    }


# ---------------------------------------------------------------- oracle SQL


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
    }


# --------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")
