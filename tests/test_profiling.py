"""Profiling kernels (SURVEY.md §2.2) vs independent pandas oracles."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from datalakequality_spark.operators.profiling import (
    infer_simple_type,
    profile_dataset,
)


def test_summary_matches_pandas(messy_pdf, messy_sdf):
    prof = profile_dataset(messy_sdf)
    s = prof["summary"]
    n_rows, n_cols = messy_pdf.shape
    assert s["row_count"] == n_rows
    assert s["column_count"] == n_cols
    assert s["total_missing_cells"] == int(messy_pdf.isna().sum().sum())
    assert s["duplicate_rows"] == int(messy_pdf.duplicated().sum())
    assert s["missing_ratio"] == pytest.approx(
        messy_pdf.isna().sum().sum() / (n_rows * n_cols)
    )


def test_column_stats_match_pandas(messy_pdf, messy_sdf):
    prof = profile_dataset(messy_sdf)
    stats = prof["basic_profile"]["column_stats"]
    for c in ["age", "amount", "customer_id"]:
        series = messy_pdf[c].dropna()
        assert stats[c]["missing_count"] == int(messy_pdf[c].isna().sum())
        assert stats[c]["unique_count"] == int(messy_pdf[c].nunique(dropna=True))
        assert stats[c]["mean"] == pytest.approx(float(series.mean()), rel=1e-9)
        # population std, matching the reference's ddof=0
        assert stats[c]["std"] == pytest.approx(float(series.std(ddof=0)), rel=1e-9)
        assert stats[c]["min"] == pytest.approx(float(series.min()))
        assert stats[c]["max"] == pytest.approx(float(series.max()))


def test_inferred_types(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "x", "2024-01-01 00:00:00")],
        "a int, b double, c string, d string",
    ).selectExpr("a", "b", "c", "cast(d as timestamp) as d")
    types = {f.name: infer_simple_type(f.dataType) for f in df.schema.fields}
    assert types == {"a": "integer", "b": "number", "c": "string", "d": "date"}


def test_duplicate_rows_with_array_column(spark):
    # arrays compare element-wise in dropDuplicates — the tokens column
    # of the sequences table relies on this
    df = spark.createDataFrame(
        [("a", [1, 2]), ("a", [1, 2]), ("a", [1, 3])], "k string, v array<int>"
    )
    prof = profile_dataset(df)
    assert prof["summary"]["duplicate_rows"] == 1


def test_profile_sketch_path_single_job(spark):
    """exact_distinct=False (the gate default / 100-TB path) must fold
    the duplicate-row count into the one wide agg — same answers as the
    exact path at small cardinality, where HLL's sparse mode is exact."""
    df = spark.createDataFrame(
        [("a", [1, 2]), ("a", [1, 2]), ("a", [1, 3]), ("b", None)],
        "k string, v array<int>",
    )
    exact = profile_dataset(df, exact_distinct=True)
    approx = profile_dataset(df, exact_distinct=False)
    assert approx["summary"]["duplicate_rows"] == exact["summary"]["duplicate_rows"] == 1
    assert (
        approx["basic_profile"]["column_stats"]["k"]["unique_count"]
        == exact["basic_profile"]["column_stats"]["k"]["unique_count"]
    )


def test_outliers_cache_projection_parity(spark, messy_sdf):
    """cache_projection must not change any number — it only persists
    the narrow projection between the two passes."""
    from datalakequality_spark.operators.outliers import detect_outliers

    plain = detect_outliers(messy_sdf)
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    cached = detect_outliers(messy_sdf, cache_projection=True)
    assert plain == cached
    # the projection was unpersisted before returning
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == before


def test_nan_counts_as_missing(spark):
    # a real NaN value (not NULL) in a double column must count as
    # missing and be excluded from stats, matching pandas isna/dropna
    df = spark.createDataFrame([(1.0,), (3.0,)], "x double").unionByName(
        spark.sql("select cast('NaN' as double) as x")
    )
    prof = profile_dataset(df)
    assert prof["basic_profile"]["column_stats"]["x"]["missing_count"] == 1
    assert prof["basic_profile"]["column_stats"]["x"]["mean"] == pytest.approx(2.0)
