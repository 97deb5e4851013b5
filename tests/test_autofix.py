"""Autofix transforms (SURVEY.md §2.9) vs a pandas mirror of the
reference's executed cleaner (/root/reference/backend/app/main.py:133-205)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datalakequality_spark.operators.autofix import (
    AutofixOptions,
    apply_autofix,
    build_autofix,
    mask_pii_hash,
)
from datalakequality_spark.operators.profiling import profile_dataset
from datalakequality_spark.operators.pii import detect_pii


def _pandas_clean(pdf: pd.DataFrame) -> pd.DataFrame:
    """Oracle: the reference's fixed clean order — numeric median fill,
    IQR clip on the filled values, categorical mode fill, date
    normalization, email/phone masking."""
    r = pdf.copy()
    num = r.select_dtypes(include=["number"]).columns
    for c in num:
        r[c] = r[c].fillna(r[c].median())
    for c in num:
        s = r[c].astype(float)
        q1, q3 = s.quantile(0.25), s.quantile(0.75)
        iqr = q3 - q1
        if iqr != 0:
            r[c] = s.clip(q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    for c in r.select_dtypes(include=["object"]).columns:
        m = r[c].mode(dropna=True)
        if not m.empty:
            r[c] = r[c].fillna(m.iloc[0])
    for c in r.columns:
        if "date" in c.lower():
            try:
                r[c] = pd.to_datetime(r[c]).dt.strftime("%Y-%m-%d")
            except Exception:
                pass
    for c in r.select_dtypes(include=["object"]).columns:
        lower = c.lower()
        if "email" in lower:
            r[c] = r[c].astype(str).str.replace(r"(^[^@]+)@", "***@", regex=True)
        if "phone" in lower or "mobile" in lower:
            r[c] = r[c].astype(str).str.replace(r"[0-9](?=[0-9]{4})", "*", regex=True)
    return r


def test_apply_autofix_matches_pandas(spark):
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "email": [f"USER{i}@Example.com" if i % 5 else None for i in range(n)],
            "phone": [f"+1 555 123 {1000 + i}" if i % 4 else None for i in range(n)],
            "city": np.where(rng.random(n) < 0.2, None, rng.choice(["x", "y", "z"], n)),
            "signup_date": [f"2024-03-{(i % 27) + 1:02d}" for i in range(n)],
            "age": np.where(rng.random(n) < 0.1, np.nan, rng.normal(40, 12, n).round()),
            "amount": rng.lognormal(4, 1, n),
        }
    )
    expected = _pandas_clean(pdf)
    got = apply_autofix(spark.createDataFrame(pdf)).toPandas()
    for c in ["age", "amount"]:
        np.testing.assert_allclose(
            got[c].to_numpy(float), expected[c].to_numpy(float), rtol=1e-9
        )
    for c in ["email", "phone", "city", "signup_date"]:
        assert [str(x) for x in got[c]] == [str(x) for x in expected[c]], c


def test_autofix_options_disable(spark):
    pdf = pd.DataFrame({"age": [1.0, None, 3.0], "email": ["a@b.co", None, None]})
    df = spark.createDataFrame(pdf)
    opt = AutofixOptions(
        fill_numeric_missing=False,
        fill_categorical_missing=False,
        clip_outliers=False,
        parse_dates=False,
        mask_pii=False,
    )
    got = apply_autofix(df, opt).toPandas()
    assert got["age"].isna().sum() == 1
    assert got["email"].isna().sum() == 2
    assert got["email"][0] == "a@b.co"  # unmasked


def test_mask_pii_hash(spark):
    df = spark.createDataFrame([("secret",), (None,)], "v string")
    got = mask_pii_hash(df, ["v"]).collect()
    import hashlib

    assert got[0]["v"] == hashlib.sha256(b"secret").hexdigest()
    assert got[1]["v"] is None


def test_build_autofix_plan(messy_sdf):
    prof = profile_dataset(messy_sdf)
    pii = detect_pii(messy_sdf)
    plan, script = build_autofix("customers", prof, pii)
    ids = [s["id"] for s in plan["steps"]]
    assert ids == [
        "missing_numeric_impute",
        "missing_categorical_impute",
        "outlier_clip_iqr",
        "date_parse_iso",
        "email_normalize",
        "pii_mask",
    ]
    # pii_mask conservative default: disabled, so not in the script
    assert next(s for s in plan["steps"] if s["id"] == "pii_mask")["enabled"] is False
    assert "sha2" not in script
    assert "percentile" in script and "OUTPUT_PATH" in script
    compile(script, "autofix_script", "exec")  # generated script must parse


def test_int_median_promotes_to_double(spark):
    """pandas promotes NaN-bearing int columns to float64 and fills the
    fractional interpolated median — no int truncation (ADVICE fix)."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (5,), (8,)], "v int"
    )
    opt = AutofixOptions(clip_outliers=False, parse_dates=False, mask_pii=False)
    got = apply_autofix(df, opt).toPandas()["v"]
    # median of [1,2,5,8] = (2+5)/2 = 3.5 — fractional, must survive
    assert sorted(got) == [1.0, 2.0, 3.5, 5.0, 8.0]
    # pandas oracle agrees
    pdf = pd.Series([1, 2, np.nan, 5, 8])
    assert sorted(pdf.fillna(pdf.median())) == sorted(got)


def test_int_without_nulls_keeps_type(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    opt = AutofixOptions(clip_outliers=False, parse_dates=False, mask_pii=False)
    out = apply_autofix(df, opt)
    assert dict(out.dtypes)["v"] == "int"  # fillna no-op → no promotion


def test_date_parse_non_string_column(spark):
    """A date-named NUMERIC column is stringified; values that don't
    parse as timestamps keep their (stringified) original value."""
    df = spark.createDataFrame(
        [(20240101,), (None,)], "date_code long"
    )
    opt = AutofixOptions(
        fill_numeric_missing=False, clip_outliers=False, mask_pii=False
    )
    out = apply_autofix(df, opt)
    assert dict(out.dtypes)["date_code"] == "string"
    vals = [r["date_code"] for r in out.collect()]
    assert vals == ["20240101", None]
