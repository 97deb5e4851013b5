"""Drift detection (PSI) — SURVEY.md §2.6 (D1–D6).

Re-expression of the reference's PSI-lite drift analysis
(/root/reference/backend/app/core/drift.py:30-277) as batched Spark
aggregations.

Baseline build (D1): per numeric column — mean, population std (0.0 for
a single value), min/max, 5 equal-width bins over [min, max] (widened
±0.5 when min==max), bin proportions. The reference bins with
``np.histogram(values, bins=edges)`` whose semantics are: values outside
[lo, hi] are DROPPED; an interior edge belongs to the bin on its right;
the last bin is closed on both sides. The Spark bucketing expression
reproduces that exactly with four `x >= edge_j` comparisons plus a
range filter — no UDF, one wide agg for every column's 5 bins at once.

Comparison pass (D5): re-histogram current data using the BASELINE's
edges (injected as literals — conceptually a broadcast join of current
data against a 5-row edge table, folded into the expression), then
driver-side PSI = Σ (p−q)·ln(p/q) with eps=1e-6 floors, severity bands
<0.10 none / <0.25 moderate / else severe, drift ⟺ psi > 0.25.

Scale: 2 jobs per analysis (one stats+histogram agg over all columns,
already computed stats reusable), map-side combine, single-row result.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profiling import nn, numeric_columns

N_BINS = 5
PSI_EPS = 1e-6


def _linspace(lo: float, hi: float, n: int) -> list[float]:
    if n == 1:
        return [lo]
    step = (hi - lo) / (n - 1)
    return [lo + i * step for i in range(n)]


def _bucket_expr(x: F.Column, edges: list[float]) -> F.Column:
    """np.histogram bin index for fixed edges: null when out of range,
    else number of interior edges <= x (last bin right-closed)."""
    x = x.cast("double")
    in_range = (x >= edges[0]) & (x <= edges[-1])
    b = sum(
        ((x >= F.lit(e)).cast("int") for e in edges[1:-1]),
        F.lit(0),
    )
    # x == last edge lands in the final bin via >= comparisons already
    return F.when(in_range, F.least(b, F.lit(len(edges) - 2)))


def histogram_counts(
    df: DataFrame, col_edges: dict[str, list[float]]
) -> dict[str, list[int]]:
    """Per-column histogram counts under np.histogram semantics, every
    column in ONE aggregation pass."""
    aggs = []
    for c, edges in col_edges.items():
        b = _bucket_expr(nn(df, c), edges)
        for i in range(len(edges) - 1):
            aggs.append(F.sum((b == i).cast("long")).alias(f"h::{c}::{i}"))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0].asDict()
    return {
        c: [int(row[f"h::{c}::{i}"] or 0) for i in range(len(edges) - 1)]
        for c, edges in col_edges.items()
    }


def build_numeric_baseline(
    df: DataFrame, columns: list[str] | None = None, n_bins: int = N_BINS
) -> dict[str, Any]:
    """D1 — the reference's baseline profile, computed in 2 Spark jobs
    (stats agg, then histogram agg with derived edges)."""
    num_cols = columns if columns is not None else numeric_columns(df)
    if not num_cols:
        return {}
    aggs = []
    for c in num_cols:
        qc = nn(df, c).cast("double")
        aggs += [
            F.avg(qc).alias(f"mean::{c}"),
            F.stddev_pop(qc).alias(f"std::{c}"),
            F.min(qc).alias(f"min::{c}"),
            F.max(qc).alias(f"max::{c}"),
            F.count(qc).alias(f"cnt::{c}"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    col_edges: dict[str, list[float]] = {}
    profile: dict[str, Any] = {}
    for c in num_cols:
        cnt = int(row[f"cnt::{c}"])
        if cnt == 0:
            continue  # reference skips empty columns
        lo, hi = float(row[f"min::{c}"]), float(row[f"max::{c}"])
        if lo == hi:
            lo -= 0.5
            hi += 0.5
        edges = _linspace(lo, hi, n_bins + 1)
        col_edges[c] = edges
        std = row[f"std::{c}"]
        profile[c] = {
            "mean": float(row[f"mean::{c}"]),
            # reference: std = 0.0 when only one value (values.size <= 1)
            "std": float(std) if cnt > 1 and std is not None else 0.0,
            "value_count": cnt,
            "bins": edges,
        }

    hists = histogram_counts(df, col_edges)
    for c, counts in hists.items():
        total = sum(counts)
        profile[c]["percents"] = (
            [cv / total for cv in counts] if total else [0.0] * n_bins
        )
    return profile


def compute_psi(
    baseline_percents: list[float],
    current_percents: list[float],
    eps: float = PSI_EPS,
) -> float:
    """D3 — PSI with zero-smoothing, identical math to the reference."""
    psi = 0.0
    for p, q in zip(current_percents, baseline_percents):
        p_s, q_s = max(p, eps), max(q, eps)
        psi += (p_s - q_s) * math.log(p_s / q_s)
    return float(psi)


def psi_severity(psi: float) -> str:
    if psi < 0.10:
        return "none"
    if psi < 0.25:
        return "moderate"
    return "severe"


def analyze_drift_against_baseline(
    df: DataFrame,
    baseline_columns: dict[str, Any],
    columns: list[str] | None = None,
) -> dict[str, Any]:
    """D5/D6 — compare current data against an existing baseline dict
    (state persistence lives in sources/state.py). Returns the
    reference's ``{"baseline_created": False, "has_drift", "columns"}``.
    """
    num_cols = columns if columns is not None else numeric_columns(df)

    with_base = [
        c
        for c in num_cols
        if c in baseline_columns
        and baseline_columns[c].get("bins")
        and baseline_columns[c].get("percents")
    ]
    # one agg: current mean+count for every column, histogram (baseline
    # edges) for columns that have a usable baseline
    aggs = []
    for c in num_cols:
        qc = nn(df, c).cast("double")
        aggs += [F.avg(qc).alias(f"mean::{c}"), F.count(qc).alias(f"cnt::{c}")]
    for c in with_base:
        edges = [float(e) for e in baseline_columns[c]["bins"]]
        b = _bucket_expr(nn(df, c), edges)
        for i in range(len(edges) - 1):
            aggs.append(F.sum((b == i).cast("long")).alias(f"h::{c}::{i}"))
    row = df.agg(*aggs).collect()[0].asDict() if aggs else {}

    drift_cols: list[dict[str, Any]] = []
    for c in num_cols:
        cnt = int(row.get(f"cnt::{c}", 0) or 0)
        cur_mean = float(row[f"mean::{c}"]) if cnt > 0 else None

        if c not in baseline_columns:
            drift_cols.append(
                {
                    "column": c,
                    "baseline_mean": None,
                    "current_mean": cur_mean if cur_mean is not None else 0.0,
                    "relative_change": None,
                    "psi": None,
                    "psi_severity": "none",
                    "drift": False,
                }
            )
            continue

        base = baseline_columns[c]
        base_mean = float(base.get("mean", 0.0))
        if cnt == 0 or c not in with_base:
            drift_cols.append(
                {
                    "column": c,
                    "baseline_mean": base_mean,
                    "current_mean": None,
                    "relative_change": None,
                    "psi": None,
                    "psi_severity": "none",
                    "drift": False,
                }
            )
            continue

        n_bins = len(base["bins"]) - 1
        counts = [int(row[f"h::{c}::{i}"] or 0) for i in range(n_bins)]
        total = sum(counts)
        cur_percents = [cv / total for cv in counts] if total else [0.0] * n_bins

        base_percents = [float(p) for p in base["percents"]]
        if len(cur_percents) != len(base_percents):
            psi_val, sev, flag = None, "none", False
        else:
            psi_val = compute_psi(base_percents, cur_percents)
            sev = psi_severity(psi_val)
            flag = psi_val > 0.25

        rel = (cur_mean - base_mean) / base_mean if base_mean != 0 else None
        drift_cols.append(
            {
                "column": c,
                "baseline_mean": base_mean,
                "current_mean": cur_mean,
                "relative_change": rel,
                "psi": psi_val,
                "psi_severity": sev,
                "drift": flag,
            }
        )

    return {
        "baseline_created": False,
        "has_drift": any(ci["drift"] for ci in drift_cols),
        "columns": drift_cols,
    }


def histogram_df(df: DataFrame, column: str, n_bins: int = N_BINS) -> DataFrame:
    """Declarative (bin_id, bin_count) histogram of one column over its
    own [min, max] range — oracle-contract shape. The min/max come from
    a broadcast single-row agg, the bucket math mirrors np.histogram."""
    x = F.col(column).cast("double")
    stats = df.agg(F.min(x).alias("__lo"), F.max(x).alias("__hi"))
    j = df.crossJoin(F.broadcast(stats))
    lo, hi = F.col("__lo"), F.col("__hi")
    lo2 = F.when(lo == hi, lo - 0.5).otherwise(lo)
    hi2 = F.when(lo == hi, hi + 0.5).otherwise(hi)
    width = (hi2 - lo2) / n_bins
    b = F.lit(0)
    for i in range(1, n_bins):
        b = b + (x >= lo2 + width * i).cast("int")
    return (
        j.where((x >= lo2) & (x <= hi2))
        .select(F.least(b, F.lit(n_bins - 1)).alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("bin_count"))
        .orderBy("bin_id")
    )
