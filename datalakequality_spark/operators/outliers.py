"""Z-score outlier detection — SURVEY.md §2.5 (O1–O4).

Re-expression of the reference detector
(/root/reference/backend/app/core/outliers.py:8-64). Two Spark jobs
total, independent of column count:

1. one wide agg: per numeric column ``avg``, ``stddev_pop``, ``count``
   (Spark aggs skip nulls, matching the reference's dropna);
2. one wide agg: per column ``sum(abs((x-mean)/std) > z)`` with the
   stage-1 stats injected as literals (no join, no shuffle — the stats
   are a handful of doubles broadcast inside the plan).

Reference semantics preserved: population std (ddof=0); std==0 or NaN →
0 outliers; severity bands 0 → none, <0.01 → low, <0.05 → medium, else
high; overall ratio = Σ outliers / Σ non-null numeric values.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profiling import nn, numeric_columns


def _severity(ratio: float) -> str:
    if ratio == 0:
        return "none"
    if ratio < 0.01:
        return "low"
    if ratio < 0.05:
        return "medium"
    return "high"


def detect_outliers(
    df: DataFrame,
    z_thresh: float = 3.0,
    columns: list[str] | None = None,
    stats: dict[str, dict[str, Any]] | None = None,
    cache_projection: bool = False,
) -> dict[str, Any]:
    """Reference-shaped result:
    ``{"columns": [...], "total_outliers", "total_numeric_values",
    "overall_outlier_ratio"}``.

    ``stats``: optionally reuse per-column {mean, std, value_count}
    already computed by profiling (saves the first pass — the quality
    gate does this so profile+outliers share one scan). That is the
    preferred at-scale shape: z-score needs mean/std BEFORE it can count
    exceedances, so a standalone call is inherently two passes.

    ``cache_projection``: for a standalone call (stats=None), persist
    the narrow numeric projection between the two passes so the second
    pass reads k columns of in-memory columnar data instead of
    re-decoding the source (worth it when the inputs are expensive
    derived expressions or a small column subset of wide/nested
    storage; the projection is k×8 bytes/row — size executor
    storage accordingly, MEMORY_AND_DISK spills the remainder).
    Unpersisted before returning.
    """
    num_cols = columns if columns is not None else numeric_columns(df)
    if not num_cols:
        return {
            "columns": [],
            "total_outliers": 0,
            "total_numeric_values": 0,
            "overall_outlier_ratio": 0.0,
        }

    cached = None
    if cache_projection and stats is None:
        # evaluate nn() against the ORIGINAL schema, then both passes
        # run over the slim persisted frame
        proj = df.select(*[nn(df, c).cast("double").alias(c) for c in num_cols])
        from pyspark.storagelevel import StorageLevel

        cached = proj.persist(StorageLevel.MEMORY_AND_DISK)
        df = cached

    if stats is None:
        aggs = []
        for c in num_cols:
            qc = nn(df, c)
            aggs += [
                F.avg(qc).alias(f"mean::{c}"),
                F.stddev_pop(qc).alias(f"std::{c}"),
                F.count(qc).alias(f"cnt::{c}"),
            ]
        row = df.agg(*aggs).collect()[0].asDict()
        stats = {
            c: {
                "mean": row[f"mean::{c}"],
                "std": row[f"std::{c}"],
                "value_count": int(row[f"cnt::{c}"]),
            }
            for c in num_cols
        }

    # second pass: outlier counts for columns with usable std, batched
    zcols = [
        c
        for c in num_cols
        if stats[c]["value_count"] > 0
        and stats[c]["std"] is not None
        and not math.isnan(stats[c]["std"])
        and stats[c]["std"] != 0
    ]
    zcounts: dict[str, int] = {}
    if zcols:
        aggs = [
            F.sum(
                (
                    F.abs(
                        (nn(df, c).cast("double") - F.lit(float(stats[c]["mean"])))
                        / F.lit(float(stats[c]["std"]))
                    )
                    > z_thresh
                ).cast("long")
            ).alias(f"out::{c}")
            for c in zcols
        ]
        row2 = df.agg(*aggs).collect()[0].asDict()
        zcounts = {c: int(row2[f"out::{c}"] or 0) for c in zcols}
    if cached is not None:
        cached.unpersist()

    results = []
    total_outliers = 0
    total_values = 0
    for c in num_cols:
        s = stats[c]
        if s["value_count"] == 0:
            continue  # reference skips empty columns entirely
        std = s["std"]
        std_bad = std is None or (isinstance(std, float) and math.isnan(std))
        outlier_count = 0 if (std_bad or std == 0) else zcounts.get(c, 0)
        value_count = int(s["value_count"])
        total_outliers += outlier_count
        total_values += value_count
        ratio = outlier_count / value_count if value_count > 0 else 0.0
        results.append(
            {
                "column": c,
                "mean": float(s["mean"]),
                "std": None if std_bad else float(std),
                "outlier_count": outlier_count,
                "value_count": value_count,
                "outlier_ratio": ratio,
                "severity": _severity(ratio),
            }
        )

    overall = total_outliers / total_values if total_values > 0 else 0.0
    return {
        "columns": results,
        "total_outliers": total_outliers,
        "total_numeric_values": total_values,
        "overall_outlier_ratio": overall,
    }


def outlier_counts_df(
    df: DataFrame, z_thresh: float = 3.0, columns: list[str] | None = None
) -> DataFrame:
    """Long-form (column_name, outlier_count, value_count) as ONE
    self-join-free declarative plan: a window-less cross join of the
    single-row stats agg against the data, so DuckDB can mirror it with
    a CTE. Used for the driver oracle."""
    num_cols = columns if columns is not None else numeric_columns(df)
    stats_aggs = []
    for c in num_cols:
        qc = F.col(c).cast("double")
        stats_aggs += [
            F.avg(qc).alias(f"mean::{c}"),
            F.stddev_pop(qc).alias(f"std::{c}"),
        ]
    stats = df.agg(*stats_aggs)  # single row → broadcast by AQE
    joined = df.crossJoin(F.broadcast(stats))
    aggs = []
    for c in num_cols:
        qc = F.col(c).cast("double")
        z_ok = (F.col(f"std::{c}").isNotNull()) & (F.col(f"std::{c}") != 0.0)
        is_out = z_ok & (
            F.abs((qc - F.col(f"mean::{c}")) / F.col(f"std::{c}")) > z_thresh
        )
        aggs.append(F.sum(is_out.cast("long")).alias(f"out::{c}"))
        aggs.append(F.count(qc).alias(f"cnt::{c}"))
    wide = joined.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `out::{c}`, `cnt::{c}`" for c in num_cols)
    return wide.selectExpr(
        f"stack({len(num_cols)}, {stack_args}) as "
        "(column_name, outlier_count, value_count)"
    ).orderBy("column_name")
