"""Sessionization + as-of join semantics (operators/sessions.py),
pandas-oracle style: tiny frames with hand-computable answers, plus
boundary cases (exact gap, ties, unmatched left rows)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datalakequality_spark.operators.sessions import (
    asof_join,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def test_sessionize_gap_boundary(spark):
    # gaps: 1800s exactly → SAME session (rule is strictly greater);
    # 1800.000001s → new session
    rows = [
        (1, _ts(0)),
        (1, _ts(1800)),          # == gap → same session
        (1, _ts(3600.000001)),   # > gap since prev → new session
        (2, _ts(0)),             # separate user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in sessionize(df, "user_id", "ts", 1800).collect()
    }
    assert got[(1, _ts(0))] == 0
    assert got[(1, _ts(1800))] == 0
    assert got[(1, _ts(3600.000001))] == 1
    assert got[(2, _ts(0))] == 0


def test_session_stats(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(5000)), (1, _ts(5001))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["span_seconds"])
        for r in session_stats(df, "user_id", "ts", 1800).collect()
    }
    assert out[(1, 0)] == (2, 10.0)
    assert out[(1, 1)] == (2, 1.0)


def test_asof_join_basic_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "a"), (1, _ts(10), "b"), (2, _ts(50), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(99), 2.0), (3, _ts(0), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["asof_value"], r["asof_ts"])
        for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()
    }
    assert out["a"] == (2.0, _ts(99))  # latest at-or-before 100
    assert out["b"] == (1.0, _ts(10))  # equal timestamps match
    assert out["c"] == (None, None)    # user 2 has no right rows

    tol = {
        r["tag"]: r["asof_value"]
        for r in asof_join(
            left, right, "user_id", "ts", ["value"], tolerance_seconds=5
        ).collect()
    }
    assert tol["a"] == 2.0   # 1s old, inside tolerance
    assert tol["b"] == 1.0   # 0s old
    assert tol["c"] is None


def test_asof_join_single_shuffle_plan(spark):
    # union-and-carry must cost ONE exchange (hash on the key), not a
    # per-side join explosion
    left = spark.createDataFrame([(1, _ts(1), "x")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "user_id long, ts timestamp, value double")
    plan = (
        asof_join(left, right, "user_id", "ts", ["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_chunks(spark):
    from datalakequality_spark.operators.textanalysis import pack_chunks

    df = spark.createDataFrame(
        [(1, 33), (2, 16), (3, 0)], "doc_id long, n long"
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_tokens"])
        for r in pack_chunks(df, "doc_id", "n", window=16).collect()
    )
    assert out == [
        (1, 0, 16), (1, 1, 16), (1, 2, 1),  # 33 = 16+16+1
        (2, 0, 16),                          # exact fit → one chunk
        (3, 0, 0),                           # empty doc keeps a row
    ]


def test_ivf_topk_matches_brute_force(spark):
    import numpy as np

    from datalakequality_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(7)
    base = rng.standard_normal((200, 16))
    query = base[0].tolist()
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # plant 5 strong neighbors of the query
    rows += [(1000 + j, (base[0] + 0.1 * rng.standard_normal(16)).tolist()) for j in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = [r["vec_id"] for r in cosine_topk(df, "vec_id", "embedding", query, k=6).collect()]
    approx = [r["vec_id"] for r in ivf_topk(df, "vec_id", "embedding", query, k=6, n_centroids=8, n_probe=4).collect()]
    assert approx == exact  # planted-neighbor construction: IVF == brute force
