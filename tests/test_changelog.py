"""Changelog (CDC) scan: row-level diffs per commit, content-preserving
rewrites skipped, replaying the changelog reproduces the target state.

Reference analogue: none (the reference has no table format). Shape
follows Iceberg's changelog scan / create_changelog_view semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalakequality_spark.maintenance.clustering import rewrite_sorted
from datalakequality_spark.maintenance.compaction import compact_table
from datalakequality_spark.maintenance.merge import (
    delete_where,
    merge_into,
)
from datalakequality_spark.sources.datagen import generate_sequences
from datalakequality_spark.sources.icemini import IceMiniTable


def _bag(df):
    """Multiset of (doc_id, n_tok, source, token-sum) rows."""
    rows = (
        df.select(
            "doc_id",
            "n_tok",
            "source",
            F.aggregate(
                "tokens", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("ts"),
        )
        .collect()
    )
    out: dict[tuple, int] = {}
    for r in rows:
        k = (r.doc_id, r.n_tok, r.source, r.ts)
        out[k] = out.get(k, 0) + 1
    return out


def _apply_changes(state: dict[tuple, int], changes) -> dict[tuple, int]:
    st = dict(state)
    for r in changes.collect():
        k = (r.doc_id, r.n_tok, r.source, r.ts)
        if r._change_type == "DELETE":
            assert st.get(k, 0) > 0, f"DELETE of absent row {k}"
            st[k] -= 1
            if not st[k]:
                del st[k]
        else:
            st[k] = st.get(k, 0) + 1
    return st


def _changes(t: IceMiniTable, lo: int, hi: int | None = None):
    return t.changelog_scan(lo, hi).select(
        "doc_id",
        "n_tok",
        "source",
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "ts"
        ),
        "_change_type",
        "_commit_version",
    )


def test_changelog_replay_reconstructs_every_state(spark, tmp_path):
    """append → MoR merge → compaction → MoR delete → CoW update:
    replaying (v, v+1] changes onto state(v) yields state(v+1) for every
    commit, and the full-range replay yields the final state."""
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 2000), target_file_rows=250)  # v1
    v1 = t.current_version()
    upd = generate_sequences(spark, 400, start_id=100, rev=1)
    merge_into(t, upd, mode="merge_on_read")  # 400 in-place updates
    compact_table(t, target_bytes=64 * 1024 * 1024)  # content-preserving
    delete_where(t, "n_tok % 7 = 0", mode="merge_on_read")
    from datalakequality_spark.maintenance.merge import update_where

    update_where(t, "n_tok % 11 = 0", {"source": F.lit("patched")})
    hi = t.current_version()

    states = {v: _bag(t.scan(v)) for v in range(v1, hi + 1)}
    for v in range(v1, hi):
        got = _apply_changes(states[v], _changes(t, v, v + 1))
        assert got == states[v + 1], f"replay {v}->{v + 1} diverged"
    assert _apply_changes(states[v1], _changes(t, v1)) == states[hi]


def test_changelog_skips_content_preserving_rewrites(spark, tmp_path):
    """Compaction and the fused sorted rewrite emit ZERO change rows —
    and contribute zero scan I/O (they are skipped before any read)."""
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 1500), target_file_rows=100)
    v1 = t.current_version()
    compact_table(t, target_bytes=64 * 1024 * 1024)
    rewrite_sorted(t, method="zorder", target_rows_per_file=500)
    assert t.current_version() > v1
    assert _changes(t, v1).count() == 0


def test_changelog_mor_delete_emits_only_deleted_rows(spark, tmp_path):
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 1000), target_file_rows=250)
    v1 = t.current_version()
    before = _bag(t.scan())
    delete_where(t, "n_tok % 5 = 0", mode="merge_on_read")
    after = _bag(t.scan())
    ch = _changes(t, v1).collect()
    assert all(r._change_type == "DELETE" for r in ch)
    gone = {(r.doc_id, r.n_tok, r.source, r.ts) for r in ch}
    assert gone == set(before) - set(after)
    # a second delete of the SAME predicate emits nothing new (those
    # rows are already invisible — no double-DELETE)
    v2 = t.current_version()
    delete_where(t, "n_tok % 5 = 0", mode="merge_on_read")
    assert _changes(t, v2).count() == 0


def test_changelog_mor_merge_emits_delete_insert_pairs(spark, tmp_path):
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 1000), target_file_rows=250)
    v1 = t.current_version()
    src = generate_sequences(spark, 300, start_id=800, rev=1)  # 200 upd, 100 new
    merge_into(t, src, mode="merge_on_read")
    ch = _changes(t, v1)
    ins = ch.where("_change_type = 'INSERT'")
    dele = ch.where("_change_type = 'DELETE'")
    assert ins.count() == 300  # every source row becomes visible
    assert dele.count() == 200  # only previously-existing keys deleted
    assert (
        dele.select("doc_id").distinct().join(
            src.select("doc_id"), "doc_id", "left_anti"
        ).count()
        == 0
    )


def test_changelog_rollback_and_quarantined_rewrite(spark, tmp_path):
    """A rollback across a delete commit re-emits the rows as INSERTs
    (visibility restored on unchanged files); a gated rewrite that
    quarantines files emits their rows as DELETEs."""
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 1000), target_file_rows=250)
    state1 = _bag(t.scan())
    v1 = t.current_version()
    delete_where(t, "n_tok % 4 = 0", mode="merge_on_read")
    v2 = t.current_version()
    t.rollback_to(v1)
    v3 = t.current_version()
    ch = _changes(t, v2, v3).collect()
    assert all(r._change_type == "INSERT" for r in ch)
    assert _apply_changes(_bag(t.scan(v2)), _changes(t, v2, v3)) == state1

    # poison some rows, gated rewrite quarantines their file
    bad = generate_sequences(spark, 50, start_id=10**8).withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("+x@example.com"))
    )
    t.append(bad, target_file_rows=50)
    v4 = t.current_version()
    rewrite_sorted(t, method="zorder", target_rows_per_file=500, quality_gate=True)
    v5 = t.current_version()
    assert any(s.quarantine for s in t.snapshots())
    ch = _changes(t, v4, v5)
    assert ch.where("_change_type = 'INSERT'").count() == 0
    assert ch.where("_change_type = 'DELETE'").count() == 50
    assert _apply_changes(_bag(t.scan(v4)), ch) == _bag(t.scan(v5))


def test_changelog_invalid_range_and_full_history(spark, tmp_path):
    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 100))
    with pytest.raises(ValueError, match="changelog range"):
        t.changelog_scan(0)
    with pytest.raises(ValueError, match="changelog range"):
        t.changelog_scan(5, 2)
    # from_version=1 (the create snapshot) is the full history
    ch = _changes(t, 1)
    assert ch.count() == 100
    assert ch.where("_change_type = 'INSERT'").count() == 100


def test_cli_changelog_writes_change_parquet(spark, tmp_path, capsys):
    import json

    from datalakequality_spark import cli

    t = IceMiniTable.create(spark, str(tmp_path / "t"))
    t.append(generate_sequences(spark, 400), target_file_rows=200)
    v1 = t.current_version()
    delete_where(t, "n_tok % 3 = 0", mode="merge_on_read")
    expected_deletes = 400 - t.scan().count()

    out_dir = str(tmp_path / "changes")
    out = cli.main(
        ["changelog", "--table", t.root, "--from-version", str(v1),
         "--out", out_dir]
    )
    assert json.loads(capsys.readouterr().out.strip())["deletes"] == out["deletes"]
    assert out["inserts"] == 0 and out["deletes"] == expected_deletes
    written = spark.read.parquet(out_dir)
    assert written.count() == expected_deletes
    assert set(written.columns) >= {"doc_id", "_change_type", "_commit_version"}
