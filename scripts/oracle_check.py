"""Local stand-in for the driver's CORRECTNESS gate: run named entry
queries on Spark AND their DuckDB oracle SQL at sf0.01, compare row
count, schema (column names), and order-insensitive values (columns
sorted by name, rows sorted, exact match for ints/strings, 1e-9 for
floats).

Usage: python scripts/oracle_check.py [query ...]   (default: all with
an oracle)
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        rows.append(tuple(t))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main() -> None:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from datalakequality_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]")
    for t in TABLES:
        duckdb.sql(
            f"create or replace view {t} as select * from '{sf}/{t}.parquet'"
        )

    names = sys.argv[1:] or [k for k in entry.queries() if k in entry.oracle_sql()]
    oracles = entry.oracle_sql()
    failed = []
    for name in names:
        sdf = entry.queries()[name](spark, sf).toPandas()
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows={len(sdf)})")
            continue
        odf = duckdb.sql(oracles[name]).df()
        scols, srows = _norm(sdf)
        ocols, orows = _norm(odf)
        ok = scols == ocols and len(srows) == len(orows)
        bad = None
        if ok:
            for i, (sr, orow) in enumerate(zip(srows, orows)):
                if not all(_eq(a, b) for a, b in zip(sr, orow)):
                    ok, bad = False, (i, sr, orow)
                    break
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} (spark_rows={len(srows)} oracle_rows={len(orows)})")
        if not ok:
            failed.append(name)
            if scols != ocols:
                print(f"  schema: spark={scols} oracle={ocols}")
            if bad:
                print(f"  first diff row {bad[0]}:\n    spark : {bad[1]}\n    oracle: {bad[2]}")
    if failed:
        raise SystemExit(f"FAILED: {failed}")
    print("all green")


if __name__ == "__main__":
    main()
