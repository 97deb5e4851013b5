"""CSV convenience I/O — reference-API parity.

The reference's only ingest/egress format is CSV
(/root/reference/backend/app/utils/io.py:46-50 ``load_csv`` via
pd.read_csv; /root/reference/backend/app/main.py:386-394 streams
``df.to_csv(index=False)`` back). The engine is parquet-first (the
IceMini table format), but a user of the reference should be able to
point the same CSV files at this engine, so:

- ``read_csv_table`` — schema-or-inferred CSV scan with the pandas-ish
  defaults the reference relies on (header row, empty string → null).
  With ``schema=None`` Spark infers types in one extra pass, matching
  pd.read_csv's dtype inference closely enough for the 4-type logical
  system (SURVEY.md §1.1).
- ``export_csv`` — header'd CSV out. Distributed (one file per
  partition) by default; ``single_file=True`` coalesces to one part and
  renames it to exactly ``path`` for to_csv-style ergonomics (driver
  never buffers the data — the coalesced write is still an executor
  write).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header).option("nullValue", "")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def export_csv(
    df: DataFrame, path: str, header: bool = True, single_file: bool = False
) -> str:
    """Write ``df`` as CSV. Returns the written path (the directory for
    the distributed layout, the file itself for ``single_file``)."""
    if not single_file:
        df.write.mode("overwrite").option("header", header).csv(path)
        return path
    if os.path.isdir(path):
        # e.g. a previous distributed export to the same path — silently
        # replacing a directory tree with one file would destroy data
        raise IsADirectoryError(
            f"export_csv(single_file=True): {path} is an existing directory "
            "(previous distributed export?); remove it or pick another path"
        )
    tmp_dir = f"{path}.__csv_tmp__"
    try:
        df.coalesce(1).write.mode("overwrite").option("header", header).csv(tmp_dir)
        part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))
        if not part:  # empty frame with no rows still writes a header-only part
            part = glob.glob(os.path.join(tmp_dir, "part-*"))
        if not part:
            raise FileNotFoundError(
                f"export_csv: Spark wrote no part file under {tmp_dir}"
            )
        os.replace(part[0], path)
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return path
