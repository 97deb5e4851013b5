"""Shared Spark session + synthetic fixtures for the test suite.

One session per pytest run (startup ≈ 15 s); local[4] with a small
shuffle-partition count so tiny-frame tests don't over-schedule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datalakequality_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def messy_pdf() -> pd.DataFrame:
    """FIXTURES.md F2-style frame: missing values, duplicate rows, PII,
    z>3 outliers — every kernel has non-trivial input."""
    rng = np.random.default_rng(42)
    n = 2000
    pdf = pd.DataFrame(
        {
            "customer_id": np.arange(n),
            "email": [f"user{i}@example.com" if i % 7 else None for i in range(n)],
            "phone": [f"+1 555-{1000 + i:07d}" if i % 3 else None for i in range(n)],
            "signup_date": [f"2024-{1 + i % 12:02d}-{1 + i % 28:02d}" for i in range(n)],
            "age": np.where(rng.random(n) < 0.05, np.nan, rng.normal(40, 12, n).round()),
            "amount": np.where(rng.random(n) < 0.02, np.nan, rng.lognormal(4, 1, n)),
        }
    )
    pdf = pd.concat([pdf, pdf.iloc[:40]], ignore_index=True)  # exact dup rows
    pdf.loc[5:9, "amount"] = 1e6  # extreme outliers
    return pdf


@pytest.fixture(scope="session")
def messy_sdf(spark, messy_pdf):
    return spark.createDataFrame(messy_pdf)
