"""Shared fixtures: one SparkSession per test run, a DuckDB oracle connection,
and the parity comparator that mimics the driver's check (row-count + schema
names + order-insensitive values)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_aws_spark.session import get_spark
from data_pipeline_aws_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running soak tests (wall-clock bound, e.g. the 75 s "
        "processingTime streaming soak); run by default, deselect with "
        '-m "not slow" for a quick loop',
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame the way the driver's hash effectively does:
    columns sorted by name, rows sorted by all values, types normalized."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[ns]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(sample.iloc[0], (list, np.ndarray)):
                df[c] = s.map(
                    lambda v: None
                    if v is None
                    else tuple(np.round(np.asarray(v, dtype="float64"), 6).tolist())
                )
    sort_cols = [c for c in df.columns]
    df = df.sort_values(by=sort_cols, ignore_index=True, kind="mergesort", na_position="first")
    return df


def assert_parity(spark_df, duck_rel_df: pd.DataFrame, *, check_names: bool = True):
    """Compare a Spark result against the DuckDB oracle result."""
    got = canon(spark_df.toPandas())
    want = canon(duck_rel_df)
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
    )
