"""Driver-contract emulation: every queries() entry vs its oracle_sql()
via DuckDB — row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:  # noqa: ANN001
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con(sf_dir):  # noqa: ANN001
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


SQL_KEYS = sorted(entrymod.oracle_sql().keys())


def test_every_oracle_key_has_a_query() -> None:
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(name: str, ray_session, sf_dir, con) -> None:  # noqa: ANN001
    ray_df = _canon(_to_pandas(entrymod.queries()[name](sf_dir)))
    sql_df = _canon(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        name,
        ray_df.columns,
        sql_df.columns,
    )
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=False, atol=1e-6)


def test_rows_only_queries_run(ray_session, sf_dir) -> None:  # noqa: ANN001
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = _to_pandas(qs[name](sf_dir))
        assert len(df) >= 0 and len(df.columns) > 0, name


def test_entry_smoke(ray_session) -> None:  # noqa: ANN001
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert {"url", "status", "content_hash"} <= set(df.columns)
    assert not math.isnan(len(df))
