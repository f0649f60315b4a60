"""Smoke the __ray_entry__ driver contract at sf0.001 (fast subset)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# fast, representative subset (one per family); the full 27-entry surface
# is exercised by scripts/check_oracle.py at sf0.01
SQL_CHECKED = ["search_term_stats", "dedup_exact", "rel_top_parts", "text_token_stats"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_runs(entrymod):
    df = _to_df(entrymod.entry())
    assert len(df) >= 0
    assert set(df.columns) == {"query_id", "rank", "docid", "score"}


def test_oracle_keys_subset(entrymod):
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_subset(entrymod, name):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    got = _norm(_to_df(entrymod.queries()[name](SF_DIR)))
    want = _norm(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(got) == len(want), name
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            np.testing.assert_allclose(a.astype(float), b.astype(float), atol=1e-9)
        else:
            assert (a.astype(object) == b.astype(object)).all(), (name, c)
