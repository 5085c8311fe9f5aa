"""Driver-gate rehearsal: run every queries() entry at sf0.01 and compare
against its oracle_sql() via DuckDB — row count, schema-ish, sorted-values
equality (the same shape of check the external driver performs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _pairs():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(name, fn, sql):
    got = fn(SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _duck(sql)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            np.testing.assert_allclose(
                g[c].to_numpy(), w[c].to_numpy(), rtol=1e-9, atol=1e-9, err_msg=f"{name}.{c}"
            )
        else:
            assert g[c].tolist() == w[c].tolist(), f"{name}.{c} mismatch"


def test_rows_only_queries_run():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    for name in sorted(set(q) - set(o)):
        out = q[name](SF)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) > 0, name


def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    assert "session_id" in ds.schema().names
