"""Ranking windows (q43) + regex redaction (q29) — kernel edge cases,
partitioning invariance, and DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _events_tbl(n=200, users=7, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, users, n).astype(np.int64)),
            "ts": pa.array(
                rng.integers(0, 10_000, n).astype("datetime64[us]").astype("datetime64[us]")
            ),
            # coarse grid so value ties within a user are guaranteed
            "value": pa.array(np.round(rng.uniform(0, 3, n), 0)),
        }
    )


def test_rank_kernel_matches_duckdb_window_functions():
    from modlyn_ray.stages.ranks import rank_kernel

    tbl = _events_tbl()
    got = (
        rank_kernel(tbl)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.execute(
        """
        SELECT event_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
          RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk,
          DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS drnk
        FROM ev ORDER BY event_id
        """
    ).fetchdf()
    for c in ("rn", "rnk", "drnk"):
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy().astype(np.int64)), c


def test_rank_kernel_edges():
    from modlyn_ray.stages.ranks import rank_kernel

    # all-equal values in one group: every rank 1, dense 1, rn 1..n
    tbl = pa.table(
        {
            "event_id": pa.array([3, 1, 2], pa.int64()),
            "user_id": pa.array([5, 5, 5], pa.int64()),
            "ts": pa.array(np.array([30, 10, 20], "datetime64[us]")),
            "value": pa.array([1.5, 1.5, 1.5]),
        }
    )
    out = rank_kernel(tbl).to_pandas().sort_values("event_id")
    assert out["rnk"].tolist() == [1, 1, 1]
    assert out["drnk"].tolist() == [1, 1, 1]
    assert out.sort_values("ts")["rn"].tolist() == [1, 2, 3]

    # empty input keeps the schema
    empty = rank_kernel(tbl.slice(0, 0))
    assert empty.num_rows == 0
    assert {"rn", "rnk", "drnk"} <= set(empty.column_names)


def test_rank_windows_partitioning_invariance(ray_session):
    from modlyn_ray.stages.ranks import rank_windows

    tbl = _events_tbl(n=500, users=11)

    def run(nb):
        return (
            rank_windows(rd.from_arrow(tbl), n_buckets=nb)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "rn", "rnk", "drnk"]]
        )

    pd.testing.assert_frame_equal(run(1), run(16))


def test_regex_redact_matches_duckdb(ray_session):
    from modlyn_ray.stages.text import regex_redact

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        regex_redact(ds, pattern=r"\b(s\w*|table)\b", replacement="<T>")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        rf"""
        SELECT doc_id,
               regexp_replace(text, '\b(s\w*|table)\b', '<T>', 'g') AS redacted,
               len(regexp_extract_all(text, '\b(s\w*|table)\b'))::BIGINT AS n_hits
        FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id
        """
    ).fetchdf()
    assert got["redacted"].tolist() == want["redacted"].tolist()
    assert np.array_equal(got["n_hits"].to_numpy(), want["n_hits"].to_numpy())
    assert int(got["n_hits"].sum()) > 0  # the pattern actually fires
