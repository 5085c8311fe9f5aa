"""Stage-level tests for the round-4 additions:

- distinct_set_op: SQL INTERSECT/EXCEPT DISTINCT semantics — emit-once,
  NULL *does* equal NULL in set ops (IS NOT DISTINCT FROM), unlike joins.
- melt: wide->long unpivot drops NULL values (SQL UNPIVOT contract) and
  round-trips against the raw columns.
- resample_gap_fill: missing buckets appear as explicit zero rows; the
  grid spans exactly [min, max]; distributed result matches pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_set_op_intersect_except_distinct(ray_session):
    from modlyn_ray.stages.joins import distinct_set_op

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, None, None, 7], pa.int64())})
    )
    right = rd.from_arrow(pa.table({"k": pa.array([2, 3, 3, 4, None], pa.int64())}))
    inter = distinct_set_op(left, right, "k", "k", op="intersect", n_buckets=4).to_pandas()["k"]
    # SQL: SELECT k FROM l INTERSECT SELECT k FROM r -> {2, 3, NULL}
    assert len(inter) == 3 and inter.isna().sum() == 1
    assert sorted(inter.dropna().tolist()) == [2, 3]
    exc = sorted(
        distinct_set_op(left, right, "k", "k", op="except", n_buckets=4)
        .to_pandas()["k"]
        .tolist()
    )
    assert exc == [1, 7]


def test_set_op_matches_duckdb_on_random_keys(ray_session):
    import duckdb

    from modlyn_ray.stages.joins import distinct_set_op

    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 300).astype(np.int64)
    b = rng.integers(25, 75, 300).astype(np.int64)
    la = pd.DataFrame({"k": a})
    rb = pd.DataFrame({"k": b})
    con = duckdb.connect()
    con.register("la", la)
    con.register("rb", rb)
    for op, sql_op in [("intersect", "INTERSECT"), ("except", "EXCEPT")]:
        want = sorted(
            con.execute(f"SELECT k FROM la {sql_op} SELECT k FROM rb").df()["k"].tolist()
        )
        got = sorted(
            distinct_set_op(
                rd.from_pandas(la), rd.from_pandas(rb), "k", "k", op=op, n_buckets=8
            )
            .to_pandas()["k"]
            .tolist()
        )
        assert got == want, op


def test_melt_drops_nulls_and_round_trips(ray_session):
    from modlyn_ray.stages.aggregates import melt

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "x": pa.array([1.0, None, 3.0]),
            "y": pa.array([10, 20, 30], pa.int64()),
        }
    )
    out = (
        melt(rd.from_arrow(t), id_cols=["id"], value_cols=["x", "y"])
        .to_pandas()
        .sort_values(["metric", "id"], ignore_index=True)
    )
    # null x for id=2 dropped (SQL UNPIVOT), ints cast to float64
    assert out["metric"].tolist() == ["x", "x", "y", "y", "y"]
    assert out["id"].tolist() == [1, 3, 1, 2, 3]
    assert out["val"].tolist() == [1.0, 3.0, 10.0, 20.0, 30.0]
    assert out["val"].dtype == np.float64


def test_melt_rejects_name_clash(ray_session):
    import pytest

    from modlyn_ray.stages.aggregates import melt

    t = pa.table({"metric": pa.array([1]), "x": pa.array([1.0])})
    with pytest.raises(ValueError, match="clash"):
        melt(rd.from_arrow(t), id_cols=["metric"], value_cols=["x"])


def test_resample_gap_fill_emits_zero_rows(ray_session):
    from modlyn_ray.stages.temporal import resample_gap_fill

    # hours 00, 01, 04 present -> 02, 03 must appear with n=0
    ts = pd.to_datetime(
        [
            "2024-01-01 00:10",
            "2024-01-01 00:50",
            "2024-01-01 01:30",
            "2024-01-01 04:05",
        ]
    )
    df = pd.DataFrame({"ts": ts, "value": [1.0, 2.0, 3.0, 4.0]})
    out = resample_gap_fill(
        rd.from_pandas(df), ts_col="ts", value_col="value", unit="hour"
    )
    assert len(out) == 5
    assert out["n"].tolist() == [2, 1, 0, 0, 1]
    assert out["sum_value"].tolist() == [3.0, 3.0, 0.0, 0.0, 4.0]
    hours = pd.to_datetime(out["bucket_ts"]).dt.hour.tolist()
    assert hours == [0, 1, 2, 3, 4]


def test_resample_gap_fill_matches_pandas_resample(ray_session):
    from modlyn_ray.stages.temporal import resample_gap_fill

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-03-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.choice(14 * 24 * 60, 500, replace=False)), unit="min"
    )
    df = pd.DataFrame({"ts": ts, "value": rng.normal(size=500)})
    out = resample_gap_fill(
        rd.from_pandas(df).repartition(7), ts_col="ts", value_col="value", unit="hour"
    )
    want = (
        df.set_index("ts")
        .resample("h")["value"]
        .agg(["count", "sum"])
        .reset_index()
        .rename(columns={"ts": "bucket_ts", "count": "n", "sum": "sum_value"})
    )
    got = out.reset_index(drop=True)
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], atol=1e-12)
