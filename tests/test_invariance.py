"""Scale-invariance + property tests (SURVEY §5): results must not depend
on partitioning (n_buckets), batch size, or input row order; windows match
a pandas oracle on randomized inputs (hypothesis)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from modlyn_ray import synth
from modlyn_ray.stages.count_stats import count_stats
from modlyn_ray.stages.temporal import window_kernel, windowize


def _cs(ds, **kw):
    return (
        count_stats(ds, **kw)
        .to_pandas()
        .sort_values(["source", "token_id"])
        .reset_index(drop=True)
    )


def test_count_stats_invariant_to_batch_size_and_order():
    t = synth.make_sequences(synth.TINY)
    base = _cs(rd.from_arrow(t))
    small_batches = _cs(rd.from_arrow(t), batch_size=7)
    pd.testing.assert_frame_equal(base, small_batches)
    perm = np.random.default_rng(3).permutation(len(t))
    shuffled = _cs(rd.from_arrow(t.take(pa.array(perm))))
    pd.testing.assert_frame_equal(base, shuffled)


def test_windowize_invariant_to_n_buckets():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    outs = []
    for nb in (1, 3, 16):
        o = (
            windowize(
                rd.read_parquet(f"{d}/sequences"),
                lag_cols=["n_tok"],
                lead_cols=["n_tok"],
                n_buckets=nb,
            )
            .to_pandas()
            .sort_values("seq_no")
            .reset_index(drop=True)
        )
        outs.append(o[["seq_no", "lag1_n_tok", "lead1_n_tok", "session_id"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


@st.composite
def _timeline(draw):
    n = draw(st.integers(2, 60))
    docs = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    return docs, ts, vals


@given(_timeline())
@settings(max_examples=25, deadline=None)
def test_window_kernel_matches_pandas(data):
    docs, ts, vals = data
    n = len(docs)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{d}" for d in docs]),
            "ingest_ts": pa.array(
                np.asarray(ts, dtype=np.int64) * 1_000_000, type=pa.timestamp("us")
            ),
            "seq_no": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.asarray(vals, dtype=np.float64)),
        }
    )
    out = window_kernel(
        tbl,
        lag_cols=["v"],
        lead_cols=["v"],
        backfill_cols=[],
        prefix_sum_cols=["v"],
        sessionize=True,
        session_gap_us=10_000_000,  # 10 "seconds"
        session_on_source_change=False,
        by="doc_id",
        ts_col="ingest_ts",
        tie_col="seq_no",
    ).to_pandas()
    out = out.sort_values("seq_no").reset_index(drop=True)

    df = tbl.to_pandas()
    df["ts_int"] = df["ingest_ts"].astype("int64")
    df = df.sort_values(["doc_id", "ts_int", "seq_no"], kind="stable")
    g = df.groupby("doc_id", sort=False)
    df["lag1_v"] = g["v"].shift(1)
    df["lead1_v"] = g["v"].shift(-1)
    df["cum_v"] = g["v"].cumsum()
    new_doc = df["doc_id"].ne(df["doc_id"].shift(1))
    brk = new_doc | ((df["ts_int"].diff() > 10_000_000) & ~new_doc)
    sid = brk.cumsum()
    df["session_id"] = sid - sid.where(new_doc).ffill()
    df = df.sort_values("seq_no").reset_index(drop=True)

    for col in ["lag1_v", "lead1_v", "cum_v", "session_id"]:
        np.testing.assert_allclose(
            out[col].astype(float).to_numpy(),
            df[col].astype(float).to_numpy(),
            err_msg=col,
            equal_nan=True,
        )
