"""Temporal operators vs pandas brute-force oracles (SURVEY §5 operator tests)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.schema import tokens_checksum
from modlyn_ray.stages.temporal import (
    DEFAULT_SESSION_GAP_US,
    add_bucket_column,
    asof_join,
    detect_heavy_keys,
    windowize,
)


def _seq_df(profile) -> pd.DataFrame:
    t = synth.make_sequences(profile)
    df = t.drop_columns(["tokens"]).to_pandas()
    df["ts_int"] = df["ingest_ts"].astype("int64")
    return df


def _window_oracle(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "ts_int", "seq_no"], kind="stable").reset_index(drop=True)
    g = df.groupby("doc_id", sort=False)
    df["lag1_n_tok"] = g["n_tok"].shift(1)
    df["lead1_n_tok"] = g["n_tok"].shift(-1)
    new_doc = df["doc_id"].ne(df["doc_id"].shift(1))
    gap = df["ts_int"].diff() > DEFAULT_SESSION_GAP_US
    src_chg = df["source"].ne(df["source"].shift(1))
    brk = new_doc | (gap & ~new_doc) | (src_chg & ~new_doc)
    sid = brk.cumsum()
    df["session_id"] = sid - sid.where(new_doc).ffill()
    return df


def test_windowize_matches_pandas_oracle():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    out = windowize(
        ds, lag_cols=["n_tok"], lead_cols=["n_tok"], sessionize=True, n_buckets=16
    )
    got = out.to_pandas()
    got["ts_int"] = got["ingest_ts"].astype("int64")
    got = got.sort_values("seq_no").reset_index(drop=True)

    want = _window_oracle(_seq_df(profile)).sort_values("seq_no").reset_index(drop=True)
    for col in ["lag1_n_tok", "lead1_n_tok", "session_id"]:
        pd.testing.assert_series_equal(
            got[col].astype("float64"),
            want[col].astype("float64"),
            check_names=False,
            obj=col,
        )


def test_windowize_token_byte_identity():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    out = windowize(ds, lag_cols=["n_tok"], n_buckets=8)
    # collect via arrow batches to avoid pandas round-trip of the list column
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    cat = pa.concat_tables(batches)
    orig = synth.make_sequences(profile)
    assert tokens_checksum(cat) == tokens_checksum(orig)
    # exact row-level equality after aligning on seq_no
    cat_sorted = cat.sort_by("seq_no")
    orig_sorted = orig.sort_by("seq_no")
    assert cat_sorted["tokens"].combine_chunks().cast(pa.list_(pa.int32())).equals(
        orig_sorted["tokens"].combine_chunks().cast(pa.list_(pa.int32()))
    )
    assert cat_sorted.schema.field("tokens").type == pa.list_(pa.int32())


def test_backfill():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")

    def sparse_col(b: pa.Table) -> pa.Table:
        v = b["n_tok"].to_numpy().astype(np.float64)
        keep = b["seq_no"].to_numpy() % 3 == 0
        arr = pa.array(np.where(keep, v, np.nan), from_pandas=False)
        arr = pc.if_else(pa.array(keep), pa.array(v), pa.scalar(None, pa.float64()))
        return b.append_column("sparse", arr)

    out = windowize(
        ds.map_batches(sparse_col, batch_format="pyarrow"),
        backfill_cols=["sparse"],
        sessionize=False,
        n_buckets=8,
    ).to_pandas()
    out = out.sort_values("seq_no").reset_index(drop=True)

    want = _seq_df(profile)
    want["sparse"] = np.where(want["seq_no"] % 3 == 0, want["n_tok"].astype(float), np.nan)
    want = want.sort_values(["doc_id", "ts_int", "seq_no"], kind="stable")
    want["sparse_ffill"] = want.groupby("doc_id", sort=False)["sparse"].ffill()
    want = want.sort_values("seq_no").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["sparse_ffill"], want["sparse_ffill"], check_names=False
    )


def _asof_oracle(seqs: pd.DataFrame, attrs: pd.DataFrame, strict=False) -> pd.DataFrame:
    rows = []
    attrs_by_doc = {k: g.sort_values(["ts_int", "attr_val"]) for k, g in attrs.groupby("doc_id")}
    for _, r in seqs.iterrows():
        g = attrs_by_doc.get(r["doc_id"])
        val, mts = np.nan, pd.NaT
        if g is not None:
            adm = g[g["ts_int"] < r["ts_int"]] if strict else g[g["ts_int"] <= r["ts_int"]]
            if len(adm):
                val = adm.iloc[-1]["attr_val"]
                mts = adm.iloc[-1]["ingest_ts"]
        rows.append({"seq_no": r["seq_no"], "attr_val_asof": val, "matched_ts": mts})
    return pd.DataFrame(rows)


def test_asof_join_matches_bruteforce():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    left = rd.read_parquet(f"{d}/sequences")
    right = rd.read_parquet(f"{d}/doc_attrs.parquet")
    out = asof_join(left, right, value_cols=["attr_val"], n_buckets=4).to_pandas()
    out = out.sort_values("seq_no").reset_index(drop=True)

    seqs = _seq_df(profile)
    attrs = synth.make_doc_attrs(profile).to_pandas()
    attrs["ts_int"] = attrs["ingest_ts"].astype("int64")
    want = _asof_oracle(seqs.sort_values("seq_no"), attrs).reset_index(drop=True)
    np.testing.assert_allclose(
        out["attr_val_asof"].to_numpy(dtype=float), want["attr_val_asof"].to_numpy(dtype=float)
    )
    # anti-leak invariant: matched_ts <= probe ts wherever matched
    m = out["matched_asof_ts"].notna()
    assert (out.loc[m, "matched_asof_ts"] <= out.loc[m, "ingest_ts"]).all()
    # some probes must miss (80% doc coverage + too-late versions)
    assert out["attr_val_asof"].isna().any()
    assert out["attr_val_asof"].notna().any()


def test_asof_join_strict_excludes_same_instant():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    left = rd.read_parquet(f"{d}/sequences")
    right = rd.read_parquet(f"{d}/doc_attrs.parquet")
    out = asof_join(left, right, value_cols=["attr_val"], n_buckets=4, strict=True).to_pandas()
    m = out["matched_asof_ts"].notna()
    assert (out.loc[m, "matched_asof_ts"] < out.loc[m, "ingest_ts"]).all()


def test_leakage_ablation():
    """W6: dropping all rows with ingest_ts > t leaves outputs at <= t identical
    (excluding lead columns, which are labeled future targets)."""
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    full_tbl = synth.make_sequences(profile)
    ts = full_tbl["ingest_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    t_cut = int(np.quantile(ts, 0.6))

    def run(tbl: pa.Table) -> pd.DataFrame:
        ds = rd.from_arrow(tbl)
        out = windowize(ds, lag_cols=["n_tok"], sessionize=True, n_buckets=4).to_pandas()
        out["ts_int"] = out["ingest_ts"].astype("int64")
        return out[out["ts_int"] <= t_cut].sort_values("seq_no").reset_index(drop=True)

    full = run(full_tbl)
    ablated = run(full_tbl.filter(pa.array(ts <= t_cut)))
    for col in ["lag1_n_tok", "session_id"]:
        pd.testing.assert_series_equal(
            full[col].astype(float), ablated[col].astype(float), check_names=False, obj=col
        )


def test_heavy_key_detection_and_dedicated_bucket():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    heavy = detect_heavy_keys(ds, n_buckets=16, threshold_frac=0.02, sample=0.3)
    assert "doc000000" in heavy  # synth forces doc 0 heavy
    assert all(b >= 16 for b in heavy.values())
    bds = add_bucket_column(ds, n_buckets=16, heavy=heavy)
    got = bds.filter(expr="doc_id == 'doc000000'").take(5)
    assert all(r["bucket"] == heavy["doc000000"] for r in got)


def test_windowize_rolling_matches_bruteforce():
    """roll_sum/roll_cnt over [t - W, t] within each doc vs an O(n^2)
    reference — many small docs + duplicate timestamps exercise the
    vectorized composite (doc_ord, ts_rank) bounds (q15's folded rolling
    RANGE semantics live here; q52's oracle covers only cumulative rows)."""
    rng = np.random.default_rng(41)
    n = 600
    docs = [f"d{int(i):03d}" for i in rng.integers(0, 60, n)]  # many tiny docs
    ts = rng.integers(0, 5000, n).astype(np.int64) * 1_000_000
    ts[rng.integers(0, n, 80)] = ts[rng.integers(0, n, 80)]  # force dup ts
    v = rng.normal(size=n)
    W = 600 * 1_000_000
    t = pa.table(
        {
            "doc_id": pa.array(docs),
            "ingest_ts": pa.array(ts, type=pa.timestamp("us")),
            "seq_no": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(v),
        }
    )
    out = (
        windowize(rd.from_arrow(t), rolling_cols=["v"], rolling_window_us=W, n_buckets=4)
        .to_pandas()
        .sort_values("seq_no")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"doc": docs, "ts": ts, "v": v})
    for i in range(n):
        m = (df["doc"] == docs[i]) & (df["ts"] >= ts[i] - W) & (df["ts"] <= ts[i])
        assert out.loc[i, "roll_cnt_v"] == int(m.sum()), i
        np.testing.assert_allclose(out.loc[i, "roll_sum_v"], df.loc[m, "v"].sum())
