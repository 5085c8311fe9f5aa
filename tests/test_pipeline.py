"""Flagship PIT pipeline + checkpoint/resume tests."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.pipelines.flagship import pit_features
from modlyn_ray.schema import tokens_checksum
from modlyn_ray.state import checkpoint as ckpt


def test_pit_features_end_to_end():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    seqs = rd.read_parquet(f"{d}/sequences")
    attrs = rd.read_parquet(f"{d}/doc_attrs.parquet")
    out = pit_features(seqs, attrs, n_buckets=16)
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    cat = pa.concat_tables(batches)
    assert len(cat) == profile.n_rows
    # token byte-identity through the full pipeline
    assert tokens_checksum(cat) == tokens_checksum(synth.make_sequences(profile))
    pdf = cat.drop_columns(["tokens"]).to_pandas().sort_values("seq_no").reset_index(drop=True)
    # prefix accumulators: cum_n_tok within a doc equals pandas cumsum oracle
    o = pdf.sort_values(["doc_id", "ingest_ts", "seq_no"], kind="stable")
    want = o.groupby("doc_id", sort=False)["n_tok"].cumsum().astype(float)
    pd.testing.assert_series_equal(o["cum_n_tok"], want, check_names=False)
    # anti-leak on asof
    m = pdf["matched_asof_ts"].notna()
    assert (pdf.loc[m, "matched_asof_ts"] <= pdf.loc[m, "ingest_ts"]).all()


def test_pit_narrow_tokens_byte_identical():
    """narrow_tokens=True (int16 exchange payload) must be byte-identical
    to the default path — same values, same schema (tokens widened back to
    list<int32> after the bucket kernel)."""
    profile = synth.SMALL
    d = synth.ensure_profile(profile)

    def run(narrow):
        out = pit_features(
            rd.read_parquet(f"{d}/sequences"),
            rd.read_parquet(f"{d}/doc_attrs.parquet"),
            n_buckets=8,
            narrow_tokens=narrow,
        )
        cat = pa.concat_tables(
            out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        )
        order = pa.compute.sort_indices(cat["seq_no"].combine_chunks())
        return cat.take(order).combine_chunks()

    base, narrow = run(False), run(True)
    assert base.schema.equals(narrow.schema)
    assert narrow.schema.field("tokens").type == pa.list_(pa.int32())
    assert tokens_checksum(narrow) == tokens_checksum(base)
    for name in base.column_names:
        assert base[name].equals(narrow[name]), name


def test_pit_push_based_shuffle_byte_identical():
    """bench.py defaults to SORT_SHUFFLE_PUSH_BASED; the strategy must be
    semantically transparent — identical output tables vs the default
    pull-based sort shuffle."""
    from ray.data.context import DataContext, ShuffleStrategy

    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy

    def run():
        out = pit_features(
            rd.read_parquet(f"{d}/sequences"),
            rd.read_parquet(f"{d}/doc_attrs.parquet"),
            n_buckets=8,
            narrow_tokens=True,
        )
        cat = pa.concat_tables(
            out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
        )
        order = pa.compute.sort_indices(cat["seq_no"].combine_chunks())
        return cat.take(order).combine_chunks()

    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        pull = run()
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        push = run()
    finally:
        ctx.shuffle_strategy = prev
    assert pull.schema.equals(push.schema)
    for name in pull.column_names:
        assert pull[name].equals(push[name]), name


def test_pit_leakage_ablation():
    """Dropping future rows must leave all features at <= t identical
    (lead1_* excluded — labeled future targets, not features)."""
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    full_tbl = synth.make_sequences(profile)
    attrs_tbl = synth.make_doc_attrs(profile)
    ts = full_tbl["ingest_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    t_cut = int(np.quantile(ts, 0.5))

    def run(tbl):
        out = pit_features(
            rd.from_arrow(tbl), rd.from_arrow(attrs_tbl), n_buckets=4, detect_skew=False
        ).to_pandas()
        out["ts_int"] = out["ingest_ts"].astype("int64")
        out = out[out["ts_int"] <= t_cut]
        return out.sort_values("seq_no").reset_index(drop=True)

    full = run(full_tbl)
    abl = run(full_tbl.filter(pa.array(ts <= t_cut)))
    feature_cols = ["lag1_n_tok", "session_id", "cum_n_tok", "cum_row_mix", "attr_val_asof"]
    for c in feature_cols:
        pd.testing.assert_series_equal(
            full[c].astype(float), abl[c].astype(float), check_names=False, obj=c
        )


def test_checkpoint_resume(tmp_path):
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    out_dir = str(tmp_path / "stage_pit")
    calls = []

    def build():
        calls.append(1)
        return pit_features(
            rd.read_parquet(f"{d}/sequences"),
            rd.read_parquet(f"{d}/doc_attrs.parquet"),
            n_buckets=4,
            detect_skew=False,
        )

    ds1 = ckpt.run_stage(out_dir, "pit", build, config={"n_buckets": 4}, token_checksum=True)
    assert len(calls) == 1
    n1 = ds1.count()
    man = ckpt.read_manifest(out_dir)
    assert man["rows"] == n1 == profile.n_rows
    assert man["tokens_checksum"] == tokens_checksum(synth.make_sequences(profile))
    assert man["wall_sec"] > 0

    # resume: build NOT called again
    ds2 = ckpt.run_stage(out_dir, "pit", build)
    assert len(calls) == 1
    assert ds2.count() == n1

    # corrupt a file -> manifest invalid -> recompute
    data_dir = os.path.join(out_dir, "data")
    f0 = [f for f in os.listdir(data_dir) if f.endswith(".parquet")][0]
    with open(os.path.join(data_dir, f0), "ab") as fh:
        fh.write(b"x")
    assert not ckpt.is_complete(out_dir)
    ds3 = ckpt.run_stage(out_dir, "pit", build)
    assert len(calls) == 2
    assert ds3.count() == n1
    shutil.rmtree(out_dir, ignore_errors=True)
