"""Distributed count-stats vs the single-process numpy oracle (golden parity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from modlyn_ray import oracle, synth
from modlyn_ray.stages.count_stats import count_stats


def _run_parity(profile):
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    got = (
        count_stats(ds)
        .to_pandas()
        .sort_values(["source", "token_id"])
        .reset_index(drop=True)
    )
    tbl = synth.make_sequences(profile)
    want = oracle.count_stats(tbl, profile.vocab)
    assert len(got) == len(want), (len(got), len(want))
    got = got[want.columns]
    pd.testing.assert_frame_equal(
        got.astype({"count": "int64", "df": "int64", "token_id": "int64"}),
        want,
        check_exact=False,
        rtol=1e-9,
        atol=1e-12,
    )


def test_tiny_parity():
    _run_parity(synth.TINY)


def test_small_parity():
    _run_parity(synth.SMALL)


def test_shuffle_aggregate_path_matches_tree_reduce():
    """The huge-vocab fallback (groupby shuffle with a local pre-combine)
    must produce exactly the tree-reduce default's result."""
    profile = synth.SMALL
    d = synth.ensure_profile(profile)

    def run(shuffle):
        return (
            count_stats(rd.read_parquet(f"{d}/sequences"), shuffle_aggregate=shuffle)
            .to_pandas()
            .sort_values(["source", "token_id"])
            .reset_index(drop=True)
        )

    tree, shuf = run(False), run(True)
    shuf = shuf[tree.columns]
    pd.testing.assert_frame_equal(tree, shuf, check_exact=False, rtol=1e-9, atol=1e-12)


def test_partials_are_small():
    # the pre-aggregation must emit far fewer rows than token occurrences
    from modlyn_ray.stages.count_stats import partial_counts

    t = synth.make_sequences(synth.SMALL)
    p = partial_counts(t)
    n_occurrences = int(np.sum(t["n_tok"].to_numpy()))
    assert len(p) < n_occurrences / 2
