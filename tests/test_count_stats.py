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


def test_row_token_counts_padded_matches_sort_fallback():
    """The padded per-row-sort fast path and the global-sort fallback of
    _row_token_counts must agree exactly on random ragged inputs, and the
    guard must route pathological (one-long-row) inputs to the fallback."""
    from modlyn_ray.stages.count_stats import _row_token_counts

    rng = np.random.default_rng(7)

    def reference(flat, lens, vmax):
        row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        key = row_idx * vmax + flat.astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        return uniq // vmax, uniq % vmax, cnt

    for trial in range(5):
        lens = rng.integers(0, 50, size=400).astype(np.int64)
        flat = rng.integers(0, 97, size=int(lens.sum())).astype(np.int32)
        vmax = int(flat.max()) + 1 if len(flat) else 1
        got = _row_token_counts(flat, lens, vmax)
        want = reference(flat, lens, vmax)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    # guard: one 5000-token row among 1-token rows -> padded blowup > 4x,
    # must still be correct (fallback path)
    lens = np.concatenate([[5000], np.ones(2000, dtype=np.int64)])
    flat = rng.integers(0, 31, size=int(lens.sum())).astype(np.int32)
    got = _row_token_counts(flat, lens, 31 + 1)
    want = reference(flat, lens, 31 + 1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # empty input
    z = _row_token_counts(np.empty(0, np.int32), np.zeros(3, np.int64), 1)
    assert all(len(a) == 0 for a in z)


def test_dense_merge_matches_pairwise_merge():
    """_merge_block_refs' dense-bincount fast path must agree exactly with
    the pairwise concat+unique reference on mixed table/tuple inputs,
    including sentinel rows, and its huge-vocab fallback must canonicalize."""
    import pyarrow as pa
    import ray

    from modlyn_ray.stages.count_stats import _SENT, _merge_block_refs, _merge_states

    rng = np.random.default_rng(11)
    tables = []
    for _ in range(5):
        n = int(rng.integers(100, 3000))
        cls = rng.integers(0, 7, n).astype(np.int64)
        tok = rng.integers(0, 900, n).astype(np.int64)
        tok[rng.random(n) < 0.01] = _SENT
        tables.append(
            pa.table(
                {
                    "key": pa.array((cls << 32) | tok),
                    "occ": pa.array(rng.integers(1, 9, n).astype(np.float64)),
                    "sumsq": pa.array(rng.random(n) * 100),
                    "df": pa.array(rng.integers(1, 5, n).astype(np.float64)),
                }
            )
        )

    got = ray.get(_merge_block_refs.remote(*tables))
    want = None
    for t in tables:
        want = _merge_states(
            want,
            (
                t["key"].to_numpy(),
                t["occ"].to_numpy(),
                t["sumsq"].to_numpy(),
                t["df"].to_numpy(),
            ),
        )
    order = np.argsort(got[0])
    np.testing.assert_array_equal(np.sort(got[0]), want[0])
    for i in (1, 2, 3):
        np.testing.assert_allclose(got[i][order], want[i], rtol=1e-12)

    # mixed tuple + table input (a level-2 merge consumes level-1 states)
    again = ray.get(_merge_block_refs.remote(got, tables[0]))
    assert len(again[0]) == len(want[0])

    # huge-vocab ids exceed the dense budget -> batched concat+unique path
    n = 500
    big_tok = rng.integers(0, 2**31, n).astype(np.int64)
    big = pa.table(
        {
            "key": pa.array(((np.arange(n, dtype=np.int64) % 3) << 32) | big_tok),
            "occ": pa.array(np.ones(n)),
            "sumsq": pa.array(np.ones(n)),
            "df": pa.array(np.ones(n)),
        }
    )
    merged = ray.get(_merge_block_refs.remote(big, big))
    assert np.all(np.diff(merged[0]) > 0)  # canonical (unique, sorted)
    np.testing.assert_allclose(merged[1], 2.0 * np.bincount(
        np.searchsorted(merged[0], big["key"].to_numpy()), minlength=len(merged[0])
    ))


def test_row_token_counts_property_vs_counter():
    """_row_token_counts (both the padded-row-sort fast path and the packed
    global-sort fallback) vs a per-row collections.Counter reference on
    randomized ragged shapes — the branch taken depends on padding ratio,
    matrix size, and value range, so shape randomization exercises every
    combination (uint16 / int32 / fallback)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from modlyn_ray.stages.count_stats import _row_token_counts

    @st.composite
    def _ragged(draw):
        n = draw(st.integers(0, 12))
        lens = [draw(st.integers(0, 9)) for _ in range(n)]
        # three regimes: tiny vocab (uint16 path), wide ids (int32 path),
        # and huge ids (vmax guard -> fallback)
        hi = draw(st.sampled_from([4, 2_000_000, 2**40]))
        vals = [
            [draw(st.integers(0, hi)) for _ in range(ln)] for ln in lens
        ]
        return lens, vals

    @given(_ragged())
    @settings(max_examples=60, deadline=None)
    def check(data):
        lens, vals = data
        flat = np.asarray([v for row in vals for v in row], dtype=np.int64)
        vmax = int(flat.max()) + 1 if len(flat) else 1
        row_of, tok_of, c_rt = _row_token_counts(
            flat, np.asarray(lens, dtype=np.int64), vmax
        )
        got = {(int(r), int(t)): int(c) for r, t, c in zip(row_of, tok_of, c_rt)}
        want = {
            (ri, tok): cnt
            for ri, row in enumerate(vals)
            for tok, cnt in Counter(row).items()
        }
        assert got == want

    check()
