"""Wilcoxon rank-sum scorer vs a dense numpy rank oracle."""

from __future__ import annotations

import numpy as np
import ray.data as rd

from modlyn_ray import oracle, synth
from modlyn_ray.stages.rank_stats import wilcoxon_scores


def _rankdata_avg(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties, scipy-free."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def _oracle_z(X: np.ndarray, y: np.ndarray, K: int, tie_correct: bool) -> np.ndarray:
    N, V = X.shape
    z = np.zeros((K, V))
    for j in range(V):
        r = _rankdata_avg(X[:, j])
        if tie_correct:
            _, t = np.unique(X[:, j], return_counts=True)
            corr = 1.0 - (t**3 - t).sum() / (N**3 - N) if N > 1 else 1.0
        else:
            corr = 1.0
        for c in range(K):
            n1 = (y == c).sum()
            rs = r[y == c].sum()
            mu = n1 * (N + 1) / 2.0
            s2 = n1 * (N - n1) * (N + 1) / 12.0 * corr
            z[c, j] = (rs - mu) / np.sqrt(s2) if s2 > 0 else 0.0
    return z


def _check(profile, tie_correct):
    d = synth.ensure_profile(profile)
    tbl = synth.make_sequences(profile)
    X, y, classes = oracle.dense_counts(tbl, profile.vocab)
    want = _oracle_z(X, y, len(classes), tie_correct)

    got = wilcoxon_scores(
        rd.read_parquet(f"{d}/sequences"), tie_correct=tie_correct
    ).to_pandas()
    assert sorted(got["class"].unique()) == classes
    for c_i, cname in enumerate(classes):
        sub = got[got["class"] == cname].set_index("token_id")["score"]
        for j in sub.index:
            np.testing.assert_allclose(sub[j], want[c_i, j], rtol=1e-9, atol=1e-12)


def test_wilcoxon_tiny():
    _check(synth.TINY, tie_correct=False)


def test_wilcoxon_tiny_tie_correct():
    _check(synth.TINY, tie_correct=True)


def test_wilcoxon_small():
    _check(synth.SMALL, tie_correct=False)


def test_wilcoxon_plugs_into_compare_scores():
    from modlyn_ray.eval.jaccard import compute_jaccard_comparison
    from modlyn_ray.stages.count_stats import count_stats
    import pyarrow as pa

    d = synth.ensure_profile(synth.TINY)
    ds = rd.read_parquet(f"{d}/sequences")
    wx = wilcoxon_scores(ds)
    cs = count_stats(ds)
    tall_cs = cs.map_batches(
        lambda b: pa.table(
            {
                "class": b["source"],
                "token_id": b["token_id"],
                "score": b["f_score"],
                "method": pa.array(["count_f"] * len(b)),
            }
        ),
        batch_format="pyarrow",
    )
    res = compute_jaccard_comparison([wx, tall_cs], n_top_values=[4, 8])
    assert (res["method_pair"] == "wilcoxon↔count_f").any()
