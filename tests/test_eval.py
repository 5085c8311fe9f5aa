"""Jaccard comparison parity vs the reference-semantics oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from modlyn_ray import oracle, synth
from modlyn_ray.eval.jaccard import compute_jaccard_comparison, topk_per_class
from modlyn_ray.stages.count_stats import count_stats
from modlyn_ray.stages.logreg import LogRegConfig, fit_logreg


def _tall_from_wide(df: pd.DataFrame, method: str) -> pa.Table:
    long = df.reset_index(names="class").melt(
        id_vars="class", var_name="token_id", value_name="score"
    )
    long["token_id"] = long["token_id"].astype(np.int32)
    long["method"] = method
    return pa.Table.from_pandas(long, preserve_index=False)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["cell_line"] = df["cell_line"].astype(object).where(df["cell_line"].notna(), None)
    return (
        df.sort_values(["n_top", "method_pair", "cell_line"], na_position="last")
        .reset_index(drop=True)[["cell_line", "n_top", "method_pair", "jaccard"]]
    )


def test_jaccard_parity_with_oracle():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")

    model = fit_logreg(ds, LogRegConfig(vocab=profile.vocab, batch_size=16, max_steps=20))
    wide_lr = model.weights_wide()

    cs = count_stats(ds).to_pandas()
    wide_f = cs.pivot_table(index="source", columns="token_id", values="mean").fillna(0.0)
    wide_f.attrs["method_name"] = "count_mean"
    # align oracle inputs: same classes/columns as engine wide frames
    want = oracle.jaccard_comparison(
        {"modlyn_logreg": wide_lr, "count_mean": wide_f}, n_top_values=[2, 4, 8, 100]
    )

    tall_lr = _tall_from_wide(wide_lr, "modlyn_logreg")
    tall_f = _tall_from_wide(wide_f, "count_mean")
    got = compute_jaccard_comparison([tall_lr, tall_f], n_top_values=[2, 4, 8, 100])

    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False, rtol=1e-12)
    # the n_top >= n_genes -> 1.0 baseline branch (_jaccard.py:68-69)
    assert (
        got[(got.method_pair == "Random baseline") & (got.n_top == 100)]["jaccard"] == 1.0
    ).all()


def test_topk_per_class():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    cs = count_stats(ds)
    tall = cs.map_batches(
        lambda b: pa.table(
            {
                "class": b["source"],
                "token_id": b["token_id"],
                "score": b["mean"],
                "method": pa.array(["count_mean"] * len(b)),
            }
        ),
        batch_format="pyarrow",
    )
    top = topk_per_class(tall, k=10).to_pandas()
    by_cls = top.groupby("class")
    pdf = tall.to_pandas()
    for cls, g in by_cls:
        assert len(g) == 10
        assert set(g["rank"]) == set(range(1, 11))
        # ties at the k-th score make the token set ambiguous; the selected
        # SCORE multiset must equal the true top-10 scores
        want = np.sort(pdf[pdf["class"] == cls]["score"].to_numpy())[-10:]
        np.testing.assert_allclose(np.sort(g["score"].to_numpy()), want)
