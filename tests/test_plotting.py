"""Headless figure rendering (SURVEY §2.1 S7 — the reference's four
matplotlib plots re-expressed as deterministic PNG rasters)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from modlyn_ray import plotting
from modlyn_ray.api import CompareScores, SimpleLogReg
from modlyn_ray.stages.codecs import decode_png


def test_viridis_endpoints_and_monotone_green():
    lo = plotting.viridis(np.array(0.0))
    hi = plotting.viridis(np.array(1.0))
    assert tuple(lo) == (68, 1, 84)  # published viridis(0)
    assert tuple(hi) == (253, 231, 37)  # published viridis(1)
    g = plotting.viridis(np.linspace(0, 1, 32))[:, 1].astype(np.int64)
    assert (np.diff(g) >= 0).all()  # green channel rises monotonically


def test_plot_losses_series_and_determinism(tmp_path):
    steps = list(range(40))
    train = list(np.exp(-np.linspace(0, 3, 40)) + 0.1)
    vsteps = [10, 20, 30, 40]
    vloss = [0.9, 0.6, 0.5, 0.45]
    p = tmp_path / "losses.png"
    png = plotting.plot_losses(steps, train, vsteps, vloss, path=str(p))
    assert p.read_bytes() == png
    img = decode_png(png)
    assert img.ndim == 3 and img.shape[2] == 3
    flat = img.reshape(-1, 3)
    assert (flat == plotting.BLUE).all(axis=1).any()  # train line drawn
    assert (flat == plotting.RED).all(axis=1).any()  # val line drawn
    # deterministic bytes
    assert plotting.plot_losses(steps, train, vsteps, vloss) == plotting.plot_losses(
        steps, train, vsteps, vloss
    )
    # no val series -> single panel, no red pixels
    solo = decode_png(plotting.plot_losses(steps, train))
    assert not (solo.reshape(-1, 3) == plotting.RED).all(axis=1).any()


def test_plot_classification_report_bar_heights():
    png = plotting.plot_classification_report(
        ["a", "b"], recalls=[1.0, 0.5], precisions=[0.8, 0.8], f1s=[0.9, 0.6]
    )
    img = decode_png(png)
    recall_color = np.array(plotting.PALETTE[0])
    mask = (img == recall_color).all(axis=2)
    cols = np.where(mask.any(axis=0))[0]
    assert cols.size  # recall bars exist
    mid = (cols.min() + cols.max()) // 2
    left = int(mask[:, : mid + 1].sum())
    right = int(mask[:, mid + 1 :].sum())
    # recall 1.0 bar has ~2x the pixel area of the 0.5 bar
    assert left > 1.5 * right > 0


def test_plot_jaccard_comparison_from_tidy_frame(tmp_path):
    df = pd.DataFrame(
        {
            "cell_line": ["x", "x", "x", "x"],
            "n_top": [25, 25, 50, 50],
            "method_pair": ["m1↔m2", "Random baseline"] * 2,
            "jaccard": [0.6, 0.1, 0.8, 0.2],
        }
    )
    p = tmp_path / "jac.png"
    png = plotting.plot_jaccard_comparison(df, path=str(p))
    img = decode_png(p.read_bytes())
    flat = img.reshape(-1, 3)
    # one bar color per method pair
    assert (flat == plotting.PALETTE[0]).all(axis=1).any()
    assert (flat == plotting.PALETTE[1]).all(axis=1).any()
    assert png == plotting.plot_jaccard_comparison(df)


def test_plot_heatmaps_shared_scale():
    rng = np.random.default_rng(3)
    a = pd.DataFrame(rng.uniform(0, 1, (4, 6)))
    a.iloc[0, 0] = 0.0
    a.iloc[1, 1] = np.nan  # NaN cells render as vmin, never crash
    a.attrs["method_name"] = "m_lo"
    b = pd.DataFrame(rng.uniform(0, 1, (4, 6)))
    b.iloc[3, 5] = 5.0  # the GLOBAL max lives in frame b
    b.attrs["method_name"] = "m_hi"
    img = decode_png(plotting.plot_heatmaps([a, b]))
    flat = img.reshape(-1, 3)
    # shared vmin/vmax: global min -> viridis(0), global max -> viridis(1)
    assert (flat == (68, 1, 84)).all(axis=1).any()
    assert (flat == (253, 231, 37)).all(axis=1).any()
    # frame a's own max (<1.0) must NOT map to viridis(1.0): the bright
    # yellow appears only in b's panel and the colorbar (right third)
    w = img.shape[1]
    left_third = img[:, : w // 3].reshape(-1, 3)
    assert not (left_third == (253, 231, 37)).all(axis=1).any()


def test_facade_plot_methods(tiny_dir, tmp_path):
    model = SimpleLogReg(f"{tiny_dir}/sequences", vocab=8).fit(
        max_steps=20, batch_size=16, val_fraction=0.25
    )
    png = model.plot_losses(path=str(tmp_path / "l.png"))
    img = decode_png(png)
    assert img.shape[2] == 3 and (tmp_path / "l.png").exists()
    rep = model.plot_classification_report()
    assert decode_png(rep).shape[2] == 3

    w1 = model.get_weights()
    rng = np.random.default_rng(0)
    w2 = pd.DataFrame(rng.standard_normal(w1.shape), index=w1.index, columns=w1.columns)
    w2.attrs["method_name"] = "random_method"
    cmp = CompareScores([w1, w2], n_top_values=[2, 4])
    jac = cmp.plot_jaccard_comparison(path=str(tmp_path / "j.png"))
    assert decode_png(jac).shape[2] == 3
    hm = cmp.plot_heatmaps()
    assert decode_png(hm).shape[2] == 3
