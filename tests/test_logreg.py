"""LogReg golden parity vs the numpy oracle + scorer/metrics tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from modlyn_ray import oracle, synth
from modlyn_ray.stages.logreg import (
    LogRegConfig,
    classification_metrics,
    confusion_matrix,
    fit_logreg,
    fit_logreg_fullbatch,
    predict,
)


def _oracle_model(profile, cfg: LogRegConfig):
    tbl = synth.make_sequences(profile)
    order = np.argsort(tbl["seq_no"].to_numpy())
    tbl = tbl.take(pa.array(order))  # canonical seq_no order
    X, y, classes = oracle.dense_counts(tbl, cfg.vocab)
    W, b, losses = oracle.logreg_adam(
        X,
        y,
        len(classes),
        lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        batch_size=cfg.batch_size,
        max_steps=cfg.max_steps,
        max_epochs=cfg.max_epochs,
        log1p=cfg.log1p,
    )
    return W, b, classes, losses


def test_fit_parity_tiny():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=16, max_steps=30, max_epochs=10)
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(ds, cfg)
    W, b, classes, losses = _oracle_model(profile, cfg)
    assert model.classes == classes
    np.testing.assert_allclose(model.W, W, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(model.b, b, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(model.losses, losses, rtol=1e-6)


def test_fit_parity_small_quickstart_budget():
    # quickstart budget: batch_size=256, max_steps=50 (docs/quickstart.ipynb:67,198)
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=256, max_steps=50, max_epochs=4, log1p=True)
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(ds, cfg)
    W, b, classes, _ = _oracle_model(profile, cfg)
    np.testing.assert_allclose(model.W, W, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(model.b, b, rtol=1e-5, atol=1e-7)


def test_weights_tall_shape():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, max_steps=5)
    model = fit_logreg(rd.read_parquet(f"{d}/sequences"), cfg)
    tall = model.weights_tall()
    assert len(tall) == len(model.classes) * profile.vocab
    assert tall.column_names == ["class", "token_id", "weight", "bias", "method"]
    wide = model.weights_wide()
    assert wide.attrs["method_name"] == "modlyn_logreg"
    assert wide.shape == (len(model.classes), profile.vocab)


def test_fullbatch_decreases_loss():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab)
    model = fit_logreg_fullbatch(rd.read_parquet(f"{d}/sequences"), cfg, steps=12)
    assert model.losses[-1] < model.losses[0]


def test_fullbatch_matches_dense_numpy_oracle():
    """The distributed sparse-gradient tree reduce must equal dense
    full-batch Adam exactly (order-insensitive float64 sums)."""
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab)
    steps = 7
    model = fit_logreg_fullbatch(rd.read_parquet(f"{d}/sequences"), cfg, steps=steps)

    X, y, classes = oracle.dense_counts(synth.make_sequences(profile), profile.vocab)
    N, K = len(y), len(classes)
    W = np.zeros((K, profile.vocab))
    b = np.zeros(K)
    from modlyn_ray.stages.logreg import AdamState

    sW, sb = AdamState.like(W), AdamState.like(b)
    losses = []
    for _ in range(steps):
        logits = X @ W.T + b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        losses.append(float(-np.log(p[np.arange(N), y]).mean()))
        dd = p
        dd[np.arange(N), y] -= 1.0
        gW = dd.T @ X / N + cfg.weight_decay * W
        gb = dd.sum(axis=0) / N
        sW.update(W, gW, cfg.lr)
        sb.update(b, gb, cfg.lr)
    np.testing.assert_allclose(model.W, W.astype(np.float32), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(model.b, b.astype(np.float32), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(model.losses, losses, rtol=1e-8)


def test_predict_and_metrics():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=256, max_steps=50)
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(ds, cfg)
    scored = predict(ds, model, concurrency=2)
    cm = confusion_matrix(scored, model.classes)
    assert cm.sum() == profile.n_rows
    m = classification_metrics(cm, model.classes)
    assert 0.0 <= m["accuracy"] <= 1.0
    assert set(m["per_class"]) == set(model.classes)
    # sanity vs majority baseline: training should beat the largest class prior
    prior = cm.sum(axis=1).max() / cm.sum()
    assert m["accuracy"] >= prior * 0.8
