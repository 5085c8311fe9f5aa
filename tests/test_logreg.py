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
    np.testing.assert_allclose(model.W, W, rtol=5e-5, atol=5e-7)
    np.testing.assert_allclose(model.b, b, rtol=5e-5, atol=5e-7)
    np.testing.assert_allclose(model.losses, losses, rtol=1e-6)


def test_fit_parity_small_quickstart_budget():
    # quickstart budget: batch_size=256, max_steps=50 (docs/quickstart.ipynb:67,198)
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=256, max_steps=50, max_epochs=4, log1p=True)
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(ds, cfg)
    W, b, classes, _ = _oracle_model(profile, cfg)
    np.testing.assert_allclose(model.W, W, rtol=5e-5, atol=5e-7)
    np.testing.assert_allclose(model.b, b, rtol=5e-5, atol=5e-7)


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
        gb = dd.sum(axis=0) / N + cfg.weight_decay * b  # torch decays bias too
        sW.update(W, gW, cfg.lr)
        sb.update(b, gb, cfg.lr)
    np.testing.assert_allclose(model.W, W.astype(np.float32), rtol=5e-5, atol=5e-7)
    np.testing.assert_allclose(model.b, b.astype(np.float32), rtol=5e-5, atol=5e-7)
    np.testing.assert_allclose(model.losses, losses, rtol=1e-8)


def test_predict_and_metrics():
    profile = synth.SMALL
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=256, max_steps=50)
    ds = rd.read_parquet(f"{d}/sequences")
    model = fit_logreg(ds, cfg)
    scored = predict(ds, model, concurrency=(1, 2))
    cm = confusion_matrix(scored, model.classes)
    assert cm.sum() == profile.n_rows
    m = classification_metrics(cm, model.classes)
    assert 0.0 <= m["accuracy"] <= 1.0
    assert set(m["per_class"]) == set(model.classes)
    # sanity vs majority baseline: training should beat the largest class prior
    prior = cm.sum(axis=1).max() / cm.sum()
    assert m["accuracy"] >= prior * 0.8


def test_split_train_val_disjoint_stable():
    from modlyn_ray.stages.logreg import split_train_val

    profile = synth.TINY
    d = synth.ensure_profile(profile)
    ds = rd.read_parquet(f"{d}/sequences")
    tr, va = split_train_val(ds, val_fraction=0.25, salt=3)
    tr_ids = set(r["seq_no"] for r in tr.select_columns(["seq_no"]).take_all())
    va_ids = set(r["seq_no"] for r in va.select_columns(["seq_no"]).take_all())
    assert tr_ids.isdisjoint(va_ids)
    assert len(tr_ids) + len(va_ids) == profile.n_rows
    assert 0.10 < len(va_ids) / profile.n_rows < 0.40
    # deterministic: the same split again
    tr2, _ = split_train_val(ds, val_fraction=0.25, salt=3)
    assert set(r["seq_no"] for r in tr2.select_columns(["seq_no"]).take_all()) == tr_ids


def test_val_loss_sequence_matches_numpy_oracle():
    """Per-epoch val loss computed by the distributed eval_pass must match a
    single-process numpy replication: train on the hash-split train side,
    evaluate frozen weights on the val side after each epoch."""
    from modlyn_ray.stages.logreg import split_train_val

    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(vocab=profile.vocab, batch_size=16, max_steps=10_000, max_epochs=3)
    ds = rd.read_parquet(f"{d}/sequences")
    tr, va = split_train_val(ds, val_fraction=0.25, salt=3)
    model = fit_logreg(tr, cfg, val_ds=va)
    assert len(model.val_history) == cfg.max_epochs

    # numpy oracle over the same split, same canonical order
    tbl = synth.make_sequences(profile)
    order = np.argsort(tbl["seq_no"].to_numpy())
    tbl = tbl.take(pa.array(order))
    s = tbl["seq_no"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        h = s * np.uint64(0x9E3779B97F4A7C15) + np.uint64(3)
    is_val = (h % np.uint64(1000)).astype(np.int64) < 250
    Xall, yall, classes = oracle.dense_counts(tbl, cfg.vocab)
    # encoder fit on TRAIN only
    Xt, yt_raw = Xall[~is_val], np.asarray(tbl["source"].to_pylist(), dtype=object)[~is_val]
    Xv, yv_raw = Xall[is_val], np.asarray(tbl["source"].to_pylist(), dtype=object)[is_val]
    tr_classes = sorted(set(yt_raw))
    lut = {c: i for i, c in enumerate(tr_classes)}
    yt = np.array([lut[c] for c in yt_raw])
    yv = np.array([lut[c] for c in yv_raw])
    assert model.classes == tr_classes
    for e in range(cfg.max_epochs):
        W, b, _ = oracle.logreg_adam(
            Xt, yt, len(tr_classes), lr=cfg.lr, weight_decay=cfg.weight_decay,
            batch_size=cfg.batch_size, max_steps=10_000, max_epochs=e + 1,
        )
        logits = Xv @ W.astype(np.float64).T + b.astype(np.float64)
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        want = float(-np.log(np.maximum(p[np.arange(len(yv)), yv], 1e-300)).mean())
        np.testing.assert_allclose(model.val_history[e]["val_loss"], want, rtol=1e-4)


def test_step_scheduler_matches_numpy_oracle():
    """StepLR semantics: lr * gamma^(step // step_size), per optimizer
    step, identical between the engine loop and a numpy replication."""
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    cfg = LogRegConfig(
        vocab=profile.vocab, batch_size=16, max_steps=24, max_epochs=10,
        scheduler="step", scheduler_gamma=0.5, scheduler_step_size=8,
    )
    model = fit_logreg(rd.read_parquet(f"{d}/sequences"), cfg)

    tbl = synth.make_sequences(profile)
    order = np.argsort(tbl["seq_no"].to_numpy())
    tbl = tbl.take(pa.array(order))
    X, y, classes = oracle.dense_counts(tbl, cfg.vocab)
    n, K = len(y), len(classes)
    W = np.zeros((K, cfg.vocab)); b = np.zeros(K)
    from modlyn_ray.stages.logreg import AdamState
    sW, sb = AdamState.like(W), AdamState.like(b)
    step = 0
    for _epoch in range(cfg.max_epochs):
        for lo in range(0, n, cfg.batch_size):
            if step >= cfg.max_steps:
                break
            Xb, yb = X[lo:lo+cfg.batch_size], y[lo:lo+cfg.batch_size]
            logits = Xb @ W.T + b
            logits -= logits.max(axis=1, keepdims=True)
            p = np.exp(logits); p /= p.sum(axis=1, keepdims=True)
            dd = p; dd[np.arange(len(yb)), yb] -= 1.0; dd /= len(yb)
            gW = dd.T @ Xb + cfg.weight_decay * W
            gb = dd.sum(axis=0) + cfg.weight_decay * b
            lr_t = cfg.lr * cfg.scheduler_gamma ** (step // cfg.scheduler_step_size)
            step += 1
            sW.update(W, gW, lr_t); sb.update(b, gb, lr_t)
    np.testing.assert_allclose(model.W, W.astype(np.float32), rtol=5e-5, atol=5e-7)
    # and the lr schedule itself decays
    assert cfg.lr_at(0) == cfg.lr and cfg.lr_at(8) == cfg.lr * 0.5
