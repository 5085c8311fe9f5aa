"""SimpleLogReg-equivalent: distributed softmax regression over token counts.

Re-expresses the reference's training path
(/root/reference/modlyn/models/_simple_logreg_model.py — torch Linear :47,
cross-entropy + Adam :70-83,105-108, lr=1e-2 / weight_decay=1e-2 defaults
:35-38, max_steps/max_epochs :120-123) without torch:

- the *golden* path (``fit_logreg``) is a deterministic driver-orchestrated
  loop over ``ds.iter_batches`` in canonical (seq_no) order with a numpy
  Adam matching torch semantics (L2 folded into the gradient, bias-corrected
  moments, eps inside the sqrt denominator) — SURVEY.md §7.4 point 1.
  Weights are zero-initialised (torch's random init is replaced by a
  deterministic choice; documented divergence).
- the *scale* path (``fit_logreg_fullbatch``) runs synchronous full-gradient
  Adam: per-epoch gradient partials computed cluster-wide in ``map_batches``
  against broadcast weights (ray.put once per step), tree-summed via a tiny
  aggregate. Different update schedule than the reference (documented);
  use for corpora where a driver loop cannot stream fast enough.

Features are the implicit bag-of-tokens count matrix — never densified:
each Arrow batch's (row, token, count) triples are derived zero-copy from
list offsets (SURVEY §2.2 M1) and used in scatter-based sparse matmuls.

The label encoding mirrors sklearn LabelEncoder fitted on train only
(classes = lexicographically sorted unique labels,
/root/reference/modlyn/models/_simple_logreg_datamodule.py:84-88); the
eval path deliberately REUSES the train encoder instead of refitting
(the reference refits at _simple_logreg_model.py:235-236 — a latent
ordering bug we do not reproduce; SURVEY §7.4 point 6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum


# ---------------------------------------------------------------------------
# batch feature extraction (shared by train + inference)
# ---------------------------------------------------------------------------
def batch_rtc(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(rows, tokens, counts, n_rows) triples of the implicit count matrix."""
    n = len(batch)
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(flat) == 0:
        return row_idx, flat, np.array([], dtype=np.float64), n
    vmax = int(flat.max()) + 1
    if int(flat.min()) < 0:
        # same hazard count_stats guards: a negative id breaks the
        # row*vmax+tok packing AND W[:, tok] would silently fancy-index
        # from the end of the vocab
        raise ValueError(f"logreg: negative token id {int(flat.min())} in batch")
    key = row_idx * vmax + flat
    uniq, cnt = np.unique(key, return_counts=True)
    return uniq // vmax, uniq % vmax, cnt.astype(np.float64), n


def batch_logits(
    batch: pa.Table, W: np.ndarray, b: np.ndarray, log1p: bool = False
) -> np.ndarray:
    rows, toks, cnt, n = batch_rtc(batch)
    x = np.log1p(cnt) if log1p else cnt
    logits = np.broadcast_to(b, (n, len(b))).copy()
    if len(toks):
        np.add.at(logits, rows, (W[:, toks] * x).T)
    return logits


@dataclass
class AdamState:
    m: np.ndarray
    v: np.ndarray
    t: int = 0

    @classmethod
    def like(cls, w: np.ndarray) -> "AdamState":
        return cls(np.zeros_like(w), np.zeros_like(w))

    def update(self, w: np.ndarray, g: np.ndarray, lr: float, beta1=0.9, beta2=0.999, eps=1e-8):
        self.t += 1
        self.m = beta1 * self.m + (1 - beta1) * g
        self.v = beta2 * self.v + (1 - beta2) * g * g
        mh = self.m / (1 - beta1**self.t)
        vh = self.v / (1 - beta2**self.t)
        w -= lr * mh / (np.sqrt(vh) + eps)


@dataclass
class LogRegConfig:
    """Hyperparameter surface mirroring the reference
    (_simple_logreg_model.py:31-38,110-124 + quickstart budget)."""

    vocab: int
    lr: float = 1e-2
    weight_decay: float = 1e-2
    batch_size: int = 256
    max_steps: int = 50
    max_epochs: int = 4
    log1p: bool = False
    method_name: str = "modlyn_logreg"
    # per-epoch sample shuffle (the reference's DaskDataset(shuffle=True),
    # _simple_logreg_datamodule.py:182 / SURVEY §2.2 M9). False = the
    # deterministic golden schedule; True = seeded random_shuffle per epoch.
    shuffle_each_epoch: bool = False
    shuffle_seed: int = 0
    # LR scheduler surface — an ENGINE EXTENSION beyond the reference
    # (its configure_optimizers returns a bare Adam with no scheduler,
    # _simple_logreg_model.py:105-108; "none" reproduces that default):
    # "step" = torch StepLR semantics (lr * gamma^(step // step_size)),
    # "cosine" = CosineAnnealingLR over max_steps. Applied per optimizer
    # step.
    scheduler: str = "none"
    scheduler_gamma: float = 0.5
    scheduler_step_size: int = 100

    def lr_at(self, step: int) -> float:
        """Learning rate for optimizer step ``step`` (0-based)."""
        if self.scheduler == "step":
            return self.lr * self.scheduler_gamma ** (step // self.scheduler_step_size)
        if self.scheduler == "cosine":
            t_max = max(self.max_steps, 1)
            return self.lr * 0.5 * (1.0 + np.cos(np.pi * min(step, t_max) / t_max))
        return self.lr


@dataclass
class LogRegModel:
    W: np.ndarray  # (K, V) float32
    b: np.ndarray  # (K,) float32
    classes: list[str]
    config: LogRegConfig
    losses: list[float] = field(default_factory=list)
    # per-epoch validation metrics when fit() was given a val set — the
    # reference's val loop (_simple_logreg_model.py:88-103 logs val loss +
    # F1 per epoch through the torchmetrics accumulators)
    val_history: list[dict] = field(default_factory=list)

    def weights_tall(self) -> pa.Table:
        """Tall equivalent of get_weights()
        (/root/reference/modlyn/models/_simple_logreg_model.py:170-192):
        one row per (class, token_id), class order = sorted classes."""
        K, V = self.W.shape
        return pa.table(
            {
                "class": pa.array(np.repeat(self.classes, V).tolist()),
                "token_id": pa.array(np.tile(np.arange(V, dtype=np.int32), K)),
                "weight": pa.array(self.W.ravel().astype(np.float32)),
                "bias": pa.array(np.repeat(self.b.astype(np.float32), V)),
                "method": pa.array([self.config.method_name] * (K * V)),
            }
        )

    def weights_wide(self) -> pd.DataFrame:
        """Reference-shaped wide frame (classes x features) with
        attrs['method_name'] — driver-side presentation only."""
        df = pd.DataFrame(self.W, index=self.classes, columns=np.arange(self.W.shape[1]))
        df.attrs["method_name"] = self.config.method_name
        return df


def train_classes(ds: Dataset) -> list[str]:
    """Lexicographically sorted unique labels == LabelEncoder.classes_.

    Projects to the label column first so the distinct scan never drags
    the token lists through the aggregate (full-width Dataset.unique paid
    a whole-corpus scan for ~K labels)."""
    return sorted(ds.select_columns(["source"]).unique("source"))


def split_train_val(
    ds: Dataset, val_fraction: float = 0.1, salt: int = 0
) -> tuple[Dataset, Dataset]:
    """Deterministic hash split on seq_no (the reference datamodule takes
    separate train/val AnnData objects, _simple_logreg_datamodule.py:174-200;
    the engine derives them from one table). The split is a pure function
    of (seq_no, salt): stable across runs, partitioning and cluster size —
    no sampling state to checkpoint."""
    thresh = int(val_fraction * 1000)

    def mark(b: pa.Table, want_val: bool) -> pa.Table:
        s = b["seq_no"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = s * np.uint64(0x9E3779B97F4A7C15) + np.uint64(salt)
        is_val = (h % np.uint64(1000)).astype(np.int64) < thresh
        return b.filter(pa.array(is_val if want_val else ~is_val))

    train = ds.map_batches(
        lambda b: mark(b, False), batch_format="pyarrow", zero_copy_batch=True
    )
    val = ds.map_batches(
        lambda b: mark(b, True), batch_format="pyarrow", zero_copy_batch=True
    )
    return train, val


def eval_pass(
    ds: Dataset, W: np.ndarray, b: np.ndarray, classes: list[str], log1p: bool = False
) -> dict:
    """One distributed evaluation pass with frozen weights: mean
    cross-entropy loss + accuracy + macro F1, computed from per-batch
    partials (loss sums + confusion cells) against weights broadcast ONCE
    via ray.put — the val_step/metric-accumulator analog
    (_simple_logreg_model.py:88-103) as a map_batches + tiny aggregate."""
    from modlyn_ray.util import encode_labels

    K = len(classes)
    lut = {c: i for i, c in enumerate(classes)}
    ref = ray.put((np.asarray(W, dtype=np.float64), np.asarray(b, dtype=np.float64)))

    def part(batch: pa.Table) -> pa.Table:
        Wl, bl = ray.get(ref)
        logits = batch_logits(batch, Wl, bl, log1p)
        n = len(batch)
        y = encode_labels(batch["source"], lut)
        # rows whose label is absent from the train-side classes (a hash
        # split can strand all rows of a rare class in val) are EXCLUDED
        # from loss/CM; their count rides the aggregate as cell -2 so the
        # driver can surface one clear warning instead of a worker KeyError
        known = y >= 0
        n_unknown = int((~known).sum())
        yk = y[known]
        logits_k = logits[known]
        nk = len(yk)
        logits_k = logits_k - logits_k.max(axis=1, keepdims=True) if nk else logits_k
        expl = np.exp(logits_k)
        p = expl / np.maximum(expl.sum(axis=1, keepdims=True), 1e-300)
        loss_sum = (
            float(-np.log(np.maximum(p[np.arange(nk), yk], 1e-300)).sum()) if nk else 0.0
        )
        pred = logits_k.argmax(axis=1) if nk else np.zeros(0, dtype=np.int64)
        cell = yk * K + pred
        uniq, cnt_c = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(np.r_[uniq, np.int64(-1), np.int64(-2)]),
                "n": pa.array(np.r_[cnt_c.astype(np.int64), np.int64(nk), np.int64(n_unknown)]),
                "loss": pa.array(np.r_[np.zeros(len(uniq)), loss_sum, 0.0]),
            }
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"), Sum("loss", alias_name="loss"))
        .take_all()  # <= K^2 + 2 rows
    )
    cm = np.zeros((K, K), dtype=np.int64)
    n_total, loss_total, n_unknown = 0, 0.0, 0
    for r in agg:
        if r["cell"] == -1:
            n_total, loss_total = int(r["n"]), float(r["loss"])
        elif r["cell"] == -2:
            n_unknown = int(r["n"])
        else:
            cm[r["cell"] // K, r["cell"] % K] = r["n"]
    if n_unknown:
        import warnings

        warnings.warn(
            f"eval_pass: {n_unknown} rows carry labels absent from the train-side "
            f"classes and were excluded from loss/metrics",
            stacklevel=2,
        )
    m = classification_metrics(cm, classes)
    return {
        "val_loss": loss_total / max(n_total, 1),
        "accuracy": m["accuracy"],
        "macro_f1": m["macro_f1"],
        "n": n_total,
        "n_skipped_unknown": n_unknown,
    }


def fit_logreg(
    ds: Dataset,
    config: LogRegConfig,
    classes: list[str] | None = None,
    val_ds: Dataset | None = None,
) -> LogRegModel:
    """Golden path: deterministic minibatch Adam over seq_no-ordered batches.

    The update sequence is identical to the numpy oracle given the same
    config, so distributed-vs-oracle parity is exact up to float noise
    (SURVEY §7.4 hard part 1).
    """
    from ray.data import DataContext

    from modlyn_ray.util import encode_labels

    classes = classes or train_classes(ds)  # encoder fit on TRAIN only
    lut = {c: i for i, c in enumerate(classes)}
    K, V = len(classes), config.vocab
    W = np.zeros((K, V), dtype=np.float64)
    b = np.zeros(K, dtype=np.float64)
    sW, sb = AdamState.like(W), AdamState.like(b)
    losses: list[float] = []
    val_history: list[dict] = []
    if val_ds is not None:
        val_ds = val_ds.materialize()  # evaluated once per epoch
    step = 0

    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        # materialize the canonical order once — iter_batches re-executes the
        # lazy sort on EVERY epoch otherwise
        ordered = ds.sort("seq_no").materialize()
        for _epoch in range(config.max_epochs):
            if step >= config.max_steps:
                break
            if config.shuffle_each_epoch:
                ordered = ordered.random_shuffle(
                    seed=config.shuffle_seed + _epoch
                ).materialize()
            for batch in ordered.iter_batches(
                batch_size=config.batch_size, batch_format="pyarrow"
            ):
                if step >= config.max_steps:
                    break
                rows, toks, cnt, n = batch_rtc(batch)
                x = np.log1p(cnt) if config.log1p else cnt
                y = encode_labels(batch["source"], lut)
                if n and y.min() < 0:
                    raise ValueError(
                        "fit_logreg: train batch contains labels absent from "
                        "the fitted class set (pass classes= covering them)"
                    )
                logits = np.broadcast_to(b, (n, K)).copy()
                if len(toks):
                    np.add.at(logits, rows, (W[:, toks] * x).T)
                logits -= logits.max(axis=1, keepdims=True)
                expl = np.exp(logits)
                p = expl / expl.sum(axis=1, keepdims=True)
                losses.append(float(-np.log(np.maximum(p[np.arange(n), y], 1e-300)).mean()))
                d = p
                d[np.arange(n), y] -= 1.0
                d /= n
                gW = config.weight_decay * W
                if len(toks):
                    gWT = np.zeros((V, K))
                    np.add.at(gWT, toks, d[rows] * x[:, None])
                    gW += gWT.T
                # torch Adam decays every parameter, the bias included
                gb = d.sum(axis=0) + config.weight_decay * b
                lr_t = config.lr_at(step)
                step += 1
                sW.update(W, gW, lr_t)
                sb.update(b, gb, lr_t)
            if val_ds is not None:
                val_history.append(
                    {"epoch": _epoch, "step": step, **eval_pass(val_ds, W, b, classes, config.log1p)}
                )
    finally:
        ctx.execution_options.preserve_order = prev
    return LogRegModel(
        W.astype(np.float32), b.astype(np.float32), classes, config, losses, val_history
    )


def fit_logreg_fullbatch(
    ds: Dataset, config: LogRegConfig, classes: list[str] | None = None, steps: int = 20
) -> LogRegModel:
    """Scale path: synchronous full-gradient Adam, one cluster-wide pass per
    step. Gradient partials are computed in map_batches against weights
    broadcast with ray.put (once per step, read by every task — never
    re-shipped per batch) and combined with a driver-side sum over the tiny
    (K x V) partials."""
    classes = classes or train_classes(ds)
    lut = {c: i for i, c in enumerate(classes)}
    K, V = len(classes), config.vocab
    W = np.zeros((K, V), dtype=np.float64)
    b = np.zeros(K, dtype=np.float64)
    sW, sb = AdamState.like(W), AdamState.like(b)
    losses: list[float] = []
    ds = ds.materialize()  # re-read per step otherwise (one pass per step)
    n_total = ds.count()

    # gradients ride the same mergeable-sketch machinery as count_stats:
    # sparse (class<<32 | token) -> grad partials per batch, parallel
    # fan-in tree reduce — no dense (K x V) payload per batch, no serial
    # driver fold. Special keys carry bias grads and the loss sum.
    from modlyn_ray.stages.count_stats import tree_reduce_partials

    SENT = (1 << 32) - 1
    BIAS_BASE = np.int64(K) << 32  # bias grad for class c: (K + c)<<32 | SENT
    LOSS_KEY = (np.int64(2 * K + 1) << 32) | SENT

    from modlyn_ray.util import encode_labels

    for _ in range(steps):
        ref = ray.put((W, b))
        log1p = config.log1p
        lut_local = dict(lut)

        def grad_partial(batch: pa.Table) -> pa.Table:
            Wl, bl = ray.get(ref)
            Kl = len(bl)
            rows, toks, cnt, n = batch_rtc(batch)
            x = np.log1p(cnt) if log1p else cnt
            y = encode_labels(batch["source"], lut_local)
            if n and y.min() < 0:
                raise ValueError(
                    "fit_logreg_fullbatch: train batch contains labels absent "
                    "from the fitted class set (pass classes= covering them)"
                )
            logits = np.broadcast_to(bl, (n, Kl)).copy()
            if len(toks):
                np.add.at(logits, rows, (Wl[:, toks] * x).T)
            logits -= logits.max(axis=1, keepdims=True)
            expl = np.exp(logits)
            p = expl / expl.sum(axis=1, keepdims=True)
            loss_sum = float(-np.log(np.maximum(p[np.arange(n), y], 1e-300)).sum())
            d = p
            d[np.arange(n), y] -= 1.0
            # sparse grad entries: for each (row, token) pair and class c:
            # g[c, tok] += d[row, c] * x — emit per (c, tok) sums
            keys_list = []
            vals_list = []
            if len(toks):
                utok, tok_inv = np.unique(toks, return_inverse=True)
                nu = len(utok)
                gsub = np.zeros((Kl, nu))
                for c in range(Kl):
                    gsub[c] = np.bincount(tok_inv, weights=d[rows, c] * x, minlength=nu)
                kk, tt = np.meshgrid(np.arange(Kl, dtype=np.int64), utok, indexing="ij")
                keys_list.append(((kk << 32) | tt).ravel())
                vals_list.append(gsub.ravel())
            keys_list.append(
                (BIAS_BASE + (np.arange(Kl, dtype=np.int64) << 32)) | SENT
            )
            vals_list.append(d.sum(axis=0))
            keys_list.append(np.array([LOSS_KEY], dtype=np.int64))
            vals_list.append(np.array([loss_sum]))
            keys = np.concatenate(keys_list)
            vals = np.concatenate(vals_list)
            z = np.zeros(len(keys))
            return pa.table(
                {
                    "key": pa.array(keys),
                    "occ": pa.array(vals),
                    "sumsq": pa.array(z),
                    "df": pa.array(z),
                }
            )

        partials = ds.map_batches(grad_partial, batch_format="pyarrow", batch_size=8192)
        keys, vals, _, _ = tree_reduce_partials(partials)
        keys = np.asarray(keys, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        gW = np.zeros((K, V))
        gb = np.zeros(K)
        loss_sum = 0.0
        hi = (keys >> 32).astype(np.int64)
        lo = (keys & SENT).astype(np.int64)
        wmask = (lo != SENT) & (hi < K)
        gW[hi[wmask], lo[wmask]] = vals[wmask]
        bmask = (lo == SENT) & (hi >= K) & (hi < 2 * K)
        gb[hi[bmask] - K] = vals[bmask]
        lmask = keys == LOSS_KEY
        loss_sum = float(vals[lmask].sum())
        gW = gW / n_total + config.weight_decay * W
        gb = gb / n_total + config.weight_decay * b  # torch decays bias too
        losses.append(loss_sum / n_total)
        lr_t = config.lr_at(sW.t)
        sW.update(W, gW, lr_t)
        sb.update(b, gb, lr_t)
    return LogRegModel(W.astype(np.float32), b.astype(np.float32), classes, config, losses)


# ---------------------------------------------------------------------------
# inference: actor-pool scorer (SURVEY §2.3 T3)
# ---------------------------------------------------------------------------
class LogRegScorer:
    """Actor-pool batch scorer: weights loaded ONCE per actor in __init__
    from a ray.put handle (broadcast, zero-copy object-store read), applied
    per batch in __call__."""

    def __init__(self, model_ref, log1p: bool = False):
        W, b, classes = ray.get(model_ref)
        self.W = np.asarray(W, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.classes = np.asarray(classes)
        self.log1p = log1p

    def __call__(self, batch: pa.Table) -> pa.Table:
        logits = batch_logits(batch, self.W, self.b, self.log1p)
        pred = logits.argmax(axis=1)
        return batch.append_column(
            "pred_source", pa.array(self.classes[pred].tolist())
        ).replace_schema_metadata(None)


def predict(ds: Dataset, model: LogRegModel, concurrency: int = 4, batch_size: int = 4096) -> Dataset:
    from modlyn_ray.util import pool_bounds

    concurrency = pool_bounds(concurrency)
    ref = ray.put((model.W, model.b, model.classes))
    return ds.map_batches(
        LogRegScorer,
        fn_constructor_kwargs={"model_ref": ref, "log1p": model.config.log1p},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# metrics from confusion partials (SURVEY §2.3 T4 / §2.5 A5)
# ---------------------------------------------------------------------------
def confusion_matrix(ds: Dataset, classes: list[str], pred_col="pred_source", true_col="source") -> np.ndarray:
    """Per-batch partial confusion counts -> groupby sum -> (K, K) int64.
    Rows = true class, cols = predicted."""
    from modlyn_ray.util import encode_labels

    K = len(classes)
    lut = {c: i for i, c in enumerate(classes)}

    def partial(batch: pa.Table) -> pa.Table:
        t = encode_labels(batch[true_col], lut)
        p = encode_labels(batch[pred_col], lut)
        known = (t >= 0) & (p >= 0)  # rows outside the class set are skipped
        key = t[known] * K + p[known]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    cm = np.zeros((K, K), dtype=np.int64)
    for r in agg:
        cm[r["cell"] // K, r["cell"] % K] = r["n"]
    return cm


def classification_metrics(cm: np.ndarray, classes: list[str]) -> dict:
    """accuracy, macro/weighted F1 and per-class P/R/F1 from a confusion
    matrix — the sklearn formulas used at _simple_logreg_model.py:239-251."""
    support = cm.sum(axis=1)
    tp = np.diag(cm).astype(np.float64)
    prec = np.divide(tp, cm.sum(axis=0), out=np.zeros_like(tp), where=cm.sum(axis=0) > 0)
    rec = np.divide(tp, support, out=np.zeros_like(tp), where=support > 0)
    f1 = np.divide(2 * prec * rec, prec + rec, out=np.zeros_like(tp), where=(prec + rec) > 0)
    total = cm.sum()
    return {
        "accuracy": float(tp.sum() / total) if total else 0.0,
        "macro_f1": float(f1.mean()),
        "weighted_f1": float((f1 * support).sum() / support.sum()) if support.sum() else 0.0,
        "per_class": {
            c: {"precision": float(prec[i]), "recall": float(rec[i]), "f1": float(f1[i]), "support": int(support[i])}
            for i, c in enumerate(classes)
        },
    }
