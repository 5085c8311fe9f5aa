"""Single-process numpy oracle re-expressing the reference math.

torch/lightning are not installed in the sandbox (SURVEY.md §4 note), so
golden fixtures are produced by this deterministic numpy re-expression of:

- the count-matrix statistics surface (freq / mean / var / one-way-ANOVA
  F-score) mirroring the feature-ranking scores compared in
  /root/reference/docs/quickstart.ipynb:303-329
- SimpleLogReg's training math: a linear layer trained with Adam on
  cross-entropy (/root/reference/modlyn/models/_simple_logreg_model.py:47,70-83,
  105-108), with torch-Adam semantics (L2 weight decay folded into the
  gradient, bias-corrected moments — torch.optim.Adam defaults)
- the per-class top-N + pairwise Jaccard evaluation
  (/root/reference/modlyn/eval/_jaccard.py:30-79)

The distributed Ray pipelines must match these outputs allclose.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# dense count matrix (the AnnData X analog — only for tiny/small oracles)
# ---------------------------------------------------------------------------
def dense_counts(tbl: pa.Table, vocab: int) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """X[i, j] = count of token j in sequence i; y = class codes.

    Class order is the sorted unique labels — identical to sklearn
    LabelEncoder's lexicographic ``classes_``
    (/root/reference/modlyn/models/_simple_logreg_datamodule.py:84-88).
    """
    n = len(tbl)
    toks = tbl["tokens"].combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    X = np.zeros((n, vocab), dtype=np.float64)
    np.add.at(X, (row_idx, flat), 1.0)
    labels = np.asarray(tbl["source"].to_pylist())
    classes = sorted(set(labels.tolist()))
    lut = {c: i for i, c in enumerate(classes)}
    y = np.array([lut[v] for v in labels], dtype=np.int64)
    return X, y, classes


def count_stats(tbl: pa.Table, vocab: int) -> pd.DataFrame:
    """Golden per-(class, token) statistics (FIXTURES.md §3.1).

    count  = total occurrences of token in class
    df     = number of sequences in class containing the token
    freq   = count / total token occurrences in class
    mean   = count / n_rows_in_class
    var    = population variance of per-sequence counts within the class
    f_score= one-way ANOVA F over classes (between-class MS / within-class MS),
             0.0 where the within-class mean square is 0 or K < 2.
    """
    X, y, classes = dense_counts(tbl, vocab)
    N, K = X.shape[0], len(classes)
    rows = []
    class_mean = np.zeros((K, vocab))
    class_n = np.zeros(K)
    for c in range(K):
        Xc = X[y == c]
        class_n[c] = len(Xc)
        class_mean[c] = Xc.mean(axis=0)
    grand_mean = X.mean(axis=0)
    between = (class_n[:, None] * (class_mean - grand_mean[None, :]) ** 2).sum(axis=0)
    within = ((X - class_mean[y]) ** 2).sum(axis=0)
    if K > 1 and N > K:
        ms_between = between / (K - 1)
        ms_within = within / (N - K)
        f = np.where(ms_within > 0, ms_between / np.where(ms_within > 0, ms_within, 1.0), 0.0)
    else:
        f = np.zeros(vocab)
    for c, cname in enumerate(classes):
        Xc = X[y == c]
        occ = Xc.sum(axis=0)
        present = np.flatnonzero(occ > 0)
        total = occ.sum()
        for j in present:
            rows.append(
                {
                    "source": cname,
                    "token_id": int(j),
                    "count": int(occ[j]),
                    "df": int((Xc[:, j] > 0).sum()),
                    "freq": occ[j] / total if total else 0.0,
                    "mean": occ[j] / class_n[c],
                    "var": (Xc[:, j] ** 2).sum() / class_n[c] - (occ[j] / class_n[c]) ** 2,
                    "f_score": float(f[j]),
                }
            )
    return pd.DataFrame(rows).sort_values(["source", "token_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimpleLogReg-equivalent: linear softmax classifier + Adam (torch semantics)
# ---------------------------------------------------------------------------
def logreg_adam(
    X: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    lr: float = 1e-2,
    weight_decay: float = 1e-2,
    batch_size: int = 256,
    max_steps: int = 50,
    max_epochs: int = 4,
    log1p: bool = False,
    seed_order: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Deterministic minibatch Adam on softmax cross-entropy.

    Defaults mirror the reference
    (/root/reference/modlyn/models/_simple_logreg_model.py:35-38,120-123 —
    lr=1e-2, weight_decay=1e-2; quickstart budget batch_size=256, max_steps=50
    at /root/reference/docs/quickstart.ipynb:67,198). Batch order is the given
    row order (deterministic schedule; no shuffling) so the distributed run
    can replicate the exact update sequence.
    Returns (W [K, V] float32, b [K] float32, per-step losses).
    """
    if log1p:
        X = np.log1p(X)
    X = X.astype(np.float64)
    n, v = X.shape
    K = n_classes
    order = np.arange(n) if seed_order is None else seed_order
    W = np.zeros((K, v), dtype=np.float64)  # torch Linear init is random; we
    b = np.zeros(K, dtype=np.float64)  # fix zero-init for determinism (documented engine choice)
    mW = np.zeros_like(W); vW = np.zeros_like(W)
    mb = np.zeros_like(b); vb = np.zeros_like(b)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    losses: list[float] = []
    step = 0
    for _epoch in range(max_epochs):
        for lo in range(0, n, batch_size):
            if step >= max_steps:
                return W.astype(np.float32), b.astype(np.float32), losses
            idx = order[lo : lo + batch_size]
            if len(idx) == 0:
                continue
            Xb, yb = X[idx], y[idx]
            logits = Xb @ W.T + b
            logits -= logits.max(axis=1, keepdims=True)
            expl = np.exp(logits)
            p = expl / expl.sum(axis=1, keepdims=True)
            loss = -np.log(np.maximum(p[np.arange(len(yb)), yb], 1e-300)).mean()
            losses.append(float(loss))
            d = p.copy()
            d[np.arange(len(yb)), yb] -= 1.0
            d /= len(yb)
            gW = d.T @ Xb + weight_decay * W  # torch Adam: L2 folded into grad
            gb = d.sum(axis=0) + weight_decay * b  # torch decays bias too
            step += 1
            t = step
            mW = beta1 * mW + (1 - beta1) * gW
            vW = beta2 * vW + (1 - beta2) * gW * gW
            mb = beta1 * mb + (1 - beta1) * gb
            vb = beta2 * vb + (1 - beta2) * gb * gb
            mhW = mW / (1 - beta1**t); vhW = vW / (1 - beta2**t)
            mhb = mb / (1 - beta1**t); vhb = vb / (1 - beta2**t)
            W -= lr * mhW / (np.sqrt(vhW) + eps)
            b -= lr * mhb / (np.sqrt(vhb) + eps)
    return W.astype(np.float32), b.astype(np.float32), losses


# ---------------------------------------------------------------------------
# Jaccard comparison (reference eval/_jaccard.py semantics)
# ---------------------------------------------------------------------------
def jaccard_comparison(
    frames: dict[str, pd.DataFrame], n_top_values: list[int]
) -> pd.DataFrame:
    """Re-expression of CompareScores.compute_jaccard_comparison
    (/root/reference/modlyn/eval/_jaccard.py:30-82).

    ``frames``: method_name -> wide DataFrame (classes x features). Aligns on
    the intersection of classes/features, takes per-class top-N by |score|,
    computes pairwise Jaccard, appends the random baseline rows
    ((2k)/(2G-k), clamped to 1.0 when k >= G — :66-71).
    """
    import itertools

    names = list(frames)
    common_cols = set.intersection(*[set(f.columns) for f in frames.values()])
    common_idx = set.intersection(*[set(f.index) for f in frames.values()])
    cols = sorted(common_cols)
    idx = sorted(common_idx)
    aligned = {m: f.loc[idx, cols] for m, f in frames.items()}
    G = len(cols)
    rows = []
    for n_top in n_top_values:
        for cls in idx:
            tops = {
                m: set(aligned[m].loc[cls].abs().nlargest(n_top).index) for m in names
            }
            for a, bname in itertools.combinations(names, 2):
                inter = len(tops[a] & tops[bname])
                union = len(tops[a] | tops[bname])
                rows.append(
                    {
                        "cell_line": cls,
                        "n_top": n_top,
                        "method_pair": f"{a}↔{bname}",
                        "jaccard": inter / union if union else 0.0,
                    }
                )
    # random baselines appended after all method pairs (_jaccard.py:66-79)
    for n_top in n_top_values:
        expected = 1.0 if n_top >= G else (2 * n_top) / (2 * G - n_top)
        rows.append(
            {
                "cell_line": None,
                "n_top": n_top,
                "method_pair": "Random baseline",
                "jaccard": expected,
            }
        )
    return pd.DataFrame(rows)
