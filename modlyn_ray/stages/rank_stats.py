"""Wilcoxon rank-sum (Mann-Whitney U) scores per (class, token) — the
scanpy ``rank_genes_groups(method="wilcoxon")`` analog the reference
compares against (/root/reference/docs/quickstart.ipynb:322-329;
SURVEY §2.5 A8).

Distributed trick: per-sequence token counts are small integers, so ranks
over the whole corpus are computable from VALUE HISTOGRAMS — no global
sort. Per batch we emit (class, token, value) -> #sequences partials
(packed into one int64 key), tree-reduce them like count_stats, then turn
histograms into average ranks:

    avg_rank(v) = (#values < v) + (ties_v + 1) / 2
    rank_sum(c) = sum_v n_{c,v} * avg_rank(v)     (including v = 0!)
    z = (rank_sum - n_c (N+1)/2) / sqrt(n_c (N - n_c) (N+1) / 12)

(one-vs-rest per class; zeros from absent sequences are counted via class
sizes). ``tie_correct=True`` applies the standard tie correction to sigma
(scanpy's default is no correction).

Key packing: class < 2^15, token < 2^31, value < 2^16 (longer counts are
clamped into the top bin — at that point rank differences are negligible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_VBITS = 16
_TBITS = 31
_VMASK = (1 << _VBITS) - 1


def make_rank_partials(class_lut: dict[str, int]):
    def partial(batch: pa.Table) -> pa.Table:
        from modlyn_ray.util import encode_labels

        # rows whose source is outside the class set (an explicit
        # ``classes`` subset — the scanpy ``groups`` analog) are EXCLUDED
        # from the rank universe, instead of a bare worker KeyError
        scode_all = encode_labels(batch["source"], class_lut)
        if (scode_all < 0).any():
            batch = batch.filter(pa.array(scode_all >= 0))
            scode_all = scode_all[scode_all >= 0]
        n = len(batch)
        scode = scode_all

        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

        vmax = int(flat.max()) + 1 if len(flat) else 1
        if len(flat) and (int(flat.min()) < 0 or vmax - 1 >= (1 << _TBITS)):
            raise ValueError(
                "rank_stats: token ids must be in [0, 2^31) to fit the "
                "packed key's token field"
            )
        key_rt = row_idx * vmax + flat
        uniq_rt, c_rt = np.unique(key_rt, return_counts=True)
        row_of = uniq_rt // vmax
        tok_of = uniq_rt % vmax
        val = np.minimum(c_rt, _VMASK).astype(np.int64)
        cls_of = scode[row_of]
        packed = (cls_of << (_TBITS + _VBITS)) | (tok_of << _VBITS) | val
        uniq_k, inv = np.unique(packed, return_inverse=True)
        cnt = np.bincount(inv).astype(np.float64)
        # sentinel rows: class sizes (token slot all-ones, value 0)
        cls_rows = np.bincount(scode, minlength=len(class_lut)).astype(np.float64)
        present = np.flatnonzero(cls_rows)
        sent = (present << (_TBITS + _VBITS)) | ((np.int64((1 << _TBITS) - 1)) << _VBITS)
        return pa.table(
            {
                "key": pa.array(np.concatenate([uniq_k, sent])),
                "occ": pa.array(np.concatenate([cnt, cls_rows[present]])),
                "sumsq": pa.array(np.zeros(len(uniq_k) + len(present))),
                "df": pa.array(np.zeros(len(uniq_k) + len(present))),
            }
        )

    return partial


def wilcoxon_scores(
    ds: Dataset,
    classes: list[str] | None = None,
    batch_size: int | None = 32768,
    tie_correct: bool = False,
    method_name: str = "wilcoxon",
) -> pa.Table:
    """One-vs-rest Wilcoxon z-score per (class, token) as a tall Arrow table
    (class, token_id, score, method) — plugs directly into CompareScores
    (the df.attrs["method_name"] extension surface, SURVEY §2.10 X3)."""
    from modlyn_ray.stages.count_stats import tree_reduce_partials

    if classes is None:
        classes = sorted(ds.unique("source"))
    class_lut = {c: i for i, c in enumerate(classes)}
    K = len(classes)

    partials = ds.map_batches(
        make_rank_partials(class_lut),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    state = tree_reduce_partials(partials)
    if len(state[0]) == 0:
        return pa.table(
            {
                "class": pa.array([], type=pa.string()),
                "token_id": pa.array([], type=pa.int32()),
                "score": pa.array([], type=pa.float64()),
                "method": pa.array([], type=pa.string()),
            }
        )
    keys, occ, _, _ = state
    keys = np.asarray(keys, dtype=np.int64)
    occ = np.asarray(occ, dtype=np.float64)

    cls = keys >> (_TBITS + _VBITS)
    tok = (keys >> _VBITS) & ((1 << _TBITS) - 1)
    val = keys & _VMASK

    # sentinel = token slot all-ones AND value 0 (real per-sequence counts
    # are clamped >= 1, so a genuine token id 2^31-1 can never collide)
    sent_mask = (tok == ((1 << _TBITS) - 1)) & (val == 0)
    n_c = np.zeros(K)
    n_c[cls[sent_mask]] = occ[sent_mask]
    N = n_c.sum()

    cls, tok, val, occ = cls[~sent_mask], tok[~sent_mask], val[~sent_mask], occ[~sent_mask]

    # Fully vectorized finalize (no per-token Python loop — sublinear driver
    # cost even at vocab 10^6): everything is segment ops over the global
    # (token, value[, class]) arrays.
    mu = n_c * (N + 1) / 2.0
    base_sigma2 = n_c * (N - n_c) * (N + 1) / 12.0

    # 1) collapse (token, value) across classes -> tie totals t_v
    tv_key = (tok << _VBITS) | val
    tv_u, tv_inv = np.unique(tv_key, return_inverse=True)
    t_v = np.bincount(tv_inv, weights=occ)
    tv_tok = tv_u >> _VBITS  # token of each unique (token, value) bin

    # 2) per-token segments over the value-sorted unique bins
    tokens_u, tok_of_tv, tv_per_tok = np.unique(
        tv_tok, return_inverse=True, return_counts=True
    )
    T = len(tokens_u)
    seg_start = np.r_[0, np.cumsum(tv_per_tok)][:-1]
    csum = np.cumsum(t_v)
    nz_total = np.add.reduceat(t_v, seg_start)  # nonzero mass per token
    zeros_t = N - nz_total  # sequences with value 0, per token
    # exclusive within-segment cumsum: global cumsum minus segment offset
    seg_offset = np.r_[0.0, csum][seg_start]  # (T,) cumsum before each segment
    below = (csum - t_v - seg_offset[tok_of_tv]) + zeros_t[tok_of_tv]
    avg_rank_v = below + (t_v + 1) / 2.0  # avg rank of each (token, value)
    avg_rank_zero = (zeros_t + 1) / 2.0  # avg rank of the zero bin per token

    # 3) per-(class, token) rank sums over nonzero bins
    tok_rank = tok_of_tv[tv_inv]  # dense token index per input row
    ct_flat = cls * T + tok_rank
    rs_nz = np.bincount(ct_flat, weights=occ * avg_rank_v[tv_inv], minlength=K * T)
    nnz = np.bincount(ct_flat, weights=occ, minlength=K * T)
    rs = rs_nz.reshape(K, T) + (n_c[:, None] - nnz.reshape(K, T)) * avg_rank_zero[None, :]

    sigma2 = np.broadcast_to(base_sigma2[:, None], (K, T)).copy()
    if tie_correct and N > 1:
        tie_sum = np.add.reduceat(t_v**3 - t_v, seg_start) + (zeros_t**3 - zeros_t)
        corr = 1.0 - tie_sum / (N**3 - N)
        sigma2 *= corr[None, :]
    z = np.divide(
        rs - mu[:, None], np.sqrt(np.maximum(sigma2, 1e-300)),
        out=np.zeros((K, T)), where=sigma2 > 0,
    )

    cls_a = np.repeat(np.arange(K), T)
    tok_a = np.tile(tokens_u, K)
    z_a = z.ravel()
    names = np.asarray(classes, dtype=object)
    return pa.table(
        {
            "class": pa.array(names[cls_a.astype(np.int64)].tolist(), type=pa.string()),
            "token_id": pa.array(tok_a.astype(np.int32)),
            "score": pa.array(z_a),
            "method": pa.array([method_name] * len(z_a)),
        }
    )
