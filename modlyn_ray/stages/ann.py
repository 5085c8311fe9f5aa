"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — the baseline. The query matrix is
  broadcast ONCE with ray.put; each batch computes a numpy matmul partial
  top-k (per query per batch), and partials (Q x k rows each) are merged by
  a tiny final reduction — no all-to-all shuffle at any point.
- ``knn_lsh``: the scale path — random-hyperplane bucketing (IVF-style
  coarse quantization): only batches' vectors in a query's bucket (or
  probed neighbor buckets) are scored. Approximate; recall measured in
  tests against knn_brute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _stack(batch_col) -> np.ndarray:
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    if len(batch_col) == 0:  # np.stack([]) raises; scorers early-return on n=0
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(batch_col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _empty_scores(qids, batch: pa.Table, id_col: str) -> pa.Table:
    """Typed empty partial-scores table: query/neighbor id dtypes derived
    from the real inputs (a hardcoded int64 empty frame would mix schemas
    with string-id blocks downstream)."""
    ncol = batch[id_col]
    if isinstance(ncol, pa.ChunkedArray):
        ncol = ncol.combine_chunks()
    return pa.table(
        {
            "query_id": pa.array(np.asarray(qids)[:0]),
            "neighbor_id": ncol.slice(0, 0),
            "cosine": pa.array(np.zeros(0)),
        }
    )


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


class _BruteScorer:
    """Actor: normalized query matrix loaded once per actor from the
    object store; per batch emits partial top-k rows."""

    def __init__(self, q_ref, k: int, emb_col: str, id_col: str, exclude_self: bool):
        self.qids, Q = ray.get(q_ref)
        self.Q = _normalize(Q)
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # empty block: np.stack/argpartition would raise
            return _empty_scores(self.qids, batch, self.id_col)
        E = _normalize(_stack(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        C = self.Q @ E.T  # (Q, B)
        if self.exclude_self:
            # mask exact self matches by id
            for qi, qid in enumerate(self.qids):
                hit = np.flatnonzero(ids == qid)
                if len(hit):
                    C[qi, hit] = -np.inf
        k = min(self.k, C.shape[1])
        part = np.argpartition(-C, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(np.arange(len(self.qids)), k)
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(np.asarray(self.qids)[rows_q]),
                "neighbor_id": pa.array(ids[cols]),
                "cosine": pa.array(C[rows_q, cols]),
            }
        )


def knn_brute(
    ds: Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency: int = 2,  # leave CPUs for the read stage — an actor pool
    # sized to the whole node starves upstream stages and stalls the pipeline
    batch_size: int = 8192,
) -> pd.DataFrame:
    """queries = (query_ids, query_matrix). Returns tidy top-k:
    (query_id, neighbor_id, cosine, rank) — rank 1..k by cosine desc,
    ties broken by neighbor_id asc (deterministic)."""
    qids, Q = queries
    q_ref = ray.put((np.asarray(qids), np.asarray(Q, dtype=np.float64)))
    from modlyn_ray.util import pool_bounds

    concurrency = pool_bounds(concurrency)
    parts = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={
            "q_ref": q_ref,
            "k": k,
            "emb_col": emb_col,
            "id_col": id_col,
            "exclude_self": exclude_self,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    ).to_pandas()  # Q x k x n_batches rows — tiny
    parts = parts[np.isfinite(parts["cosine"])]
    parts = parts.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top


def make_queries(ds: Dataset, n: int, emb_col="embedding", id_col="vec_id"):
    """Deterministic query set: the n smallest ids (stable across runs)."""
    rows = ds.select_columns([id_col, emb_col]).sort(id_col).limit(n).take_all()
    qids = np.array([r[id_col] for r in rows])
    Q = np.stack([np.asarray(r[emb_col]) for r in rows]).astype(np.float64)
    return qids, Q


def train_ivf_centroids(
    ds: Dataset, n_centroids: int = 16, emb_col: str = "embedding",
    sample: float = 0.2, iters: int = 8, seed: int = 9,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means (Lloyd, few iterations) on a
    SAMPLE of normalized vectors — driver-side numpy on the sample only."""
    rows = ds.select_columns([emb_col]).random_sample(sample, seed=seed).take_all()
    X = _normalize(np.stack([np.asarray(r[emb_col]) for r in rows]).astype(np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def knn_ivf(
    ds: Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    centroids: np.ndarray | None = None,
    n_probe: int = 2,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-style approximate top-k: score only vectors whose nearest
    centroid is among each query's ``n_probe`` closest centroids.
    ``centroids`` from train_ivf_centroids (broadcast once)."""
    qids, Q = queries
    if centroids is None:
        centroids = train_ivf_centroids(ds, emb_col=emb_col)
    Qn = _normalize(np.asarray(Q, dtype=np.float64))
    q_cells = np.argsort(-(Qn @ centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((np.asarray(qids), Qn, centroids, q_cells))

    class Scorer:
        def __init__(self):
            self.qids, self.Q, self.C, self.q_cells = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return _empty_scores(self.qids, batch, id_col)
            E = _normalize(_stack(batch[emb_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            cell = (E @ self.C.T).argmax(axis=1)
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cell, self.q_cells[qi])
                if exclude_self:
                    mask &= ids != qid
                if not mask.any():
                    continue
                c = self.Q[qi] @ E[mask].T
                kk = min(k, len(c))
                part = np.argpartition(-c, kk - 1)[:kk]
                out_q.append(np.full(kk, qid))
                out_n.append(ids[mask][part])
                out_c.append(c[part])
            if not out_q:
                return _empty_scores(self.qids, batch, id_col)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "neighbor_id": pa.array(np.concatenate(out_n)),
                    "cosine": pa.array(np.concatenate(out_c)),
                }
            )

    from modlyn_ray.util import pool_bounds

    parts = ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=8192,
        concurrency=pool_bounds(2), zero_copy_batch=True,
    ).to_pandas()
    parts = parts.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top


def knn_lsh(
    ds: Dataset,
    queries: tuple[np.ndarray, np.ndarray],
    k: int = 10,
    n_planes: int = 6,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    seed: int = 5,
    probe_hamming: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature is
    within ``probe_hamming`` bits of the query's (multi-probe LSH)."""
    qids, Q = queries
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    Qn = _normalize(np.asarray(Q, dtype=np.float64))
    qsig = (Qn @ planes > 0).astype(np.int64) @ (1 << np.arange(n_planes))
    # admissible buckets per query (exact + ALL hamming<=probe neighbors —
    # sum of C(n_planes, r) masks, e.g. 6+15=21 flips at probe=2/6 planes),
    # as sorted int arrays so the per-batch membership test is np.isin
    from itertools import combinations

    admissible: list[np.ndarray] = []
    for s in qsig:
        cur = {int(s)}
        for r in range(1, min(probe_hamming, n_planes) + 1):
            for bits in combinations(range(n_planes), r):
                flip = 0
                for b in bits:
                    flip |= 1 << b
                cur.add(int(s) ^ flip)
        admissible.append(np.array(sorted(cur), dtype=np.int64))
    q_ref = ray.put((np.asarray(qids), Qn, planes, admissible))

    class Scorer:
        def __init__(self):
            self.qids, self.Q, self.planes, self.adm = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return _empty_scores(self.qids, batch, id_col)
            E = _normalize(_stack(batch[emb_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            sig = (E @ self.planes > 0).astype(np.int64) @ (1 << np.arange(self.planes.shape[1]))
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(sig, self.adm[qi])
                if exclude_self:
                    mask &= ids != qid
                if not mask.any():
                    continue
                c = self.Q[qi] @ E[mask].T
                kk = min(k, len(c))
                part = np.argpartition(-c, kk - 1)[:kk]
                out_q.append(np.full(kk, qid))
                out_n.append(ids[mask][part])
                out_c.append(c[part])
            if not out_q:
                return _empty_scores(self.qids, batch, id_col)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "neighbor_id": pa.array(np.concatenate(out_n)),
                    "cosine": pa.array(np.concatenate(out_c)),
                }
            )

    from modlyn_ray.util import pool_bounds

    parts = ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=8192, concurrency=pool_bounds(2), zero_copy_batch=True
    ).to_pandas()
    parts = parts.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top
