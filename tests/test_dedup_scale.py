"""Scale/adversarial dedup tests (VERDICT r1 items 3 + 9):

- minhash at 10^5 docs runs fully distributed — candidate pairs, exact
  Jaccard verification and component labeling never materialize on the
  driver (the to_pandas()/broadcast/union-find path was removed).
- simhash / embedding dedup complete on adversarial inputs where every row
  lands in ONE bucket (tiled pair generation keeps memory bounded at
  TILE^2 instead of O(b^2)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from modlyn_ray.stages.dedup import (
    embedding_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)


def _corpus_100k(n_unique: int = 99_700, n_families: int = 100):
    rng = np.random.default_rng(42)
    texts, ids = [], []
    for i in range(n_unique):
        texts.append(" ".join(f"w{v}" for v in rng.integers(0, 50_000, 8)))
        ids.append(i)
    nid = n_unique
    for f in range(n_families):
        base = [f"f{f}_{v}" for v in rng.integers(0, 1000, 20)]
        for v in range(3):  # three near-identical variants per family
            words = list(base)
            words[-1] = f"var{v}"
            texts.append(" ".join(words))
            ids.append(nid)
            nid += 1
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_minhash_dedup_100k_distributed(ray_session):
    tbl = _corpus_100k()
    n = len(tbl)
    assert n == 100_000
    ds = rd.from_arrow(tbl).repartition(16)
    out = minhash_lsh_dedup(ds, n_buckets=16).to_pandas()
    assert len(out) == n
    # every planted family collapsed to one cluster with one kept row
    fam = out[out["doc_id"] >= 99_700].copy()
    fam["family"] = (fam["doc_id"] - 99_700) // 3
    grp = fam.groupby("family")
    assert (grp["cluster_id"].nunique() == 1).all()
    assert (grp["is_kept"].sum() == 1).all()
    # uniques keep themselves (no false merges across the random corpus)
    uniq = out[out["doc_id"] < 99_700]
    assert uniq["is_kept"].mean() > 0.999
    assert (uniq["cluster_id"] == uniq["doc_id"]).mean() > 0.999


def test_simhash_adversarial_single_bucket(ray_session):
    # all docs identical -> one signature -> every chunk bucket holds ALL
    # docs; the tiled kernel must complete within bounded memory and emit
    # the full pair set at hamming 0
    n = 1200
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["the same exact document text"] * n),
        }
    )
    out = simhash_dedup(rd.from_arrow(tbl).repartition(4)).to_pandas()
    assert len(out) == n * (n - 1) // 2
    assert (out["hamming"] == 0).all()


def test_embedding_adversarial_single_bucket(ray_session):
    n = 1500
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    embs = np.tile(base, (n, 1)) + rng.standard_normal((n, 16)) * 1e-6
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(embs)),
        }
    )
    out = embedding_dedup(rd.from_arrow(tbl).repartition(4), threshold=0.99).to_pandas()
    assert len(out) == n * (n - 1) // 2
    assert (out["cosine"] >= 0.99).all()


def test_minhash_partitioning_invariance(ray_session):
    """Cluster assignments are a pure function of the data — identical
    across different input partitionings (the bucketed kernels and joins
    must not depend on block boundaries)."""
    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{v}" for v in rng.integers(0, 2000, 10)) for _ in range(400)]
    base = [f"dup_{v}" for v in rng.integers(0, 100, 15)]
    for v in range(4):
        w = list(base)
        w[-1] = f"x{v}"
        texts.append(" ".join(w))
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    outs = []
    for parts in (2, 8):
        out = (
            minhash_lsh_dedup(rd.from_arrow(tbl).repartition(parts), n_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd_a, pd_b = outs
    assert pd_a["cluster_id"].tolist() == pd_b["cluster_id"].tolist()
    assert pd_a["is_kept"].tolist() == pd_b["is_kept"].tolist()
