"""Streaming sessionizer actor vs batch windowize; IVF ANN recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.stages.ann import knn_brute, knn_ivf, make_queries, train_ivf_centroids
from modlyn_ray.stages.streaming import process_ordered_stream
from modlyn_ray.stages.temporal import windowize


def test_streaming_sessionizer_matches_batch():
    profile = synth.TINY
    d = synth.ensure_profile(profile)
    tbl = synth.make_sequences(profile)
    # ordered log: sort by (doc, ts, seq) then split into stream batches
    order = np.lexsort(
        (
            tbl["seq_no"].to_numpy(),
            tbl["ingest_ts"].to_numpy().astype("datetime64[us]").view(np.int64),
            pd.factorize(tbl["doc_id"].to_pandas())[0],
        )
    )
    ordered = tbl.take(pa.array(order))
    batches = [ordered.slice(i, 16) for i in range(0, len(ordered), 16)]

    out, states = process_ordered_stream(batches, n_actors=3)
    got = out.to_pandas().sort_values("seq_no").reset_index(drop=True)

    want = (
        windowize(rd.from_arrow(tbl), sessionize=True, n_buckets=4)
        .to_pandas()
        .sort_values("seq_no")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        got["session_id"].astype("int64"), want["session_id"].astype("int64"), check_names=False
    )
    # incremental resume: re-feed a later drop with carried state
    half = len(batches) // 2
    out1, st = process_ordered_stream(batches[:half], n_actors=3)
    out2, _ = process_ordered_stream(batches[half:], n_actors=3, states=st)
    got2 = (
        pa.concat_tables([out1, out2]).to_pandas().sort_values("seq_no").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        got2["session_id"].astype("int64"), want["session_id"].astype("int64"), check_names=False
    )


def test_ivf_recall_vs_brute():
    rng = np.random.default_rng(1)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((6, 32)) * 3
    X = np.concatenate([c + rng.standard_normal((80, 32)) for c in centers])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.array(list(X.astype(np.float32))),
        }
    )
    ds = rd.from_arrow(tbl)
    q = make_queries(ds, 8)
    C = train_ivf_centroids(ds, n_centroids=6, sample=0.5)
    assert C.shape == (6, 32)
    brute = knn_brute(ds, q, k=5)
    ivf = knn_ivf(ds, q, k=5, centroids=C, n_probe=2)
    joined = brute.merge(ivf, on=["query_id", "neighbor_id"], how="inner")
    recall = len(joined) / len(brute)
    assert recall >= 0.7, recall
