"""Flagship pipeline: point-in-time feature vectors per (doc_id, ingest_ts).

Composes the engine's layers into the north-star shape
(golden_pit_features, FIXTURES.md §3.3): for every sequence row —

  tokens (byte-identical passthrough), n_tok, source,
  session_id, lag1_n_tok, lead1_n_tok (labeled future target),
  attr_val_asof (+ matched ts for the anti-leak invariant),
  cum_n_tok and cum_row_mix — inclusive zero-leakage prefix accumulators
  (the tok_freq_vec_checksum analog: a deterministic function of the token
  multiset seen in the doc up to and including t)

Stages: one map_batches (row mix) + one bucket shuffle (windowize) + one
bucket shuffle (as-of) — both keyed identically on crc32(doc_id), with
heavy doc_ids routed to dedicated buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from modlyn_ray.stages.temporal import asof_join, detect_heavy_keys, windowize


def add_row_mix(batch: pa.Table) -> pa.Table:
    """Per-row order-insensitive token mix (int64) — prefix-summable."""
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    mixed = (flat * np.uint64(2654435761)) % np.uint64(1 << 31)
    pad = np.zeros(len(mixed) + 1, dtype=np.uint64)
    np.cumsum(mixed, out=pad[1:])
    row = (pad[offs[1:]] - pad[offs[:-1]]).astype(np.int64)
    return batch.append_column("row_mix", pa.array(row))


def pit_features(
    sequences: Dataset,
    doc_attrs: Dataset | None = None,
    n_buckets: int = 64,
    detect_skew: bool = True,
    session_gap_us: int | None = None,
) -> Dataset:
    """sequences (+ optional doc_attrs) -> point-in-time feature Dataset."""
    from modlyn_ray.stages.temporal import DEFAULT_SESSION_GAP_US

    heavy = detect_heavy_keys(sequences, n_buckets=n_buckets) if detect_skew else {}
    seq = sequences.map_batches(add_row_mix, batch_format="pyarrow", zero_copy_batch=True)
    feat = windowize(
        seq,
        lag_cols=["n_tok"],
        lead_cols=["n_tok"],
        prefix_sum_cols=["n_tok", "row_mix"],
        sessionize=True,
        session_gap_us=session_gap_us or DEFAULT_SESSION_GAP_US,
        n_buckets=n_buckets,
        heavy=heavy,
    )
    if doc_attrs is not None:
        feat = asof_join(
            feat, doc_attrs, value_cols=["attr_val"], n_buckets=n_buckets, heavy=heavy
        )
    return feat
