"""Streaming-shaped sessionization: incremental per-key state in actors.

Ray Data is a batch engine (no watermarks); the guide's pattern for
stream-shaped workloads is an ordered, partitioned log consumed by actors
holding incremental state. ``StreamingSessionizer`` demonstrates it: one
actor per hash-bucket of keys, fed batches in event-time order, emitting
session ids computed from carried state (last ts / last source / session
counter per key) — byte-equivalent to the batch ``windowize`` sessionizer
on the same ordered input, but able to absorb an unbounded stream with
O(active keys) memory.

Use when data arrives incrementally (e.g. hourly drops): feed each drop
through ``process_ordered_stream`` and session ids continue across drops
without recomputation — the state IS the checkpoint (``get_state`` /
restore via constructor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

DEFAULT_GAP_US = 3_600_000_000


@ray.remote
class SessionActor:
    """Holds per-key incremental state: (last_ts, last_source, session_idx)."""

    def __init__(self, gap_us: int, on_source_change: bool, state: dict | None = None):
        self.gap_us = gap_us
        self.on_source_change = on_source_change
        self.state: dict[str, tuple[int, str | None, int]] = state or {}

    def process(self, batch: pa.Table) -> pa.Table:
        """Batch rows MUST arrive in (key, ts) order across calls (the
        ordered-log contract). Returns the batch + session_id."""
        keys = batch["doc_id"].to_pylist()
        ts = (
            batch["ingest_ts"].combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        sources = (
            batch["source"].to_pylist() if "source" in batch.column_names else [None] * len(keys)
        )
        out = np.empty(len(keys), dtype=np.int64)
        for i, (k, t, s) in enumerate(zip(keys, ts, sources)):
            prev = self.state.get(k)
            if prev is None:
                sid = 0
            else:
                lt, ls, sid = prev
                if (t - lt > self.gap_us) or (self.on_source_change and s != ls):
                    sid += 1
            self.state[k] = (int(t), s, sid)
            out[i] = sid
        return batch.append_column("session_id", pa.array(out))

    def get_state(self) -> dict:
        return self.state


def process_ordered_stream(
    batches: list[pa.Table],
    n_actors: int = 4,
    gap_us: int = DEFAULT_GAP_US,
    on_source_change: bool = True,
    key: str = "doc_id",
    states: list[dict] | None = None,
) -> tuple[pa.Table, list[dict]]:
    """Feed an ordered stream of Arrow batches through a pool of session
    actors (keys hash-partitioned so each key's timeline is owned by ONE
    actor). Returns (labeled table, per-actor states for checkpointing).
    """
    import zlib

    actors = [
        SessionActor.remote(gap_us, on_source_change, states[i] if states else None)
        for i in range(n_actors)
    ]
    futures = []
    for batch in batches:
        keys = batch[key].to_pylist()
        owner = np.array([zlib.crc32(str(k).encode()) % n_actors for k in keys])
        parts = []
        for a in range(n_actors):
            mask = owner == a
            if mask.any():
                parts.append(actors[a].process.remote(batch.filter(pa.array(mask))))
        # barrier per stream batch: ordering within each key must be kept
        futures.extend(ray.get(parts))
    out = pa.concat_tables(futures) if futures else None
    states_out = ray.get([a.get_state.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return out, states_out
