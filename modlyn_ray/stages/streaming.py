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

    def __init__(
        self,
        gap_us: int,
        on_source_change: bool,
        state: dict | None = None,
        key: str = "doc_id",
        ts_col: str = "ingest_ts",
    ):
        self.gap_us = gap_us
        self.on_source_change = on_source_change
        self.key = key
        self.ts_col = ts_col
        self.state: dict[str, tuple[int, str | None, int]] = state or {}

    def process(self, batch: pa.Table) -> pa.Table:
        """Batches MUST arrive in event-time order across calls (the
        ordered-log contract); WITHIN a batch, rows are key-clustered
        here (stable sort by key preserves the per-key time order), so
        interleaved keys in one drop are handled. Returns the batch +
        session_id, in the batch's ORIGINAL row order.

        Vectorized: in-batch breaks (time gap / source change) are numpy
        segment ops; the carried state is consulted only at SEGMENT HEADS
        (one per distinct key per batch) and updated from segment tails —
        O(rows) numpy + O(distinct keys) Python, never per-row Python."""
        n = len(batch)
        if n == 0:
            return batch.append_column("session_id", pa.array(np.array([], np.int64)))
        kcol = batch[self.key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kdic = kcol.dictionary_encode()
        codes = kdic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kvals = kdic.dictionary.to_pylist()
        ts = (
            batch[self.ts_col].combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        if "source" in batch.column_names:
            scol = batch["source"]
            if isinstance(scol, pa.ChunkedArray):
                scol = scol.combine_chunks()
            sdic = scol.dictionary_encode()
            scodes = sdic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            svals = sdic.dictionary.to_pylist()
        else:
            scodes = np.zeros(n, dtype=np.int64)
            svals = [None]

        # key-cluster the batch: a key appearing in two non-adjacent runs
        # would consult stale pre-batch state at its second head. Stable
        # sort by key code keeps per-key rows in input (event-time) order;
        # session ids are scattered back to the original row order below.
        order = np.argsort(codes, kind="stable")
        identity = bool(np.all(order == np.arange(n)))
        if not identity:
            codes, ts, scodes = codes[order], ts[order], scodes[order]

        new_seg = np.r_[True, codes[1:] != codes[:-1]]
        brk = np.r_[False, (ts[1:] - ts[:-1]) > self.gap_us]
        if self.on_source_change:
            brk |= np.r_[False, scodes[1:] != scodes[:-1]]
        brk &= ~new_seg  # head rows handled against carried state below

        seg_starts = np.flatnonzero(new_seg)
        base = np.empty(len(seg_starts), dtype=np.int64)
        for j, s in enumerate(seg_starts):
            k = kvals[codes[s]]
            prev = self.state.get(k)
            if prev is None:
                base[j] = 0
            else:
                lt, ls, sid = prev
                inc = (ts[s] - lt > self.gap_us) or (
                    self.on_source_change and svals[scodes[s]] != ls
                )
                base[j] = sid + (1 if inc else 0)
        cum = np.cumsum(brk)
        seg_of = np.cumsum(new_seg) - 1
        out = base[seg_of] + (cum - cum[seg_starts][seg_of])

        seg_ends = np.r_[seg_starts[1:], n] - 1
        for j, e in enumerate(seg_ends):
            self.state[kvals[codes[e]]] = (int(ts[e]), svals[scodes[e]], int(out[e]))
        if not identity:
            unsorted = np.empty(n, dtype=np.int64)
            unsorted[order] = out
            out = unsorted
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
        SessionActor.remote(
            gap_us, on_source_change, states[i] if states else None, key=key
        )
        for i in range(n_actors)
    ]
    futures = []
    for batch in batches:
        kcol = batch[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kdic = kcol.dictionary_encode()
        codes = kdic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        owner_of_unique = np.array(
            [zlib.crc32(str(k).encode()) % n_actors for k in kdic.dictionary.to_pylist()],
            dtype=np.int64,
        )
        owner = owner_of_unique[codes]
        for a in range(n_actors):
            mask = owner == a
            if mask.any():
                futures.append(actors[a].process.remote(batch.filter(pa.array(mask))))
        # NO per-batch driver barrier: Ray executes an actor's tasks in
        # submission order, so each key's timeline (owned by exactly one
        # actor) is processed in stream order; the stream pipelines freely.
    results = ray.get(futures)
    out = pa.concat_tables(results) if results else None
    states_out = ray.get([a.get_state.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return out, states_out
