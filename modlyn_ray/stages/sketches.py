"""Mergeable cardinality sketches: HyperLogLog approximate distinct count.

At 100 TB an exact ``COUNT(DISTINCT col)`` is an all-to-all shuffle of every
distinct value (the q05 path — correct, but the exchange carries the whole
key set). The HLL path ships a FIXED 2^p-byte register array per block
instead: map_batches computes per-block registers, a tree reduce merges
them with an elementwise max, and the driver finalizes one tiny array —
no shuffle at all, error ~1.04/sqrt(2^p) (~1.6% at p=12).

Hashing is vectorized end to end: string/int columns are hashed by DuckDB's
C ``hash()`` kernel (xxhash-class, 64-bit) inside each batch — the same
in-actor DuckDB pattern as text.Fingerprinter — and register index / rank
extraction is pure numpy bit math. No Python loop touches rows.

Reference analog: none (modlyn has no sketches); this is an engine
extension for the 100 TB dedup/profiling suite (prompt requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "hll_register_partial",
    "merge_registers",
    "hll_estimate",
    "approx_distinct",
    "mg_partial",
    "mg_merge",
    "heavy_hitters",
]


_DUCK = None  # one connection per worker process (Fingerprinter pattern)


def _hash64(col: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash of an Arrow column via DuckDB's hash() kernel.

    The connection is cached per worker process — constructing a fresh
    DuckDB database instance PER BATCH was pure fixed overhead on the HLL
    hot path."""
    global _DUCK
    import duckdb

    if _DUCK is None:
        _DUCK = duckdb.connect()
    tbl = pa.table({"v": col})  # noqa: F841 (duckdb scans it by name)
    out = _DUCK.execute("SELECT hash(v) AS h FROM tbl").arrow()
    return out.column("h").combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)


def hll_register_partial(col: pa.Array | pa.ChunkedArray, p: int = 12) -> np.ndarray:
    """One block's HLL registers (uint8[2^p]) for a value column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(col) == 0:
        return regs
    h = _hash64(col)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # rank = 1 + count-leading-zeros of the remaining 64-p bits (shifted to
    # the top of the word); guard bits in the low p positions cap the rank
    # at 64-p+1 even for an all-zero remainder
    v = (h << np.uint64(p)) | np.uint64((1 << p) - 1)

    def _exp(x: np.ndarray) -> np.ndarray:
        # floor(log2(x)) via the float64 exponent field — exact ONLY for
        # x < 2^53 (beyond that, mantissa rounding can cross a power of 2)
        return ((x.astype(np.float64).view(np.uint64) >> np.uint64(52)).astype(np.int64)) - 1023

    top = v >> np.uint64(11)  # 53 high bits: exact in float64
    lz = np.where(top > 0, 52 - _exp(top), 63 - _exp(v))  # low branch: v < 2^11, exact
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT col): per-block registers ->
    tree-merged elementwise max -> one driver-side finalize. The exchange
    volume is (#blocks x 2^p) bytes total, independent of cardinality."""

    def partial(b: pa.Table) -> pa.Table:
        regs = hll_register_partial(b[col], p)
        return pa.table({"regs": pa.array([regs], type=pa.list_(pa.uint8()))})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # fan-in merge: each task ORs (max) a handful of register arrays into
    # one — the same parallel tree-reduce shape as count_stats
    def merge_batch(b: pa.Table) -> pa.Table:
        arrs = b["regs"]
        if isinstance(arrs, pa.ChunkedArray):
            arrs = arrs.combine_chunks()
        flat = arrs.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
        regs = flat.reshape(len(b), -1).max(axis=0)
        return pa.table({"regs": pa.array([regs], type=pa.list_(pa.uint8()))})

    merged = parts.map_batches(merge_batch, batch_format="pyarrow", batch_size=64)
    final = np.zeros(1 << p, dtype=np.uint8)
    for row in merged.take_all():
        final = merge_registers(final, np.asarray(row["regs"], dtype=np.uint8))
    return hll_estimate(final)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (bounded-memory frequent items)
# ---------------------------------------------------------------------------
def mg_partial(col: pa.Array | pa.ChunkedArray, capacity: int) -> dict:
    """One block's Misra-Gries summary: {value: lower-bound count}, at most
    ``capacity`` entries. Per-block counting is EXACT and vectorized
    (dictionary-encode + bincount); the MG truncation subtracts the
    (capacity+1)-th count from everything and drops <=0 — the classic
    decrement step, giving global error <= n_block / (capacity+1)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return {}
    dic = col.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(codes, minlength=len(dic.dictionary))
    vals = dic.dictionary.to_pylist()
    if len(counts) > capacity:
        # subtract the (capacity+1)-th largest count; at most `capacity`
        # entries stay positive
        kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
        counts = counts - kth
    keep = np.flatnonzero(counts > 0)
    return {vals[i]: int(counts[i]) for i in keep}


def mg_merge(a: dict, b: dict, capacity: int) -> dict:
    """Mergeable-summaries merge (Agarwal et al.): sum counters, then apply
    the same (capacity+1)-th-largest decrement. Error adds linearly, so the
    merged summary keeps the n_total/(capacity+1) guarantee."""
    out = dict(a)
    for v, c in b.items():
        out[v] = out.get(v, 0) + c
    if len(out) > capacity:
        cnts = np.fromiter(out.values(), dtype=np.int64)
        kth = np.partition(cnts, len(cnts) - capacity - 1)[len(cnts) - capacity - 1]
        out = {v: c - kth for v, c in out.items() if c - kth > 0}
    return out


def heavy_hitters(ds: Dataset, col: str, k: int = 10, capacity: int = 1024) -> "pd.DataFrame":
    """Distributed approximate top-k frequent values. Exchange volume is
    (#blocks x capacity) entries, independent of cardinality; any value
    with true frequency > 2*n/(capacity+1) is guaranteed present, and the
    reported count is a lower bound within n/(capacity+1) of the truth.
    With capacity >= total distinct values the counts are EXACT."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        mg = mg_partial(b[col], capacity)
        return pa.table(
            {
                "value": pa.array([str(v) for v in mg.keys()]),
                "count": pa.array(list(mg.values()), type=pa.int64()),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_batch(b: pa.Table) -> pa.Table:
        mg = mg_partial_from_pairs(
            b["value"].to_pylist(), b["count"].to_numpy(zero_copy_only=False), capacity
        )
        return pa.table(
            {
                "value": pa.array(list(mg.keys())),
                "count": pa.array(list(mg.values()), type=pa.int64()),
            }
        )

    merged = parts.map_batches(
        merge_batch, batch_format="pyarrow", batch_size=capacity * 16
    ).to_pandas()
    final = mg_partial_from_pairs(
        merged["value"].tolist(), merged["count"].to_numpy(), capacity
    )
    out = pd.DataFrame({"value": list(final.keys()), "count": list(final.values())})
    return (
        out.sort_values(["count", "value"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def mg_partial_from_pairs(vals: list, counts: np.ndarray, capacity: int) -> dict:
    """Merge pre-counted (value, count) pairs under the MG truncation rule
    (vectorized groupby-sum + decrement)."""
    import pandas as pd

    s = pd.Series(np.asarray(counts, dtype=np.int64)).groupby(pd.Index(vals)).sum()
    c = s.to_numpy()
    if len(c) > capacity:
        kth = np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1]
        c = c - kth
    keep = c > 0
    return dict(zip(np.asarray(s.index.to_numpy())[keep].tolist(), c[keep].tolist()))
