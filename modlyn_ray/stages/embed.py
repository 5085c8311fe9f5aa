"""Deterministic text -> embedding: hashed character-n-gram projection.

The LLM-pipeline "embed then index / dedup" front end (SURVEY.md §2
extension; the reference has no embedding stage — its vectors arrive
precomputed). A real model would be an actor-pool ``map_batches`` stage
with weights loaded in ``__init__``; this stage has exactly that shape but
with a deterministic, dependency-free featurizer (signed feature hashing of
char n-grams — the classic hashing-trick text kernel), so the downstream
ANN / dedup path (stages/ann.py, stages/dedup.py) can be driven end-to-end
and reproduced bit-for-bit on any partitioning.

Per-batch the kernel is fully vectorized over the Arrow string buffer:
the batch's UTF-8 bytes are ONE flat uint8 array (zero-copy from the
object store), the rolling n-gram hash is computed over that whole buffer
with three shifted slices, window starts per doc come from offset
arithmetic (no per-row Python), and the signed accumulation into the
embedding matrix is a single ``np.bincount``. Cost is O(total_bytes) per
batch regardless of row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from modlyn_ray.util import pool_bounds

# mix constants: any fixed odd multipliers give a stable rolling hash; the
# shift picks an independent bit for the sign so bucket and sign decorrelate.
# The sign bit sits at 47 — ABOVE any realistic bucket range (bucket = hh %
# dim uses the low bits; a low sign bit like 13 would overlap the bucket
# bits for power-of-two dims >= 2^14 and correlate sign with bucket parity,
# losing hashing-trick unbiasedness).
_M1 = np.uint64(1099511628211)
_M2 = np.uint64(65599)
_SIGN_SHIFT = np.uint64(47)


class HashedNgramEmbedder:
    """Actor: per-batch vectorized signed n-gram hashing into ``dim``
    buckets, L2-normalized. Deterministic (no RNG, no fitted state), so the
    embedding of a document is identical on every worker and partitioning."""

    def __init__(self, text_col: str, out_col: str, dim: int, normalize: bool):
        if dim < 2:
            raise ValueError(f"dim must be >= 2, got {dim}")
        self.text_col = text_col
        self.out_col = out_col
        self.dim = np.uint64(dim)
        self.normalize = normalize

    def _flat_utf8(self, col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(byte buffer, per-doc offsets) — zero-copy views of the Arrow
        string array's own buffers."""
        if pa.types.is_large_string(col.type):
            col = col.cast(pa.string())
        col = pc.fill_null(col, "")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if len(col) == 0 or col.buffers()[1] is None:
            return np.zeros(0, dtype=np.uint8), np.zeros(len(col) + 1, dtype=np.int64)
        voff = col.offset
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            voff : voff + len(col) + 1
        ].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        return data, offs

    def __call__(self, b: pa.Table) -> pa.Table:
        data, offs = self._flat_utf8(b[self.text_col])
        n_docs = len(offs) - 1
        lens = np.diff(offs)
        cnt = np.maximum(lens - 2, 0)  # trigram windows per doc
        total = int(cnt.sum())
        acc = np.zeros(n_docs * int(self.dim), dtype=np.float64)
        if total > 0:
            d = data.astype(np.uint64)
            h = d[:-2] * _M1 + d[1:-1] * _M2 + d[2:]
            csum = np.cumsum(cnt) - cnt
            starts = (
                np.arange(total, dtype=np.int64)
                - np.repeat(csum, cnt)
                + np.repeat(offs[:-1], cnt)
            )
            hh = h[starts]
            bucket = (hh % self.dim).astype(np.int64)
            sign = (((hh >> _SIGN_SHIFT) & np.uint64(1)).astype(np.float64) * 2.0) - 1.0
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
            acc = np.bincount(
                doc_idx * int(self.dim) + bucket,
                weights=sign,
                minlength=n_docs * int(self.dim),
            )
        E = acc.reshape(n_docs, int(self.dim))
        if self.normalize:
            nrm = np.linalg.norm(E, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            E = E / nrm
        flat = pa.array(E.ravel().astype(np.float32), pa.float32())
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n_docs + 1) * int(self.dim), int(self.dim)),
                     pa.int32()),
            flat,
        )
        return b.append_column(self.out_col, lists)


def embed_text(
    ds: Dataset,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    normalize: bool = True,
    concurrency: int | None = None,
    batch_size: int = 4096,
) -> Dataset:
    """Append a deterministic hashed-n-gram embedding column
    (``list<float32>``, length ``dim``) to every row."""
    return ds.map_batches(
        HashedNgramEmbedder,
        fn_constructor_kwargs={
            "text_col": text_col,
            "out_col": out_col,
            "dim": dim,
            "normalize": normalize,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or pool_bounds(4),
    )
