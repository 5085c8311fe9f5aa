"""Deterministic hash-based sampling — reproducible row subsets with no
randomness state, the building block for train/val carving and corpus
down-sampling at 100 TB.

``hash_sample`` keeps a row iff the first 16 bits of ``md5(key)`` fall
below a threshold — a pure function of the key, so the SAME rows are kept
regardless of partitioning, worker count, or execution order (re-runs and
resumed runs agree; the reference's seeded ``np.random`` splits cannot make
that promise across partitionings). Rates are quantized to 1/65536.
``stratified_hash_sample`` applies a per-stratum rate (e.g. down-sample the
dominant class, keep the rare ones whole — the usual class-rebalancing move
before training).

md5 is computed by DuckDB's vectorized C kernel (one connection per actor,
the ``Fingerprinter`` pattern from stages/text.py) — no per-row Python
hashing — and matches an ANSI-SQL oracle
(``('0x' || substr(md5(key::VARCHAR),1,4))::INT``) bit for bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from modlyn_ray.util import pool_bounds


def rate_to_threshold(frac: float) -> int:
    """Quantize a sampling rate to the 16-bit integer threshold
    ``hash_sample`` compares against (rate = floor(frac * 65536) / 65536)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    return min(int(frac * 65536), 65536)


class _HashSampler:
    """Actor: one DuckDB connection, per-batch vectorized md5 + compare."""

    def __init__(self, key_col: str, thresholds: dict[str, str] | str, strata_col: str | None):
        import duckdb

        self.con = duckdb.connect()
        self.key_col = key_col
        self.strata_col = strata_col
        self.thresholds = thresholds

    def _bucket16(self, col: pa.Array) -> np.ndarray:
        """md5(key) -> first 16 bits as int32, via DuckDB's vectorized md5 +
        hex-cast kernels (matches the SQL oracle's expression verbatim).

        md5(NULL) is NULL; the SQL oracle's ``WHERE hash < thr`` drops those
        rows at any rate, so null keys map to sentinel 65536 here — above
        every admissible threshold (max 65536), never kept."""
        tbl = pa.table({"k": col.cast(pa.string())})  # noqa: F841 — duckdb scans it
        h = self.con.execute(
            "SELECT ('0x' || substr(md5(k), 1, 4))::INT AS h FROM tbl"
        ).arrow().column("h")
        return (
            h.combine_chunks()
            .cast(pa.int64())
            .fill_null(65536)
            .to_numpy(zero_copy_only=False)
        )

    def __call__(self, b: pa.Table) -> pa.Table:
        col = b[self.key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = self._bucket16(col)
        if self.strata_col is None:
            mask = h < self.thresholds
        else:
            s = b[self.strata_col]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            d = s.dictionary_encode()
            # null strata route to a sentinel slot with threshold 0 (dropped,
            # matching the oracle: fracs has no NULL stratum)
            idx = d.indices.fill_null(len(d.dictionary)).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            # threshold per DISTINCT stratum value only (absent -> keep none)
            thr = np.array(
                [self.thresholds.get(str(u), 0) for u in d.dictionary.to_pylist()]
                + [0],
                dtype=np.int64,
            )
            mask = h < thr[idx] if len(b) else np.zeros(0, dtype=bool)
        return b.filter(pa.array(mask)).replace_schema_metadata(None)


def hash_sample(
    ds: Dataset, key_col: str, frac: float, concurrency: int | None = None
) -> Dataset:
    """Keep ~``frac`` of rows, chosen deterministically by md5(key)."""
    return ds.map_batches(
        _HashSampler,
        fn_constructor_kwargs={
            "key_col": key_col,
            "thresholds": rate_to_threshold(frac),
            "strata_col": None,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or pool_bounds(4),
    )


def stratified_hash_sample(
    ds: Dataset,
    key_col: str,
    strata_col: str,
    fracs: dict[str, float],
    concurrency: int | None = None,
) -> Dataset:
    """Per-stratum deterministic sampling: row kept iff
    ``md5_bucket16(key) < rate_to_threshold(fracs[stratum])``. Strata absent
    from ``fracs`` are dropped entirely (rate 0)."""
    return ds.map_batches(
        _HashSampler,
        fn_constructor_kwargs={
            "key_col": key_col,
            "thresholds": {k: rate_to_threshold(v) for k, v in fracs.items()},
            "strata_col": strata_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or pool_bounds(4),
    )


class _HashSplitter(_HashSampler):
    """Actor: label every row with its deterministic split name.

    ``thresholds`` here is the CUMULATIVE 16-bit boundary list paired with
    ``names`` — a row with md5 bucket h gets the first split whose boundary
    exceeds h (SQL: the same CASE WHEN h < b1 ... chain). Rows beyond the
    last boundary (fractions summing < 1) and null keys get a NULL split."""

    def __init__(self, key_col: str, bounds: list[int], names: list[str]):
        super().__init__(key_col, 0, None)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.names = pa.array(list(names) + [None], pa.string())

    def __call__(self, b: pa.Table) -> pa.Table:
        col = b[self.key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = self._bucket16(col)  # null keys -> 65536, beyond every boundary
        idx = np.searchsorted(self.bounds, h, side="right")
        return b.append_column(
            "split", self.names.take(pa.array(idx))
        ).replace_schema_metadata(None)


def hash_split(
    ds: Dataset,
    key_col: str,
    fractions: dict[str, float],
    concurrency: int | None = None,
) -> Dataset:
    """Deterministic train/val/test carving: append a ``split`` column
    assigning each row by md5(key) to named fractions (quantized to
    1/65536, same scheme as ``hash_sample`` — partitioning- and
    resume-invariant, and all rows sharing a key land in the same split).
    Fractions summing below 1 leave the remainder with a NULL split
    (filter downstream); summing above 1 raises."""
    total = 0
    bounds, names = [], []
    for name, frac in fractions.items():
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in (0, 1], got {frac}")
        total += rate_to_threshold(frac)
        bounds.append(total)
        names.append(name)
    if total > 65536:
        raise ValueError(f"fractions sum above 1 (quantized {total}/65536)")
    return ds.map_batches(
        _HashSplitter,
        fn_constructor_kwargs={"key_col": key_col, "bounds": bounds, "names": names},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or pool_bounds(4),
    )
