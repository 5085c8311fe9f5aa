"""Distributed SQL-style ranking window functions.

Reference surface: the engine's K2 axis sorts cover global ordering
(`/root/reference/modlyn/eval/_jaccard.py:145-172` sorts heatmap axes);
this stage adds the per-group ranking family a feature pipeline needs
(ROW_NUMBER / RANK / DENSE_RANK OVER (PARTITION BY k ORDER BY ...)),
expressed Ray-Data-first: one crc32(key) bucket exchange
(`groupby("bucket").map_groups`), then a fully vectorized numpy kernel
per bucket — no per-row Python, no global sort.

Scale notes: the exchange is the same single bucket shuffle every other
keyed stage uses (shared partitioning key discipline); within a bucket
the kernel is O(n log n) lexsort + O(n) segment ops. Skewed keys route
to dedicated buckets via ``heavy`` exactly like windowize.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from modlyn_ray.stages.temporal import add_bucket_column


def rank_kernel(
    tbl: pa.Table,
    by: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
) -> pa.Table:
    """Append ``rn`` (ROW_NUMBER by ts,tie), ``rnk`` (RANK by value DESC)
    and ``drnk`` (DENSE_RANK by value DESC), each partitioned by ``by``.

    Pure segment ops: lexsort once per ordering, then first-occurrence
    run arithmetic — ties share a rank, dense ranks have no gaps,
    matching SQL window semantics bit-for-bit (oracle: q43).
    """
    n = len(tbl)
    if n == 0:
        out = tbl
        for c in ("rn", "rnk", "drnk"):
            out = out.append_column(c, pa.array([], pa.int64()))
        return out

    def col(name):
        c = tbl[name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c

    key = col(by)
    idx = key.indices if pa.types.is_dictionary(key.type) else key.dictionary_encode().indices
    # SQL PARTITION BY groups NULL keys together: all null rows share the
    # sentinel partition -1 (dictionary codes are >= 0, no collision).
    user = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    ts = col(ts_col).to_numpy(zero_copy_only=False)
    if ts.dtype.kind == "M":
        ts = ts.astype("datetime64[us]").view(np.int64).copy()
        # NaT views as INT64_MIN and would sort FIRST; DuckDB's default is
        # NULLS LAST for ASC — map null timestamps to the top of the order
        ts[ts == np.iinfo(np.int64).min] = np.iinfo(np.int64).max
    tie = col(tie_col).to_numpy(zero_copy_only=False).astype(np.int64)
    val = col(value_col).to_numpy(zero_copy_only=False).astype(np.float64)

    # ROW_NUMBER() OVER (PARTITION BY user ORDER BY ts, tie)
    o1 = np.lexsort((tie, ts, user))
    u1 = user[o1]
    seg_new = np.r_[True, u1[1:] != u1[:-1]]
    starts = np.flatnonzero(seg_new)
    seg_id = np.cumsum(seg_new) - 1
    rn = np.empty(n, np.int64)
    rn[o1] = np.arange(n) - starts[seg_id] + 1

    # RANK()/DENSE_RANK() OVER (PARTITION BY user ORDER BY value DESC)
    o2 = np.lexsort((-val, user))
    u2, v2 = user[o2], val[o2]
    seg_new2 = np.r_[True, u2[1:] != u2[:-1]]
    starts2 = np.flatnonzero(seg_new2)
    seg_id2 = np.cumsum(seg_new2) - 1
    pos = np.arange(n) - starts2[seg_id2]
    # NULL values are RANK peers (NaN != NaN would start a run per null);
    # they already sort last within the partition (NULLS LAST), matching
    # DuckDB's default DESC null ordering
    both_nan = np.isnan(v2[1:]) & np.isnan(v2[:-1])
    run_new = np.r_[True, ((v2[1:] != v2[:-1]) & ~both_nan) | seg_new2[1:]]
    run_id = np.cumsum(run_new) - 1
    first_pos_of_run = pos[np.flatnonzero(run_new)]
    rnk = np.empty(n, np.int64)
    rnk[o2] = first_pos_of_run[run_id] + 1
    drnk = np.empty(n, np.int64)
    drnk[o2] = run_id - run_id[starts2][seg_id2] + 1

    return (
        tbl.append_column("rn", pa.array(rn))
        .append_column("rnk", pa.array(rnk))
        .append_column("drnk", pa.array(drnk))
    )


def rank_windows(
    ds: Dataset,
    by: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
    n_buckets: int = 32,
    heavy: dict[str, int] | None = None,
) -> Dataset:
    """SQL ranking windows over a Dataset in ONE bucket-keyed shuffle."""

    def per_bucket(group: pa.Table) -> pa.Table:
        return rank_kernel(
            group.drop_columns(["bucket"]), by=by, ts_col=ts_col,
            tie_col=tie_col, value_col=value_col,
        )

    bds = add_bucket_column(ds, key=by, n_buckets=n_buckets, heavy=heavy)
    return bds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
