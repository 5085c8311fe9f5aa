"""Temporal operators: as-of join, lag/lead, backfill, sessionization.

The reference is strictly batch with no temporal semantics (SURVEY.md §2.9);
these operators implement the north rule's point-in-time layer over the
sequences table:

- ``asof_join``      — backward point-in-time merge on (doc_id, ingest_ts):
                       for each left row, the latest right row with
                       ``ts_r <= ts_l`` (SURVEY §2.4 J4 / §2.9 W1).
- ``windowize``      — lag/lead of chosen columns, source-boundary + gap
                       sessionization, and forward-fill (backfill) of sparse
                       columns, all within a doc_id's timeline ordered by
                       (ingest_ts, seq_no)  (W2-W4).
- ``detect_heavy_keys`` — sampled heavy-hitter detection so skewed doc_ids
                       get dedicated buckets instead of hot-spotting one
                       shuffle partition (SURVEY §4 skew row).

Execution model: ONE explicit shuffle keyed on a hash bucket of ``doc_id``
(`groupby("bucket").map_groups`), with per-bucket work fully vectorized —
numpy lexsort + boundary masks for windows, pandas ``merge_asof`` (C
sorted-merge) on slim key frames for the as-of join. Token list columns
never round-trip through pandas: group tables are reordered with
``pa.Table.take`` which preserves the Arrow buffers' values exactly
(byte-identity invariant, BASELINE.json:15).

Ordering/watermark contract (W5): input files are unordered; all window
semantics are defined by the explicit sort on (doc_id, ingest_ts, seq_no).
Late rows are just rows — recompute of the affected doc buckets yields the
same result (checkpoint granularity = bucket).

Zero temporal leakage (W6): every feature at (doc, t) is a function of rows
with ``ingest_ts <= t`` only; lag/backfill look strictly backward; ``lead``
columns are labeled future values for *training targets*, never features —
they are excluded from the leakage-ablation invariant by name prefix
``lead``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

DEFAULT_SESSION_GAP_US = 3_600_000_000  # 1 hour


# ---------------------------------------------------------------------------
# bucketing / skew
# ---------------------------------------------------------------------------
def _crc_bucket_of_uniques(uniques: list[str], n_buckets: int, heavy: dict[str, int]) -> np.ndarray:
    # int32: bucket ids are bounded by n_buckets + len(heavy), and the
    # column rides every exchange — half the payload of int64
    out = np.empty(len(uniques), dtype=np.int32)
    for i, u in enumerate(uniques):
        h = heavy.get(u)
        out[i] = h if h is not None else zlib.crc32(str(u).encode()) % n_buckets
    return out


def add_bucket_column(
    ds: Dataset, key: str = "doc_id", n_buckets: int = 64, heavy: dict[str, int] | None = None
) -> Dataset:
    """Append a deterministic ``bucket`` column = crc32(key) % n_buckets.

    crc32 is stable across processes (unlike Python's seeded str hash), so
    co-partitioning two datasets by calling this on both sides is safe.
    ``heavy`` maps known heavy keys to dedicated bucket ids >= n_buckets so a
    hot doc_id never shares a shuffle partition (skew-splitting). Keys are
    matched by their string rendering (the bucket kernel stringifies the
    per-batch dictionary), so int/str heavy maps both route correctly.
    """
    heavy = {str(k): v for k, v in (heavy or {}).items()}

    def bucketize(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = col.dictionary_encode()
        # null keys route to one deterministic bucket via a sentinel slot
        # appended to the per-batch dictionary (they never MATCH anything —
        # joins use side-specific null sentinels — but anti-join / as-of
        # left rows must still reach a bucket to be emitted)
        idx = dic.indices.fill_null(len(dic.dictionary)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        uniq = [str(x) for x in dic.dictionary.to_pylist()] + ["\x00__null__"]
        b = _crc_bucket_of_uniques(uniq, n_buckets, heavy)
        # metadata stripped: parquet-inherited pandas metadata makes
        # pa.Schema unhashable inside Ray's shuffle schema dedup (warning
        # spam on every reduce task)
        return batch.append_column("bucket", pa.array(b[idx])).replace_schema_metadata(None)

    return ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


def detect_heavy_keys(
    ds: Dataset,
    key: str = "doc_id",
    n_buckets: int = 64,
    threshold_frac: float = 0.02,
    sample: float = 0.05,
    seed: int = 7,
) -> dict[str, int]:
    """Sampled heavy-hitter detection → {heavy_key: dedicated_bucket_id}.

    A key holding more than ``threshold_frac`` of sampled rows gets its own
    bucket id starting at ``n_buckets``. Sampling keeps this O(sample) —
    never a full groupby over the input.
    """
    import pyarrow.compute as pc

    sampled = ds.select_columns([key]).random_sample(sample, seed=seed)

    def partial_counts(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # nulls are dropped: None vs str is unorderable under np.unique in
        # the driver fold, and a null key gets crc32("None") routing in
        # add_bucket_column anyway — never a dedicated heavy bucket
        vc = pc.value_counts(col.drop_null())
        return pa.table({"k": vc.field("values"), "n": vc.field("counts")})

    # distributed per-batch value_counts; the driver folds only the (small)
    # per-batch unique-key tables, vectorized with numpy — no per-key
    # Python loop (the old iter_batches + dict fold was a serial driver
    # stage worth ~0.5-1s of fixed cost per pipeline run)
    key_arrs, n_arrs = [], []
    for b in sampled.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        key_arrs.append(np.asarray(b["k"].to_pylist(), dtype=object))
        n_arrs.append(b["n"].to_numpy(zero_copy_only=False).astype(np.int64))
    if not key_arrs:
        return {}
    kcol = np.concatenate(key_arrs)
    ncol = np.concatenate(n_arrs)
    total = int(ncol.sum())
    if total == 0:
        return {}
    uniq, inv = np.unique(kcol, return_inverse=True)
    sums = np.bincount(inv, weights=ncol.astype(np.float64))
    heavy = uniq[sums / total >= threshold_frac]
    # stringified keys: the bucket kernel matches on the string rendering
    # of the per-batch dictionary, so int64 keys route correctly too
    return {str(k): n_buckets + i for i, k in enumerate(sorted(heavy))}


# ---------------------------------------------------------------------------
# windows: lag / lead / backfill / sessionize (one pass per bucket)
# ---------------------------------------------------------------------------
def _ts_int(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # a null timestamp would view as INT64_MIN and silently wrap the
        # gap / rolling-bound arithmetic downstream — fail loudly instead
        raise ValueError(
            "temporal: null timestamps are not orderable — drop or fill "
            "them upstream"
        )
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)


def _doc_codes(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    # SQL window semantics: NULL partition keys form ONE partition. Route
    # nulls to an explicit sentinel code (-1, disjoint from real codes >= 0)
    # instead of relying on the NaN -> INT64_MIN cast coincidence (which
    # also emitted a RuntimeWarning per bucket).
    return (
        d.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    )


def windowize(
    ds: Dataset,
    lag_cols: list[str] | None = None,
    lead_cols: list[str] | None = None,
    backfill_cols: list[str] | None = None,
    prefix_sum_cols: list[str] | None = None,
    rolling_cols: list[str] | None = None,
    rolling_window_us: int = DEFAULT_SESSION_GAP_US,
    lag_steps: int = 1,
    lead_steps: int = 1,
    sessionize: bool = True,
    session_gap_us: int = DEFAULT_SESSION_GAP_US,
    session_on_source_change: bool = True,
    by: str = "doc_id",
    ts_col: str = "ingest_ts",
    tie_col: str = "seq_no",
    n_buckets: int = 64,
    heavy: dict[str, int] | None = None,
) -> Dataset:
    """Per-doc windowed columns in ONE bucket-keyed shuffle.

    Sizing: one bucket is processed by one task holding the bucket in
    memory — choose ``n_buckets`` so input_bytes / n_buckets stays well
    under a worker's heap (e.g. ~1-2 GB/bucket: 100 TB -> ~64k buckets on
    a 256-node cluster). Heavy doc_ids get dedicated buckets via
    ``heavy``; a single doc must fit one task (docs are never split —
    split at session boundaries upstream if a doc exceeds worker memory).

    Adds, per input row (output rows = input rows, time-sorted within doc):
      - ``lag1_<c>`` / ``lead1_<c>`` for each requested column (null at
        doc/window edges)
      - ``<c>_ffill`` forward-filled from past rows within the doc (W3 —
        backfill of *past* observations only, never leads)
      - ``cum_<c>`` inclusive prefix sum within the doc timeline — the
        zero-leakage point-in-time accumulator (W6: value at t depends only
        on rows with ingest_ts <= t)
      - ``roll_sum_<c>`` / ``roll_cnt_<c>`` trailing time-range aggregates
        over rows with ``ts in [t - rolling_window_us, t]`` within the doc
        (SQL RANGE ... PRECEDING semantics incl. equal-ts peers)
      - ``session_id`` (int64) — increments at doc start, at a time gap >
        ``session_gap_us``, and (optionally) whenever ``source`` changes (W4)
    """
    lag_cols = lag_cols or []
    lead_cols = lead_cols or []
    backfill_cols = backfill_cols or []
    prefix_sum_cols = prefix_sum_cols or []
    rolling_cols = rolling_cols or []

    from modlyn_ray.util import dict_decode_batch, dict_encode_batch

    # string key/group columns ride the shuffle as per-block dictionary
    # arrays (slim payload; Arrow unifies dictionaries on concat) and are
    # decoded back to plain strings inside the per-bucket kernel
    slim_cols = (by, "source") if session_on_source_change else (by,)

    def per_bucket(group: pa.Table) -> pa.Table:
        group = dict_decode_batch(group, slim_cols)
        return window_kernel(
            group,
            lag_cols=lag_cols,
            lead_cols=lead_cols,
            backfill_cols=backfill_cols,
            prefix_sum_cols=prefix_sum_cols,
            rolling_cols=rolling_cols,
            rolling_window_us=rolling_window_us,
            lag_steps=lag_steps,
            lead_steps=lead_steps,
            sessionize=sessionize,
            session_gap_us=session_gap_us,
            session_on_source_change=session_on_source_change,
            by=by,
            ts_col=ts_col,
            tie_col=tie_col,
        )

    slim = ds.map_batches(
        lambda b: dict_encode_batch(b, slim_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bds = add_bucket_column(slim, key=by, n_buckets=n_buckets, heavy=heavy)
    res = bds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    return res.drop_columns(["bucket"])


def window_kernel(
    group: pa.Table,
    *,
    lag_cols: list[str],
    lead_cols: list[str],
    backfill_cols: list[str],
    prefix_sum_cols: list[str],
    sessionize: bool,
    session_gap_us: int,
    session_on_source_change: bool,
    by: str,
    ts_col: str,
    tie_col: str,
    rolling_cols: list[str] | None = None,
    rolling_window_us: int = DEFAULT_SESSION_GAP_US,
    lag_steps: int = 1,
    lead_steps: int = 1,
) -> pa.Table:
    """Vectorized per-bucket window pass (assumes all rows of a doc are
    co-located in ``group``; sorts internally)."""
    n = len(group)
    if n == 0:
        # emit the SAME schema as the non-empty path: a 0-row bucket (e.g.
        # an attr-only bucket in the fused PIT merge) must not produce a
        # block missing the window columns — schema unification fails
        out = group
        for c in lag_cols:
            for k in range(1, (lag_steps or 1) + 1):
                out = out.append_column(f"lag{k}_{c}", pa.nulls(0, group.schema.field(c).type))
        for c in lead_cols:
            for k in range(1, (lead_steps or 1) + 1):
                out = out.append_column(f"lead{k}_{c}", pa.nulls(0, group.schema.field(c).type))
        if sessionize:
            out = out.append_column("session_id", pa.nulls(0, pa.int64()))
        for c in prefix_sum_cols:
            out = out.append_column(f"cum_{c}", pa.nulls(0, pa.float64()))
        if rolling_cols:
            for c in rolling_cols:
                out = out.append_column(f"roll_sum_{c}", pa.nulls(0, pa.float64()))
                out = out.append_column(f"roll_cnt_{c}", pa.nulls(0, pa.int64()))
        for c in backfill_cols:
            out = out.append_column(f"{c}_ffill", pa.nulls(0, group.schema.field(c).type))
        return out
    docs = _doc_codes(group[by])
    ts = _ts_int(group[ts_col])
    tie = (
        group[tie_col].combine_chunks().to_numpy(zero_copy_only=False)
        if tie_col in group.column_names
        else np.arange(n)
    )
    order = np.lexsort((tie, ts, docs))
    group = group.take(pa.array(order))
    docs, ts = docs[order], ts[order]
    new_doc = np.r_[True, docs[1:] != docs[:-1]]

    out = group
    import pyarrow.compute as pc

    arange = np.arange(n, dtype=np.int64)
    doc_start_idx = np.where(new_doc, arange, 0)
    np.maximum.accumulate(doc_start_idx, out=doc_start_idx)
    pos = arange - doc_start_idx  # row position within its doc
    starts_ = np.flatnonzero(new_doc)
    ends_ = np.r_[starts_[1:], n]
    doc_ord_ = np.cumsum(new_doc) - 1
    pos_from_end = (ends_[doc_ord_] - 1) - arange

    for c in lag_cols:
        col = out[c].combine_chunks() if isinstance(out[c], pa.ChunkedArray) else out[c]
        for k in range(1, (lag_steps or 1) + 1):
            idx = np.maximum(arange - k, 0)
            shifted = col.take(pa.array(idx))
            valid = pa.array(pos >= k)
            out = out.append_column(
                f"lag{k}_{c}", pc.if_else(valid, shifted, pa.scalar(None, col.type))
            )
    for c in lead_cols:
        col = out[c].combine_chunks() if isinstance(out[c], pa.ChunkedArray) else out[c]
        for k in range(1, (lead_steps or 1) + 1):
            idx = np.minimum(arange + k, n - 1)
            shifted = col.take(pa.array(idx))
            valid = pa.array(pos_from_end >= k)
            out = out.append_column(
                f"lead{k}_{c}", pc.if_else(valid, shifted, pa.scalar(None, col.type))
            )

    if sessionize:
        gap = np.r_[False, (ts[1:] - ts[:-1]) > session_gap_us]
        brk = new_doc | gap
        if session_on_source_change and "source" in out.column_names:
            src = _doc_codes(out["source"])
            brk = brk | (np.r_[False, src[1:] != src[:-1]] & ~new_doc)
        # session_id = session index WITHIN the doc (0-based), so it is
        # globally meaningful regardless of bucket assignment
        g = np.cumsum(brk).astype(np.int64)
        start_val = np.zeros(n, dtype=np.int64)
        start_val[new_doc] = g[new_doc]
        np.maximum.accumulate(start_val, out=start_val)
        out = out.append_column("session_id", pa.array(g - start_val))

    for c in prefix_sum_cols:
        col = out[c].combine_chunks() if isinstance(out[c], pa.ChunkedArray) else out[c]
        v = np.nan_to_num(col.to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
        g = np.cumsum(v)
        starts = np.flatnonzero(new_doc)
        start_offset = np.where(starts > 0, g[np.maximum(starts - 1, 0)], 0.0)
        doc_ord = np.cumsum(new_doc) - 1  # doc index per row within bucket
        out = out.append_column(f"cum_{c}", pa.array(g - start_offset[doc_ord]))

    if rolling_cols:
        # vectorized window bounds via the same composite (doc_ord, ts_rank)
        # int64 trick as range_join_kernel: rank every ts that can appear as
        # a value or a lower bound in one shared ordering, then TWO global
        # searchsorted calls resolve all per-row [t - W, t] bounds — no
        # per-doc Python loop (which dominated buckets holding many small
        # docs). comp is globally sorted because rows are (doc, ts)-sorted.
        doc_ord = np.cumsum(new_doc) - 1
        lo_t = ts - rolling_window_us
        uniq_ts = np.unique(np.concatenate([ts, lo_t]))
        m = np.int64(len(uniq_ts) + 1)
        comp = doc_ord * m + np.searchsorted(uniq_ts, ts)
        lo = np.searchsorted(comp, doc_ord * m + np.searchsorted(uniq_ts, lo_t), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        roll_cnt_col = pa.array((hi - lo).astype(np.int64))
        for c in rolling_cols:
            col = out[c].combine_chunks() if isinstance(out[c], pa.ChunkedArray) else out[c]
            v = np.nan_to_num(col.to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
            pad = np.zeros(n + 1)
            np.cumsum(v, out=pad[1:])
            out = out.append_column(f"roll_sum_{c}", pa.array(pad[hi] - pad[lo]))
            out = out.append_column(f"roll_cnt_{c}", roll_cnt_col)

    for c in backfill_cols:
        col = out[c].combine_chunks() if isinstance(out[c], pa.ChunkedArray) else out[c]
        valid = ~np.asarray(col.is_null())
        idx = np.where(valid, np.arange(n), -1)
        np.maximum.accumulate(idx, out=idx)
        # reset carry at doc boundaries: last valid index must be >= doc start
        doc_start = np.zeros(n, dtype=np.int64)
        doc_start[new_doc] = np.flatnonzero(new_doc)
        np.maximum.accumulate(doc_start, out=doc_start)
        take = np.where(idx >= doc_start, idx, -1)
        filled = col.take(pa.array(np.where(take >= 0, take, 0)))
        mask = pa.array(take >= 0)
        import pyarrow.compute as pc

        out = out.append_column(f"{c}_ffill", pc.if_else(mask, filled, pa.scalar(None, col.type)))
    return out


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------
def _arrow_schema(ds: Dataset) -> pa.Schema:
    # pandas-backed blocks report a PandasBlockSchema whose .types are
    # numpy dtypes (pa.field would reject them); probe through an
    # arrow-converting no-op to get the real Arrow schema
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return (
        ds.map_batches(lambda b: b, batch_format="pyarrow")
        .schema()
        .base_schema
    )


def asof_join(
    left: Dataset,
    right: Dataset,
    value_cols: list[str],
    by: str = "doc_id",
    ts_col: str = "ingest_ts",
    suffix: str = "_asof",
    n_buckets: int = 64,
    heavy: dict[str, int] | None = None,
    strict: bool = False,
) -> Dataset:
    """Backward as-of join: latest right row with ``ts_r <= ts_l`` per key.

    Both sides are co-partitioned by crc32(doc_id) % n_buckets (ONE shuffle
    total: union → groupby(bucket)), then merged per bucket with pandas
    ``merge_asof`` (C sorted-merge) over slim (key, ts, row-index) frames —
    payload columns (incl. the token lists) never enter pandas; the output
    left rows keep their exact Arrow buffers. ``strict=True`` uses
    ``ts_r < ts_l`` (exclusive) for pipelines where same-instant attributes
    must not be visible. Right-side timestamp ties are broken by the
    greatest value tuple (deterministic).

    Left rows with no admissible right row get nulls. Output schema =
    left columns + ``f"{c}{suffix}"`` for each value column, plus
    ``f"matched{suffix}_ts"`` (the matched right timestamp — lets callers
    and tests assert the anti-leak invariant ``matched_ts <= ingest_ts``).
    """
    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    lcols = list(l_schema.names)
    clash = set(value_cols) & set(lcols)
    if clash:
        # a colliding name would duplicate a column on the padded left side
        # and collapse on the right — fail up front like hash_equi_join
        raise ValueError(
            f"asof_join: value_cols clash with left schema: {sorted(clash)} "
            "— rename upstream with a map_batches projection"
        )
    vtypes = {c: r_schema.field(c).type for c in value_cols}
    union_cols = lcols + value_cols  # value cols are null on the left side

    from modlyn_ray.util import dict_decode_batch, dict_encode_batch

    # the join key rides the shuffle dictionary-encoded (slim payload, no
    # global dict — Arrow unifies per-block dictionaries on concat) and is
    # decoded back inside the merge kernel
    key_is_string = pa.types.is_string(l_schema.field(by).type)
    slim_cols = (by,) if key_is_string else ()

    def pad_left(b: pa.Table) -> pa.Table:
        b = dict_encode_batch(b, slim_cols)
        for c in value_cols:
            b = b.append_column(c, pa.nulls(len(b), vtypes[c]))
        return b.append_column("__side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_right(b: pa.Table) -> pa.Table:
        b = dict_encode_batch(b, slim_cols)
        n = len(b)
        arrays = []
        for c in lcols:
            if c == by:
                arrays.append(b[c])
            elif c == ts_col:
                arrays.append(b[c])
            else:
                arrays.append(pa.nulls(n, l_schema.field(c).type))
        for c in value_cols:
            arrays.append(b[c])
        t = pa.table(dict(zip(union_cols, arrays)))
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    l_aug = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r_aug = right.select_columns([by, ts_col, *value_cols]).map_batches(
        pad_right, batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(l_aug.union(r_aug), key=by, n_buckets=n_buckets, heavy=heavy)

    def merge(group: pa.Table) -> pa.Table:
        group = dict_decode_batch(group, slim_cols)
        side = group["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        ltbl = group.filter(lmask).drop_columns(["__side", "bucket"] + value_cols)
        rtbl = group.filter(pa.array(side == 1))
        return asof_kernel(
            ltbl, rtbl, by=by, ts_col=ts_col, value_cols=value_cols,
            vtypes=vtypes, suffix=suffix, strict=strict,
        )

    res = both.groupby("bucket").map_groups(merge, batch_format="pyarrow")
    return res


def asof_kernel(
    ltbl: pa.Table,
    rtbl: pa.Table,
    *,
    by: str,
    ts_col: str,
    value_cols: list[str],
    vtypes: dict,
    suffix: str,
    strict: bool,
) -> pa.Table:
    """Per-bucket backward as-of merge: slim key frames through pandas
    merge_asof; payload (incl. token lists) stays in Arrow."""
    nl, nr = len(ltbl), len(rtbl)
    if nl == 0:
        return _empty_asof_schema(ltbl, value_cols, vtypes, ts_col, suffix)
    if nr == 0:
        out = ltbl
        for c in value_cols:
            out = out.append_column(f"{c}{suffix}", pa.nulls(nl, vtypes[c]))
        return out.append_column(f"matched{suffix}_ts", pa.nulls(nl, pa.timestamp("us")))
    # joint dictionary-encode the key so merge_asof matches on int64 codes
    # instead of python-object strings (object-dtype 'by' keys dominate the
    # per-bucket merge cost at scale)
    l_key = ltbl[by].combine_chunks() if isinstance(ltbl[by], pa.ChunkedArray) else ltbl[by]
    r_key = rtbl[by].combine_chunks() if isinstance(rtbl[by], pa.ChunkedArray) else rtbl[by]
    # NULL keys match nothing (SQL equality): the shared side-specific
    # sentinel contract lives in util.joint_codes — null left rows get
    # null attr values.
    from modlyn_ray.util import joint_codes

    lcodes, rcodes = joint_codes(l_key, r_key)
    lf = pd.DataFrame(
        {
            "doc": lcodes,
            "ts": _ts_int(ltbl[ts_col]),
            "idx": np.arange(nl, dtype=np.int64),
        }
    ).sort_values("ts", kind="stable")
    rts = _ts_int(rtbl[ts_col])
    # Tie-break among equal right timestamps: greatest value tuple wins
    # (merge_asof picks the LAST row in frame order). Only orderable
    # (non-nested) value columns participate in the sort — token lists
    # ride along via the Arrow take below and never enter pandas — and
    # nulls sort FIRST so a real value always beats a NULL at a tied
    # timestamp (matching SQL max(), which ignores nulls).
    sortable = [c for c in value_cols if not pa.types.is_nested(vtypes[c])]
    rdata = {
        "doc": rcodes,
        "ts": rts,
        "ridx": np.arange(nr, dtype=np.int64),
    }
    for c in sortable:
        rdata[c] = rtbl[c].combine_chunks().to_pandas()
    rf = pd.DataFrame(rdata).sort_values(
        ["ts", *sortable], kind="stable", na_position="first"
    )
    merged = pd.merge_asof(
        lf,
        rf[["doc", "ts", "ridx"]],
        on="ts",
        by="doc",
        direction="backward",
        allow_exact_matches=not strict,
    )
    back = np.argsort(merged["idx"].to_numpy(), kind="stable")
    # unmatched rows surface as NaN in the float64 ridx round-trip; row
    # positions are far below 2^53, so matched indices stay exact — the
    # value payload itself is gathered in Arrow (null indices -> null
    # output), so int64/list/decimal values never lose precision or type
    ridx = merged["ridx"].to_numpy()[back]
    matched = ~np.isnan(ridx)
    take = pa.array(
        np.where(matched, ridx, 0).astype(np.int64), mask=~matched
    )
    out = ltbl
    for c in value_cols:
        col = rtbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        taken = col.take(take)
        if taken.type != vtypes[c]:  # e.g. exchange-dict-encoded payloads
            taken = taken.cast(vtypes[c])
        out = out.append_column(f"{c}{suffix}", taken)
    mcol = rtbl[ts_col]
    if isinstance(mcol, pa.ChunkedArray):
        mcol = mcol.combine_chunks()
    return out.append_column(
        f"matched{suffix}_ts", mcol.cast(pa.timestamp("us")).take(take)
    )


def _empty_asof_schema(ltbl: pa.Table, value_cols, vtypes, ts_col, suffix) -> pa.Table:
    out = ltbl
    for c in value_cols:
        out = out.append_column(f"{c}{suffix}", pa.nulls(0, vtypes[c]))
    return out.append_column(f"matched{suffix}_ts", pa.nulls(0, pa.timestamp("us")))


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------
def range_join(
    left: Dataset,
    right: Dataset,
    value_cols: list[str],
    by: str = "doc_id",
    ts_col: str = "ingest_ts",
    lo_offset_us: int = -DEFAULT_SESSION_GAP_US,
    hi_offset_us: int = 0,
    suffix: str = "_rng",
    n_buckets: int = 64,
    heavy: dict[str, int] | None = None,
) -> Dataset:
    """Bounded time-range join (inner): for each left row, EVERY right row of
    the same key with ``ts_l + lo_offset_us <= ts_r <= ts_l + hi_offset_us``
    (default: the trailing window ``[ts_l - 1h, ts_l]``). One left row can
    emit many output rows — the windowed generalization of the as-of join
    (which keeps only the latest admissible right row).

    Same execution shape as ``asof_join``: both sides co-partitioned by
    crc32(key) % n_buckets via a side-tagged union (ONE shuffle), per-bucket
    kernel fully vectorized — right side sorted once by (key, ts), per-left
    interval bounds resolved with TWO global ``np.searchsorted`` calls over a
    composite (key_code, ts_rank) int64 key (no per-key Python loop), pair
    expansion via ``np.repeat`` index arithmetic.

    Output = left columns + ``f"{c}{suffix}"`` per value column +
    ``f"matched{suffix}_ts"`` (the matched right timestamp). Left rows with
    no admissible right row are dropped (inner semantics — wrap with a
    left-anti pass if outer semantics are needed).

    Scale note: output cardinality is sum over left rows of their window
    occupancy — bound ``hi - lo`` (or pre-aggregate with
    ``windowize(rolling_cols=...)`` when only windowed SUM/COUNT of a
    co-keyed stream is needed) so a hot key cannot emit O(n^2) pairs.
    """
    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    lcols = list(l_schema.names)
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"range_join: value_cols clash with left schema: {sorted(clash)} "
            "— rename upstream with a map_batches projection"
        )
    vtypes = {c: r_schema.field(c).type for c in value_cols}
    union_cols = lcols + value_cols

    from modlyn_ray.util import dict_decode_batch, dict_encode_batch

    key_is_string = pa.types.is_string(l_schema.field(by).type)
    slim_cols = (by,) if key_is_string else ()

    def pad_left(b: pa.Table) -> pa.Table:
        b = dict_encode_batch(b, slim_cols)
        for c in value_cols:
            b = b.append_column(c, pa.nulls(len(b), vtypes[c]))
        return b.append_column("__side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_right(b: pa.Table) -> pa.Table:
        b = dict_encode_batch(b, slim_cols)
        n = len(b)
        arrays = []
        for c in lcols:
            if c in (by, ts_col):
                arrays.append(b[c])
            else:
                arrays.append(pa.nulls(n, l_schema.field(c).type))
        for c in value_cols:
            arrays.append(b[c])
        t = pa.table(dict(zip(union_cols, arrays)))
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    l_aug = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r_aug = right.select_columns([by, ts_col, *value_cols]).map_batches(
        pad_right, batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(l_aug.union(r_aug), key=by, n_buckets=n_buckets, heavy=heavy)

    def merge(group: pa.Table) -> pa.Table:
        group = dict_decode_batch(group, slim_cols)
        side = group["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        ltbl = group.filter(pa.array(side == 0)).drop_columns(["__side", "bucket"] + value_cols)
        rtbl = group.filter(pa.array(side == 1))
        return range_join_kernel(
            ltbl, rtbl, by=by, ts_col=ts_col, value_cols=value_cols,
            vtypes=vtypes, suffix=suffix,
            lo_offset_us=lo_offset_us, hi_offset_us=hi_offset_us,
        )

    return both.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def range_join_kernel(
    ltbl: pa.Table,
    rtbl: pa.Table,
    *,
    by: str,
    ts_col: str,
    value_cols: list[str],
    vtypes: dict,
    suffix: str,
    lo_offset_us: int,
    hi_offset_us: int,
) -> pa.Table:
    """Per-bucket vectorized interval-pair expansion (inner join)."""
    nl, nr = len(ltbl), len(rtbl)
    if nl == 0 or nr == 0:
        out = ltbl.slice(0, 0)
        for c in value_cols:
            out = out.append_column(f"{c}{suffix}", pa.nulls(0, vtypes[c]))
        return out.append_column(f"matched{suffix}_ts", pa.nulls(0, pa.timestamp("us")))
    l_key = ltbl[by].combine_chunks() if isinstance(ltbl[by], pa.ChunkedArray) else ltbl[by]
    r_key = rtbl[by].combine_chunks() if isinstance(rtbl[by], pa.ChunkedArray) else rtbl[by]
    # NULL keys match nothing (SQL equality): shared sentinel contract in
    # util.joint_codes; composite-key arithmetic below stays sound — code c
    # occupies the disjoint range [c*m, c*m + m - 1] even for c in {-1, -2}.
    from modlyn_ray.util import joint_codes

    lcodes, rcodes = joint_codes(l_key, r_key)
    lts = _ts_int(ltbl[ts_col])
    rts = _ts_int(rtbl[ts_col])
    order = np.lexsort((rts, rcodes))
    rcodes_s, rts_s = rcodes[order], rts[order]
    lo_b = lts + np.int64(lo_offset_us)
    hi_b = lts + np.int64(hi_offset_us)
    # composite (key_code, ts_rank) int64 keys: rank every timestamp that
    # can appear as a bound or a right ts in ONE shared ordering, so a
    # single global searchsorted resolves per-left segment bounds without a
    # per-key loop
    uniq_ts = np.unique(np.concatenate([rts_s, lo_b, hi_b]))
    m = np.int64(len(uniq_ts) + 1)
    comp_r = rcodes_s * m + np.searchsorted(uniq_ts, rts_s)
    start = np.searchsorted(comp_r, lcodes * m + np.searchsorted(uniq_ts, lo_b), side="left")
    end = np.searchsorted(comp_r, lcodes * m + np.searchsorted(uniq_ts, hi_b), side="right")
    counts = end - start
    total = int(counts.sum())
    if total == 0:
        out = ltbl.slice(0, 0)
        for c in value_cols:
            out = out.append_column(f"{c}{suffix}", pa.nulls(0, vtypes[c]))
        return out.append_column(f"matched{suffix}_ts", pa.nulls(0, pa.timestamp("us")))
    left_rep = np.repeat(np.arange(nl, dtype=np.int64), counts)
    csum = np.cumsum(counts) - counts
    ridx = np.arange(total, dtype=np.int64) - np.repeat(csum, counts) + np.repeat(start, counts)
    out = ltbl.take(pa.array(left_rep))
    take_r = pa.array(order[ridx])
    for c in value_cols:
        col = rtbl[c].combine_chunks() if isinstance(rtbl[c], pa.ChunkedArray) else rtbl[c]
        out = out.append_column(f"{c}{suffix}", col.take(take_r))
    mts = pa.array(rts_s[ridx], type=pa.timestamp("us"))
    return out.append_column(f"matched{suffix}_ts", mts)


def resample_gap_fill(
    ds: Dataset,
    ts_col: str,
    value_col: str | None = None,
    unit: str = "hour",
) -> "pd.DataFrame":
    """Fixed-frequency resample WITH gap filling: count (and optionally
    sum(value_col)) per truncated time bucket, then every missing bucket in
    [min, max] emitted with 0 — the ``generate_series + LEFT JOIN`` SQL
    shape a feature-store backfill needs (a missing hour must be an explicit
    zero row, not an absent one, or downstream lag/rolling features silently
    skip it).

    The heavy part is fully distributed (per-batch ``floor_temporal`` +
    partial counts, one tiny groupby over distinct buckets); the grid fill
    runs on the AGGREGATED result, whose size is bounded by the time span
    (e.g. a decade of hours is ~88k rows) — independent of input row count,
    so driver-side fill is the correct shape at 100 TB.
    """
    step = {"hour": "h", "day": "D", "minute": "min"}[unit]

    def partial(b: pa.Table) -> pa.Table:
        cols = {"bucket_ts": pc.floor_temporal(b[ts_col], unit=unit)}
        if value_col is not None:
            cols["__v"] = b[value_col]
        t = pa.table(cols)
        df = t.to_pandas()
        g = df.groupby("bucket_ts", as_index=False, sort=False)
        out = g.size().rename(columns={"size": "n"})
        if value_col is not None:
            out = out.merge(
                g["__v"].sum().rename(columns={"__v": "sum_value"}), on="bucket_ts"
            )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    aggs = [Sum("n", alias_name="n")]
    if value_col is not None:
        aggs.append(Sum("sum_value", alias_name="sum_value"))
    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket_ts")
        .aggregate(*aggs)
        .to_pandas()
    )
    if agg.empty:
        return agg
    grid = pd.DataFrame(
        {
            "bucket_ts": pd.date_range(
                agg["bucket_ts"].min(), agg["bucket_ts"].max(), freq=step
            )
        }
    )
    out = grid.merge(agg, on="bucket_ts", how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    if value_col is not None:
        out["sum_value"] = out["sum_value"].fillna(0.0)
    return out.sort_values("bucket_ts", ignore_index=True)
