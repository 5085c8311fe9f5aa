"""General distributed equi-joins: bucketed hash inner / semi / anti join,
plus a broadcast key-filter for small right sides.

The reference delegates joins to pandas ``merge`` / AnnData alignment inside
one process (SURVEY.md §2 J1-J3); here each join is ONE crc32(key)-bucketed
exchange — the same co-partitioning contract as the temporal stages
(stages/temporal.py add_bucket_column), so a pipeline can reuse one
partitioning across a join followed by windowed/as-of stages.

Execution shape (hash_equi_join):
- both sides ride a side-tagged union through a single shuffle: the left
  carries its full row, the right only ``[right_on] + right_cols`` with the
  remaining left columns null-padded (schemas must match for union);
- per bucket, the kernel dictionary-encodes the two key columns JOINTLY
  (one dict; left rows get code c, right rows the same c iff equal), sorts
  the right side by code once, then resolves each left row's match segment
  with two global ``np.searchsorted`` calls and expands pairs with
  ``np.repeat`` index arithmetic — no per-key loop, no pandas hash table;
- semi/anti skip the expansion entirely: a ``np.isin`` membership mask over
  the joint codes filters the left rows in place.

Scale notes: inner-join output is sum over left rows of their key's right
multiplicity — pre-aggregate the right side when only aggregates of the
match set are needed. Known-hot keys go to dedicated buckets via ``heavy``
(same skew contract as the temporal exchange). For a right side small
enough to broadcast (dimension tables), ``broadcast_semi_join`` ships the
key set once via ``ray.put`` and needs NO shuffle at all (the pattern q03
uses for its dense int lookup join, pipelines/queries.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from modlyn_ray.stages.temporal import add_bucket_column
from modlyn_ray.util import dict_decode_batch, dict_encode_batch


def _arrow_schema(ds: Dataset) -> pa.Schema:
    # pandas-backed blocks report a PandasBlockSchema whose .types are
    # numpy dtypes; probe through an arrow-converting no-op (same one-block
    # cost as schema() itself) to get the real Arrow schema
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return (
        ds.map_batches(lambda b: b, batch_format="pyarrow")
        .schema()
        .base_schema
    )


def _combined(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# the NULL-sentinel key-encoding contract lives in util.joint_codes (shared
# with temporal.asof_kernel / range_join_kernel)
from modlyn_ray.util import joint_codes as _joint_codes  # noqa: E402


def hash_equi_join(
    left: Dataset,
    right: Dataset,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    how: str = "inner",
    n_buckets: int = 64,
    heavy: dict[str, int] | None = None,
) -> Dataset:
    """Distributed equi-join in ONE bucket-keyed exchange.

    ``how``: "inner" (left columns + ``right_cols`` per matching right row,
    one output row per match pair), "left" (same, plus unmatched left rows
    once with null ``right_cols`` — SQL LEFT OUTER), "semi" (left rows with
    >=1 match, left columns only), or "anti" (left rows with NO match, left
    columns only).

    ``right_cols`` must be disjoint from the left schema (rename upstream
    with a ``map_batches`` projection if needed); ignored for semi/anti.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")
    l_schema = _arrow_schema(left)
    lcols = list(l_schema.names)
    if how in ("semi", "anti"):
        right_cols = []
    clash = set(right_cols) & set(lcols)
    if clash:
        raise ValueError(f"right_cols clash with left schema: {sorted(clash)}")
    r_schema = _arrow_schema(right)
    vtypes = {c: r_schema.field(c).type for c in right_cols}
    union_cols = lcols + right_cols
    key_is_string = pa.types.is_string(l_schema.field(left_on).type)
    slim_l = (left_on,) if key_is_string else ()

    def pad_left(b: pa.Table) -> pa.Table:
        b = dict_encode_batch(b, slim_l)
        for c in right_cols:
            b = b.append_column(c, pa.nulls(len(b), vtypes[c]))
        return b.append_column(
            "__side", pa.array(np.zeros(len(b), dtype=np.int8))
        ).replace_schema_metadata(None)

    def pad_right(b: pa.Table) -> pa.Table:
        n = len(b)
        arrays = []
        for c in lcols:
            if c == left_on:
                arrays.append(_combined(b[right_on]))
            else:
                arrays.append(pa.nulls(n, l_schema.field(c).type))
        for c in right_cols:
            arrays.append(b[c])
        t = dict_encode_batch(pa.table(dict(zip(union_cols, arrays))), slim_l)
        return t.append_column(
            "__side", pa.array(np.ones(n, dtype=np.int8))
        ).replace_schema_metadata(None)

    l_aug = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r_aug = right.select_columns([right_on, *right_cols]).map_batches(
        pad_right, batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(
        l_aug.union(r_aug), key=left_on, n_buckets=n_buckets, heavy=heavy
    )

    def merge(group: pa.Table) -> pa.Table:
        group = dict_decode_batch(group, slim_l)
        side = _combined(group["__side"]).to_numpy(zero_copy_only=False)
        ltbl = group.filter(pa.array(side == 0)).drop_columns(
            ["__side", "bucket"] + right_cols
        )
        rtbl = group.filter(pa.array(side == 1))
        if how in ("inner", "left"):
            return _inner_kernel(
                ltbl, rtbl, left_on=left_on, right_cols=right_cols,
                vtypes=vtypes, outer=(how == "left"),
            )
        return _membership_kernel(ltbl, rtbl, left_on=left_on, anti=(how == "anti"))

    return both.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def _membership_kernel(ltbl: pa.Table, rtbl: pa.Table, *, left_on: str, anti: bool) -> pa.Table:
    nl, nr = len(ltbl), len(rtbl)
    if nl == 0:
        return ltbl
    if nr == 0:
        return ltbl if anti else ltbl.slice(0, 0)
    lcodes, rcodes = _joint_codes(_combined(ltbl[left_on]), _combined(rtbl[left_on]))
    mask = np.isin(lcodes, rcodes)
    return ltbl.filter(pa.array(~mask if anti else mask))


def _inner_kernel(
    ltbl: pa.Table,
    rtbl: pa.Table,
    *,
    left_on: str,
    right_cols: list[str],
    vtypes: dict,
    outer: bool = False,
) -> pa.Table:
    """``outer=True`` = LEFT OUTER: unmatched left rows are appended once
    with null right columns (row order within a bucket is not part of the
    join contract)."""

    def _with_null_cols(t: pa.Table) -> pa.Table:
        for c in right_cols:
            t = t.append_column(c, pa.nulls(len(t), vtypes[c]))
        return t

    nl, nr = len(ltbl), len(rtbl)
    if nl == 0 or (nr == 0 and not outer):
        return _with_null_cols(ltbl.slice(0, 0))
    if nr == 0:
        return _with_null_cols(ltbl)
    lcodes, rcodes = _joint_codes(_combined(ltbl[left_on]), _combined(rtbl[left_on]))
    order = np.argsort(rcodes, kind="stable")
    rcodes_s = rcodes[order]
    start = np.searchsorted(rcodes_s, lcodes, side="left")
    end = np.searchsorted(rcodes_s, lcodes, side="right")
    counts = end - start
    total = int(counts.sum())
    if total == 0:
        return _with_null_cols(ltbl if outer else ltbl.slice(0, 0))
    left_rep = np.repeat(np.arange(nl, dtype=np.int64), counts)
    csum = np.cumsum(counts) - counts
    ridx = np.arange(total, dtype=np.int64) - np.repeat(csum, counts) + np.repeat(
        start, counts
    )
    out = ltbl.take(pa.array(left_rep))
    take_r = pa.array(order[ridx])
    for c in right_cols:
        out = out.append_column(c, _combined(rtbl[c]).take(take_r))
    if outer and (counts == 0).any():
        unmatched = _with_null_cols(ltbl.filter(pa.array(counts == 0)))
        out = pa.concat_tables([out, unmatched])
    return out


def distinct_set_op(
    left: Dataset,
    right: Dataset,
    left_on: str,
    right_on: str,
    op: str = "intersect",
    n_buckets: int = 64,
) -> Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` over one key column — DISTINCT set
    semantics, one bucket-keyed exchange (U1 "set intersection across
    frames" at dataset scale; the reference does this driver-side over
    top-k index sets, /root/reference/modlyn/eval/_jaccard.py).

    Each side is pre-deduped per batch, ships ONLY its key column through
    the same crc32 bucket exchange as ``hash_equi_join`` (equal keys land
    in one bucket, so global distinct = per-bucket distinct), and the
    kernel emits each qualifying key exactly once. Unlike joins, SQL set
    ops compare rows with IS-NOT-DISTINCT-FROM semantics: NULL *does*
    equal NULL here, so both sides' nulls share one joint code.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be intersect|except, got {op!r}")

    def project(col_name: str, side: int):
        def f(b: pa.Table) -> pa.Table:
            keys = _combined(b[col_name])
            # per-batch distinct: cuts exchange rows to <= distinct keys
            keys = pc.unique(keys)
            return pa.table(
                {
                    left_on: keys,
                    "__side": pa.array(np.full(len(keys), side, dtype=np.int8)),
                }
            )

        return f

    l_keys = left.map_batches(
        project(left_on, 0), batch_format="pyarrow", zero_copy_batch=True
    )
    r_keys = right.map_batches(
        project(right_on, 1), batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(l_keys.union(r_keys), key=left_on, n_buckets=n_buckets)

    def kernel(group: pa.Table) -> pa.Table:
        side = _combined(group["__side"]).to_numpy(zero_copy_only=False)
        keys = _combined(group[left_on])
        # one joint dictionary; NULL gets one shared code (set-op equality)
        codes = (
            keys.dictionary_encode()
            .indices.fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lmask = side == 0
        lcodes, rcodes = codes[lmask], codes[~lmask]
        # first occurrence of each distinct left code -> emit-once contract
        uniq, first = np.unique(lcodes, return_index=True)
        hit = np.isin(uniq, rcodes)
        take = first[hit if op == "intersect" else ~hit]
        lidx = np.flatnonzero(lmask)
        return pa.table({left_on: keys.take(pa.array(lidx[take]))})

    return both.groupby("bucket").map_groups(kernel, batch_format="pyarrow")


def broadcast_inner_join(
    left: Dataset,
    right: Dataset | pa.Table,
    left_on: str,
    right_on: str,
    right_cols: list[str],
    concurrency: int | None = None,
) -> Dataset:
    """Shuffle-free INNER join against a SMALL right side (dimension
    tables): the right table is materialized once, ``ray.put`` into the
    object store, and read in each actor's ``__init__`` — the left side
    never pays an exchange (at 100 TB a 25-row nation table must not cost
    an all-to-all). Per batch the same vectorized ``_inner_kernel`` as
    ``hash_equi_join`` runs against the broadcast table (joint dictionary
    codes + two global searchsorted calls), so semantics — including
    one-output-row-per-match-pair duplication and SQL NULL-equality (null
    keys match nothing) — are identical to the shuffled path bit for bit.

    Use when ``|right|`` fits comfortably in a worker heap; otherwise
    ``hash_equi_join``.
    """
    l_schema = _arrow_schema(left)
    clash = set(right_cols) & set(l_schema.names)
    if clash:
        raise ValueError(f"right_cols clash with left schema: {sorted(clash)}")
    if isinstance(right, Dataset):
        rtbl = pa.concat_tables(
            ray.get(right.select_columns([right_on, *right_cols]).to_arrow_refs())
        )
    else:
        rtbl = right.select([right_on, *right_cols])
    # the kernel resolves both key columns under the LEFT key name
    rtbl = rtbl.rename_columns([left_on, *right_cols]).combine_chunks()
    vtypes = {c: rtbl.schema.field(c).type for c in right_cols}
    ref = ray.put(rtbl)

    class _BcastJoin:
        def __init__(self):
            self.rtbl = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            return _inner_kernel(
                b, self.rtbl, left_on=left_on, right_cols=right_cols, vtypes=vtypes
            )

    from modlyn_ray.util import pool_bounds

    return left.map_batches(
        _BcastJoin,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or pool_bounds(4),
    )


def broadcast_semi_join(
    left: Dataset,
    keys,
    left_on: str,
    anti: bool = False,
    concurrency: int | None = None,
) -> Dataset:
    """Shuffle-free semi/anti join against a SMALL key set: ``keys`` (numpy
    array / list) is ``ray.put`` once and read from the object store in each
    actor's ``__init__``; per-batch membership is one vectorized ``np.isin``.
    Use when the distinct-key side fits comfortably in a worker heap
    (dimension tables, qualifying-key lists); otherwise ``hash_equi_join``.
    """
    arr = np.unique(np.asarray(keys))
    ref = ray.put(arr)

    class _Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            col = _combined(b[left_on]).to_numpy(zero_copy_only=False)
            mask = np.isin(col, self.keys)
            return b.filter(pa.array(~mask if anti else mask))

    from modlyn_ray.util import pool_bounds

    return left.map_batches(
        _Filter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or pool_bounds(4),
    )
