"""Token-sequence restructuring for LLM training-data prep.

Beyond-reference operators over the engine's sequences contract
(``doc_id``, ``tokens: list<int32>``, ``n_tok``, ``source``): the
restructuring steps a training pipeline runs AFTER cleaning/dedup and
BEFORE the data loader —

- :func:`chunk_sequences` — explode each row's token list into fixed-size
  windows (optionally overlapping).  A vectorized flat_map: all offset
  arithmetic in numpy, values zero-copied when windows are non-overlapping.
- :func:`remap_tokens` — vocabulary remapping through a broadcast lookup
  table held by an actor pool (``ray.put`` once, ``np.take`` per batch) —
  the tokenizer-migration / vocab-compaction step.
- :func:`pack_concat` — GPT-style "concatenate and cut every C tokens"
  packing with a deterministic global order per group.  Distributed in
  three phases (doc-index prefix-sum -> offset attach -> boundary-aligned
  partial emission + one bucketed merge exchange); no stage ever holds a
  group's full token stream.
- :func:`pack_greedy` — first-fit-sequential packing (documents are never
  split); per-bucket searchsorted loop over *packs*, not rows.

All four keep tokens in Arrow list arrays end to end — token values never
pass through Python objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

# int32 list-offset availability ceiling per merge bucket (ADVICE r4:
# failure is loud, never silent corruption); tests lower it to exercise
# the guard without materializing 2^31 tokens
_MAX_BUCKET_TOKENS = np.iinfo(np.int32).max


def _list_parts(col) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(rebased offsets int64, flat numpy values, flat arrow values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = col.flatten()
    return offs, flat.to_numpy(zero_copy_only=False), flat


def _composite_key(group_col, key_col) -> pa.Array:
    """Group-qualified key: cast both to string and join, length-prefixing
    the group part so a separator character INSIDE a group/key value can't
    make distinct (group, key) pairs render identically (('a\\x1fb','c') vs
    ('a','b\\x1fc')). Uses the same Arrow kernels on every side of a lookup
    so the rendered strings always agree."""
    parts = []
    for col in (group_col, key_col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.cast(col, pa.string()))
    glen = pc.cast(pc.utf8_length(parts[0]), pa.string())
    return pc.binary_join_element_wise(glen, parts[0], parts[1], "\x1f")


def _packed_key_factory(index, group_col, key_col, max_groups=1 << 20):
    """Exact int64 (group, key) encoder for the shuffle offset-attach, or
    None when packing can't be proven collision-free.

    Ships ~8 B/row through the bucketed exchange instead of a rendered
    'group\\x1fkey' string (20+ B/row, twice — left and offset side). One
    cheap projected pass over the doc index collects the distinct groups
    and global key bounds; the packed key is gcode * span + (key - kmin),
    which is exact (not a hash) whenever n_groups * span fits in int64.
    Falls back (returns None) for string keys, > ``max_groups`` distinct
    groups, or a group x key-range product that would overflow.
    """
    ktype = dict(zip(index.schema().names, index.schema().types))[key_col]
    if not (pa.types.is_integer(ktype) or pa.types.is_temporal(ktype)):
        return None

    def batch_stats(b: pa.Table) -> pa.Table:
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        k = pc.cast(b[key_col], pa.int64())
        if g.null_count or k.null_count:
            # the offset attach cannot address a null (group, key) on ANY
            # encoding (the string composite renders null and the inner
            # join would silently drop the row) — fail loudly up front
            raise ValueError(
                f"pack_concat: null {group_col!r}/{key_col!r} values are not "
                "packable — drop or fill them upstream"
            )
        u = pc.unique(pc.cast(g, pa.string()))
        kmin, kmax = pc.min(k).as_py(), pc.max(k).as_py()
        n = len(u)
        return pa.table(
            {
                "g": u,
                "kmin": pa.array([kmin] * n, type=pa.int64()),
                "kmax": pa.array([kmax] * n, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min

    # per-batch (unique groups, key bounds) partials, merged by a small
    # DISTRIBUTED groupby — the driver never sees more than max_groups + 1
    # rows (limit before take_all), so a huge-group-cardinality input hits
    # the string-composite fallback instead of a driver OOM
    rows = (
        index.select_columns([group_col, key_col])
        .map_batches(batch_stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Min("kmin", alias_name="kmin"), Max("kmax", alias_name="kmax"))
        .limit(max_groups + 1)
        .take_all()
    )
    if not rows or len(rows) > max_groups:
        return None
    groups = np.sort(np.asarray([r["g"] for r in rows], dtype=object))
    kmin = int(min(r["kmin"] for r in rows))
    kmax = int(max(r["kmax"] for r in rows))
    span = kmax - kmin + 1
    if span <= 0 or len(groups) > (2**62) // span:  # would overflow int64
        return None
    gvals = pa.array(groups, type=pa.string())
    ref = ray.put((gvals, kmin, span))

    def packed(b: pa.Table) -> pa.Array:
        gv, kmn, sp = ray.get(ref)
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gcode = pc.index_in(pc.cast(g, pa.string()), value_set=gv)
        if gcode.null_count:
            raise ValueError(
                f"pack_concat: {group_col!r} value missing from the doc-index "
                "group dictionary — index and data passes disagree"
            )
        gc = gcode.cast(pa.int64()).to_numpy(zero_copy_only=False)
        karr = pc.cast(b[key_col], pa.int64())
        if karr.null_count:
            raise ValueError(f"pack_concat: null {key_col!r} in packed-key attach")
        k = karr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.array(gc * sp + (k - kmn))

    return packed


def chunk_sequences(
    ds: Dataset,
    chunk_len: int,
    stride: int | None = None,
    drop_remainder: bool = False,
    tokens_col: str = "tokens",
) -> Dataset:
    """One output row per (input row, window): windows of ``chunk_len``
    tokens starting every ``stride`` tokens (default: non-overlapping).
    ``drop_remainder`` keeps only full windows.  Output = every non-list
    input column (gathered), plus ``chunk_no`` (int32 within the row),
    ``tokens`` (the window) and ``n_tok``.

    Non-overlapping windows are a pure re-offsetting of the flat value
    buffer — zero value copies; overlapping windows pay one ``np.take``.
    """
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    stride = chunk_len if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def fn(b: pa.Table) -> pa.Table:
        offs, flat_np, flat = _list_parts(b[tokens_col])
        lens = np.diff(offs)
        if drop_remainder:
            n_chunks = np.where(lens >= chunk_len, (lens - chunk_len) // stride + 1, 0)
        else:
            n_chunks = (lens + stride - 1) // stride
        total = int(n_chunks.sum())
        row_idx = np.repeat(np.arange(len(b), dtype=np.int64), n_chunks)
        first = np.cumsum(n_chunks) - n_chunks
        chunk_no = np.arange(total, dtype=np.int64) - first[row_idx]
        starts = offs[:-1][row_idx] + chunk_no * stride
        ends = np.minimum(starts + chunk_len, offs[1:][row_idx])
        clens = ends - starts

        if stride == chunk_len and not drop_remainder:
            # windows tile each row exactly: values stay in place
            vals = flat
        else:
            idx = np.repeat(starts, clens) + (
                np.arange(int(clens.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(clens) - clens, clens)
            )
            vals = pa.array(flat_np[idx], type=flat.type)
        new_offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(clens, out=new_offs[1:])
        toks = pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), vals)

        keep = [
            c for c in b.column_names
            if c != tokens_col and not pa.types.is_list(b.schema.field(c).type)
        ]
        out = b.select(keep).take(pa.array(row_idx))
        out = out.append_column("chunk_no", pa.array(chunk_no.astype(np.int32)))
        out = out.append_column(tokens_col, toks)
        if "n_tok" in keep:
            out = out.drop_columns(["n_tok"])
        out = out.append_column("n_tok", pa.array(clens.astype(np.int32)))
        return out.replace_schema_metadata(None)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _RemapActor:
    """Broadcast-lookup vocab remapper: the table is ray.put once by
    remap_tokens and fetched ONCE per actor here (zero-copy plasma read),
    never re-shipped per batch."""

    def __init__(self, table_ref, tokens_col: str):
        self.table = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        self.vocab = len(self.table)
        self.tokens_col = tokens_col

    def __call__(self, b: pa.Table) -> pa.Table:
        # _list_parts rebases offsets so sliced (non-zero-offset) arrays are
        # handled like every other kernel in this module
        offs, flat_np, _flat = _list_parts(b[self.tokens_col])
        if len(flat_np) and (flat_np.min() < 0 or flat_np.max() >= self.vocab):
            raise ValueError(
                f"token id out of range for remap table of size {self.vocab}: "
                f"[{flat_np.min()}, {flat_np.max()}]"
            )
        mapped = self.table[flat_np]
        toks = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), pa.array(mapped))
        i = b.schema.get_field_index(self.tokens_col)
        return b.set_column(i, self.tokens_col, toks).replace_schema_metadata(None)


def remap_tokens(
    ds: Dataset,
    table: np.ndarray,
    tokens_col: str = "tokens",
    concurrency=(1, 8),
) -> Dataset:
    """Remap every token id through ``table`` (``new_id = table[old_id]``).

    The table is broadcast once with ``ray.put``; each actor in the pool
    materializes it in ``__init__`` and every batch is one ``np.take``.
    Out-of-range ids raise instead of wrapping.
    """
    table = np.ascontiguousarray(np.asarray(table, dtype=np.int32))
    ref = ray.put(table)
    return ds.map_batches(
        _RemapActor,
        fn_constructor_args=(ref, tokens_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def pack_concat(
    ds: Dataset,
    context_len: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str = "tokens",
    emit_tokens: bool = True,
    n_buckets: int = 64,
    offsets_via: str = "auto",
    broadcast_max_docs: int = 10_000_000,
    max_bucket_tokens: int = _MAX_BUCKET_TOKENS,
    packed_keys: bool = True,
) -> Dataset:
    """Concat-and-chunk packing: within each ``group_col``, order rows by
    ``key_col`` (must be unique WITHIN its group — both attach paths key
    offsets on the (group, key) pair, the broadcast index raises on a
    duplicate pair, and the merge exchange rejects overlapping spans), and
    conceptually concatenate their token streams, cutting a pack boundary
    every ``context_len`` tokens.  Output: one row per (group, pack_no)
    with ``n_tok``, ``tok_sum`` (int64 sum of token ids — a cheap content
    checksum) and, when ``emit_tokens``, the pack's token list.  The last
    pack of a group may be short.

    Distributed shape (no stage holds a group's token stream):

    1. *doc index* — project (group, key, n_tok) — ~1/1000 of the bytes —
       and compute each row's exclusive global token offset via the
       engine's own prefix-sum machinery (:func:`~modlyn_ray.stages.
       temporal.windowize` with ``by=group_col`` ordered by ``key_col``).
       For extreme per-group doc counts the doc index itself would shard
       into a hierarchical (range-bucketed) prefix sum; at the sandbox
       profiles the per-group index task holds only (key, n_tok) pairs.
    2. *offset attach* — join the offsets back to the full rows:
       ``offsets_via="broadcast"`` ships the doc index once via ``ray.put``
       (right shape for a small-side index, but DRIVER-RESIDENT — ~30 B/doc
       at the driver); ``"shuffle"`` routes through the bucketed hash join
       and never materializes the index in one place, keying the join on
       an exact packed int64 (gcode * key_span + key) whenever one cheap
       index pass proves it collision-free, else on the length-prefixed
       string composite.  The default
       ``"auto"`` counts the index (one cheap projected pass) and picks
       broadcast at or below ``broadcast_max_docs`` (default 1e7 docs ~
       300 MB at the driver), shuffle above — pass ``offsets_via``
       explicitly to skip the counting pass.  The shuffle path orders by
       ``key_col`` inside windowize, so it needs integer/timestamp keys;
       auto raises (rather than silently falling back to a driver-sized
       broadcast) when the count demands shuffle but the key is a string.
    3. *partial emission* — per batch, each row cuts its span at global
       multiples of ``context_len`` (pure offset arithmetic) and emits
       per-pack partial rows; ONE bucketed exchange on hash(group,
       pack_no) merges partials — vectorized inside each bucket task, no
       per-pack Ray groups.  A merge bucket holds at most ~2^31 token
       values (int32 list offsets); the merge raises with guidance to
       raise ``n_buckets`` before overflowing.
    """
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")

    index = ds.select_columns([group_col, key_col, "n_tok"])
    if offsets_via in ("auto", "shuffle"):
        # these paths read the index 2-3 times (count / packed-key stats /
        # windowize); materialize the 3-narrow-column projection ONCE
        # (distributed, object-store resident) so an expensive upstream
        # pipeline isn't re-executed per pass
        index = index.materialize()

    if offsets_via == "auto":
        n_docs = index.count()
        if n_docs <= broadcast_max_docs:
            offsets_via = "broadcast"
        else:
            sch = index.schema()
            ktype = dict(zip(sch.names, sch.types))[key_col]
            if not (pa.types.is_integer(ktype) or pa.types.is_temporal(ktype)):
                raise ValueError(
                    f"pack_concat: {n_docs} docs exceeds broadcast_max_docs="
                    f"{broadcast_max_docs} but {key_col!r} is {ktype} — the "
                    "distributed shuffle attach needs integer/timestamp keys. "
                    "Map keys to integers upstream, or force "
                    "offsets_via='broadcast' if the driver can hold the index."
                )
            offsets_via = "shuffle"

    if offsets_via == "broadcast":
        # the doc index (group, key, n_tok) is ~1/1000 of the token bytes;
        # broadcast mode declares it driver-resident: sort + per-group
        # exclusive cumsum in pandas, one ray.put, zero-copy reads per actor
        idx = index.to_pandas().sort_values([group_col, key_col], kind="mergesort")
        if idx.duplicated([group_col, key_col]).any():
            raise ValueError(
                f"pack_concat: {key_col!r} must be unique within each "
                f"{group_col!r} group (the offset lookup cannot distinguish "
                "duplicate (group, key) pairs)"
            )
        ex = idx.groupby(group_col, sort=False)["n_tok"].cumsum() - idx["n_tok"]
        keys = _composite_key(
            pa.Array.from_pandas(idx[group_col]), pa.Array.from_pandas(idx[key_col])
        )
        gstart = ex.to_numpy(dtype=np.int64)
        ref = ray.put((keys, gstart))

        def attach(b: pa.Table) -> pa.Table:
            k, g = ray.get(ref)
            pos = pc.index_in(_composite_key(b[group_col], b[key_col]), value_set=k)
            if pos.null_count:
                raise ValueError("pack_concat: (group, key) missing from doc index")
            pos_np = pos.to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "__gstart", pa.array(g[pos_np])
            ).replace_schema_metadata(None)

        attached = ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    elif offsets_via == "shuffle":
        from modlyn_ray.stages.joins import hash_equi_join
        from modlyn_ray.stages.temporal import windowize

        # distributed prefix sum over the doc index via the engine's own
        # bucket-windowed machinery (key_col must be integer/timestamp
        # ordered on this path), then a bucketed hash join attaches offsets
        # keyed on the (group, key) pair so a key reused across groups
        # matches only its own group's offset row. The pair is encoded as
        # an exact packed int64 when provable collision-free (8 B/row on
        # the exchange), else as the length-prefixed string composite.
        # packed_keys=False forces the string-composite encoding (A/B lever
        # for measuring the exchange-payload cut; semantics identical)
        make_key = (
            _packed_key_factory(index, group_col, key_col) if packed_keys else None
        )
        if make_key is None:

            def make_key(b):
                k = _composite_key(b[group_col], b[key_col])
                if k.null_count:
                    # a null composite would be silently dropped by the
                    # inner offset join — missing rows, not an error
                    raise ValueError(
                        f"pack_concat: null {group_col!r}/{key_col!r} values "
                        "are not packable — drop or fill them upstream"
                    )
                return k
        widx = windowize(
            index,
            prefix_sum_cols=["n_tok"],
            sessionize=False,
            by=group_col,
            ts_col=key_col,
            n_buckets=n_buckets,
        ).select_columns([group_col, key_col, "cum_n_tok", "n_tok"])
        gs = widx.map_batches(
            lambda b: pa.table(
                {
                    "__gk": make_key(b),
                    "__gstart": pc.subtract(b["cum_n_tok"], pc.cast(b["n_tok"], pa.int64())),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        left = ds.map_batches(
            lambda b: b.append_column(
                "__gk", make_key(b)
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        attached = hash_equi_join(
            left, gs, left_on="__gk", right_on="__gk",
            right_cols=["__gstart"], n_buckets=n_buckets,
        )
    else:
        raise ValueError(f"offsets_via must be auto|broadcast|shuffle, got {offsets_via!r}")

    C = int(context_len)

    def emit_partials(b: pa.Table) -> pa.Table:
        offs, flat_np, flat = _list_parts(b[tokens_col])
        lens = np.diff(offs)
        gstart = b["__gstart"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        gend = gstart + lens
        # segments of each row's [gstart, gend) span cut at multiples of C
        n_seg = np.where(lens > 0, (gend - 1) // C - gstart // C + 1, 0)
        total = int(n_seg.sum())
        row_idx = np.repeat(np.arange(len(b), dtype=np.int64), n_seg)
        first = np.cumsum(n_seg) - n_seg
        seg_no = np.arange(total, dtype=np.int64) - first[row_idx]
        pack_no = gstart[row_idx] // C + seg_no
        s_glob = np.maximum(gstart[row_idx], pack_no * C)
        e_glob = np.minimum(gend[row_idx], (pack_no + 1) * C)
        s_loc = offs[:-1][row_idx] + (s_glob - gstart[row_idx])
        clens = e_glob - s_glob

        pad = np.zeros(len(flat_np) + 1, dtype=np.int64)
        np.cumsum(flat_np.astype(np.int64), out=pad[1:])
        tok_sum = pad[s_loc + clens] - pad[s_loc]

        gcol = b[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        out = {
            group_col: gcol.take(pa.array(row_idx)),
            "pack_no": pa.array(pack_no),
            "__ord": pa.array(s_glob),
            "n_tok": pa.array(clens.astype(np.int64)),
            "tok_sum": pa.array(tok_sum),
        }
        if emit_tokens:
            idx = np.repeat(s_loc, clens) + (
                np.arange(int(clens.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(clens) - clens, clens)
            )
            no = np.zeros(total + 1, dtype=np.int64)
            np.cumsum(clens, out=no[1:])
            out[tokens_col] = pa.ListArray.from_arrays(
                pa.array(no, type=pa.int32()), pa.array(flat_np[idx], type=flat.type)
            )
        return pa.table(out)

    partials = attached.map_batches(emit_partials, batch_format="pyarrow", zero_copy_batch=True)

    # ONE bucketed merge exchange: hash(group, pack_no) -> vectorized
    # pandas combine inside each bucket task (never one Ray group per pack)
    def bucketize(b: pa.Table) -> pa.Table:
        import zlib

        g = b[group_col].combine_chunks() if isinstance(b[group_col], pa.ChunkedArray) else b[group_col]
        gd = g.dictionary_encode()
        codes = gd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gh = np.array(
            [zlib.crc32(str(v).encode()) for v in gd.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        pk = b["pack_no"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((gh[codes] * np.uint64(1000003) + pk) % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket)).replace_schema_metadata(None)

    def merge_bucket(g: pa.Table) -> pa.Table:
        df_cols = {
            group_col: g[group_col].combine_chunks() if isinstance(g[group_col], pa.ChunkedArray) else g[group_col],
        }
        gd = df_cols[group_col].dictionary_encode()
        codes = gd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pack = g["pack_no"].combine_chunks().to_numpy(zero_copy_only=False)
        ordk = g["__ord"].combine_chunks().to_numpy(zero_copy_only=False)
        ntok = g["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        tsum = g["tok_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ordk, pack, codes))
        codes, pack, ntok, tsum = codes[order], pack[order], ntok[order], tsum[order]
        ordk = ordk[order].astype(np.int64)
        key_change = np.empty(len(codes), dtype=bool)
        if len(codes):
            key_change[0] = True
            key_change[1:] = (codes[1:] != codes[:-1]) | (pack[1:] != pack[:-1])
            # partial spans must tile each pack exactly; an overlap means a
            # duplicate (group, key) row slipped past the offset attach
            contig = ordk[1:] == ordk[:-1] + ntok[:-1].astype(np.int64)
            if not (key_change[1:] | contig).all():
                raise ValueError(
                    "pack_concat: overlapping partial spans in a merge bucket "
                    "— duplicate (group, key) rows in the input?"
                )
        seg_id = np.cumsum(key_change) - 1
        n_out = int(seg_id[-1]) + 1 if len(seg_id) else 0
        out_ntok = np.bincount(seg_id, weights=ntok, minlength=n_out).astype(np.int64)
        out_tsum = np.bincount(seg_id, weights=tsum, minlength=n_out).astype(np.int64)
        head = np.flatnonzero(key_change)
        cols = {
            group_col: gd.dictionary.take(pa.array(codes[head])),
            "pack_no": pa.array(pack[head]),
            "n_tok": pa.array(out_ntok),
            "tok_sum": pa.array(out_tsum),
        }
        if emit_tokens:
            toks = g[tokens_col]
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            flat_np = toks.flatten().to_numpy(zero_copy_only=False)
            s, e = offs[:-1][order], offs[1:][order]
            ln = e - s
            idx = np.repeat(s, ln) + (
                np.arange(int(ln.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(ln) - ln, ln)
            )
            vals = flat_np[idx]
            per_seg = np.bincount(seg_id, weights=ln, minlength=n_out).astype(np.int64)
            no = np.zeros(n_out + 1, dtype=np.int64)
            np.cumsum(per_seg, out=no[1:])
            if no[-1] > max_bucket_tokens:
                raise ValueError(
                    f"pack_concat: merge bucket holds {int(no[-1])} token "
                    "values, exceeding int32 list offsets — raise n_buckets "
                    "(each bucket is limited to ~2.1e9 tokens)"
                )
            cols[tokens_col] = pa.ListArray.from_arrays(
                pa.array(no, type=pa.int32()),
                pa.array(vals, type=toks.flatten().type),
            )
        return pa.table(cols)

    return (
        partials.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def pack_greedy(
    ds: Dataset,
    context_len: int,
    key_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_buckets: int = 64,
) -> Dataset:
    """First-fit-sequential packing: rows are hash-bucketed by ``key_col``,
    ordered by ``key_col`` inside each bucket, and greedily appended to the
    current pack until the next row would overflow ``context_len`` — rows
    are never split (rows longer than ``context_len`` get a pack of their
    own).  Deterministic for a given bucket count.  Output: one row per
    pack — ``bucket``, ``pack_no``, ``n_docs``, ``n_tok``, ``tok_sum``.

    The per-bucket kernel loops over *packs* (searchsorted on the token
    cumsum), never over rows; exchange payload is (key, n_tok, tok_sum)
    only — tokens themselves never ride this shuffle.
    """
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")

    def project(b: pa.Table) -> pa.Table:
        offs, flat_np, _ = _list_parts(b[tokens_col])
        pad = np.zeros(len(flat_np) + 1, dtype=np.int64)
        np.cumsum(flat_np.astype(np.int64), out=pad[1:])
        tok_sum = pad[offs[1:]] - pad[offs[:-1]]
        keys = b[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        import zlib

        kd = pc.cast(keys, pa.string()).dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kh = np.array(
            [zlib.crc32(v.encode()) for v in kd.dictionary.to_pylist()], dtype=np.int64
        )
        bucket = (kh[codes] % n_buckets).astype(np.int32)
        return pa.table(
            {
                key_col: keys,
                "n_tok": pa.array(np.diff(offs).astype(np.int64)),
                "tok_sum": pa.array(tok_sum),
                "bucket": pa.array(bucket),
            }
        )

    def pack_bucket(g: pa.Table) -> pa.Table:
        df = g.sort_by(key_col)
        ntok = df["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        tsum = df["tok_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ntok)
        starts = []  # pack start row indices
        i = 0
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ntok, out=csum[1:])
        while i < n:
            starts.append(i)
            # furthest j with csum[j] - csum[i] <= context_len, at least i+1
            j = int(np.searchsorted(csum, csum[i] + context_len, side="right")) - 1
            i = max(j, i + 1)
        starts.append(n)
        s = np.asarray(starts, dtype=np.int64)
        bkt = df["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        psum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tsum, out=psum[1:])
        return pa.table(
            {
                "bucket": pa.array(bkt[s[:-1]] if n else np.array([], dtype=np.int32)),
                "pack_no": pa.array(np.arange(len(s) - 1, dtype=np.int64)),
                "n_docs": pa.array((s[1:] - s[:-1]).astype(np.int64)),
                "n_tok": pa.array(csum[s[1:]] - csum[s[:-1]]),
                "tok_sum": pa.array(psum[s[1:]] - psum[s[:-1]]),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pyarrow")
    )


class _TokenFilterActor:
    """Broadcast keep/drop LUT: ray.put once, one boolean gather + list
    re-offsetting per batch. Ids at or beyond the LUT length are kept
    (the LUT covers the known vocab prefix)."""

    def __init__(self, lut_ref, tokens_col: str):
        self.drop = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.tokens_col = tokens_col

    def __call__(self, b: pa.Table) -> pa.Table:
        offs, flat_np, flat = _list_parts(b[self.tokens_col])
        n = len(b)
        in_range = flat_np < len(self.drop)
        dropm = np.zeros(len(flat_np), dtype=bool)
        dropm[in_range] = self.drop[flat_np[in_range]]
        keep = ~dropm
        # new per-row lengths = kept count per row (cumsum-diff, no loop)
        kc = np.zeros(len(flat_np) + 1, dtype=np.int64)
        np.cumsum(keep, out=kc[1:])
        new_lens = kc[offs[1:]] - kc[offs[:-1]]
        new_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_offs[1:])
        toks = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()),
            pa.array(flat_np[keep], type=flat.type),
        )
        i = b.schema.get_field_index(self.tokens_col)
        b = b.set_column(i, self.tokens_col, toks)
        if "n_tok" in b.column_names:
            j = b.schema.get_field_index("n_tok")
            b = b.set_column(
                j, "n_tok", pa.array(new_lens.astype(np.int32))
            )
        return b.replace_schema_metadata(None)


def filter_tokens(
    ds: Dataset,
    remove,
    vocab: int | None = None,
    tokens_col: str = "tokens",
    concurrency=(1, 8),
) -> Dataset:
    """Drop the ids in ``remove`` from every token list (stop-token /
    special-token scrub). The removal set is broadcast once as a boolean
    LUT; per batch the kernel is one gather + one cumsum re-offsetting.
    ``n_tok`` is kept consistent when present."""
    remove = np.asarray(sorted(set(int(t) for t in remove)), dtype=np.int64)
    if len(remove) and remove.min() < 0:
        raise ValueError("negative token ids in remove set")
    size = int(vocab) if vocab is not None else (int(remove.max()) + 1 if len(remove) else 1)
    lut = np.zeros(size, dtype=bool)
    lut[remove[remove < size]] = True
    ref = ray.put(lut)
    return ds.map_batches(
        _TokenFilterActor,
        fn_constructor_args=(ref, tokens_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def _content_hashes(offs: np.ndarray, flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit polynomial hashes per row over its tokens
    (order-sensitive), vectorized: position-weighted prefix sums with
    natural uint64 wraparound. Restarting the power at each row start
    makes the hash a pure function of the row's token sequence."""
    lens = np.diff(offs)
    total = int(offs[-1])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
    out = []
    vals = flat.astype(np.uint64) + np.uint64(1)
    maxlen = int(lens.max()) if len(lens) else 0
    for r in (np.uint64(1000003), np.uint64(10000019)):
        pows = np.ones(max(maxlen, 1), dtype=np.uint64)
        np.cumprod(np.full(max(maxlen, 1), r, dtype=np.uint64), out=pows)
        contrib = vals * pows[pos]
        cs = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(contrib, out=cs[1:])
        out.append((cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64))
    return out[0], out[1]


def dedup_by_token_content(
    ds: Dataset,
    key_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_buckets: int = 64,
) -> Dataset:
    """Exact dedup on token-sequence CONTENT: among rows whose token lists
    are element-for-element identical, keep the one with the minimum
    ``key_col`` — the post-tokenization twin of exact text dedup.

    Hash-routed, value-exact (stages/dedup.py's contract): rows are
    bucketed by a 64-bit content hash, and inside each bucket candidate
    groups (equal 128-bit hash pair + equal length) are verified by
    comparing the actual token values vectorized against the group head —
    a collision that survives both hashes AND equal length raises rather
    than silently merging distinct sequences."""

    def project(b: pa.Table) -> pa.Table:
        offs, flat_np, _ = _list_parts(b[tokens_col])
        h1, h2 = _content_hashes(offs, flat_np)
        bucket = (h1 % np.int64(n_buckets)).astype(np.int32)
        b = b.append_column("__h1", pa.array(h1)).append_column("__h2", pa.array(h2))
        return b.append_column("bucket", pa.array(np.abs(bucket))).replace_schema_metadata(None)

    def resolve(g: pa.Table) -> pa.Table:
        offs, flat_np, _ = _list_parts(g[tokens_col])
        lens = np.diff(offs)
        h1 = g["__h1"].combine_chunks().to_numpy(zero_copy_only=False)
        h2 = g["__h2"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        korder = pc.sort_indices(keys).to_numpy(zero_copy_only=False).astype(np.int64)
        krank = np.empty_like(korder)
        krank[korder] = np.arange(len(korder))
        order = np.lexsort((krank, lens, h2, h1))
        sh1, sh2, sl = h1[order], h2[order], lens[order]
        new_grp = np.empty(len(order), dtype=bool)
        if len(order):
            new_grp[0] = True
            new_grp[1:] = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]) | (sl[1:] != sl[:-1])
        gid = np.cumsum(new_grp) - 1
        heads = np.flatnonzero(new_grp)
        # verify every member of a multi-row group against its head
        members = np.flatnonzero(~new_grp)
        if len(members):
            head_of = heads[gid[members]]
            m_rows, h_rows = order[members], order[head_of]
            m_len = lens[m_rows]
            m_idx = np.repeat(offs[:-1][m_rows], m_len) + (
                np.arange(int(m_len.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(m_len) - m_len, m_len)
            )
            h_idx = np.repeat(offs[:-1][h_rows], m_len) + (
                np.arange(int(m_len.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(m_len) - m_len, m_len)
            )
            if not np.array_equal(flat_np[m_idx], flat_np[h_idx]):
                raise RuntimeError(
                    "dedup_by_token_content: 128-bit content-hash collision "
                    "between distinct token sequences — rehash with different "
                    "primes or report this input"
                )
        keep_rows = order[heads]
        mask = np.zeros(len(g), dtype=bool)
        mask[keep_rows] = True
        return g.filter(pa.array(mask)).drop_columns(["__h1", "__h2", "bucket"])

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )
