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

from modlyn_ray.stages.temporal import detect_heavy_keys, windowize


def row_mix_values(toks: pa.ListArray | pa.ChunkedArray) -> np.ndarray:
    """Per-row order-insensitive token mix (int64) — prefix-summable."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    mixed = (flat * np.uint64(2654435761)) % np.uint64(1 << 31)
    pad = np.zeros(len(mixed) + 1, dtype=np.uint64)
    np.cumsum(mixed, out=pad[1:])
    return (pad[offs[1:]] - pad[offs[:-1]]).astype(np.int64)


def add_row_mix(batch: pa.Table) -> pa.Table:
    return batch.append_column("row_mix", pa.array(row_mix_values(batch["tokens"])))


# ---------------------------------------------------------------------------
# Compact exchange encoding
#
# The shuffle payload is narrowed wherever it is STATICALLY safe — i.e.
# where no property of the data can break it at any scale:
#   * row_mix (token-free variant) splits into a dictionary<int16, int64>
#     HIGH-32 word + plain int32 LOW word: its high word has at most
#     max_n_tok/2 <= 16384 distinct VALUES by construction (row_mix <
#     n_tok * 2^31), so dictionary unification can never overflow the
#     int16 indices. Reconstruction is byte-exact: v == (hi<<32)|u32(lo).
#   * n_tok ships as int16 (safe cast — raises loudly past 32767 tokens).
#   * source ships as dictionary<int16, string> (loud past 32767 sources).
#   * the explicit side tag is dropped: an attr row IS a null n_tok.
# ingest_ts and the fused seq_no/attr-bits slot stay 64-bit on purpose:
# their high words are NOT low-cardinality in general (a skewed doc's
# timeline spans years -> ~50k distinct timestamp high words on the 32M
# synthetic corpus; float64 attr bits are near-distinct per value), and
# Ray's sort shuffle unifies chunk dictionaries per map block before
# partitioning — an int16-indexed dictionary there overflows exactly at
# the scale this engine targets (found by the first round-5 scale32
# sweep, which crashed on it).
# ---------------------------------------------------------------------------

_HI_LIMIT = 32767  # int16 dictionary-index capacity


def _pack_hi_lo(vals: np.ndarray, mask, what: str, dict_hi: bool = True):
    """int64 numpy -> (high-32 word, int32 low word); byte-exact split."""
    hi = vals >> np.int64(32)
    lo = (vals & np.int64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    if not dict_hi:
        return pa.array(hi.astype(np.uint32).view(np.int32), mask=mask), pa.array(
            lo, mask=mask
        )
    uniq, inv = np.unique(hi, return_inverse=True)
    if len(uniq) > _HI_LIMIT:
        raise ValueError(
            f"compact exchange: column {what!r} has {len(uniq)} distinct "
            f"high-32 words in one block (> {_HI_LIMIT}); only columns whose "
            "high-word cardinality is bounded by construction may use "
            "dict_hi=True (see module comment)."
        )
    hi_arr = pa.DictionaryArray.from_arrays(
        pa.array(inv.astype(np.int16), mask=mask),
        pa.array(uniq, type=pa.int64()),
    )
    return hi_arr, pa.array(lo, mask=mask)


def _unpack_hi_lo(col_hi, col_lo) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`_pack_hi_lo` -> (int64 values, null mask).

    Decodes chunk by chunk: reduce-side groups concatenate many map blocks,
    each with its own tiny dictionary; per-chunk decode means those
    dictionaries are never unified, so the int16 index width can never
    overflow no matter the bucket size.
    """
    if isinstance(col_lo, pa.ChunkedArray):
        col_lo = col_lo.combine_chunks()
    lo = (
        col_lo.fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int32)
        .view(np.uint32)
        .astype(np.int64)
    )
    chunks = col_hi.chunks if isinstance(col_hi, pa.ChunkedArray) else [col_hi]
    his, masks = [], []
    for ch in chunks:
        if pa.types.is_dictionary(ch.type):
            d = ch.dictionary.to_numpy(zero_copy_only=False).astype(np.int64)
            idx = ch.indices
            masks.append(idx.is_null().to_numpy(zero_copy_only=False))
            iv = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            his.append(d[iv] if len(d) else np.zeros(len(iv), dtype=np.int64))
        else:
            # plain int32 high word (the fused slot): sign-extend
            masks.append(ch.is_null().to_numpy(zero_copy_only=False))
            his.append(
                ch.fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int32)
                .astype(np.int64)
            )
    hi = np.concatenate(his) if his else np.empty(0, dtype=np.int64)
    mask = np.concatenate(masks) if masks else np.empty(0, dtype=bool)
    return (hi << np.int64(32)) | lo, mask


def _dict16(col, what: str):
    """String column -> dictionary<int16, string> (per-block dictionary)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dic = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
    if len(dic.dictionary) > _HI_LIMIT:
        raise ValueError(
            f"compact exchange: column {what!r} has {len(dic.dictionary)} "
            f"distinct values in one block (> {_HI_LIMIT}); pass "
            "compact_exchange=False."
        )
    return pa.DictionaryArray.from_arrays(dic.indices.cast(pa.int16()), dic.dictionary)


def _null_dict16(n: int, value_type) -> pa.DictionaryArray:
    """All-null dictionary<int16, value_type> column of length n."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int16), mask=np.ones(n, dtype=bool)),
        pa.array([], type=value_type),
    )


def _i64_np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def pit_features(
    sequences: Dataset,
    doc_attrs: Dataset | None = None,
    n_buckets: int = 64,
    detect_skew: bool = True,
    session_gap_us: int | None = None,
    validate: bool = False,
    narrow_tokens: bool = False,
    emit_tokens: bool = True,
    compact_exchange: bool = True,
) -> Dataset:
    """sequences (+ optional doc_attrs) -> point-in-time feature Dataset.

    FUSED execution: windows and the as-of merge share one crc32(doc_id)
    bucket key, so both run inside a SINGLE groupby(bucket) shuffle — the
    attrs rows ride the same exchange as the sequences (side-tagged union),
    halving all-to-all traffic vs windowize-then-asof_join.

    ``narrow_tokens=True`` ships ``tokens`` through the exchange as
    ``list<int16>`` (callers assert vocab <= 32768, e.g. the synthetic
    corpus profiles) and widens back to ``list<int32>`` after the bucket
    kernel — byte-identical values, ~half the bytes of the dominant
    shuffle column. The cast is ``safe``: an out-of-range token raises
    instead of corrupting.

    ``emit_tokens=False`` removes the ``tokens`` column from the OUTPUT
    entirely — for feature-store consumers that keep tokens in the source
    table and only need the derived features. The token lists then never
    ride the exchange at all: ``row_mix`` (a pure function of ``tokens``)
    is computed BEFORE the shuffle and shipped in their place. All emitted
    feature columns are byte-identical to the ``emit_tokens=True`` path;
    the byte-identity contract on ``tokens`` itself applies only when
    tokens are emitted. With tokens emitted, ``row_mix`` is never shipped:
    it is recomputed inside the bucket task.

    ``compact_exchange=True`` (default) applies the statically-safe payload
    cuts (module comment above): ``row_mix`` (when shipped) rides as a
    dict<int16>-hi + int32-lo split, ``n_tok`` narrows to int16, ``source``
    to int16 dictionary indices, and the explicit side tag is dropped (an
    attr row is identified by its null ``n_tok``). ``ingest_ts`` and the
    fused ``seq_no``/``attr_val``-bits slot deliberately stay 64-bit —
    their high words are not low-cardinality in general, and Ray's sort
    shuffle unifies chunk dictionaries per map block, which overflows
    int16 indices at exactly the target scale. All outputs are byte-
    identical to ``compact_exchange=False`` (tests/test_round5_fixes.py);
    bound violations (n_tok > 32767, > 32767 distinct sources per block)
    raise loudly instead of corrupting. ~34 B/row token-free exchange
    payload vs ~41 B/row legacy.
    """
    from modlyn_ray.stages.temporal import (
        DEFAULT_SESSION_GAP_US,
        add_bucket_column,
        asof_kernel,
        window_kernel,
    )

    gap = session_gap_us or DEFAULT_SESSION_GAP_US
    if validate:
        from modlyn_ray.schema import validate_sequences_batch

        sequences = sequences.map_batches(
            validate_sequences_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    heavy = detect_heavy_keys(sequences, n_buckets=n_buckets) if detect_skew else {}

    window_args = dict(
        lag_cols=["n_tok"],
        lead_cols=["n_tok"],
        backfill_cols=[],
        prefix_sum_cols=["n_tok", "row_mix"],
        sessionize=True,
        session_gap_us=gap,
        session_on_source_change=True,
        by="doc_id",
        ts_col="ingest_ts",
        tie_col="seq_no",
    )

    if doc_attrs is None:
        import pyarrow.compute as _pc

        seq = sequences.map_batches(
            add_row_mix, batch_format="pyarrow", zero_copy_batch=True
        )
        if not emit_tokens:
            seq = seq.drop_columns(["tokens"])
        elif narrow_tokens:
            # honor the narrowing on the windows-only path too (it was
            # silently ignored): tokens ride the exchange as list<int16>
            # (safe cast — loud past int16), restored to int32 after
            def _narrow(b: pa.Table) -> pa.Table:
                i = b.schema.get_field_index("tokens")
                return b.set_column(
                    i, "tokens", _pc.cast(b["tokens"], pa.list_(pa.int16()))
                )

            seq = seq.map_batches(_narrow, batch_format="pyarrow", zero_copy_batch=True)
        out = windowize(
            seq,
            lag_cols=["n_tok"],
            lead_cols=["n_tok"],
            prefix_sum_cols=["n_tok", "row_mix"],
            sessionize=True,
            session_gap_us=gap,
            n_buckets=n_buckets,
            heavy=heavy,
        )
        if emit_tokens and narrow_tokens:
            def _widen(b: pa.Table) -> pa.Table:
                i = b.schema.get_field_index("tokens")
                return b.set_column(
                    i, "tokens", _pc.cast(b["tokens"], pa.list_(pa.int32()))
                )

            out = out.map_batches(_widen, batch_format="pyarrow", zero_copy_batch=True)
        return out

    import pyarrow.compute as pc

    DICT = pa.dictionary(pa.int32(), pa.string())
    tok_type = pa.list_(pa.int16()) if narrow_tokens else pa.list_(pa.int32())
    vtypes = {"attr_val": pa.float64()}

    from modlyn_ray.util import dict_decode_batch as _dict_decode
    from modlyn_ray.util import dict_encode_batch as _dict_encode

    if compact_exchange:
        # column order shared by both sides (union requires equal schemas)
        names = ["doc_id"]
        names += ["tokens"] if emit_tokens else ["__rm_hi", "__rm_lo"]
        names += ["n_tok", "source", "ingest_ts", "__sa"]

        def pad_seq(b: pa.Table) -> pa.Table:
            cols = {
                "doc_id": _dict_encode(
                    pa.table({"doc_id": b["doc_id"]}), ("doc_id",)
                )["doc_id"],
                "n_tok": pc.cast(b["n_tok"], pa.int16()),
                "source": _dict16(b["source"], "source"),
                "ingest_ts": b["ingest_ts"],
                "__sa": b["seq_no"],
            }
            if emit_tokens:
                toks = b["tokens"]
                if narrow_tokens:
                    toks = pc.cast(toks, tok_type)
                cols["tokens"] = toks
            else:
                cols["__rm_hi"], cols["__rm_lo"] = _pack_hi_lo(
                    row_mix_values(b["tokens"]), None, "row_mix"
                )
            return pa.table({n: cols[n] for n in names})

        def pad_attr(b: pa.Table) -> pa.Table:
            n = len(b)
            attr = b["attr_val"]
            if isinstance(attr, pa.ChunkedArray):
                attr = attr.combine_chunks()
            null_mask = attr.is_null().to_numpy(zero_copy_only=False)
            bits = attr.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int64)
            cols = {
                "doc_id": _dict_encode(
                    pa.table({"doc_id": b["doc_id"]}), ("doc_id",)
                )["doc_id"],
                # null n_tok IS the side tag: sequence rows always carry one
                "n_tok": pa.nulls(n, pa.int16()),
                "source": _null_dict16(n, pa.string()),
                "ingest_ts": b["ingest_ts"],
                "__sa": pa.array(bits, mask=null_mask),
            }
            if emit_tokens:
                cols["tokens"] = pa.nulls(n, tok_type)
            else:
                cols["__rm_hi"] = _null_dict16(n, pa.int64())
                cols["__rm_lo"] = pa.nulls(n, pa.int32())
            return pa.table({n_: cols[n_] for n_ in names})

        # batch_size=None = whole-block batches: the pad kernels are pure
        # vectorized Arrow/numpy, so fewer+larger batches cut per-batch
        # overhead and leave ~1 chunk per column per block — the sort's
        # map-side take/unify then touches hundreds of fewer chunks
        s_aug = sequences.map_batches(
            pad_seq, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        a_aug = doc_attrs.select_columns(["doc_id", "ingest_ts", "attr_val"]).map_batches(
            pad_attr, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        both = add_bucket_column(
            s_aug.union(a_aug), key="doc_id", n_buckets=n_buckets, heavy=heavy
        )

        def per_bucket(group: pa.Table) -> pa.Table:
            ntk = group["n_tok"]
            if isinstance(ntk, pa.ChunkedArray):
                ntk = ntk.combine_chunks()
            is_attr = ntk.is_null().to_numpy(zero_copy_only=False)
            seq_part = group.filter(pa.array(~is_attr))
            attr_part = group.filter(pa.array(is_attr))

            seq_part = _dict_decode(seq_part, ("doc_id", "source"))
            lcols = {
                "doc_id": seq_part["doc_id"],
                "n_tok": pc.cast(seq_part["n_tok"], pa.int32()),
                "source": seq_part["source"],
                "ingest_ts": seq_part["ingest_ts"],
                "seq_no": seq_part["__sa"],
            }
            if emit_tokens:
                lcols["tokens"] = seq_part["tokens"]
                ltbl = pa.table(lcols)
                # row_mix never rides the exchange: recomputed from tokens
                ltbl = add_row_mix(ltbl)
            else:
                rm_vals, _ = _unpack_hi_lo(seq_part["__rm_hi"], seq_part["__rm_lo"])
                lcols["row_mix"] = pa.array(rm_vals)
                ltbl = pa.table(lcols)

            sa = attr_part["__sa"]
            if isinstance(sa, pa.ChunkedArray):
                sa = sa.combine_chunks()
            a_mask = sa.is_null().to_numpy(zero_copy_only=False)
            a_bits = sa.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            rtbl = pa.table(
                {
                    "doc_id": pc.cast(attr_part["doc_id"], pa.string()),
                    "ingest_ts": attr_part["ingest_ts"],
                    "attr_val": pa.array(a_bits.view(np.float64), mask=a_mask),
                }
            )
            w = window_kernel(ltbl, **window_args)
            out = asof_kernel(
                w, rtbl, by="doc_id", ts_col="ingest_ts", value_cols=["attr_val"],
                vtypes=vtypes, suffix="_asof", strict=False,
            )
            if emit_tokens and narrow_tokens:
                i = out.schema.get_field_index("tokens")
                out = out.set_column(
                    i, "tokens", pc.cast(out["tokens"], pa.list_(pa.int32()))
                )
            return out

        return both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    # ---- legacy (pre-round-5) exchange encoding, kept for same-window A/B —
    # __sa fuses the two side-exclusive int64-wide columns into ONE shuffle
    # slot: sequence rows carry seq_no, attr rows carry attr_val's float64
    # BITS (bitcast, validity preserved).
    seq_schema = [
        ("doc_id", DICT),
        *([("tokens", tok_type)] if emit_tokens else [("row_mix", pa.int64())]),
        ("n_tok", pa.int32()),
        ("source", DICT),
        ("ingest_ts", pa.timestamp("us")),
        ("__sa", pa.int64()),
    ]

    def pad_seq(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            ["__sa" if c == "seq_no" else c for c in b.column_names]
        )
        if not emit_tokens:
            b = add_row_mix(b).drop_columns(["tokens"]).select(
                [name for name, _ in seq_schema]
            )
        b = _dict_encode(b, ("doc_id", "source"))
        if emit_tokens and narrow_tokens:
            i = b.schema.get_field_index("tokens")
            b = b.set_column(i, "tokens", pc.cast(b["tokens"], tok_type))
        return b.append_column("__side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_attr(b: pa.Table) -> pa.Table:
        b = _dict_encode(b, ("doc_id",))
        n = len(b)
        attr = b["attr_val"]
        if isinstance(attr, pa.ChunkedArray):
            attr = attr.combine_chunks()
        null_mask = attr.is_null().to_numpy(zero_copy_only=False)
        bits = attr.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.int64)
        sa = pa.array(bits, mask=null_mask)
        cols = {}
        for name, typ in seq_schema:
            if name in ("doc_id", "ingest_ts"):
                cols[name] = b[name]
            elif name == "__sa":
                cols[name] = sa
            else:
                cols[name] = pa.nulls(n, typ)
        t = pa.table(cols)
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    s_aug = sequences.map_batches(pad_seq, batch_format="pyarrow", zero_copy_batch=True)
    a_aug = doc_attrs.select_columns(["doc_id", "ingest_ts", "attr_val"]).map_batches(
        pad_attr, batch_format="pyarrow", zero_copy_batch=True
    )
    both = add_bucket_column(s_aug.union(a_aug), key="doc_id", n_buckets=n_buckets, heavy=heavy)

    def per_bucket(group: pa.Table) -> pa.Table:
        group = _dict_decode(group, ("doc_id", "source"))
        side = group["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        ltbl = group.filter(pa.array(side == 0)).drop_columns(["__side", "bucket"])
        # sequence side: the fused slot is seq_no again
        ltbl = ltbl.rename_columns(
            ["seq_no" if c == "__sa" else c for c in ltbl.column_names]
        )
        raw = group.filter(pa.array(side == 1))
        # attr side: un-bitcast the fused slot back to float64 attr_val
        sa = raw["__sa"].combine_chunks()
        null_mask = sa.is_null().to_numpy(zero_copy_only=False)
        vals = sa.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64).view(np.float64)
        rtbl = pa.table(
            {
                "doc_id": raw["doc_id"],
                "ingest_ts": raw["ingest_ts"],
                "attr_val": pa.array(vals, mask=null_mask),
            }
        )
        if emit_tokens:
            # row_mix never rides the exchange: recomputed here from tokens
            ltbl = add_row_mix(ltbl)
        w = window_kernel(ltbl, **window_args)
        out = asof_kernel(
            w, rtbl, by="doc_id", ts_col="ingest_ts", value_cols=["attr_val"],
            vtypes=vtypes, suffix="_asof", strict=False,
        )
        if emit_tokens and narrow_tokens:
            i = out.schema.get_field_index("tokens")
            out = out.set_column(i, "tokens", pc.cast(out["tokens"], pa.list_(pa.int32())))
        return out

    return both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
