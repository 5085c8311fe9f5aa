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


def add_row_mix(batch: pa.Table) -> pa.Table:
    """Per-row order-insensitive token mix (int64) — prefix-summable."""
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    mixed = (flat * np.uint64(2654435761)) % np.uint64(1 << 31)
    pad = np.zeros(len(mixed) + 1, dtype=np.uint64)
    np.cumsum(mixed, out=pad[1:])
    row = (pad[offs[1:]] - pad[offs[:-1]]).astype(np.int64)
    return batch.append_column("row_mix", pa.array(row))


def pit_features(
    sequences: Dataset,
    doc_attrs: Dataset | None = None,
    n_buckets: int = 64,
    detect_skew: bool = True,
    session_gap_us: int | None = None,
    validate: bool = False,
    narrow_tokens: bool = False,
    emit_tokens: bool = True,
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
    instead of corrupting. ``row_mix`` is likewise no longer shipped at
    all — it is a pure function of ``tokens`` and is recomputed inside
    the bucket task, saving 8 B/row of exchange payload.

    ``emit_tokens=False`` removes the ``tokens`` column from the OUTPUT
    entirely — for feature-store consumers that keep tokens in the source
    table and only need the derived features. The token lists then never
    ride the exchange at all: ``row_mix`` (8 B/row) is computed BEFORE the
    shuffle and shipped in their place, cutting the dominant remaining
    payload column (~25 B/row avg on the synthetic profiles, more on real
    text). All emitted feature columns are byte-identical to the
    ``emit_tokens=True`` path; the byte-identity contract on ``tokens``
    itself applies only when tokens are emitted.
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
        seq = sequences.map_batches(
            add_row_mix, batch_format="pyarrow", zero_copy_batch=True
        )
        if not emit_tokens:
            seq = seq.drop_columns(["tokens"])
        return windowize(
            seq,
            lag_cols=["n_tok"],
            lead_cols=["n_tok"],
            prefix_sum_cols=["n_tok", "row_mix"],
            sessionize=True,
            session_gap_us=gap,
            n_buckets=n_buckets,
            heavy=heavy,
        )

    import pyarrow.compute as pc

    DICT = pa.dictionary(pa.int32(), pa.string())
    tok_type = pa.list_(pa.int16()) if narrow_tokens else pa.list_(pa.int32())
    # __sa fuses the two side-exclusive int64-wide columns into ONE shuffle
    # slot: sequence rows carry seq_no, attr rows carry attr_val's float64
    # BITS (bitcast, validity preserved) — 8 B/row less exchange payload
    # than shipping seq_no plus a mostly-null attr_val buffer.
    seq_schema = [
        ("doc_id", DICT),
        *([("tokens", tok_type)] if emit_tokens else [("row_mix", pa.int64())]),
        ("n_tok", pa.int32()),
        ("source", DICT),
        ("ingest_ts", pa.timestamp("us")),
        ("__sa", pa.int64()),
    ]
    vtypes = {"attr_val": pa.float64()}

    from modlyn_ray.util import dict_decode_batch as _dict_decode
    from modlyn_ray.util import dict_encode_batch as _dict_encode

    def pad_seq(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            ["__sa" if c == "seq_no" else c for c in b.column_names]
        )
        if not emit_tokens:
            # row_mix rides the exchange (8 B/row) INSTEAD of the token
            # lists — computed pre-shuffle, tokens never leave the read
            # stage; select() also pins the union column order to seq_schema
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
