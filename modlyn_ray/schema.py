"""Canonical Arrow schemas and validation for the engine's tables.

The primary table mirrors the reference's AnnData contract (a labeled count
matrix — /root/reference/modlyn/models/_simple_logreg_model.py:44-45) as a
Parquet table of pre-tokenized sequences, plus the two temporal columns the
north rule requires (ingest_ts event time, seq_no deterministic tie-break).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# sequences — the primary input (BASELINE.json input_hint + temporal columns)
# ---------------------------------------------------------------------------
SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("ingest_ts", pa.timestamp("us")),
        pa.field("seq_no", pa.int64()),
    ]
)

# doc_attrs — the as-of right side: slowly-changing attributes per doc.
DOC_ATTRS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("ingest_ts", pa.timestamp("us")),
        pa.field("attr_val", pa.float64()),
    ]
)

# Tall scores table — the engine's equivalent of the reference's wide
# classes×features weights frame (_simple_logreg_model.py:170-192); tall
# because vocab can be huge. ``method`` mirrors df.attrs["method_name"].
SCORES_SCHEMA = pa.schema(
    [
        pa.field("class", pa.string()),
        pa.field("token_id", pa.int32()),
        pa.field("score", pa.float64()),
        pa.field("method", pa.string()),
    ]
)


class SchemaError(ValueError):
    pass


def validate_sequences_batch(batch: pa.Table) -> pa.Table:
    """Validate the per-row invariants of a sequences batch (zero-copy).

    Checks: required columns present, tokens is list<int32> (or large_list),
    and ``n_tok == len(tokens)`` for every row (FIXTURES.md §4.2).
    Returns the batch unchanged so it can run inline as a map_batches stage.
    """
    names = set(batch.column_names)
    missing = {"doc_id", "tokens", "n_tok", "source"} - names
    if missing:
        raise SchemaError(f"sequences batch missing columns: {sorted(missing)}")
    tok_type = batch.schema.field("tokens").type
    if not (pa.types.is_list(tok_type) or pa.types.is_large_list(tok_type)):
        raise SchemaError(f"tokens must be list<int32>, got {tok_type}")
    if tok_type.value_type != pa.int32():
        raise SchemaError(f"tokens element must be int32, got {tok_type.value_type}")
    lengths = pc.list_value_length(batch["tokens"]).cast(pa.int32())
    eq = pc.equal(lengths, batch["n_tok"].combine_chunks())
    # nulls in tokens/n_tok make eq null — pc.all would SKIP them (a null
    # row validating cleanly) and over zero rows returns null (a spurious
    # failure on empty blocks); check both explicitly
    if eq.null_count:
        raise SchemaError("null tokens or n_tok — the invariant needs both")
    if len(eq) and not pc.all(eq).as_py():
        raise SchemaError("n_tok != len(tokens) for at least one row")
    return batch


def tokens_checksum(batch: pa.Table) -> int:
    """Order-insensitive checksum over the token payload of a batch.

    Used by lineage manifests to prove token byte-identity across stages
    without materializing both sides (BASELINE.json per-row invariant).
    Sums a per-row mix of (doc-local token values) so the check is invariant
    to row order but sensitive to any token value/length change.
    """
    import numpy as np

    col = batch["tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # sliced arrays have non-zero starting offset
    # +1 so token id 0 contributes (0 * C == 0 made the checksum blind to
    # adding/dropping id-0 tokens — the most frequent token under Zipf)
    mixed = ((flat + np.uint64(1)) * np.uint64(2654435761)) % np.uint64(1 << 61)
    pad = np.zeros(len(mixed) + 1, dtype=np.uint64)
    np.cumsum(mixed, out=pad[1:])
    row_sum = pad[offs[1:]] - pad[offs[:-1]]
    acc = int(((row_sum + np.uint64(1469598103934665603)) % np.uint64(1 << 61)).sum())
    return acc % (1 << 61)
