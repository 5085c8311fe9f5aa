"""Small shared utilities."""

from __future__ import annotations


def encode_labels(col, lut: dict[str, int], unknown: int = -1):
    """Label column -> int64 codes via ``lut``, touching Python only for
    DISTINCT values: dictionary-encode the Arrow column, map the lut over
    the (tiny) dictionary, then one vectorized take. Replaces the
    per-ROW ``[lut[s] for s in col.to_pylist()]`` pattern in hot paths
    (the count_stats partial kernel's idiom). Values absent from the lut
    map to ``unknown`` — callers decide whether that is an error (train)
    or a row to exclude (validation)."""
    import numpy as np
    import pyarrow as pa

    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    # a null element has a NULL dictionary index — route it to a sentinel
    # slot appended at the end of code_of (plain astype would NaN-cast)
    n_dict = len(d.dictionary)
    idx = pc.fill_null(d.indices, n_dict).to_numpy(zero_copy_only=False).astype(np.int64)
    code_of = np.array(
        [lut.get(str(u), unknown) for u in d.dictionary.to_pylist()] + [unknown],
        dtype=np.int64,
    )
    return code_of[idx] if len(idx) else np.zeros(0, dtype=np.int64)


DICT_STR = None  # populated lazily (pyarrow import kept out of module load)


def dict_encode_batch(b, cols):
    """Exchange-payload slimming: string columns -> per-block dictionary
    arrays (int32 indices + one tiny per-block dict). No global dictionary
    is needed — Arrow unifies dictionaries when the shuffle concatenates
    blocks — so this is scale-safe at 10^9 distinct keys. Non-string /
    missing columns are left untouched. Decode after the shuffle with
    ``dict_decode_batch``."""
    import pyarrow as pa

    target = pa.dictionary(pa.int32(), pa.string())
    for c in cols:
        if c not in b.column_names:
            continue
        col = b[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type):
            col = col.dictionary_encode().cast(target)
        elif pa.types.is_dictionary(col.type):
            col = col.cast(target)
        else:
            continue
        b = b.set_column(b.schema.get_field_index(c), c, col)
    return b


def dict_decode_batch(t, cols):
    """Inverse of ``dict_encode_batch``: cast dictionary columns back to
    plain strings (byte-identical round-trip)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for c in cols:
        if c in t.column_names and pa.types.is_dictionary(t.schema.field(c).type):
            t = t.set_column(t.schema.get_field_index(c), c, pc.cast(t[c], pa.string()))
    return t


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so it can never starve upstream stages.

    An actor pool that reserves every cluster CPU leaves nothing for the
    read/write tasks feeding it and the pipeline stalls (observed with a
    2-actor pool on a 2-CPU cluster). Leave at least 2 CPUs for other
    stages whenever the cluster has more than 2.
    """
    import ray

    try:
        avail = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        avail = 4
    return max(1, min(requested, max(1, avail - 2)))


def pool_bounds(requested) -> tuple[int, int]:
    """``(1, pool_size(requested))`` autoscaling tuple for actor-pool
    ``map_batches`` stages: the pool scales down to one actor on tiny
    inputs (silencing Ray's min-concurrency warning and never deadlocking
    a small session) while capping at the CPU-clamped maximum.  A caller
    that already holds ``(min, max)`` bounds gets its max re-clamped and
    its min floored at 1."""
    if isinstance(requested, tuple):
        lo, hi = requested
        return (max(1, min(int(lo), pool_size(int(hi)))), pool_size(int(hi)))
    return (1, pool_size(requested))


def joint_codes(l_key, r_key):
    """Dictionary-encode two key columns through ONE shared dictionary and
    return (left_codes, right_codes) as int64 — equal values share a code.

    SQL equality semantics for NULL keys: NULL matches nothing, not even
    NULL. Null rows get side-specific sentinel codes (-1 left, -2 right)
    that can never appear in the other side's code space, so inner/semi
    joins never emit NULL=NULL pairs and anti-joins KEEP null-key left rows
    (the NOT EXISTS contract, e.g. the q08 oracle). Composite-key
    arithmetic over the codes stays sound: code c occupies the disjoint
    range [c*m, c*m + m - 1] even for c in {-1, -2}.

    Shared by joins.hash_equi_join, temporal.asof_kernel and
    temporal.range_join_kernel so the NULL-sentinel contract lives in ONE
    place (it has been fixed once before, in commit 2139fa7).
    """
    import numpy as np
    import pyarrow as pa

    nl = len(l_key)
    joint = pa.chunked_array([l_key, r_key]).combine_chunks().dictionary_encode()
    codes = joint.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    lcodes, rcodes = codes[:nl], codes[nl:].copy()
    rcodes[rcodes == -1] = -2
    return lcodes, rcodes
