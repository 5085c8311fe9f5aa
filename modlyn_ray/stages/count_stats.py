"""Per-class per-token count statistics — the count-matrix scoring surface.

Re-expresses the reference's feature-ranking statistics (the scores surface
compared against scanpy's rank_genes_groups in
/root/reference/docs/quickstart.ipynb:303-329, and the count-matrix view of
AnnData X — /root/reference/modlyn/models/_simple_logreg_datamodule.py:93) as
an idiomatic Ray Data pipeline:

    map_batches(partial per-(class, token) sums)      # stateless, vectorized
      -> groupby(key).aggregate                       # ONE shuffle over tiny partials
      -> finalize (broadcast class sizes)              # stateless math
      -> per-token F-score via a second groupby over  # vocab-sized, cheap
         the already-aggregated (K x V) table

Scale notes:
- the input is never densified: per-batch partials are computed zero-copy
  from Arrow list offsets (X[i,j] is implicit — SURVEY.md §2.2 M1)
- the shuffle key is a SINGLE packed int64 ``key = class_code << 32 |
  token_id`` — grouping by an int column is far cheaper than a
  (string, int) composite at millions of partial rows
- class codes come from the lexicographically sorted label set (the
  LabelEncoder analog, computed once and broadcast — M3); sentinel token
  0xFFFFFFFF carries per-class row counts through the same shuffle so no
  second input scan is needed
- intermediate aggregates (<= K x V rows) are materialized once because
  they feed three consumers — without that, Ray's lazy execution re-runs
  the full input scan per consumer.

Statistics per (class c, token j), over per-sequence counts X[i,j]:
    count  = sum_i X            (total occurrences)
    df     = #{i : X > 0}       (document frequency)
    freq   = count / class token mass
    mean   = count / n_c        (n_c = ALL sequences in the class)
    var    = population variance including zero rows
    f_score= one-way ANOVA F over classes (same for every class row):
        between = (sum_c count_c^2 / n_c - total^2 / N) / (K - 1)
        within  = (sum_c sumsq_c - sum_c count_c^2 / n_c) / (N - K)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

_SENT = (1 << 32) - 1  # token slot carrying per-class row counts


def _row_stats(occ, sumsq, n_c, mass_c):
    """Shared per-(class, token) row math: (mean, var, freq, occ^2/n_c).
    Used by BOTH the tree-reduce finalize and the shuffle-aggregate path —
    keep the formulas in one place so the two paths can never drift."""
    mean = occ / n_c
    return mean, sumsq / n_c - mean**2, occ / mass_c, occ**2 / n_c


def _f_formula(s_occ2n, s_sumsq, s_occ, n_total, k_classes):
    """Shared one-way ANOVA F over classes, incl. the within>1e-12
    degenerate-case convention (documented in oracle.py: f_score = 0 where
    the within-class mean square is ~0)."""
    if k_classes > 1 and n_total > k_classes:
        between = (s_occ2n - s_occ**2 / n_total) / (k_classes - 1)
        within = (s_sumsq - s_occ2n) / (n_total - k_classes)
        return np.where(
            within > 1e-12, between / np.where(within > 1e-12, within, 1.0), 0.0
        )
    return np.zeros(len(np.atleast_1d(s_occ2n)))



def _row_token_counts(flat: np.ndarray, lens: np.ndarray, vmax: int):
    """Per-(row, token) occurrence counts -> (row_of, tok_of, c_rt).

    Fast path: pad rows to Lmax into an int32 matrix, sort each ROW
    (cache-local, int32) and run-length the sorted rows with pure index
    arithmetic. Measured ~2.5x faster than the global ``np.unique`` sort
    over int64 (row, token) keys, which dominated the partial kernel at
    32M rows — the padded sort touches 1/2 the bytes and never leaves
    L1-sized row segments. Guarded to inputs where padding stays within
    4x the real token count (synth corpus: Lmax 48 vs mean 24.5 -> ~2x)
    and the padded matrix stays <= 32M cells; anything else falls back to
    the sort-based path below.
    """
    n = len(lens)
    total = int(flat.size)
    if total == 0 or n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    Lmax = int(lens.max())
    padded = n * Lmax
    fmin = int(flat.min())
    if fmin < 0:
        # token ids are vocab indices; a negative id would silently wrap on
        # the narrow padded path AND break the row*vmax+tok packing's
        # injectivity on the fallback path — fail loudly instead
        raise ValueError(f"count_stats: negative token id {fmin} in batch")
    if vmax < np.iinfo(np.int32).max and padded <= 4 * total and padded <= (1 << 25):
        # uint16 when the vocab fits (token ids in [0, 65534)): the row
        # sort is memory-bandwidth-bound, so halving the element width
        # halves the kernel's dominant traffic (the stats phase's measured
        # scaling residual on the 32M-row corpus is exactly this kernel).
        dt = np.uint16 if vmax < np.iinfo(np.uint16).max else np.int32
        M = np.full((n, Lmax), vmax, dtype=dt)
        M[np.arange(Lmax) < lens[:, None]] = flat
        M.sort(axis=1)
        F = M.ravel()
        is_start = np.empty(padded, dtype=bool)
        is_start[0] = True
        np.not_equal(F[1:], F[:-1], out=is_start[1:])
        is_start[::Lmax] = True  # runs never span row boundaries
        starts = np.flatnonzero(is_start)
        run_vals = F[starts]
        keep = run_vals != vmax  # drop the per-row padding run
        run_len = np.diff(starts, append=padded)
        return (
            (starts[keep] // Lmax).astype(np.int64),
            run_vals[keep].astype(np.int64),
            run_len[keep].astype(np.int64),
        )
    # fallback: one global sort over packed (row, token) int64 keys
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    key_rt = row_idx * vmax + flat.astype(np.int64)
    uniq_rt, c_rt = np.unique(key_rt, return_counts=True)
    return uniq_rt // vmax, uniq_rt % vmax, c_rt


def make_partial_counts(class_lut: dict[str, int]):
    """Build the per-batch partial kernel with a broadcast class->code map."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        from modlyn_ray.util import encode_labels

        n = len(batch)
        src_codes = encode_labels(batch["source"], class_lut)
        if n and int(src_codes.min()) < 0:
            # null or unknown label: fail with a clear message instead of a
            # bare KeyError / garbage NaN-cast index deep in a Ray worker
            raise ValueError(
                "count_stats: 'source' contains a null or a label absent "
                "from the class set — pass classes= covering every label"
            )

        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(offs - offs[0])

        vmax = int(flat.max()) + 1 if len(flat) else 1
        if vmax > _SENT:
            # tok == 2^32-1 would collide with the per-class sentinel slot
            # and larger ids would bleed into the class bits of the packed
            # (cls << 32 | tok) key — fail loudly, mirroring the negative-id
            # guard in _row_token_counts
            raise ValueError(
                f"count_stats: token id {vmax - 1} exceeds the 2^32-2 packed "
                "key space — remap the vocabulary upstream"
            )
        row_of, tok_of, c_rt = _row_token_counts(flat, lens, vmax)
        cls_of = src_codes[row_of]
        key_ct = cls_of * vmax + tok_of
        kspace = len(class_lut) * vmax
        c_rt_f = c_rt.astype(np.float64)
        if kspace <= 1 << 26:
            # bounded (class, token) space: direct bincount — no second
            # O(n log n) sort over the ~tokens-sized run array (the partial
            # kernel is the stats phase's dominant cost at 32M rows)
            occ_d = np.bincount(key_ct, weights=c_rt_f, minlength=kspace)
            nz = np.flatnonzero(occ_d)
            occ = occ_d[nz]
            sumsq = np.bincount(key_ct, weights=c_rt_f**2, minlength=kspace)[nz]
            df = np.bincount(key_ct, minlength=kspace)[nz].astype(np.float64)
            uniq_ct = nz
        else:
            # huge-vocab fallback: unbounded key space, sort-based combine
            uniq_ct, inv = np.unique(key_ct, return_inverse=True)
            occ = np.bincount(inv, weights=c_rt_f)
            sumsq = np.bincount(inv, weights=c_rt_f**2)
            df = np.bincount(inv).astype(np.float64)
        packed = ((uniq_ct // vmax) << 32) | (uniq_ct % vmax)

        cls_rows = np.bincount(src_codes, minlength=len(class_lut)).astype(np.float64)
        present = np.flatnonzero(cls_rows)
        sent_key = (present << 32) | _SENT
        return pa.table(
            {
                "key": pa.array(np.concatenate([packed, sent_key])),
                "occ": pa.array(np.concatenate([occ, cls_rows[present]])),
                "sumsq": pa.array(np.concatenate([sumsq, np.zeros(len(present))])),
                "df": pa.array(np.concatenate([df, np.zeros(len(present))])),
            }
        )

    return partial_counts


def combine_partials(b: pa.Table) -> pa.Table:
    """Second-level local combiner: merge partial rows by key inside one
    task before the global shuffle (tree pre-aggregation). Cuts shuffle
    input by ~an order of magnitude when read blocks are small."""
    key = b["key"].to_numpy()
    uniq, inv = np.unique(key, return_inverse=True)
    return pa.table(
        {
            "key": pa.array(uniq),
            "occ": pa.array(np.bincount(inv, weights=b["occ"].to_numpy())),
            "sumsq": pa.array(np.bincount(inv, weights=b["sumsq"].to_numpy())),
            "df": pa.array(np.bincount(inv, weights=b["df"].to_numpy())),
        }
    )


def _combine_state(keys, occ, sumsq, df):
    """Canonicalize a state: sum duplicate keys (a raw partial table may
    contain the same key several times — one per source batch)."""
    uniq, inv = np.unique(keys, return_inverse=True)
    return (
        uniq,
        np.bincount(inv, weights=occ),
        np.bincount(inv, weights=sumsq),
        np.bincount(inv, weights=df),
    )


def _merge_states(a, b):
    """Pairwise merge of (keys, occ, sumsq, df) sketch states. Always
    canonicalizes, so raw (possibly duplicate-keyed) inputs are safe."""
    if a is None and b is None:
        return None
    if a is None:
        return _combine_state(*b)
    if b is None:
        return _combine_state(*a)
    return _combine_state(
        np.concatenate([a[0], b[0]]),
        np.concatenate([a[1], b[1]]),
        np.concatenate([a[2], b[2]]),
        np.concatenate([a[3], b[3]]),
    )


@ray.remote
def _merge_block_refs(*tables: pa.Table):
    """Merge a fan-in of partial tables (or prior merged states) into one
    combined (keys, occ, sumsq, df) state tuple.

    Fast path: when the (class, token) key space is bounded (it is by
    construction on the tree path — the huge-vocab case routes through
    shuffle_aggregate), accumulate each input straight into dense
    per-slot arrays with np.bincount — O(n), no sort, no concat. The
    previous pairwise concat+np.unique merge was O(fan_in * n log n) and
    measured 4.2 s per 8-way merge of ~2.6M-row blocks; the dense path
    does the same merge in ~0.3 s. Inputs whose token ids exceed the
    2^26-slot budget fall back to one batched concat+unique (still one
    sort instead of fan_in of them)."""
    states = []
    for t in tables:
        if t is None:
            continue
        if isinstance(t, tuple):
            states.append(tuple(np.asarray(x) for x in t))
        else:
            states.append(
                (
                    t["key"].to_numpy(),
                    t["occ"].to_numpy(),
                    t["sumsq"].to_numpy(),
                    t["df"].to_numpy(),
                )
            )
    states = [s for s in states if len(s[0])]
    if not states:
        return None
    # bounded-key-space probe: token slots below vmax plus the sentinel
    tmax = 0
    kmax = 0
    for keys, *_ in states:
        keys = keys.astype(np.int64, copy=False)
        tok = keys & _SENT
        cls = keys >> 32
        real = tok[tok != _SENT]
        if len(real):
            tmax = max(tmax, int(real.max()))
        kmax = max(kmax, int(cls.max()) + 1)
    n_slots = tmax + 2  # [0, tmax] real tokens + one sentinel slot
    kspace = kmax * n_slots
    if kspace <= (1 << 26):
        occ_d = np.zeros(kspace, dtype=np.float64)
        sumsq_d = np.zeros(kspace, dtype=np.float64)
        df_d = np.zeros(kspace, dtype=np.float64)
        for keys, occ, sumsq, df in states:
            keys = keys.astype(np.int64, copy=False)
            tok = keys & _SENT
            cls = keys >> 32
            slot = cls * n_slots + np.where(tok == _SENT, tmax + 1, tok)
            occ_d += np.bincount(slot, weights=occ, minlength=kspace)
            sumsq_d += np.bincount(slot, weights=sumsq, minlength=kspace)
            df_d += np.bincount(slot, weights=df, minlength=kspace)
        nz = np.flatnonzero(occ_d)
        cls = nz // n_slots
        tokslot = nz % n_slots
        tok = np.where(tokslot == tmax + 1, _SENT, tokslot)
        return ((cls << 32) | tok, occ_d[nz], sumsq_d[nz], df_d[nz])
    # unbounded fallback: one batched concat + canonicalize (single sort)
    return _combine_state(
        np.concatenate([s[0] for s in states]),
        np.concatenate([s[1] for s in states]),
        np.concatenate([s[2] for s in states]),
        np.concatenate([s[3] for s in states]),
    )


def tree_reduce_partials(partials: Dataset, fan_in: int = 8, canonical_blocks: bool = False):
    """Distributed fan-in tree reduce over the partial blocks (parallel
    merges, log depth) — replaces Ray Data's serial ungrouped aggregate.

    ``canonical_blocks=True`` (set when the partial kernel ran once per
    BLOCK, so every block already holds unique keys) skips the level-0
    per-block canonicalize pass and tree-merges the raw refs directly:
    the level-0 round-trip measured 3.1 s at 8 CPUs and 4.2-5.8 s at 32
    (object-store contention makes it anti-scale) for zero work — an
    8-way merge over <= K x V-row canonical blocks is ~2M-row np.unique
    per task either way. When the kernel ran per 32k-row BATCH instead,
    Ray coalesces many batch outputs into one materialized block with
    ~10x the K x V key space in duplicate keys, and the per-block
    pre-combine at full map parallelism still pays for itself."""
    refs = list(partials.to_arrow_refs())
    if not refs:
        return (np.array([], dtype=np.int64), np.array([]), np.array([]), np.array([]))
    if not canonical_blocks or len(refs) == 1:
        # level 0: per-block canonicalize (duplicate-keyed raw blocks; the
        # single-block case also converts the Table ref to a state tuple)
        refs = [_merge_block_refs.remote(r) for r in refs]
    while len(refs) > 1:
        refs = [
            _merge_block_refs.remote(*refs[i : i + fan_in])
            for i in range(0, len(refs), fan_in)
        ]
    state = ray.get(refs[0])
    if state is None:
        return (np.array([], dtype=np.int64), np.array([]), np.array([]), np.array([]))
    return state


def _state_to_dataset(state) -> Dataset:
    import ray.data as rd

    keys, occ, sumsq, df = state
    return rd.from_arrow(
        pa.table(
            {
                "key": pa.array(np.asarray(keys, dtype=np.int64)),
                "occ": pa.array(np.asarray(occ, dtype=np.float64)),
                "sumsq": pa.array(np.asarray(sumsq, dtype=np.float64)),
                "df": pa.array(np.asarray(df, dtype=np.float64)),
            }
        )
    )


def _finalize_state_numpy(state, class_names: np.ndarray, k_classes: int) -> pa.Table:
    """Vectorized driver-side finalization of a reduced sketch state:
    per-(class, token) count/df/freq/mean/var + per-token ANOVA F."""
    keys, occ, sumsq, df = (np.asarray(x) for x in state)
    keys = keys.astype(np.int64)
    sent_mask = (keys & _SENT) == _SENT
    nc_arr = np.zeros(k_classes, dtype=np.float64)
    nc_arr[(keys[sent_mask] >> 32)] = occ[sent_mask]
    n_total = float(nc_arr.sum())

    keys, occ, sumsq, df = keys[~sent_mask], occ[~sent_mask], sumsq[~sent_mask], df[~sent_mask]
    cls_idx = (keys >> 32).astype(np.int64)
    tok = (keys & _SENT).astype(np.int64)
    n_c = nc_arr[cls_idx]
    mass = np.maximum(np.bincount(cls_idx, weights=occ, minlength=k_classes), 1.0)
    mean, var, freq, occ2n = _row_stats(occ, sumsq, n_c, mass[cls_idx])

    # per-token F over classes (dense arrays indexed by token id)
    vmax = int(tok.max()) + 1 if len(tok) else 1
    s_occ2n = np.bincount(tok, weights=occ2n, minlength=vmax)
    s_sumsq = np.bincount(tok, weights=sumsq, minlength=vmax)
    s_occ = np.bincount(tok, weights=occ, minlength=vmax)
    f_tok = _f_formula(s_occ2n, s_sumsq, s_occ, n_total, k_classes)

    return pa.table(
        {
            "source": pa.array(class_names[cls_idx].tolist(), type=pa.string()),
            "token_id": pa.array(tok.astype(np.int32)),
            "count": pa.array(occ.astype(np.int64)),
            "df": pa.array(df.astype(np.int64)),
            "freq": pa.array(freq),
            "mean": pa.array(mean),
            "var": pa.array(var),
            "f_score": pa.array(f_tok[tok]),
        }
    )


def count_stats(
    ds: Dataset,
    batch_size: int | None = None,
    classes: list[str] | None = None,
    shuffle_aggregate: bool = False,
) -> Dataset:
    """Full pipeline: sequences Dataset -> per-(class, token) stats Dataset.

    Result schema: (source, token_id, count: int64, df: int64, freq, mean,
    var, f_score: float64), one row per (class, token) with nonzero support.

    ``batch_size`` feeds the partial kernel; the default (None) hands the
    kernel whatever the upstream pipeline yields — for a parquet read,
    the READER's record batches (Ray's default ~10k rows), NOT whole
    blocks. Each tiny batch re-emits its slice of the (class, token) key
    space, so the raw partials stream is ~11x the key space on the
    32M-row corpus (64 blocks x 2.6M rows, ~5.4 GB). Three measured
    NON-fixes (leave batch_size alone — BASELINE.md "Stats-phase
    decomposition"): an explicit kernel ``batch_size`` makes Ray's
    batcher concatenate the wide token-list column before every call
    (map 21 -> 37 s); a fused combine stage with explicit batch_size hits
    the same batcher pathology (44-102 s end-to-end); reader-level
    ``read_parquet(batch_size=250_000)`` is ALSO pathological (4-cycle
    interleaved medians 59.5 s vs 17.6 s default). The inflated partial
    stream is instead absorbed by the reduce: ``_merge_block_refs``
    accumulates its whole fan-in into dense per-slot arrays with
    np.bincount — one O(n) pass, no concat, no sort — so the ~11x
    duplication costs bincount adds, not comparison sorts.
    """
    if classes is None:
        # LabelEncoder.classes_ analog. Project to the source column FIRST
        # (parquet projection pushdown: only that column leaves storage)
        # and reduce every block to its distinct values before the global
        # unique — Dataset.unique() alone aggregates over full-width
        # blocks, which cost a second full-corpus scan per call here.
        import pyarrow.compute as _pc

        proj = ds.select_columns(["source"]).map_batches(
            lambda b: pa.table({"source": _pc.unique(b["source"])}),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        classes = sorted(proj.unique("source"))
    class_lut = {c: i for i, c in enumerate(classes)}
    class_names = np.asarray(classes, dtype=object)
    k_classes = len(classes)

    # the partial kernel touches ONLY (source, tokens). Ray 2.49 has no
    # projection-pushdown rule and never fuses ReadParquet with downstream
    # maps, so a select_columns here does NOT prune the file read — callers
    # on the hot path should pass ``read_parquet(..., columns=["source",
    # "tokens"])`` so pruning happens inside the reader itself. The
    # projection below is then skipped entirely (no extra Project
    # operator); for wider inputs it still bounds what the kernel ships.
    schema = ds.schema(fetch_if_missing=False)
    if schema is None or set(schema.names) != {"source", "tokens"}:
        ds = ds.select_columns(["source", "tokens"])

    partials = ds.map_batches(
        make_partial_counts(class_lut),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if shuffle_aggregate:
        # hash-shuffle path: unbounded key spaces (huge vocab x classes).
        # combine_partials first: a block holds several batch outputs, so a
        # local merge by key cuts the shuffle input before the exchange.
        # NOTE: no explicit batch_size here — Ray's batcher concatenates
        # accumulated batches before every UDF call and measured 5-10x
        # slower than the no-op combine it replaces (see docstring); the
        # real pre-aggregation lever is the READER batch size.
        combined = partials.map_batches(
            combine_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        agg = (
            combined.groupby("key")
            .aggregate(
                Sum("occ", alias_name="occ"),
                Sum("sumsq", alias_name="sumsq"),
                Sum("df", alias_name="df"),
            )
            .materialize()  # consumed by sentinel slice + mass + finalize below
        )
    else:
        # tree-reduce path (default): the accumulator is a mergeable sketch
        # of (key -> occ/sumsq/df) arrays — the north-star "running
        # sum/sumsq/count sketches per token id". Partial blocks are merged
        # by PARALLEL ray tasks in a fan-in tree (Ray Data's ungrouped
        # aggregate folds all blocks in a single task — serial — so we run
        # the tree explicitly over the block refs). Final state is bounded
        # by K x V keys, so the finalization math runs vectorized on the
        # driver in one shot — spinning five tiny Ray pipelines for a
        # 262k-row table costs ~10x the math itself in orchestration.
        import ray.data as rd

        # the tree's merges canonicalize every input (dense bincount
        # accumulation — see _merge_block_refs), so no separate level-0
        # pre-combine pass is needed and the reader-batch-sized partial
        # duplication is absorbed at O(n)
        state = tree_reduce_partials(partials, canonical_blocks=True)
        return rd.from_arrow(
            _finalize_state_numpy(state, class_names, k_classes)
        )

    def _split(want_sentinel: bool):
        def fn(b: pa.Table) -> pa.Table:
            mask = (b["key"].to_numpy() & _SENT) == _SENT
            return b.filter(pa.array(mask if want_sentinel else ~mask))

        return fn

    sent = agg.map_batches(_split(True), batch_format="pyarrow").take_all()
    nc_arr = np.zeros(k_classes, dtype=np.float64)
    for r in sent:
        nc_arr[r["key"] >> 32] = r["occ"]
    n_total = float(nc_arr.sum())

    stats = agg.map_batches(_split(False), batch_format="pyarrow")

    # class token mass for freq: K values, via a tiny driver-side reduction
    mass_parts = stats.map_batches(
        lambda b: pa.table(
            {
                "cls": pa.array((b["key"].to_numpy() >> 32).astype(np.int64)),
                "occ": b["occ"],
            }
        ),
        batch_format="pyarrow",
    )
    mass_arr = np.ones(k_classes, dtype=np.float64)
    for b in mass_parts.groupby("cls").aggregate(Sum("occ", alias_name="m")).take_all():
        mass_arr[b["cls"]] = max(b["m"], 1.0)

    def finalize(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy()
        cls_idx = (key >> 32).astype(np.int64)
        tok = (key & _SENT).astype(np.int32)
        occ = batch["occ"].to_numpy()
        sumsq = batch["sumsq"].to_numpy()
        df = batch["df"].to_numpy()
        n_c = nc_arr[cls_idx]
        mean, var, freq, occ2n = _row_stats(occ, sumsq, n_c, mass_arr[cls_idx])
        return pa.table(
            {
                "source": pa.array(class_names[cls_idx].tolist(), type=pa.string()),
                "token_id": pa.array(tok),
                "count": pa.array(occ.astype(np.int64)),
                "df": pa.array(df.astype(np.int64)),
                "freq": pa.array(freq),
                "mean": pa.array(mean),
                "var": pa.array(var),
                "occ2n": pa.array(occ2n),
                "sumsq_": pa.array(sumsq),
                "occ_": pa.array(occ),
            }
        )

    with_partials = stats.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused by the F-score aggregate AND the final join

    ftok = with_partials.groupby("token_id").aggregate(
        Sum("occ2n", alias_name="s_occ2n"),
        Sum("sumsq_", alias_name="s_sumsq"),
        Sum("occ_", alias_name="s_occ"),
    )

    def f_math(batch: pa.Table) -> pa.Table:
        s_occ2n = batch["s_occ2n"].to_numpy()
        s_sumsq = batch["s_sumsq"].to_numpy()
        s_occ = batch["s_occ"].to_numpy()
        f = _f_formula(s_occ2n, s_sumsq, s_occ, n_total, k_classes)
        return pa.table({"token_id": batch["token_id"], "f_score": pa.array(f)})

    f_pd = ftok.map_batches(f_math, batch_format="pyarrow").to_pandas()
    tok_ids = f_pd["token_id"].to_numpy().astype(np.int64)
    dense = np.zeros(int(tok_ids.max()) + 1 if len(tok_ids) else 1, dtype=np.float64)
    dense[tok_ids] = f_pd["f_score"].to_numpy()
    f_ref = ray.put(dense)

    def join_f(batch: pa.Table) -> pa.Table:
        fmap = ray.get(f_ref)
        toks = batch["token_id"].to_numpy().astype(np.int64)
        f = np.where(toks < len(fmap), fmap[np.minimum(toks, len(fmap) - 1)], 0.0)
        return batch.drop_columns(["occ2n", "sumsq_", "occ_"]).append_column(
            "f_score", pa.array(f)
        )

    return with_partials.map_batches(join_f, batch_format="pyarrow")


# Backwards-compatible alias used by tests/benchmarks: emit partials for one
# in-memory table (diagnostics only).
def partial_counts(batch: pa.Table) -> pa.Table:
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    classes = sorted({str(x) for x in src.unique().to_pylist()})
    return make_partial_counts({c: i for i, c in enumerate(classes)})(batch)
