"""Per-class per-token count statistics — the count-matrix scoring surface.

Re-expresses the reference's feature-ranking statistics (the scores surface
compared against scanpy's rank_genes_groups in
/root/reference/docs/quickstart.ipynb:303-329, and the count-matrix view of
AnnData X — /root/reference/modlyn/models/_simple_logreg_datamodule.py:93) as
an idiomatic Ray Data pipeline:

    map_batches(partial per-(class, token) sums)      # stateless, vectorized
      -> groupby(["source", "token_id"]).aggregate    # ONE shuffle over tiny partials
      -> finalize (broadcast class sizes)              # stateless math
      -> per-token F-score via a second groupby over  # vocab-sized, cheap
         the already-aggregated (K x V) table

The input dataset is never densified: per-batch partials are computed
zero-copy from Arrow list offsets (X[i,j] is implicit — SURVEY.md §2.2 M1),
and the shuffle moves at most (distinct keys per batch) rows per batch, not
the raw data — the "pre-aggregate before groupby" scale pattern.

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

_SENTINEL = -1  # token_id used to carry per-class row counts through the shuffle


def _encode_source(batch: pa.Table) -> tuple[np.ndarray, list[str]]:
    codes = batch["source"].combine_chunks().dictionary_encode()
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    return codes.indices.to_numpy(zero_copy_only=False).astype(np.int64), [
        str(x) for x in codes.dictionary.to_pylist()
    ]


def partial_counts(batch: pa.Table) -> pa.Table:
    """Emit per-(source, token_id) partial sums for one Arrow batch.

    Output rows: (source, token_id, occ, sumsq, df) plus one sentinel row per
    source with token_id=-1 whose ``occ`` is the batch's row count for that
    class (so class sizes ride the same shuffle — no second scan).
    """
    n = len(batch)
    src_codes, src_names = _encode_source(batch)
    toks = batch["tokens"].combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

    vmax = int(flat.max()) + 1 if len(flat) else 1
    # per-(row, token) occurrence counts c_rt — the implicit X[i, j]
    key_rt = row_idx * vmax + flat
    uniq_rt, c_rt = np.unique(key_rt, return_counts=True)
    row_of = uniq_rt // vmax
    tok_of = uniq_rt % vmax
    cls_of = src_codes[row_of]
    # aggregate to (class, token)
    key_ct = cls_of * vmax + tok_of
    uniq_ct, inv = np.unique(key_ct, return_inverse=True)
    occ = np.bincount(inv, weights=c_rt.astype(np.float64))
    sumsq = np.bincount(inv, weights=(c_rt.astype(np.float64)) ** 2)
    df = np.bincount(inv)
    cls_u = uniq_ct // vmax
    tok_u = uniq_ct % vmax

    # sentinel rows: per-class row counts
    cls_rows = np.bincount(src_codes, minlength=len(src_names)).astype(np.float64)
    all_cls = np.concatenate([cls_u, np.arange(len(src_names), dtype=np.int64)])
    all_tok = np.concatenate([tok_u, np.full(len(src_names), _SENTINEL, dtype=np.int64)])
    all_occ = np.concatenate([occ, cls_rows])
    all_sumsq = np.concatenate([sumsq, np.zeros(len(src_names))])
    all_df = np.concatenate([df.astype(np.float64), np.zeros(len(src_names))])

    names = np.asarray(src_names, dtype=object)
    return pa.table(
        {
            "source": pa.array(names[all_cls].tolist(), type=pa.string()),
            "token_id": pa.array(all_tok.astype(np.int32)),
            "occ": pa.array(all_occ),
            "sumsq": pa.array(all_sumsq),
            "df": pa.array(all_df),
        }
    )


def aggregate_partials(ds: Dataset, batch_size: int | None = 65536) -> Dataset:
    """partials -> one shuffled aggregate keyed on (source, token_id)."""
    partials = ds.map_batches(
        partial_counts, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(["source", "token_id"]).aggregate(
        Sum("occ", alias_name="occ"),
        Sum("sumsq", alias_name="sumsq"),
        Sum("df", alias_name="df"),
    )


def count_stats(ds: Dataset, batch_size: int | None = 65536) -> Dataset:
    """Full pipeline: sequences Dataset -> per-(class, token) stats Dataset.

    Result schema: (source, token_id, count: int64, df: int64, freq, mean,
    var, f_score: float64), one row per (class, token) with nonzero support.
    """
    agg = aggregate_partials(ds, batch_size=batch_size)

    # class sizes + token-mass totals: the sentinel slice is K rows — tiny.
    sent = agg.filter(expr=f"token_id == {_SENTINEL}")
    class_rows = {r["source"]: float(r["occ"]) for r in sent.take_all()}
    classes = sorted(class_rows)
    n_total = sum(class_rows.values())
    k_classes = len(classes)

    stats = agg.filter(expr=f"token_id != {_SENTINEL}")

    # class token mass for freq — K rows, driver-side.
    mass_ds = stats.groupby("source").aggregate(Sum("occ", alias_name="mass"))
    class_mass = {r["source"]: float(r["mass"]) for r in mass_ds.take_all()}

    nc_arr = np.array([class_rows[c] for c in classes])
    mass_arr = np.array([max(class_mass.get(c, 0.0), 1.0) for c in classes])
    cls_lut = {c: i for i, c in enumerate(classes)}

    def finalize(batch: pa.Table) -> pa.Table:
        cls_idx = np.array([cls_lut[s] for s in batch["source"].to_pylist()], dtype=np.int64)
        occ = batch["occ"].to_numpy()
        sumsq = batch["sumsq"].to_numpy()
        df = batch["df"].to_numpy()
        n_c = nc_arr[cls_idx]
        mean = occ / n_c
        return pa.table(
            {
                "source": batch["source"],
                "token_id": batch["token_id"],
                "count": pa.array(occ.astype(np.int64)),
                "df": pa.array(df.astype(np.int64)),
                "freq": pa.array(occ / mass_arr[cls_idx]),
                "mean": pa.array(mean),
                "var": pa.array(sumsq / n_c - mean**2),
                "occ2n": pa.array(occ**2 / n_c),
                "sumsq_": pa.array(sumsq),
                "occ_": pa.array(occ),
            }
        )

    with_partials = stats.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)

    # per-token F across classes over the (<= K x V)-row aggregated table
    ftok = with_partials.groupby("token_id").aggregate(
        Sum("occ2n", alias_name="s_occ2n"),
        Sum("sumsq_", alias_name="s_sumsq"),
        Sum("occ_", alias_name="s_occ"),
    )

    def f_math(batch: pa.Table) -> pa.Table:
        s_occ2n = batch["s_occ2n"].to_numpy()
        s_sumsq = batch["s_sumsq"].to_numpy()
        s_occ = batch["s_occ"].to_numpy()
        if k_classes > 1 and n_total > k_classes:
            between = (s_occ2n - s_occ**2 / n_total) / (k_classes - 1)
            within = (s_sumsq - s_occ2n) / (n_total - k_classes)
            f = np.where(within > 1e-12, between / np.where(within > 1e-12, within, 1.0), 0.0)
        else:
            f = np.zeros(len(batch))
        return pa.table({"token_id": batch["token_id"], "f_score": pa.array(f)})

    f_tbl = ftok.map_batches(f_math, batch_format="pyarrow")
    # vocab-sized (small) -> broadcast join into the class rows via ray.put
    f_pd = f_tbl.to_pandas()
    f_ref = ray.put(dict(zip(f_pd["token_id"].to_numpy(), f_pd["f_score"].to_numpy())))

    def join_f(batch: pa.Table) -> pa.Table:
        fmap = ray.get(f_ref)
        toks = batch["token_id"].to_numpy()
        f = np.array([fmap.get(int(t), 0.0) for t in toks])
        return batch.drop_columns(["occ2n", "sumsq_", "occ_"]).append_column(
            "f_score", pa.array(f)
        )

    return with_partials.map_batches(join_f, batch_format="pyarrow")
