"""Distributed statistical aggregates beyond Ray Data's built-ins.

- ``grouped_quantiles`` — EXACT per-group quantiles (SQL percentile_cont
  semantics, linear interpolation) without a global sort: per-batch
  (group, value) -> count histograms pre-aggregated in ``map_batches``
  (the shuffle ships one row per DISTINCT (group, value) pair per batch,
  never the raw rows), then one ``groupby(group).map_groups`` finalize that
  sorts each group's merged histogram and reads the quantiles off the
  cumulative counts. Same histogram-ranks trick as the Wilcoxon stage
  (rank_stats.py) — heavily duplicated values collapse; worst case
  (all-distinct doubles) degrades to a per-group sort of distinct values,
  still bounded by group size, and the partial histograms keep the exchange
  no larger than the input.

- ``grouped_corr`` — per-group Pearson correlation from mergeable moment
  sketches (n, Σx, Σy, Σx², Σy², Σxy): per-batch partials in map_batches,
  one tiny groupby-sum, closed-form finalize on the driver-side result
  blocks. One shuffle of K rows per batch (K = number of groups).

No reference analog (the reference delegates statistics to scanpy/pandas,
SURVEY.md §2.5); these are the engine's A-class extensions for
training-data QA at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def grouped_quantiles(
    ds: Dataset,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    exact: bool = True,
    sketch_size: int = 256,
) -> Dataset:
    """Per-group quantiles of ``value_col`` at each q in ``qs``
    (percentile_cont / numpy-linear interpolation: position q*(n-1)).

    ``exact=True`` (default): exact-by-histogram — the shuffle ships one row
    per DISTINCT (group, value) pair per batch. Right for discrete /
    heavily-duplicated values (and for oracle parity), but a CONTINUOUS
    float column at 100 TB has distinct≈rows, so the exchange degenerates
    to O(n) into single per-group tasks.

    ``exact=False``: mergeable equal-frequency quantile sketch — each batch
    summarizes every group to at most ``sketch_size`` weighted points (the
    stratum-midpoint order statistics of the batch's sorted values, weights
    = stratum widths), the shuffle ships only those K·B summary rows, and
    the finalize interpolates the weighted CDF. Deterministic, partition-
    invariant rank-error bound: each batch contributes at most
    n_batch/(2·K) rank uncertainty, so the merged estimate is within
    n/(2·sketch_size) ranks of exact REGARDLESS of how rows are split into
    batches — sketch_size=256 → ≤0.2% rank error. This is the 100 TB path
    for continuous values: bounded exchange, bounded per-group finalize
    state (K rows per batch per group).

    Output: one row per (group, q): ``group_cols... , q, value``.
    """
    group_cols = list(group_cols or [])
    qs_arr = np.asarray(sorted(qs), dtype=np.float64)
    if not exact:
        return _sketch_quantiles(ds, value_col, qs_arr, group_cols, sketch_size)

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_cols + [value_col]).to_pandas()
        h = (
            df.groupby(group_cols + [value_col], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        h["n"] = h["n"].astype(np.int64)
        return pa.Table.from_pandas(h, preserve_index=False).replace_schema_metadata(None)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(value_col, as_index=False)["n"].sum().sort_values(value_col)
        vals = h[value_col].to_numpy(dtype=np.float64)
        cc = np.cumsum(h["n"].to_numpy(dtype=np.int64))
        ntot = int(cc[-1])
        pos = qs_arr * (ntot - 1)
        k = np.floor(pos).astype(np.int64)
        frac = pos - k
        v_lo = vals[np.searchsorted(cc, k, side="right")]
        v_hi = vals[np.searchsorted(cc, np.minimum(k + 1, ntot - 1), side="right")]
        out = {c: np.repeat(g[c].iloc[0], len(qs_arr)) for c in group_cols}
        out["q"] = qs_arr
        out["value"] = v_lo + frac * (v_hi - v_lo)
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if not group_cols:
        # global quantiles: collapse through a single synthetic group
        partials = partials.map_batches(
            lambda b: b.append_column(
                "__g", pa.array(np.zeros(len(b), dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        res = partials.groupby("__g").map_groups(finalize, batch_format="pandas")
        return res
    return partials.groupby(group_cols).map_groups(finalize, batch_format="pandas")


def _sketch_quantiles(
    ds: Dataset,
    value_col: str,
    qs_arr: np.ndarray,
    group_cols: list[str],
    sketch_size: int,
) -> Dataset:
    """Equal-frequency weighted-summary sketch (grouped_quantiles
    exact=False). Per-batch: sort each group's values once (numpy C sort),
    keep the K stratum-midpoint order statistics with stratum widths as
    integer weights (Σw = n, no mass lost). Finalize: sort the ≤K·B merged
    summary points, interpolate the target ranks on the weighted CDF at the
    points' midpoint ranks. The per-group Python loop inside a batch is
    bounded by the number of groups co-resident in that batch — quantile
    group keys are categorical by contract (same as the exact path's
    finalize fan-out)."""
    K = int(sketch_size)
    if K < 2:
        raise ValueError(f"sketch_size must be >= 2, got {sketch_size}")

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_cols + [value_col]).to_pandas()
        out_g: dict[str, list] = {c: [] for c in group_cols}
        out_v: list[np.ndarray] = []
        out_w: list[np.ndarray] = []
        groups = (
            df.groupby(group_cols, sort=False, dropna=True)
            if group_cols
            else [((), df)]
        )
        for key, sub in groups:
            v = np.sort(sub[value_col].to_numpy(dtype=np.float64))
            v = v[~np.isnan(v)]
            n = len(v)
            if n == 0:
                continue
            if n <= K:
                vals, wts = v, np.ones(n, dtype=np.int64)
            else:
                bnd = np.linspace(0, n, K + 1).round().astype(np.int64)
                wts = np.diff(bnd)
                vals = v[(bnd[:-1] + bnd[1:] - 1) // 2]
            if not isinstance(key, tuple):
                key = (key,)
            for c, kv in zip(group_cols, key):
                out_g[c].append(np.repeat(kv, len(vals)))
            out_v.append(vals)
            out_w.append(wts)
        if not out_v:
            t = {
                c: pa.array([], b.schema.field(c).type) for c in group_cols
            }
            t["__v"] = pa.array([], pa.float64())
            t["__w"] = pa.array([], pa.int64())
            return pa.table(t)
        cols = {c: pa.array(np.concatenate(out_g[c])) for c in group_cols}
        cols["__v"] = pa.array(np.concatenate(out_v))
        cols["__w"] = pa.array(np.concatenate(out_w).astype(np.int64))
        return pa.table(cols)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        v = g["__v"].to_numpy(dtype=np.float64)
        w = g["__w"].to_numpy(dtype=np.float64)
        o = np.argsort(v, kind="stable")
        v, w = v[o], w[o]
        cum = np.cumsum(w)
        n = cum[-1]
        # midpoint 0-based rank of each summary point on the weighted CDF
        mid_rank = cum - (w + 1.0) / 2.0
        pos = qs_arr * (n - 1.0)
        out = {c: np.repeat(g[c].iloc[0], len(qs_arr)) for c in group_cols}
        out["q"] = qs_arr
        out["value"] = np.interp(pos, mid_rank, v)
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if not group_cols:
        partials = partials.map_batches(
            lambda b: b.append_column(
                "__g", pa.array(np.zeros(len(b), dtype=np.int8))
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        return partials.groupby("__g").map_groups(finalize, batch_format="pandas")
    return partials.groupby(group_cols).map_groups(finalize, batch_format="pandas")


def pivot_wide(
    ds: Dataset,
    index_cols: list[str],
    pivot_col: str,
    value_col: str | None = None,
    categories: list[str] | None = None,
) -> Dataset:
    """Distributed pivot: one output row per distinct ``index_cols``, one
    column per category of ``pivot_col`` holding count(*) (or
    sum(value_col)) of the matching cell. The long->wide transpose happens
    INSIDE ``map_batches`` (per-batch partial pivot), so the one shuffle
    carries pre-pivoted partials — |index| rows × |categories| columns —
    never the raw long rows; the groupby then just sums aligned columns.

    ``categories`` (the output column set) is discovered with a tiny
    distinct aggregation when not supplied; it must be small (it becomes
    the schema — the usual pivot contract). Category values are used as
    column names verbatim.
    """
    def _render(c) -> str:
        # ONE rendering for category names everywhere: Arrow's string cast
        # (the same kernel the per-batch pivot uses on the column), so an
        # int/float/bool category can never mismatch its column label
        return pa.scalar(c).cast(pa.string()).as_py()

    if categories is None:
        # drop nulls BEFORE sorting (None is unorderable) — null pivot
        # values are dropped per the documented contract, so they can
        # never be a category
        raw = [c for c in ds.select_columns([pivot_col]).unique(pivot_col) if c is not None]
        categories = [_render(c) for c in sorted(raw)]
    # normalize once: ALL category handling (per-batch reindex, the final
    # Sum aggregate, the output schema) speaks the Arrow string rendering,
    # and the per-batch pivot casts the pivot column with the same kernel —
    # an int pivot column against str categories previously reindexed to
    # nothing and silently zeroed the whole output
    categories = [_render(c) for c in categories]
    # category values become schema column names verbatim: refuse silent
    # breakage from a category shadowing an index column or two categories
    # colliding after str() (null pivot/index values are dropped by the
    # pandas groupby, per the documented contract)
    str_cats = categories
    clash = set(str_cats) & set(index_cols)
    if clash:
        raise ValueError(
            f"pivot categories collide with index_cols: {sorted(clash)}"
        )
    if len(set(str_cats)) != len(str_cats):
        dupes = sorted({c for c in str_cats if str_cats.count(c) > 1})
        raise ValueError(f"pivot categories duplicate after str(): {dupes}")

    def partial(b: pa.Table) -> pa.Table:
        cols = index_cols + [pivot_col] + ([value_col] if value_col else [])
        b = b.select(cols).set_column(
            b.select(cols).schema.get_field_index(pivot_col),
            pivot_col,
            pc.cast(b[pivot_col], pa.string()),
        )
        df = b.to_pandas()
        if value_col is None:
            df = df.assign(__v=np.ones(len(df), dtype=np.int64))
            vc = "__v"
        else:
            vc = value_col
        # (pivot column already cast to Arrow string above — a nullable
        # int64 would otherwise come to pandas as float64 and render as
        # '2023.0', never matching the '2023' category labels)
        g = (
            df.groupby(index_cols + [pivot_col], as_index=False, sort=False)[vc]
            .sum()
            .pivot(index=index_cols, columns=pivot_col, values=vc)
        )
        g = g.reindex(columns=categories)
        g.columns = [str(c) for c in g.columns]
        if value_col is None:
            g = g.fillna(0).astype(np.int64)
        else:
            g = g.fillna(0.0)
        g = g.reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(index_cols).aggregate(
        *[Sum(c, alias_name=c) for c in categories]
    )


def melt(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    metric_col: str = "metric",
    value_col: str = "val",
) -> Dataset:
    """Wide->long unpivot (SQL ``UNPIVOT``, the inverse of ``pivot_wide``):
    one output row per (input row, value column), with the source column
    name in ``metric_col`` and its value cast to float64 in ``value_col``.

    Pure per-batch transform — no shuffle, no state: each batch emits
    ``len(value_cols)`` stacked slices (id columns repeated via zero-copy
    arrow concat). SQL NULL contract: UNPIVOT drops rows whose value is
    NULL, and so does this kernel.
    """
    clash = {metric_col, value_col} & set(id_cols)
    if clash:
        raise ValueError(f"metric/value column names clash with id_cols: {sorted(clash)}")

    def kernel(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            v = b[c].cast(pa.float64())
            t = b.select(id_cols).append_column(
                metric_col, pa.array([c] * len(b))
            ).append_column(value_col, v)
            if v.null_count:
                t = t.filter(pc.is_valid(t[value_col]))
            parts.append(t)
        return pa.concat_tables(parts).replace_schema_metadata(None)

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def grouped_corr(
    ds: Dataset,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> pd.DataFrame:
    """Per-group Pearson correlation of (x, y) via mergeable SHIFTED moments.

    The naive single-pass formula (sxy - sx*sy/n) suffers catastrophic
    cancellation when |mean| >> stddev (values near 1e9 with small spread).
    Here every batch centers each group around its first in-batch value (a
    pilot near the data) and ships (n, shift_x, shift_y, Σdx, Σdy, Σdx²,
    Σdy², Σdx·dy); the per-group finalize realigns all partials to one
    common shift with exact closed-form translation identities, so every
    summed quantity stays centered — numerically equivalent to a two-pass
    centered computation, still ONE shuffle of K·B partial rows.

    Output: one row per group: ``group_cols..., n (int64), corr``.
    ``corr`` is NaN for degenerate groups (zero variance or n < 2).
    """

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_cols + [x_col, y_col]).to_pandas()
        # SQL corr() skips rows where either side is NULL; without this a
        # single null poisoned the whole group's sums to NaN. ``n`` counts
        # the pairs actually used.
        df = df.dropna(subset=[x_col, y_col])
        if df.empty:
            base = b.select(group_cols).slice(0, 0).to_pandas()
            for c in ("n",):
                base[c] = pd.Series([], dtype=np.int64)
            for c in ("ax", "ay", "sdx", "sdy", "sdxx", "sdyy", "sdxy"):
                base[c] = pd.Series([], dtype=np.float64)
            return pa.Table.from_pandas(base, preserve_index=False).replace_schema_metadata(None)
        g = df.groupby(group_cols, sort=False)
        ax = g[x_col].transform("first").to_numpy(dtype=np.float64)
        ay = g[y_col].transform("first").to_numpy(dtype=np.float64)
        dx = df[x_col].to_numpy(dtype=np.float64) - ax
        dy = df[y_col].to_numpy(dtype=np.float64) - ay
        df = df.assign(
            __n=np.ones(len(df), dtype=np.int64),
            __ax=ax, __ay=ay,
            __sdx=dx, __sdy=dy, __sdxx=dx * dx, __sdyy=dy * dy, __sdxy=dx * dy,
        )
        out = df.groupby(group_cols, as_index=False, sort=False).agg(
            n=("__n", "sum"), ax=("__ax", "first"), ay=("__ay", "first"),
            sdx=("__sdx", "sum"), sdy=("__sdy", "sum"),
            sdxx=("__sdxx", "sum"), sdyy=("__sdyy", "sum"), sdxy=("__sdxy", "sum"),
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(dtype=np.float64)
        ax, ay = g["ax"].to_numpy(), g["ay"].to_numpy()
        sdx, sdy = g["sdx"].to_numpy(), g["sdy"].to_numpy()
        sdxx, sdyy, sdxy = g["sdxx"].to_numpy(), g["sdyy"].to_numpy(), g["sdxy"].to_numpy()
        da, db = ax - ax[0], ay - ay[0]
        ntot = n.sum()
        sx = (sdx + n * da).sum()
        sy = (sdy + n * db).sum()
        sxx = (sdxx + 2.0 * da * sdx + n * da * da).sum()
        syy = (sdyy + 2.0 * db * sdy + n * db * db).sum()
        sxy = (sdxy + db * sdx + da * sdy + n * da * db).sum()
        cov = sxy - sx * sy / ntot
        vx = sxx - sx * sx / ntot
        vy = syy - sy * sy / ntot
        denom = np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
        corr = cov / denom if denom > 0 and ntot >= 2 else np.nan
        out = {c: [g[c].iloc[0]] for c in group_cols}
        out["n"] = np.array([ntot], dtype=np.int64)
        out["corr"] = np.array([corr], dtype=np.float64)
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_cols)
        .map_groups(finalize, batch_format="pandas")
        .to_pandas()
        .sort_values(group_cols, ignore_index=True)
    )
