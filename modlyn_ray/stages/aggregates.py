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

from ray.data import Dataset
from ray.data.aggregate import Sum


def grouped_quantiles(
    ds: Dataset,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> Dataset:
    """Exact per-group quantiles of ``value_col`` at each q in ``qs``
    (percentile_cont / numpy-linear interpolation: position q*(n-1)).

    Output: one row per (group, q): ``group_cols... , q, value``.
    """
    group_cols = list(group_cols or [])
    qs_arr = np.asarray(sorted(qs), dtype=np.float64)

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
    if categories is None:
        categories = [
            str(c) for c in sorted(ds.select_columns([pivot_col]).unique(pivot_col))
        ]

    def partial(b: pa.Table) -> pa.Table:
        cols = index_cols + [pivot_col] + ([value_col] if value_col else [])
        df = b.select(cols).to_pandas()
        if value_col is None:
            df = df.assign(__v=np.ones(len(df), dtype=np.int64))
            vc = "__v"
        else:
            vc = value_col
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


def grouped_corr(
    ds: Dataset,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> pd.DataFrame:
    """Per-group Pearson correlation of (x, y) via mergeable moments.

    Output: one row per group: ``group_cols..., n (int64), corr``.
    ``corr`` is NaN for degenerate groups (zero variance or n < 2).
    """

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(group_cols + [x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        df = df.assign(
            __n=np.ones(len(df), dtype=np.int64),
            __sx=x, __sy=y, __sxx=x * x, __syy=y * y, __sxy=x * y,
        )
        g = df.groupby(group_cols, as_index=False, sort=False)[
            ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_cols)
        .aggregate(
            Sum("__n", alias_name="n"),
            Sum("__sx", alias_name="sx"),
            Sum("__sy", alias_name="sy"),
            Sum("__sxx", alias_name="sxx"),
            Sum("__syy", alias_name="syy"),
            Sum("__sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy(dtype=np.float64)
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxx, syy, sxy = agg["sxx"].to_numpy(), agg["syy"].to_numpy(), agg["sxy"].to_numpy()
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    denom = np.sqrt(vx * vy)
    corr = np.divide(cov, denom, out=np.full(len(agg), np.nan), where=denom > 0)
    out = agg[group_cols].copy()
    out["n"] = agg["n"].astype(np.int64)
    out["corr"] = corr
    return out
