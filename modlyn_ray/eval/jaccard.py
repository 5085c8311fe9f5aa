"""Distributed CompareScores: per-class top-N overlap (Jaccard) across methods.

Re-expresses /root/reference/modlyn/eval/_jaccard.py:25-82 over tall score
tables ``(class, token_id, score, method)`` instead of wide pandas frames:

- alignment = keep only (class, token_id) pairs present in EVERY method
  (the reference's set-intersection of index/columns, :30-36)
- per class: top-N token sets by |score| per method, pairwise Jaccard for
  each n_top (:40-64) — computed inside ONE groupby("class").map_groups
  pass, so each class's (n_methods x vocab) slice is handled by one task
- the "Random baseline" rows use the closed form (2k)/(2G-k) clamped to 1.0
  when k >= G (:66-79)

Output is the reference's tidy schema: (cell_line, n_top, method_pair,
jaccard) with null cell_line on baseline rows.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

DEFAULT_N_TOP = [25, 50, 100, 200]  # _jaccard.py:19-20


def _to_dataset(x) -> Dataset:
    import ray.data as rd

    if isinstance(x, Dataset):
        return x
    if isinstance(x, pa.Table):
        return rd.from_arrow(x)
    if isinstance(x, pd.DataFrame):
        return rd.from_pandas(x)
    raise TypeError(type(x))


def compute_jaccard_comparison(
    score_tables: list, n_top_values: list[int] | None = None
) -> pd.DataFrame:
    """``score_tables``: tall tables/Datasets, each with a single distinct
    ``method`` value (the df.attrs["method_name"] analog)."""
    n_top_values = n_top_values or DEFAULT_N_TOP
    dss = [_to_dataset(t) for t in score_tables]
    union = dss[0].union(*dss[1:]) if len(dss) > 1 else dss[0]
    method_names: list[str] = []
    for ds in dss:
        names = ds.unique("method")
        if len(names) != 1:
            raise ValueError(f"each score table must carry one method, got {names}")
        method_names.append(names[0])
    n_methods = len(method_names)

    # alignment: classes present in every method, and the GLOBAL common
    # token set across methods (the reference intersects feature columns
    # globally — _jaccard.py:30-32 — before any per-class slicing); the
    # per-class pivot+dropna below additionally drops tokens a method did
    # not score for that class.
    classes_per_method = [set(ds.unique("class")) for ds in dss]
    common_classes = sorted(set.intersection(*classes_per_method))
    token_sets = [set(ds.unique("token_id")) for ds in dss]
    common_tokens = set.intersection(*token_sets)
    n_genes = len(common_tokens)

    def per_class(group: pd.DataFrame) -> pd.DataFrame:
        cls = group["class"].iloc[0]
        if cls not in common_classes:
            return pd.DataFrame(
                {"cell_line": [], "n_top": [], "method_pair": [], "jaccard": []}
            )
        group = group[group["token_id"].isin(common_tokens)]
        # keep tokens scored by ALL methods for this class-slice's alignment
        piv = group.pivot_table(
            index="token_id", columns="method", values="score", aggfunc="first"
        )
        piv = piv.dropna(axis=0, how="any")
        ids = piv.index.to_numpy()
        rows = []
        for n_top in n_top_values:
            # deterministic top-N: |score| desc, token_id asc on ties (the
            # reference's nlargest ties are positional — we pin them so a
            # SQL oracle (row_number OVER (ORDER BY abs(score) DESC,
            # token_id)) reproduces the sets exactly)
            tops = {}
            for m in method_names:
                order = np.lexsort((ids, -piv[m].abs().to_numpy()))
                tops[m] = set(ids[order[:n_top]])
            for m1, m2 in combinations(method_names, 2):
                inter = len(tops[m1] & tops[m2])
                union_n = len(tops[m1] | tops[m2])
                rows.append(
                    {
                        "cell_line": cls,
                        "n_top": n_top,
                        "method_pair": f"{m1}↔{m2}",
                        "jaccard": inter / union_n if union_n > 0 else 0.0,
                    }
                )
        return pd.DataFrame(rows)

    res = (
        union.groupby("class")
        .map_groups(per_class, batch_format="pandas")
        .to_pandas()
    )

    # G = number of commonly-scored tokens (reference: len(common_genes));
    # computed above. Token sets per method are vocab-sized -> driver sets
    # are fine; for huge vocabs use a groupby(token_id).count()==n_methods.
    base = []
    for n_top in n_top_values:
        rj = 1.0 if n_top >= n_genes else (2 * n_top) / (2 * n_genes - n_top)
        base.append(
            {"cell_line": None, "n_top": n_top, "method_pair": "Random baseline", "jaccard": rj}
        )
    res = pd.concat([res, pd.DataFrame(base)], ignore_index=True)
    return res.sort_values(["n_top", "method_pair", "cell_line"], na_position="last").reset_index(
        drop=True
    )


def topk_per_class(scores: Dataset, k: int, score_col: str = "score") -> Dataset:
    """Per-class top-k tokens by |score| (SURVEY §2.6 K1) — np.argpartition
    inside map_groups, no global sort."""

    def top(group: pd.DataFrame) -> pd.DataFrame:
        # deterministic |score| ties: pin token_id ascending (matching the
        # row_number-over-(abs(score) DESC, token_id) SQL oracle shape) —
        # argpartition alone kept whichever tied row arrived first, and Ray
        # block order is not deterministic run-to-run
        a = group[score_col].abs().to_numpy()
        toks = group["token_id"].to_numpy()
        order = np.lexsort((toks, -a))
        kk = min(k, len(a))
        out = group.iloc[order[:kk]].copy()
        out["rank"] = np.arange(1, kk + 1)
        return out

    return scores.groupby("class").map_groups(top, batch_format="pandas")
