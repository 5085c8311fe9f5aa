"""Driver-gate rehearsal for the rows-only queries.

Ten queries() entries carry no oracle_sql() (hash-specific LSH output,
iterative k-means recall, HLL estimation, quantile sketching, text
embedding + ANN / near-dup, SGD training, greedy packing) — the external
driver only checks that they execute and return >= 0 rows with a stable
schema at sf0.01. Rehearse exactly that here so a scale- or
data-dependent failure (e.g. an IVF recall floor that holds at one sf
but not another) surfaces in pytest before the driver run.

The value-level semantics of each underlying stage are covered by their
dedicated tests (test_dedup_scale / test_text_dedup_ann /
test_streaming_ivf / test_logreg / test_round3_ops).
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"

EXPECTED_COLUMNS = {
    "q32_minhash_dedup": {"doc_id", "cluster_id", "is_kept"},
    "q33_simhash_pairs": {"a", "b", "hamming"},
    "q36_approx_distinct": {"column", "exact", "hll_estimate", "within_5pct"},
    "q45_embed_knn": {"n_queries", "k", "dim", "n_true", "recall_floor"},
    "q47_embed_dedup": {
        "n_planted", "planted_found", "n_pairs_total", "all_planted_recovered",
    },
    "q44_quantile_sketch": {
        "l_returnflag", "q", "value_sketch", "value_exact", "rank_error",
        "within_bound",
    },
    "q50_logreg_weights": {"class", "token_id", "weight"},
    "q53_logreg_fullbatch": {"class", "token_id", "weight"},
    "q58_pack_greedy": {"bucket", "pack_no", "n_docs", "n_tok", "tok_sum"},
}


def _rows_only_names():
    import __ray_entry__ as e

    return sorted(set(e.queries()) - set(e.oracle_sql()))


def test_rows_only_set_is_exactly_the_documented_ten(ray_session):
    assert _rows_only_names() == sorted(EXPECTED_COLUMNS)


@pytest.mark.parametrize("name", sorted(EXPECTED_COLUMNS))
def test_rows_only_query_runs_at_driver_sf(name, ray_session):
    import __ray_entry__ as e

    out = e.queries()[name](SF)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) > 0, name
    assert EXPECTED_COLUMNS[name] <= set(out.columns), (name, out.columns)
