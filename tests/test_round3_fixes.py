"""Regression tests for the round-2 ADVICE findings + round-3 VERDICT items:

1. eval_pass must not crash when validation rows carry labels absent from
   the train-side classes (hash splits can strand a rare class in val) —
   unknown rows are excluded with a warning, not a worker KeyError.
2. min-label propagation must converge on components whose graph diameter
   exceeds the old max_iters=12 cap (long chains of drifting near-dups).
3. The minhash verify kernel (now vectorized across pairs) and the
   exact_dedup md5 fallback (now DuckDB's C kernel) keep their semantics.
4. encode_labels: the dictionary-encode label-lookup helper that replaced
   the per-row `[lut[s] for s in col.to_pylist()]` hot-path pattern.
5. SimpleLogReg.write_artifacts: losses.parquet + sorted scores-heatmap
   pivot round-trip (S7 — the plot_losses / plot_heatmaps data products).
6. q53 (fullbatch trainer) runs as a driver query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _seq_table(n=200, vocab=32, labels=("A", "B", "C"), seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(3, 9, n)
    toks = [rng.integers(0, vocab, l).astype(np.int32) for l in lens]
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "tokens": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(np.concatenate(toks))
            ),
            "n_tok": pa.array(lens.astype(np.int32)),
            "seq_no": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(rng.choice(list(labels), n).tolist()),
        }
    )


# ---------------------------------------------------------------------------
# 1. eval_pass with labels unseen at train time
# ---------------------------------------------------------------------------
def test_eval_pass_unknown_val_labels_excluded_with_warning(ray_session):
    from modlyn_ray.stages.logreg import LogRegConfig, eval_pass, fit_logreg

    train = rd.from_arrow(_seq_table(labels=("A", "B")))
    model = fit_logreg(train, LogRegConfig(vocab=32, max_steps=5, batch_size=64))
    # val set contains class "Z" never seen at train time
    val = rd.from_arrow(_seq_table(n=120, labels=("A", "B", "Z"), seed=7))
    with pytest.warns(UserWarning, match="absent from the train-side"):
        res = eval_pass(val, model.W, model.b, model.classes)
    assert res["n_skipped_unknown"] > 0
    assert res["n"] + res["n_skipped_unknown"] == 120
    assert np.isfinite(res["val_loss"]) and 0.0 <= res["accuracy"] <= 1.0


def test_fit_with_val_fraction_and_stranded_rare_class(ray_session):
    """End-to-end ADVICE shape: fit(val_fraction=...) where the val split
    contains a class so rare the train side never sees it."""
    from modlyn_ray.api import SimpleLogReg
    from modlyn_ray.stages.logreg import split_train_val

    t = _seq_table(n=300, labels=("A", "B"), seed=3)
    # craft one rare-class row routed to the val side of the hash split
    ds_all = rd.from_arrow(t)
    _, val = split_train_val(ds_all, 0.1)
    val_seq = val.take(1)[0]["seq_no"]
    src = t["source"].to_pylist()
    src[t["seq_no"].to_pylist().index(val_seq)] = "RARE"
    t = t.set_column(t.schema.get_field_index("source"), "source", pa.array(src))
    m = SimpleLogReg(rd.from_arrow(t), vocab=32)
    with pytest.warns(UserWarning, match="absent from the train-side"):
        m.fit(max_epochs=1, max_steps=5, val_fraction=0.1)
    assert "RARE" not in m.model.classes
    assert m.model.val_history and m.model.val_history[0]["n_skipped_unknown"] >= 1


def test_confusion_matrix_skips_unknown_labels(ray_session):
    from modlyn_ray.stages.logreg import confusion_matrix

    t = pa.table(
        {
            "source": pa.array(["A", "B", "Z", "A"]),
            "pred_source": pa.array(["A", "A", "B", "B"]),
        }
    )
    cm = confusion_matrix(rd.from_arrow(t), ["A", "B"])
    assert cm.sum() == 3  # the Z row is excluded
    assert cm[0, 0] == 1 and cm[1, 0] == 1 and cm[0, 1] == 1


# ---------------------------------------------------------------------------
# 2. propagation convergence on a >12-diameter chain
# ---------------------------------------------------------------------------
def test_minhash_chain_component_converges(ray_session):
    """16 docs where doc i ~ doc i+1 (exact trigram Jaccard ≈ 0.818 ≥ 0.8)
    but doc i !~ doc i+2 (≈ 0.667): the verified-pair graph is a path of
    diameter 15 — beyond the old max_iters=12 cap, which silently split the
    component (and could leave a cluster with no is_kept row)."""
    from modlyn_ray.stages.dedup import minhash_lsh_dedup

    stream = [f"w{i}" for i in range(400)]
    texts = [" ".join(stream[i * 10 : i * 10 + 102]) for i in range(16)]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(16, dtype=np.int64)), "text": texts})
    )
    out = (
        minhash_lsh_dedup(ds, jaccard_threshold=0.8, n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 16
    assert set(out["cluster_id"]) == {0}, "chain must collapse to one component"
    kept = out[out["is_kept"]]
    assert len(kept) == 1 and int(kept["doc_id"].iloc[0]) == 0


# ---------------------------------------------------------------------------
# 3. md5 fallback + verify vectorization semantics
# ---------------------------------------------------------------------------
def test_exact_dedup_md5_route_matches_fast_hash(ray_session):
    from modlyn_ray.stages.dedup import exact_dedup

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "alpha"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(6, dtype=np.int64)), "text": pa.array(texts)}
    )
    a = (
        exact_dedup(rd.from_arrow(t), fast_hash=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        exact_dedup(rd.from_arrow(t), fast_hash=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[["doc_id", "text", "dup_count"]],
                                  b[["doc_id", "text", "dup_count"]])
    assert a["doc_id"].tolist() == [0, 1, 3] and a["dup_count"].tolist() == [3, 2, 1]


# ---------------------------------------------------------------------------
# 4. encode_labels helper
# ---------------------------------------------------------------------------
def test_encode_labels_distinct_only_and_unknowns():
    from modlyn_ray.util import encode_labels

    col = pa.chunked_array([pa.array(["b", "a", "zz", "b", None])])
    y = encode_labels(col, {"a": 0, "b": 1})
    assert y.tolist() == [1, 0, -1, 1, -1]
    assert encode_labels(pa.array([], type=pa.string()), {"a": 0}).tolist() == []


# ---------------------------------------------------------------------------
# 5. S7 artifacts: losses + sorted heatmap pivot round-trip
# ---------------------------------------------------------------------------
def test_write_artifacts_roundtrip(ray_session, tmp_path):
    from modlyn_ray.api import SimpleLogReg

    m = SimpleLogReg(rd.from_arrow(_seq_table()), vocab=32)
    m.fit(max_epochs=2, max_steps=8, batch_size=32, val_fraction=0.1)
    paths = m.write_artifacts(str(tmp_path / "art"))

    losses = pd.read_parquet(paths["losses"])
    assert list(losses.columns) == ["step", "loss"]
    n_steps = len(m.model.losses)
    assert n_steps > 1  # multiple optimizer steps recorded
    assert losses["step"].tolist() == list(range(n_steps))
    assert np.allclose(losses["loss"].to_numpy(), m.model.losses)

    heat = pd.read_parquet(paths["scores_heatmap"])
    assert heat["class"].tolist() == sorted(m.model.classes)  # K2: sorted axes
    tok_cols = [c for c in heat.columns if c != "class"]
    assert [int(c) for c in tok_cols] == sorted(int(c) for c in tok_cols)
    wide = m.get_weights()
    assert np.allclose(
        heat[tok_cols].to_numpy(),
        wide.sort_index().to_numpy(),
    )

    vh = pd.read_parquet(paths["val_history"])
    assert len(vh) >= 1 and {"epoch", "val_loss", "accuracy"} <= set(vh.columns)


# ---------------------------------------------------------------------------
# 6. q53 driver query
# ---------------------------------------------------------------------------
def test_q53_fullbatch_query_runs(ray_session):
    from modlyn_ray.pipelines.queries import QUERIES

    out = QUERIES["q53_logreg_fullbatch"]("/root/testdata/sf0.001")
    assert len(out) > 0 and {"class", "token_id", "weight"} <= set(out.columns)


# ---------------------------------------------------------------------------
# 7. detect_heavy_keys with null keys (ADVICE r2: np.unique over object
#    arrays raises TypeError when None meets str)
# ---------------------------------------------------------------------------
def test_detect_heavy_keys_tolerates_null_keys(ray_session):
    from modlyn_ray.stages.temporal import detect_heavy_keys

    t = pa.table(
        {
            "doc_id": pa.array((["hot"] * 80) + [None] * 10 + ["a", "b"] * 5),
            "v": pa.array(np.arange(100, dtype=np.int64)),
        }
    )
    heavy = detect_heavy_keys(rd.from_arrow(t), n_buckets=8, sample=1.0)
    assert "hot" in heavy  # the 80% key is detected
    assert None not in heavy  # nulls never get a dedicated bucket
