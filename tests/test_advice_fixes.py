"""Regression tests for the round-1 ADVICE findings:

1. SimpleLogReg with a non-default label_column: evaluate() must work (it
   used to KeyError on the hardcoded 'source'), including when an unrelated
   'source' column already exists.
2. Checkpoint resume must invalidate on config / inputs mismatch instead of
   returning stale output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from modlyn_ray.api import SimpleLogReg
from modlyn_ray.state.checkpoint import run_stage, run_stage_partitioned


def _seq_table(n=256, vocab=32, label_col="cell_line", extra_source=False, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(3, 9, n)
    toks = [rng.integers(0, vocab, l).astype(np.int32) for l in lens]
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    cols = {
        "doc_id": pa.array([f"d{i}" for i in range(n)]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(np.concatenate(toks))
        ),
        "n_tok": pa.array(lens.astype(np.int32)),
        "seq_no": pa.array(np.arange(n, dtype=np.int64)),
        label_col: pa.array(rng.choice(["A", "B", "C"], n).tolist()),
    }
    if extra_source:
        cols["source"] = pa.array(["junk"] * n)  # unrelated pre-existing col
    return pa.table(cols)


def test_nondefault_label_column_fit_and_evaluate(ray_session):
    ds = rd.from_arrow(_seq_table(label_col="cell_line"))
    m = SimpleLogReg(ds, label_column="cell_line", vocab=32)
    m.fit(max_epochs=1, max_steps=10)
    res = m.evaluate()  # used to crash: KeyError 'source'
    assert 0.0 <= res["accuracy"] <= 1.0
    assert sorted(m.model.classes) == ["A", "B", "C"]


def test_label_column_with_preexisting_source_column(ray_session):
    ds = rd.from_arrow(_seq_table(label_col="cell_line", extra_source=True))
    m = SimpleLogReg(ds, label_column="cell_line", vocab=32)
    m.fit(max_epochs=1, max_steps=5)
    # classes come from cell_line, not the junk 'source' column
    assert sorted(m.model.classes) == ["A", "B", "C"]
    res = m.evaluate()
    assert 0.0 <= res["accuracy"] <= 1.0


def test_run_stage_invalidates_on_config_change(ray_session, tmp_path):
    out = str(tmp_path / "stage")
    calls = []

    def build_v1():
        calls.append("v1")
        return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3])}))

    def build_v2():
        calls.append("v2")
        return rd.from_arrow(pa.table({"x": pa.array([10, 20, 30, 40])}))

    d1 = run_stage(out, "s", build_v1, config={"steps": 5})
    assert d1.count() == 3 and calls == ["v1"]
    # same config -> resume, no rebuild
    d1b = run_stage(out, "s", build_v1, config={"steps": 5})
    assert d1b.count() == 3 and calls == ["v1"]
    # changed config -> rebuild (used to silently return the stale 3 rows)
    d2 = run_stage(out, "s", build_v2, config={"steps": 9})
    assert d2.count() == 4 and calls == ["v1", "v2"]


def test_run_stage_invalidates_on_inputs_change(ray_session, tmp_path):
    out = str(tmp_path / "stage_i")
    calls = []

    def build():
        calls.append("b")
        return rd.from_arrow(pa.table({"x": pa.array([1])}))

    run_stage(out, "s", build, config={}, inputs=["a.parquet"])
    run_stage(out, "s", build, config={}, inputs=["a.parquet"])
    assert calls == ["b"]
    run_stage(out, "s", build, config={}, inputs=["a.parquet", "b.parquet"])
    assert calls == ["b", "b"]


def test_partitioned_resume_invalidates_on_config_change(ray_session, tmp_path):
    out = str(tmp_path / "parts")
    built = []

    def build_for(missing):
        built.append(sorted(missing))
        n = 10
        rng = np.random.default_rng(1)
        t = pa.table(
            {
                "bucket": pa.array(rng.integers(0, 4, n)),
                "v": pa.array(np.arange(n)),
            }
        )
        mask = np.isin(t["bucket"].to_numpy(), missing)
        return rd.from_arrow(t.filter(pa.array(mask)))

    run_stage_partitioned(out, "s", build_for, [0, 1, 2, 3], config={"k": 1})
    assert built == [[0, 1, 2, 3]]
    run_stage_partitioned(out, "s", build_for, [0, 1, 2, 3], config={"k": 1})
    assert built == [[0, 1, 2, 3]]  # full resume
    run_stage_partitioned(out, "s", build_for, [0, 1, 2, 3], config={"k": 2})
    assert built == [[0, 1, 2, 3], [0, 1, 2, 3]]  # config change -> recompute
