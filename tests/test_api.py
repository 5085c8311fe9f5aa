"""Reference-facade parity: the modlyn user surface works unchanged."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from modlyn_ray import oracle, synth
from modlyn_ray.api import CompareScores, SimpleLogReg


def test_simplelogreg_surface(tiny_dir):
    model = SimpleLogReg(f"{tiny_dir}/sequences", label_column="source", vocab=8)
    model.fit(max_epochs=10, max_steps=30, batch_size=16, dataset_type="pq")
    w = model.get_weights()
    assert w.attrs["method_name"] == "modlyn_logreg"
    assert w.shape == (3, 8)  # classes x features, reference shape
    # numeric parity with the oracle (same schedule)
    import pyarrow as pa

    tbl = synth.make_sequences(synth.TINY)
    tbl = tbl.take(pa.array(np.argsort(tbl["seq_no"].to_numpy())))
    X, y, classes = oracle.dense_counts(tbl, 8)
    W, b, _ = oracle.logreg_adam(X, y, len(classes), batch_size=16, max_steps=30, max_epochs=10)
    np.testing.assert_allclose(w.to_numpy(), W, rtol=1e-5, atol=1e-7)
    m = model.evaluate()
    assert 0 <= m["accuracy"] <= 1

    with pytest.raises(ValueError, match="unknown dataset type"):
        model.fit(dataset_type="zarr")


def test_simplelogreg_vocab_inference(tiny_dir):
    model = SimpleLogReg(f"{tiny_dir}/sequences")
    assert model.config.vocab == 8  # max token id + 1, the n_vars analog


def test_compare_scores_facade(tiny_dir):
    m = SimpleLogReg(f"{tiny_dir}/sequences", vocab=8).fit(max_steps=20, batch_size=16)
    w1 = m.get_weights()
    rng = np.random.default_rng(0)
    w2 = pd.DataFrame(
        rng.standard_normal(w1.shape), index=w1.index, columns=w1.columns
    )
    w2.attrs["method_name"] = "random_method"
    cmp = CompareScores([w1, w2], n_top_values=[2, 4, 100])
    res = cmp.compute_jaccard_comparison()
    assert set(res.columns) == {"cell_line", "n_top", "method_pair", "jaccard"}
    assert (res["method_pair"] == "modlyn_logreg↔random_method").any()
    base = res[res["method_pair"] == "Random baseline"]
    assert base[base["n_top"] == 100]["jaccard"].iloc[0] == 1.0  # n_top >= G branch
    # distributed variant computes the same values
    res2 = cmp.compute_jaccard_comparison_distributed()
    a = res.sort_values(["n_top", "method_pair", "cell_line"], na_position="last")
    b = res2.sort_values(["n_top", "method_pair", "cell_line"], na_position="last")
    np.testing.assert_allclose(a["jaccard"].to_numpy(), b["jaccard"].to_numpy())


def test_jaccard_grouped_means_and_artifacts(tmp_path):
    """S7 data products: grouped means match pandas on the tidy frame;
    artifacts round-trip through parquet (VERDICT r1 item 8)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    frames = []
    for name in ("m1", "m2"):
        df = pd.DataFrame(
            rng.standard_normal((3, 40)),
            index=["A", "B", "C"],
            columns=np.arange(40),
        )
        df.attrs["method_name"] = name
        frames.append(df)
    cs = CompareScores(frames, n_top_values=[5, 10])
    tidy = cs.compute_jaccard_comparison()
    gm = cs.jaccard_grouped_means()
    want = tidy.groupby(["n_top", "method_pair"])["jaccard"].mean().unstack()
    pd.testing.assert_frame_equal(gm, want)
    assert "Random baseline" in gm.columns
    paths = cs.write_artifacts(str(tmp_path / "eval"))
    rt = pd.read_parquet(paths["grouped_means"])
    assert "n_top" in rt.columns and len(rt) == 2
    assert len(pd.read_parquet(paths["results"])) == len(tidy)
