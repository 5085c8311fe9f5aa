"""Round-3 operator additions: range (interval) join, exact grouped
quantiles, grouped Pearson correlation, corpus TF-IDF."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ts(us: int) -> np.datetime64:
    return np.datetime64(us, "us")


def _events_tables():
    # left: 5 probes across 2 keys; right: purchases with boundary cases
    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "user_id": pa.array([10, 10, 10, 20, 30], type=pa.int64()),
            "ts": pa.array([_ts(1000), _ts(2000), _ts(5000), _ts(1000), _ts(9000)]),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([10, 10, 10, 20, 20, 99], type=pa.int64()),
            "ts": pa.array([_ts(0), _ts(1000), _ts(1500), _ts(500), _ts(1001), _ts(1000)]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    return left, right


def _expected_pairs(window_us=1000):
    # brute-force oracle over _events_tables
    left, right = _events_tables()
    lf, rf = left.to_pandas(), right.to_pandas()
    rows = []
    for _, l in lf.iterrows():
        for _, r in rf.iterrows():
            if l["user_id"] != r["user_id"]:
                continue
            if l["ts"] - pd.Timedelta(microseconds=window_us) <= r["ts"] <= l["ts"]:
                rows.append((l["event_id"], r["value"], r["ts"]))
    return sorted(rows, key=lambda t: (t[0], t[1]))


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_range_join_matches_bruteforce(ray_session, n_buckets):
    from modlyn_ray.stages.temporal import range_join

    left, right = _events_tables()
    out = range_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        value_cols=["value"],
        by="user_id",
        ts_col="ts",
        lo_offset_us=-1000,
        hi_offset_us=0,
        n_buckets=n_buckets,
    ).to_pandas()
    got = sorted(
        zip(out["event_id"], out["value_rng"], out["matched_rng_ts"]),
        key=lambda t: (t[0], t[1]),
    )
    assert got == _expected_pairs()
    # boundary inclusivity spot checks: ts_r == ts_l and ts_r == ts_l - window
    eids = out["event_id"].tolist()
    assert 1 in eids  # user 10 @1000 matches purchases @0 (lo edge) and @1000 (hi edge)
    assert (out[out["event_id"] == 1]["value_rng"].sort_values().tolist() == [1.0, 2.0])
    assert 3 not in eids  # user 10 @5000: nearest purchase @1500 — outside, dropped (inner)
    assert 5 not in eids  # user 30 has no purchases


def test_range_join_string_keys_and_empty_sides(ray_session):
    from modlyn_ray.stages.temporal import range_join

    left = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "ingest_ts": pa.array([_ts(100), _ts(100)]),
        }
    )
    right = pa.table(
        {
            "doc_id": pa.array(["a", "a"]),
            "ingest_ts": pa.array([_ts(50), _ts(100)]),
            "attr_val": pa.array([7.0, 8.0]),
        }
    )
    out = range_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        value_cols=["attr_val"],
        lo_offset_us=-60,
        hi_offset_us=0,
        n_buckets=4,
    ).to_pandas()
    assert sorted(out["attr_val_rng"]) == [7.0, 8.0]
    assert set(out["doc_id"]) == {"a"}

    empty_r = rd.from_arrow(right.slice(0, 0))
    out2 = range_join(
        rd.from_arrow(left), empty_r, value_cols=["attr_val"],
        lo_offset_us=-60, hi_offset_us=0, n_buckets=2,
    ).to_pandas()
    assert len(out2) == 0


def _join_tables():
    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
            "lv": pa.array([10.0, 11.0, 20.0, 30.0, 40.0]),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([1, 2, 2, 5], type=pa.int64()),
            "rv": pa.array(["a", "b", "c", "d"]),
        }
    )
    return left, right


@pytest.mark.parametrize("n_buckets", [1, 3, 8])
def test_hash_inner_join_matches_pandas(ray_session, n_buckets):
    from modlyn_ray.stages.joins import hash_equi_join

    left, right = _join_tables()
    out = hash_equi_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="k", right_on="rk", right_cols=["rv"],
        how="inner", n_buckets=n_buckets,
    ).to_pandas()
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .drop(columns=["rk"])
    )
    got = out.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = want.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_hash_semi_and_anti_join(ray_session):
    from modlyn_ray.stages.joins import hash_equi_join

    left, right = _join_tables()
    semi = hash_equi_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="k", right_on="rk", right_cols=[], how="semi", n_buckets=4,
    ).to_pandas()
    anti = hash_equi_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="k", right_on="rk", right_cols=[], how="anti", n_buckets=4,
    ).to_pandas()
    assert sorted(semi["k"].unique()) == [1, 2]
    assert len(semi) == 3  # k=1 twice, k=2 once — row multiplicity preserved
    assert sorted(anti["k"]) == [3, 4]
    # semi + anti partition the left side
    assert len(semi) + len(anti) == 5
    assert list(semi.columns) == ["k", "lv"] and list(anti.columns) == ["k", "lv"]


def test_hash_join_string_keys_and_empty_right(ray_session):
    from modlyn_ray.stages.joins import hash_equi_join

    left = pa.table({"name": pa.array(["x", "y", "z"]), "v": pa.array([1, 2, 3])})
    right = pa.table({"n2": pa.array(["y", "y"]), "tag": pa.array(["t1", "t2"])})
    out = hash_equi_join(
        rd.from_arrow(left), rd.from_arrow(right),
        left_on="name", right_on="n2", right_cols=["tag"], how="inner", n_buckets=4,
    ).to_pandas()
    assert sorted(out["tag"]) == ["t1", "t2"]
    assert set(out["name"]) == {"y"}
    # string column survives the dictionary-encoded exchange byte-identical
    assert out["name"].dtype == object

    empty = hash_equi_join(
        rd.from_arrow(left), rd.from_arrow(right.slice(0, 0)),
        left_on="name", right_on="n2", right_cols=["tag"], how="anti", n_buckets=2,
    ).to_pandas()
    assert sorted(empty["name"]) == ["x", "y", "z"]


def test_broadcast_semi_join(ray_session):
    from modlyn_ray.stages.joins import broadcast_semi_join

    left = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()), "v": pa.array([1.0, 2.0, 3.0, 4.0])})
    keep = broadcast_semi_join(rd.from_arrow(left), [2, 4, 9], left_on="k").to_pandas()
    drop = broadcast_semi_join(rd.from_arrow(left), [2, 4, 9], left_on="k", anti=True).to_pandas()
    assert sorted(keep["k"]) == [2, 4]
    assert sorted(drop["k"]) == [1, 3]


def test_grouped_quantiles_matches_numpy(ray_session):
    from modlyn_ray.stages.aggregates import grouped_quantiles

    rng = np.random.default_rng(11)
    g = rng.choice(["x", "y", "z"], 5000)
    # duplicated discrete values exercise the histogram collapse path
    v = np.round(rng.normal(100, 15, 5000), 1)
    t = pa.table({"grp": pa.array(g.tolist()), "val": pa.array(v)})
    qs = [0.1, 0.5, 0.9]
    out = (
        grouped_quantiles(rd.from_arrow(t), "val", qs, ["grp"])
        .to_pandas()
        .sort_values(["grp", "q"])
        .reset_index(drop=True)
    )
    for grp in ["x", "y", "z"]:
        want = np.percentile(v[g == grp], [q * 100 for q in qs], method="linear")
        got = out[out["grp"] == grp]["value"].to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_global_quantiles_no_group(ray_session):
    from modlyn_ray.stages.aggregates import grouped_quantiles

    v = np.arange(101, dtype=np.float64)
    t = pa.table({"val": pa.array(v)})
    out = grouped_quantiles(rd.from_arrow(t), "val", [0.0, 0.25, 1.0]).to_pandas()
    assert sorted(out["value"]) == [0.0, 25.0, 100.0]


def test_grouped_corr_matches_numpy(ray_session):
    from modlyn_ray.stages.aggregates import grouped_corr

    rng = np.random.default_rng(5)
    g = rng.choice(["a", "b"], 3000)
    x = rng.normal(10, 2, 3000)
    y = 3 * x + rng.normal(0, 4, 3000)
    t = pa.table({"grp": pa.array(g.tolist()), "x": pa.array(x), "y": pa.array(y)})
    out = grouped_corr(rd.from_arrow(t), "x", "y", ["grp"]).sort_values("grp")
    for grp in ["a", "b"]:
        want = np.corrcoef(x[g == grp], y[g == grp])[0, 1]
        got = out[out["grp"] == grp]["corr"].iloc[0]
        np.testing.assert_allclose(got, want, rtol=1e-9)
        assert out[out["grp"] == grp]["n"].iloc[0] == int((g == grp).sum())


def test_grouped_corr_degenerate_group_is_nan(ray_session):
    from modlyn_ray.stages.aggregates import grouped_corr

    t = pa.table(
        {
            "grp": pa.array(["c", "c", "c"]),
            "x": pa.array([1.0, 1.0, 1.0]),  # zero variance
            "y": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = grouped_corr(rd.from_arrow(t), "x", "y", ["grp"])
    assert np.isnan(out["corr"].iloc[0])


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_hash_sample_partitioning_invariant(ray_session, n_blocks):
    """The kept subset is a pure function of the key — identical under any
    partitioning and any rate-consistent re-run."""
    from modlyn_ray.stages.sampling import hash_sample

    keys = pa.table({"k": pa.array(np.arange(2000, dtype=np.int64))})
    ds = rd.from_arrow(keys).repartition(n_blocks)
    kept = sorted(hash_sample(ds, "k", 0.2).to_pandas()["k"])
    # ~20% with md5 uniformity; exact set fixed forever
    assert 300 < len(kept) < 500
    kept2 = sorted(hash_sample(rd.from_arrow(keys).repartition(3), "k", 0.2).to_pandas()["k"])
    assert kept == kept2
    # monotone: raising the rate only ADDS rows (nested subsets)
    kept_half = set(hash_sample(ds, "k", 0.5).to_pandas()["k"])
    assert set(kept) <= kept_half


def test_stratified_hash_sample_rates_and_drop(ray_session):
    from modlyn_ray.stages.sampling import stratified_hash_sample

    n = 4000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "cls": pa.array(["big" if i % 2 else "small" for i in range(n)]),
        }
    )
    out = stratified_hash_sample(
        rd.from_arrow(t), "k", "cls", {"big": 0.1, "small": 1.0}
    ).to_pandas()
    small = out[out["cls"] == "small"]
    big = out[out["cls"] == "big"]
    assert len(small) == n // 2  # rate 1.0 keeps every row
    assert 100 < len(big) < 300  # ~10%
    # stratum absent from fracs -> dropped entirely
    out2 = stratified_hash_sample(rd.from_arrow(t), "k", "cls", {"small": 0.5}).to_pandas()
    assert (out2["cls"] == "small").all()


def test_token_counts_matches_re(ray_session):
    import re

    from modlyn_ray.stages.text import BPE_SPLIT_PATTERN, token_counts

    texts = ["Hello, world! It's 42", "", "a1b2 c--d  __x", "naïve café—ok?"]
    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)), "text": texts})
    out = token_counts(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    pat = re.compile(BPE_SPLIT_PATTERN)
    want = [len(pat.findall(s)) for s in texts]
    assert out["n_tokens"].tolist() == want
    assert out.loc[out["doc_id"] == 1, "chars_per_token"].iloc[0] == 0.0


def test_pivot_wide_counts_and_sums(ray_session):
    from modlyn_ray.stages.aggregates import pivot_wide

    t = pa.table(
        {
            "g": pa.array(["x", "x", "y", "y", "y"]),
            "cat": pa.array(["a", "b", "a", "a", "c"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    cnt = (
        pivot_wide(rd.from_arrow(t).repartition(3), ["g"], "cat")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert cnt[["a", "b", "c"]].to_numpy().tolist() == [[1, 1, 0], [2, 0, 1]]
    sums = (
        pivot_wide(rd.from_arrow(t), ["g"], "cat", value_col="v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert sums[["a", "b", "c"]].to_numpy().tolist() == [[1.0, 2.0, 0.0], [7.0, 0.0, 5.0]]
    # explicit category list pins the schema even if a category is absent
    pinned = pivot_wide(rd.from_arrow(t), ["g"], "cat", categories=["a", "b", "c", "z"])
    assert "z" in pinned.to_pandas().columns


def test_tfidf_terms_matches_direct(ray_session):
    from modlyn_ray.stages.text import tfidf_terms

    texts = ["a b b c", "a c", "d d d", "a"]
    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)), "text": texts})
    out = tfidf_terms(rd.from_arrow(t)).to_pandas().sort_values("word")
    # direct oracle
    from collections import Counter

    occ, df = Counter(), Counter()
    for txt in texts:
        ws = txt.split(" ")
        occ.update(ws)
        df.update(set(ws))
    for _, r in out.iterrows():
        assert r["occ"] == occ[r["word"]]
        assert r["df"] == df[r["word"]]
        np.testing.assert_allclose(
            r["tfidf"], occ[r["word"]] * np.log(4.0 / df[r["word"]]), rtol=1e-12
        )

def test_streaming_query_equals_batch_sessionize(ray_session):
    """q35 (streaming actors over an ordered log) must byte-match the batch
    windowize sessionizer — the same 30-min-gap rule, two execution paths.
    (The standalone batch query was folded into q35's oracle in round 5;
    this test keeps the batch path value-checked.)"""
    import ray.data as rd

    from modlyn_ray.pipelines.queries import q35_streaming_sessionize
    from modlyn_ray.stages.temporal import windowize

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    batch = (
        windowize(
            ds,
            sessionize=True,
            session_gap_us=30 * 60 * 1_000_000,
            session_on_source_change=False,
            by="user_id",
            ts_col="ts",
            tie_col="event_id",
            n_buckets=32,
        )
        .to_pandas()
    )
    batch["session_id"] = batch["session_id"].astype(np.int64)
    batch = (
        batch[["event_id", "session_id"]].sort_values("event_id").reset_index(drop=True)
    )
    stream = q35_streaming_sessionize(sf).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(batch, stream)


def test_minhash_query_covers_exact_dups(ray_session):
    """q32: rows cover every doc exactly once; byte-identical docs must land
    in the same cluster with exactly one keeper."""
    from modlyn_ray.pipelines.queries import q32_minhash_dedup

    sf = "/root/testdata/sf0.001"
    out = q32_minhash_dedup(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    j = out.merge(docs, on="doc_id")
    for _txt, grp in j.groupby("text"):
        assert grp["cluster_id"].nunique() == 1
    keepers = out.groupby("cluster_id")["is_kept"].sum()
    assert (keepers == 1).all()

def test_hll_accuracy_and_merge(ray_session):
    from modlyn_ray.stages.sketches import (
        approx_distinct,
        hll_estimate,
        hll_register_partial,
        merge_registers,
    )

    n = 20_000
    vals = pa.array([f"user_{i % 7919}" for i in range(n)])  # 7919 distinct
    # accuracy on one block
    est = hll_estimate(hll_register_partial(vals, p=12))
    assert abs(est - 7919) / 7919 < 0.05
    # merge(a, b) == whole: registers are a max-semilattice
    a = hll_register_partial(vals.slice(0, n // 2), p=12)
    b = hll_register_partial(vals.slice(n // 2), p=12)
    whole = hll_register_partial(vals, p=12)
    assert (merge_registers(a, b) == whole).all()
    # distributed path: estimate is partitioning-invariant
    t = pa.table({"u": vals})
    e1 = approx_distinct(rd.from_arrow(t).repartition(1), "u")
    e7 = approx_distinct(rd.from_arrow(t).repartition(7), "u")
    assert e1 == e7
    assert abs(e1 - 7919) / 7919 < 0.05
    # int columns hash through the same DuckDB kernel
    ints = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64) % 1000)})
    ei = approx_distinct(rd.from_arrow(ints), "k")
    assert abs(ei - 1000) / 1000 < 0.08

def test_mg_heavy_hitters_exact_and_bounded(ray_session):
    from modlyn_ray.stages.sketches import heavy_hitters, mg_merge, mg_partial

    # skewed corpus: value i appears (50-i)^2 times
    reps = [(f"v{i:02d}", (50 - i) ** 2) for i in range(50)]
    vals = [v for v, c in reps for _ in range(c)]
    rng = np.random.default_rng(0)
    vals = [vals[j] for j in rng.permutation(len(vals))]
    t = pa.table({"c": pa.array(vals)})

    # capacity >= distinct -> exact, any partitioning
    out = heavy_hitters(rd.from_arrow(t).repartition(5), "c", k=3, capacity=64)
    assert out["value"].tolist() == ["v00", "v01", "v02"]
    assert out["count"].tolist() == [2500, 2401, 2304]

    # truncating regime: top item survives with count within n/(cap+1) * #merges
    n = len(vals)
    cap = 8
    out2 = heavy_hitters(rd.from_arrow(t).repartition(5), "c", k=3, capacity=cap)
    assert "v00" in out2["value"].tolist()
    got = int(out2.loc[out2["value"] == "v00", "count"].iloc[0])
    assert got <= 2500 and 2500 - got <= n  # lower bound, bounded error

    # merge law: mg_merge(a, b) over disjoint halves covers the top item
    # with the same guarantee as one pass
    a = mg_partial(pa.array(vals[: n // 2]), cap)
    b = mg_partial(pa.array(vals[n // 2 :]), cap)
    m = mg_merge(a, b, cap)
    assert len(m) <= cap
    assert m.get("v00", 0) <= 2500 and 2500 - m.get("v00", 0) <= 2 * (n // 2)
