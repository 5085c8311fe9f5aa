"""Regression tests for the round-3 ADVICE findings + round-4 VERDICT items:

1. NULL join keys follow SQL equality (NULL matches nothing, not even NULL)
   in hash_equi_join inner/semi/anti, range_join, and asof_join — previously
   null dictionary indices cast NaN->INT64_MIN and NULL=NULL rows matched.
2. rank_windows groups NULL partition keys into ONE partition (SQL
   PARTITION BY semantics) instead of casting garbage codes.
3. hash_sample / stratified_hash_sample drop null-key and null-stratum rows
   (md5(NULL) is NULL; the SQL oracle's `hash < thr` predicate drops them).
4. pivot_wide raises on category/index-column collisions and post-str()
   duplicate categories instead of silently producing a broken frame.
5. grouped_corr is numerically stable when |mean| >> stddev (shifted
   mergeable moments; the old raw-moment formula cancelled catastrophically
   near 1e9 means).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# 1. NULL join keys: SQL equality semantics
# ---------------------------------------------------------------------------
def _null_key_sides():
    left = pa.table(
        {
            "k": pa.array(["a", None, "b", None, "c"]),
            "lv": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(["a", None, "a", "x"]),
            "rv": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    return left, right


def test_hash_join_null_keys_never_match(ray_session):
    from modlyn_ray.stages.joins import hash_equi_join

    left, right = _null_key_sides()
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)

    inner = hash_equi_join(
        lds, rds, "k", "rk", ["rv"], how="inner", n_buckets=4
    ).to_pandas()
    # only k='a' matches (twice); no NULL=NULL pairs
    assert sorted(inner["lv"]) == [1, 1]
    assert sorted(inner["rv"]) == [10, 30]

    semi = hash_equi_join(lds, rds, "k", "rk", [], how="semi", n_buckets=4).to_pandas()
    assert sorted(semi["lv"]) == [1]

    # NOT EXISTS keeps null-key left rows (the q08 oracle contract)
    anti = hash_equi_join(lds, rds, "k", "rk", [], how="anti", n_buckets=4).to_pandas()
    assert sorted(anti["lv"]) == [2, 3, 4, 5]

    con = duckdb.connect()
    con.register("left_t", left)
    con.register("right_t", right)
    oracle_anti = con.execute(
        "SELECT lv FROM left_t WHERE NOT EXISTS "
        "(SELECT 1 FROM right_t WHERE right_t.rk = left_t.k) ORDER BY lv"
    ).df()["lv"].tolist()
    assert sorted(anti["lv"]) == oracle_anti


def test_range_join_null_keys_never_match(ray_session):
    from modlyn_ray.stages.temporal import range_join

    ts = pa.array(np.array([1_000_000] * 3, dtype="datetime64[us]"))
    left = rd.from_arrow(
        pa.table({"doc_id": pa.array(["a", None, "b"]), "ingest_ts": ts})
    )
    right = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a", None, "c"]),
                "ingest_ts": ts,
                "v": pa.array([1.0, 2.0, 3.0]),
            }
        )
    )
    out = range_join(
        left, right, ["v"], by="doc_id", ts_col="ingest_ts",
        lo_offset_us=-10, hi_offset_us=10, n_buckets=2,
    ).to_pandas()
    # inner semantics: only doc_id='a' pairs; the NULL left row emits nothing
    assert out["doc_id"].tolist() == ["a"]
    assert out["v_rng"].tolist() == [1.0]


def test_asof_join_null_keys_get_null_attrs(ray_session):
    from modlyn_ray.stages.temporal import asof_join

    ts = pa.array(np.array([5_000_000, 5_000_000], dtype="datetime64[us]"))
    left = rd.from_arrow(
        pa.table({"doc_id": pa.array(["a", None]), "ingest_ts": ts})
    )
    right = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a", None]),
                "ingest_ts": pa.array(
                    np.array([1_000_000, 1_000_000], dtype="datetime64[us]")
                ),
                "attr_val": pa.array([7.0, 9.0]),
            }
        )
    )
    out = asof_join(
        left, right, ["attr_val"], by="doc_id", ts_col="ingest_ts", n_buckets=2
    ).to_pandas().sort_values("doc_id", na_position="last")
    assert out["attr_val_asof"].tolist()[0] == 7.0
    assert np.isnan(out["attr_val_asof"].tolist()[1])
    assert pd.isna(out["matched_asof_ts"].tolist()[1])


# ---------------------------------------------------------------------------
# broadcast_inner_join ≡ hash_equi_join (dup keys, misses, NULLs)
# ---------------------------------------------------------------------------
def test_broadcast_inner_join_matches_hash_join(ray_session):
    from modlyn_ray.stages.joins import broadcast_inner_join, hash_equi_join

    rng = np.random.default_rng(3)
    keys = [f"k{i}" for i in range(40)]
    lk = [keys[i] if i % 11 else None for i in rng.integers(0, 40, 500)]
    left = pa.table(
        {"k": pa.array(lk), "lv": pa.array(np.arange(500, dtype=np.int64))}
    )
    # right: duplicate keys (multiplicity 0-2) + one null
    rk = [keys[i] for i in rng.integers(0, 30, 45)] + [None]
    right = pa.table(
        {"rk": pa.array(rk), "rv": pa.array(np.arange(46, dtype=np.int64))}
    )
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    a = (
        broadcast_inner_join(lds, rds, "k", "rk", ["rv"], concurrency=(1, 2))
        .to_pandas()
        .sort_values(["lv", "rv"], ignore_index=True)
    )
    b = (
        hash_equi_join(lds, rds, "k", "rk", ["rv"], how="inner", n_buckets=8)
        .to_pandas()
        .sort_values(["lv", "rv"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 500  # duplication actually exercised


def test_left_outer_join_matches_duckdb(ray_session):
    from modlyn_ray.stages.joins import hash_equi_join

    rng = np.random.default_rng(5)
    keys = [f"k{i}" for i in range(30)]
    lk = [keys[i] if i % 7 else None for i in rng.integers(0, 30, 300)]
    left = pa.table(
        {"k": pa.array(lk), "lv": pa.array(np.arange(300, dtype=np.int64))}
    )
    rk = [keys[i] for i in rng.integers(0, 18, 40)] + [None]
    right = pa.table(
        {"rk": pa.array(rk), "rv": pa.array(np.arange(41, dtype=np.int64))}
    )
    got = (
        hash_equi_join(
            rd.from_arrow(left), rd.from_arrow(right), "k", "rk", ["rv"],
            how="left", n_buckets=8,
        )
        .to_pandas()
        .sort_values(["lv", "rv"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        "SELECT k, lv, rv FROM l LEFT JOIN r ON l.k = r.rk ORDER BY lv, rv"
    ).df()
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["lv"].astype("int64"), want["lv"].astype("int64"), check_names=False
    )
    np.testing.assert_array_equal(
        got["rv"].to_numpy(dtype=np.float64), want["rv"].to_numpy(dtype=np.float64)
    )


# ---------------------------------------------------------------------------
# 2. rank_windows with NULL partition keys
# ---------------------------------------------------------------------------
def test_rank_kernel_null_partition_is_one_group(ray_session):
    from modlyn_ray.stages.ranks import rank_kernel

    tbl = pa.table(
        {
            "user_id": pa.array(["u1", None, "u1", None]),
            "ts": pa.array(np.array([1, 2, 3, 4], dtype="datetime64[us]")),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "value": pa.array([5.0, 1.0, 3.0, 2.0]),
        }
    )
    out = rank_kernel(tbl).to_pandas()
    nulls = out[out["user_id"].isna()].sort_values("event_id")
    # the two NULL rows form one partition: ROW_NUMBER 1,2; value-DESC rank
    assert nulls["rn"].tolist() == [1, 2]
    assert nulls["rnk"].tolist() == [2, 1]  # values 1.0 < 2.0 -> desc ranks
    u1 = out[out["user_id"] == "u1"].sort_values("event_id")
    assert u1["rn"].tolist() == [1, 2]


# ---------------------------------------------------------------------------
# 3. sampling: null keys / null strata are dropped
# ---------------------------------------------------------------------------
def test_hash_sample_drops_null_keys(ray_session):
    from modlyn_ray.stages.sampling import hash_sample

    tbl = pa.table({"k": pa.array(["a", None, "b", None, "c", "d"] * 50)})
    kept = hash_sample(rd.from_arrow(tbl), "k", 1.0, concurrency=(1, 2)).to_pandas()
    # rate 1.0 keeps every NON-NULL row; nulls drop (md5(NULL) IS NULL)
    assert len(kept) == 200
    assert kept["k"].notna().all()
    # at a low rate, nulls must not leak through either (the old bug kept
    # 100% of null-key rows at ANY rate); distinct keys so some survive
    tbl2 = pa.table(
        {"k": pa.array([f"key{i}" if i % 3 else None for i in range(3000)])}
    )
    lo = hash_sample(rd.from_arrow(tbl2), "k", 0.2, concurrency=(1, 2)).to_pandas()
    assert 0 < len(lo) < 1500
    assert lo["k"].notna().all()


def test_stratified_sample_null_stratum_dropped(ray_session):
    from modlyn_ray.stages.sampling import stratified_hash_sample

    tbl = pa.table(
        {
            "k": pa.array([f"r{i}" for i in range(300)]),
            "s": pa.array((["hi", None, "lo"] * 100)),
        }
    )
    kept = stratified_hash_sample(
        rd.from_arrow(tbl), "k", "s", {"hi": 1.0, "lo": 1.0}, concurrency=(1, 2)
    ).to_pandas()
    assert len(kept) == 200
    assert kept["s"].notna().all()


# ---------------------------------------------------------------------------
# 4. pivot_wide category validation
# ---------------------------------------------------------------------------
def test_pivot_wide_rejects_category_collisions(ray_session):
    from modlyn_ray.stages.aggregates import pivot_wide

    ds = rd.from_arrow(
        pa.table({"g": pa.array(["x", "y"]), "cat": pa.array(["g", "g"])})
    )
    with pytest.raises(ValueError, match="collide with index_cols"):
        pivot_wide(ds, ["g"], "cat")
    ds2 = rd.from_arrow(
        pa.table({"g": pa.array(["x", "y"]), "cat": pa.array([1, 2])})
    )
    with pytest.raises(ValueError, match="duplicate after str"):
        pivot_wide(ds2, ["g"], "cat", categories=[1, "1"])


# ---------------------------------------------------------------------------
# pit_features(emit_tokens=False): same features, tokens never shuffled
# ---------------------------------------------------------------------------
def test_pit_features_emit_tokens_false_matches(ray_session, tiny_dir):
    from modlyn_ray.pipelines.flagship import pit_features

    seqs = rd.read_parquet(f"{tiny_dir}/sequences")
    attrs = rd.read_parquet(f"{tiny_dir}/doc_attrs.parquet")
    wide = (
        pit_features(seqs, attrs, n_buckets=8, detect_skew=False)
        .drop_columns(["tokens"])
        .to_pandas()
    )
    slim_ds = pit_features(
        seqs, attrs, n_buckets=8, detect_skew=False, emit_tokens=False
    )
    assert "tokens" not in slim_ds.schema().names
    slim = slim_ds.to_pandas()
    key = ["doc_id", "seq_no"]
    wide = wide.sort_values(key, ignore_index=True)
    slim = slim.sort_values(key, ignore_index=True)[wide.columns]
    pd.testing.assert_frame_equal(wide, slim)


# ---------------------------------------------------------------------------
# hashed n-gram text embeddings (stages/embed.py)
# ---------------------------------------------------------------------------
def _ref_embed(s: str, dim: int) -> np.ndarray:
    """Per-row scalar reference for the vectorized buffer kernel."""
    bs = s.encode("utf-8")
    acc = np.zeros(dim, dtype=np.float64)
    for i in range(len(bs) - 2):
        h = (bs[i] * 1099511628211 + bs[i + 1] * 65599 + bs[i + 2]) % (1 << 64)
        acc[h % dim] += 1.0 if (h >> 47) & 1 else -1.0
    n = np.linalg.norm(acc)
    return acc / n if n else acc


def test_embed_text_matches_scalar_reference(ray_session):
    from modlyn_ray.stages.embed import embed_text

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "ab",            # shorter than one trigram -> zero vector
        "",              # empty
        None,            # null -> treated as empty
        "naïve café — ünïcödé ✓ multibyte",
        "aaaaaaaaaa",    # degenerate repetition
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    out = (
        embed_text(rd.from_arrow(tbl), dim=16, concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
    )
    for i, t in enumerate(texts):
        got = np.asarray(out["embedding"].iloc[i], dtype=np.float64)
        want = _ref_embed(t or "", 16)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(t))


# ---------------------------------------------------------------------------
# quantile sketch (exact=False): rank error <= n/(2K) vs the exact path
# ---------------------------------------------------------------------------
def _rank_of(sorted_vals: np.ndarray, x: float) -> float:
    lo = np.searchsorted(sorted_vals, x, side="left")
    hi = np.searchsorted(sorted_vals, x, side="right")
    return (lo + hi) / 2.0


@pytest.mark.parametrize("override_blocks", [4, 17])
def test_quantile_sketch_rank_error_bound(ray_session, override_blocks):
    from modlyn_ray.stages.aggregates import grouped_quantiles

    rng = np.random.default_rng(11)
    n = 60_000
    g = rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1])
    # skewed continuous values + a heavy duplicated atom
    v = np.exp(rng.normal(0.0, 2.0, n))
    v[rng.random(n) < 0.15] = 3.25
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v)})
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    ds = rd.from_arrow(tbl).repartition(override_blocks)
    K = 256
    got = (
        grouped_quantiles(ds, "v", qs, ["g"], exact=False, sketch_size=K)
        .to_pandas()
        .sort_values(["g", "q"], ignore_index=True)
    )
    assert len(got) == 3 * len(qs)
    for grp in ["a", "b", "c"]:
        vals = np.sort(v[g == grp])
        ng = len(vals)
        sub = got[got["g"] == grp]
        for q, est in zip(sub["q"], sub["value"]):
            target = q * (ng - 1)
            err = abs(_rank_of(vals, est) - target)
            # contract: <= n/(2K) + interpolation slack; assert the
            # VERDICT-required 1% bound with margin (K=256 -> ~0.2%)
            assert err <= max(0.01 * ng, 2.0), (grp, q, err, ng)


def test_quantile_sketch_small_group_is_exact(ray_session):
    from modlyn_ray.stages.aggregates import grouped_quantiles

    # groups smaller than sketch_size in a single batch: sketch == exact
    v = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float64)
    tbl = pa.table({"g": pa.array(["x"] * 4), "v": pa.array(v)})
    got = (
        grouped_quantiles(
            rd.from_arrow(tbl), "v", [0.0, 0.5, 1.0], ["g"], exact=False
        )
        .to_pandas()
        .sort_values("q", ignore_index=True)
    )
    np.testing.assert_allclose(got["value"], [1.0, 2.5, 4.0])


# ---------------------------------------------------------------------------
# 5. grouped_corr numerical stability (|mean| >> stddev)
# ---------------------------------------------------------------------------
def test_grouped_corr_stable_near_large_means(ray_session):
    from modlyn_ray.stages.aggregates import grouped_corr

    rng = np.random.default_rng(42)
    n = 4000
    g = np.repeat(["a", "b"], n // 2)
    base_x = rng.normal(0.0, 1.0, n)
    x = 1e9 + base_x                      # mean 1e9, std 1
    y = 2e9 + 0.5 * base_x + rng.normal(0.0, 0.5, n)
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})
    got = grouped_corr(rd.from_arrow(tbl), "x", "y", ["g"])

    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT g, count(*)::BIGINT AS n, corr(x, y) AS corr FROM t GROUP BY g ORDER BY g"
    ).df()
    assert got["g"].tolist() == want["g"].tolist()
    # 1e9 + O(1) stored as float64 carries ~1e-7 relative representation
    # error in the deviations themselves, so 1e-6 is the honest bound; the
    # old raw-moment formula was off by >1e-2 (or NaN) on this data
    np.testing.assert_allclose(got["corr"], want["corr"], rtol=1e-6)
    # sanity: the correlation really is strong (the old formula returned
    # garbage like NaN or values off by >0.1 on this data)
    assert (got["corr"] > 0.6).all()
