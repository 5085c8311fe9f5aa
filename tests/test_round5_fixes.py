"""Round-5 regressions: the compact (hi/lo split) exchange encoding on the
fused PIT shuffle must be byte-identical to the legacy encoding, exact on
adversarial bit patterns, and loud on every documented bound."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modlyn_ray.pipelines.flagship import (
    _pack_hi_lo,
    _unpack_hi_lo,
    pit_features,
    row_mix_values,
)


def _sorted_pdf(ds):
    df = ds.to_pandas()
    key = ["doc_id", "ingest_ts", "seq_no"]
    return df.sort_values(key).reset_index(drop=True)


@pytest.mark.parametrize(
    "emit_tokens,narrow_tokens",
    [(True, True), (True, False), (False, False)],
)
def test_compact_exchange_byte_identical(ray_session, emit_tokens, narrow_tokens):
    import ray.data as rd

    from modlyn_ray import synth

    p = synth.PROFILES["small"]
    seqs, attrs = synth.make_sequences(p), synth.make_doc_attrs(p)
    kw = dict(n_buckets=8, emit_tokens=emit_tokens, narrow_tokens=narrow_tokens)
    a = _sorted_pdf(
        pit_features(rd.from_arrow(seqs), rd.from_arrow(attrs), compact_exchange=True, **kw)
    )
    b = _sorted_pdf(
        pit_features(rd.from_arrow(seqs), rd.from_arrow(attrs), compact_exchange=False, **kw)
    )
    assert sorted(a.columns) == sorted(b.columns)
    b = b[a.columns]
    for c in a.columns:
        if a[c].dtype == object:
            assert all(
                np.array_equal(x, y) for x, y in zip(a[c].to_numpy(), b[c].to_numpy())
            ), c
        else:
            assert a[c].equals(b[c]), c


def test_pack_hi_lo_roundtrip_adversarial_bits():
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, size=1000),
            np.array(
                [0, -1, 1, 2**31, -(2**31), 2**32, -(2**32), 2**63 - 1, -(2**63)],
                dtype=np.int64,
            ),
            # float64 bit patterns (the attr_val slot): negatives, subnormals
            rng.standard_normal(500).view(np.int64),
        ]
    ).astype(np.int64)
    mask = rng.random(len(vals)) < 0.1
    for dict_hi in (True, False):
        hi, lo = _pack_hi_lo(vals, mask, "t", dict_hi=dict_hi)
        out, out_mask = _unpack_hi_lo(hi, lo)
        np.testing.assert_array_equal(out_mask, mask)
        np.testing.assert_array_equal(out[~mask], vals[~mask])


def test_pack_hi_lo_chunked_decode_never_unifies():
    # two chunks with disjoint dictionaries decode independently
    a = np.array([1 << 32, 2 << 32], dtype=np.int64)
    b = np.array([3 << 32, (4 << 32) + 7], dtype=np.int64)
    ha, la = _pack_hi_lo(a, None, "t")
    hb, lb = _pack_hi_lo(b, None, "t")
    hi = pa.chunked_array([ha, hb])
    lo = pa.chunked_array([la, lb])
    out, mask = _unpack_hi_lo(hi, lo)
    np.testing.assert_array_equal(out, np.concatenate([a, b]))
    assert not mask.any()


def test_pack_hi_lo_raises_on_hi_cardinality():
    vals = (np.arange(40000, dtype=np.int64) << 32)
    with pytest.raises(ValueError, match="distinct high-32 words"):
        _pack_hi_lo(vals, None, "ingest_ts")


def test_compact_exchange_preserves_null_attr_val(ray_session):
    import ray.data as rd

    seqs = pa.table(
        {
            "doc_id": pa.array(["d1", "d1", "d2"]),
            "tokens": pa.array([[1, 2], [3], [4, 5, 6]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, 3], type=pa.int32()),
            "source": pa.array(["s", "s", "s"]),
            "ingest_ts": pa.array([100, 200, 150], type=pa.timestamp("us")),
            "seq_no": pa.array([0, 1, 2], type=pa.int64()),
        }
    )
    attrs = pa.table(
        {
            "doc_id": pa.array(["d1", "d2"]),
            "ingest_ts": pa.array([50, 60], type=pa.timestamp("us")),
            "attr_val": pa.array([None, -2.5], type=pa.float64()),
        }
    )
    out = _sorted_pdf(
        pit_features(rd.from_arrow(seqs), rd.from_arrow(attrs), n_buckets=4)
    )
    by_doc = dict(zip(out["doc_id"], out["attr_val_asof"]))
    assert np.isnan(by_doc["d1"])  # null attr round-trips as null, not 0.0
    assert by_doc["d2"] == -2.5
    # token passthrough stays byte-identical
    assert [list(t) for t in out["tokens"]] == [[1, 2], [3], [4, 5, 6]]
    assert row_mix_values(pa.array([[1, 2]], type=pa.list_(pa.int32()))).dtype == np.int64


# ---- post-review regressions (round-5 code-review findings) ----


def test_audio_features_zero_frame_wav_real_decode(ray_session):
    """A structurally valid zero-frame PCM WAV must featurize to a clean
    all-zero envelope, not kill the actor batch with an IndexError."""
    from modlyn_ray.stages import codecs
    from modlyn_ray.stages.multimodal import MediaFeaturizer

    payload = codecs.encode_wav(np.zeros((0, 2), dtype=np.float32), 8000)
    batch = pa.table(
        {
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["audio"]),
            "payload": pa.array([payload], type=pa.binary()),
            "meta_w": pa.array([8000], type=pa.int32()),
            "meta_h": pa.array([2], type=pa.int32()),
        }
    )
    out = MediaFeaturizer(feature_dim=8, decode="real")(batch)
    feats = np.asarray(out["features"][0].as_py(), dtype=np.float32)
    assert feats.shape == (8,)
    assert np.isfinite(feats).all()
    assert feats[0] == 0.0  # log1p(duration=0)
    assert (feats[4:] == 0.0).all()  # empty envelope bins


def test_media_featurizer_validates_feature_dim():
    from modlyn_ray.stages.multimodal import MediaFeaturizer

    with pytest.raises(ValueError, match="feature_dim >= 6"):
        MediaFeaturizer(feature_dim=4, decode="real")
    with pytest.raises(ValueError, match="1 <= feature_dim <= 16"):
        MediaFeaturizer(feature_dim=20, decode="fake")
    MediaFeaturizer(feature_dim=6, decode="real")  # boundary constructs


def test_row_token_counts_rejects_negative_ids():
    """Negative token ids would silently wrap on the narrow padded path and
    break row*vmax+tok injectivity on the fallback — must raise loudly."""
    from modlyn_ray.stages.count_stats import _row_token_counts

    flat = np.asarray([-(2**40), 5, 5], dtype=np.int64)
    lens = np.asarray([3], dtype=np.int64)
    with pytest.raises(ValueError, match="negative token id"):
        _row_token_counts(flat, lens, 6)
    # tiny negative on the would-be uint16 path raises too
    with pytest.raises(ValueError, match="negative token id"):
        _row_token_counts(np.asarray([-1, 2], np.int64), np.asarray([2], np.int64), 3)


def test_composite_key_separator_injection():
    """('a\\x1fb','c') and ('a','b\\x1fc') must render DIFFERENT composites
    (the length prefix disambiguates a separator inside a value)."""
    from modlyn_ray.stages.tokenops import _composite_key

    g = pa.array(["a\x1fb", "a"])
    k = pa.array(["c", "b\x1fc"])
    out = _composite_key(g, k).to_pylist()
    assert out[0] != out[1]
    # equal pairs still render equal across chunked/plain layouts
    gc = pa.chunked_array([["a\x1fb"], []])
    kc = pa.chunked_array([["c"], []])
    assert _composite_key(gc, kc).to_pylist()[0] == out[0]


def test_media_featurizer_strict_shares_digest_bound():
    """strict falls through to the fake path when PIL is importable, so it
    must share the 16-wide digest bound at construction."""
    from modlyn_ray.stages.multimodal import MediaFeaturizer

    with pytest.raises(ValueError, match="1 <= feature_dim <= 16"):
        MediaFeaturizer(feature_dim=20, decode="strict")
    MediaFeaturizer(feature_dim=16, decode="strict")  # boundary constructs


# ---- second-review fixes: temporal/joins hardening ----


def _ts(us):
    return pa.array(us, type=pa.timestamp("us"))


def test_asof_tiebreak_null_value_loses_to_real(ray_session):
    """At a tied right timestamp, a NULL value must lose to a real value
    (SQL max() ignores nulls) — nulls sort first in the tie-break."""
    import ray.data as rd

    from modlyn_ray.stages.temporal import asof_join

    left = pa.table({"doc_id": ["u1"], "ingest_ts": _ts([100]), "seq_no": pa.array([0], pa.int64())})
    right = pa.table(
        {
            "doc_id": ["u1", "u1"],
            "ingest_ts": _ts([10, 10]),
            "attr_val": pa.array([None, 5.0], type=pa.float64()),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right), value_cols=["attr_val"], n_buckets=2
    ).to_pandas()
    assert out["attr_val_asof"].tolist() == [5.0]


def test_asof_list_value_cols_and_int64_precision(ray_session):
    """List-typed value columns ride the Arrow take (never pandas), and
    int64 values survive exactly even when other rows are unmatched."""
    import ray.data as rd

    from modlyn_ray.stages.temporal import asof_join

    big = 9007199254740993  # 2**53 + 1: corrupted by a float64 round-trip
    left = pa.table(
        {
            "doc_id": ["a", "b"],
            "ingest_ts": _ts([100, 100]),
            "seq_no": pa.array([0, 1], pa.int64()),
        }
    )
    right = pa.table(
        {
            "doc_id": ["a"],  # doc b unmatched -> forces the NaN path
            "ingest_ts": _ts([50]),
            "ref_id": pa.array([big], pa.int64()),
            "toks": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        value_cols=["ref_id", "toks"], n_buckets=2,
    ).take_batch(10, batch_format="pyarrow")
    # (arrow consumption: Ray's to_pandas tensor extension rejects a ragged
    # list column holding a null — the join output itself is fine)
    rows = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    assert out["ref_id_asof"][rows["a"]].as_py() == big
    assert out["toks_asof"][rows["a"]].as_py() == [1, 2, 3]
    assert out["ref_id_asof"][rows["b"]].as_py() is None


def test_asof_rejects_value_col_clash(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.temporal import asof_join, range_join

    left = pa.table({"doc_id": ["a"], "ingest_ts": _ts([1]), "attr_val": pa.array([1.0])})
    right = pa.table({"doc_id": ["a"], "ingest_ts": _ts([1]), "attr_val": pa.array([2.0])})
    with pytest.raises(ValueError, match="clash with left schema"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), value_cols=["attr_val"])
    with pytest.raises(ValueError, match="clash with left schema"):
        range_join(rd.from_arrow(left), rd.from_arrow(right), value_cols=["attr_val"])


def test_windowize_rejects_null_timestamps(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.temporal import windowize

    t = pa.table(
        {
            "doc_id": ["a", "a"],
            "ingest_ts": pa.array([100, None], type=pa.timestamp("us")),
            "seq_no": pa.array([0, 1], pa.int64()),
            "v": pa.array([1.0, 2.0]),
        }
    )
    with pytest.raises(Exception, match="null timestamps"):
        windowize(rd.from_arrow(t), lag_cols=["v"], n_buckets=2).to_pandas()


def test_windowize_null_partition_keys_form_one_group(ray_session):
    """SQL PARTITION BY groups NULL keys into ONE partition — lag within
    the null group must see the previous null-key row, warning-free."""
    import warnings

    import ray.data as rd

    from modlyn_ray.stages.temporal import windowize

    t = pa.table(
        {
            "doc_id": pa.array([None, "a", None], type=pa.string()),
            "ingest_ts": _ts([10, 20, 30]),
            "seq_no": pa.array([0, 1, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = (
            windowize(rd.from_arrow(t), lag_cols=["v"], n_buckets=2)
            .to_pandas()
            .sort_values("seq_no")
            .reset_index(drop=True)
        )
    assert pd.isna(out.loc[0, "lag1_v"])  # first null-key row: no predecessor
    assert out.loc[2, "lag1_v"] == 1.0  # second null-key row lags the first


def test_heavy_key_routing_works_for_int_keys(ray_session):
    """detect_heavy_keys output must actually route int64 hot keys to their
    dedicated bucket (string-rendering match in the bucket kernel)."""
    import ray.data as rd

    from modlyn_ray.stages.temporal import add_bucket_column

    ids = [7] * 80 + list(range(100, 120))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    bds = add_bucket_column(rd.from_arrow(t), n_buckets=8, heavy={7: 8}).to_pandas()
    hot = bds[bds["doc_id"] == 7]
    assert (hot["bucket"] == 8).all()
    assert (bds[bds["doc_id"] != 7]["bucket"] < 8).all()


def test_joins_schema_tolerates_pandas_blocks(ray_session):
    """hash_equi_join on a pandas-backed upstream dataset must not crash on
    the schema probe."""
    import ray.data as rd

    from modlyn_ray.stages.joins import hash_equi_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b"]), "x": pa.array([1, 2], pa.int64())})
    ).map_batches(lambda df: df, batch_format="pandas")
    right = rd.from_arrow(
        pa.table({"k": pa.array(["a"]), "y": pa.array([10], pa.int64())})
    )
    out = hash_equi_join(left, right, "k", "k", ["y"], n_buckets=2).to_pandas()
    assert sorted(out["k"]) == ["a"]
    assert out["y"].tolist() == [10]


def test_logreg_batch_rtc_rejects_negative_ids():
    from modlyn_ray.stages.logreg import batch_rtc

    b = pa.table(
        {
            "tokens": pa.array([[1, -3]], pa.list_(pa.int32())),
            "source": pa.array(["s0"]),
        }
    )
    with pytest.raises(ValueError, match="negative token id"):
        batch_rtc(b)


def test_count_stats_rejects_ids_beyond_packed_space(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.count_stats import count_stats

    t = pa.table(
        {
            "source": pa.array(["s0"]),
            "tokens": pa.array([[2**32 - 1]], pa.list_(pa.int64())),
        }
    )
    with pytest.raises(Exception, match="packed key space"):
        count_stats(rd.from_arrow(t)).to_pandas()


def test_count_stats_loud_on_unknown_label(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.count_stats import count_stats

    t = pa.table(
        {
            "source": pa.array(["s0", "zzz"]),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        }
    )
    with pytest.raises(Exception, match="absent from the class set"):
        count_stats(rd.from_arrow(t), classes=["s0"]).to_pandas()


def test_bias_weight_decay_matches_torch_semantics():
    """Adam with weight_decay must decay the bias too: with zero-token
    input and one step, gb = d + wd*b — verify the trainer's b moves as
    the closed-form single-step Adam update predicts."""
    from modlyn_ray.stages.logreg import AdamState

    b = np.array([0.5, -0.5])
    d = np.array([0.1, -0.1])
    wd = 1e-2
    gb = d + wd * b
    sb = AdamState.like(b)
    b2 = b.copy()
    sb.update(b2, gb, 1e-2)
    # first Adam step moves by -lr * sign(g) (bias-corrected m/v ratio = sign)
    np.testing.assert_allclose(b2, b - 1e-2 * np.sign(gb), rtol=1e-6)


# ---- third-review fixes: dedup/ann/embed hardening ----


def test_exact_dedup_keeps_null_rows_and_whole_min_row(ray_session):
    """Null-text rows must survive as ONE group (SQL GROUP BY), and the
    kept row must be the min-id ROW verbatim — not a per-column 'first'
    franken-row backfilled from other group members."""
    import ray.data as rd

    from modlyn_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", None, "a", None]),
            "meta": pa.array([None, None, "x", "y"]),
        }
    )
    out = (
        exact_dedup(rd.from_arrow(t), col="text", id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["dup_count"].tolist() == [2, 2]
    # the min-id rows had meta=None; a franken-row would show 'x'/'y'
    assert out["meta"].isna().all()


def test_dedup_anti_join_keeps_null_key_left_rows(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.dedup import _anti_join

    left = pa.table(
        {"k": pa.array(["a", None, "b"]), "x": pa.array([1, 2, 3], pa.int64())}
    )
    right = pa.table({"k": pa.array(["a", None])})
    out = _anti_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "k", n_buckets=2
    ).to_pandas()
    # 'a' matched -> dropped; null NEVER matches (NOT EXISTS keeps it); 'b' kept
    assert sorted(out["x"].tolist()) == [2, 3]


def test_knn_lsh_probe_hamming_two_probes_all_flips(ray_session):
    """probe_hamming=2 must reach hamming-2 buckets (it silently behaved
    as 1 before) — with few planes, probing every 2-flip finds the true
    neighbor that hamming-1 probing misses."""
    import ray.data as rd

    from modlyn_ray.stages.ann import knn_brute, knn_lsh

    rng = np.random.default_rng(19)
    E = rng.standard_normal((300, 12))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(E.tolist(), pa.list_(pa.float64())),
        }
    )
    q = (np.array([0, 5]), E[[0, 5]])
    brute = knn_brute(rd.from_arrow(t), q, k=5)
    r2 = knn_lsh(rd.from_arrow(t), q, k=5, n_planes=6, probe_hamming=2)
    r6 = knn_lsh(rd.from_arrow(t), q, k=5, n_planes=6, probe_hamming=6)
    # probing every bucket (hamming <= n_planes) must equal brute force
    for qid in (0, 5):
        want = set(brute[brute["query_id"] == qid]["neighbor_id"])
        full = set(r6[r6["query_id"] == qid]["neighbor_id"])
        assert full == want
        # recall is monotone in probe_hamming (r2 sees a superset of r1's
        # candidate buckets; its top-k may differ from full's, so subset
        # of full is NOT the invariant)
        r1 = knn_lsh(rd.from_arrow(t), q, k=5, n_planes=6, probe_hamming=1)
        got1 = set(r1[r1["query_id"] == qid]["neighbor_id"])
        got2 = set(r2[r2["query_id"] == qid]["neighbor_id"])
        assert len(got2 & want) >= len(got1 & want)
        assert len(got2) > 0


def test_embedding_dedup_empty_and_singleton_bucket_schema(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.dedup import embedding_dedup

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.string()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }
    )
    d = embedding_dedup(rd.from_arrow(empty))
    assert d.count() == 0
    assert d.schema().names == ["a", "b", "cosine"]

    # string ids + all-singleton buckets: empty pair frames must carry the
    # STRING id dtype, or schema unification fails downstream
    rng = np.random.default_rng(21)
    E = rng.standard_normal((40, 8))
    t = pa.table(
        {
            "vec_id": pa.array([f"d{i}" for i in range(40)]),
            "embedding": pa.array(E.tolist(), pa.list_(pa.float64())),
        }
    )
    pairs = embedding_dedup(rd.from_arrow(t), threshold=0.999999).to_pandas()
    assert len(pairs) == 0  # random vectors: no near-dups at this threshold


# ---- fourth-review fixes: text/aggregates/ranks/streaming hardening ----


def test_pivot_wide_int_pivot_column_not_zeroed(ray_session):
    """Int-typed pivot columns must produce real counts — the str()-cast
    categories previously reindexed against raw int column labels and
    silently zeroed the whole output."""
    import ray.data as rd

    from modlyn_ray.stages.aggregates import pivot_wide

    t = pa.table(
        {
            "g": pa.array(["a", "a", "b", "b", "b"]),
            "year": pa.array([2023, 2024, 2023, 2023, None], pa.int64()),
        }
    )
    out = (
        pivot_wide(rd.from_arrow(t), ["g"], "year")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["g", "2023", "2024"]
    assert out["2023"].tolist() == [1, 2]  # null pivot value dropped
    assert out["2024"].tolist() == [1, 0]


def test_grouped_corr_skips_null_pairs(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.aggregates import grouped_corr

    t = pa.table(
        {
            "g": pa.array(["a"] * 4),
            "x": pa.array([1.0, 2.0, None, 3.0]),
            "y": pa.array([2.0, 4.0, 6.0, 6.0]),
        }
    )
    out = grouped_corr(rd.from_arrow(t), "x", "y", ["g"])
    # SQL corr() over the 3 non-null pairs (1,2),(2,4),(3,6) = exactly 1
    assert out["n"].tolist() == [3]
    np.testing.assert_allclose(out["corr"].to_numpy(), [1.0], rtol=1e-12)


def test_rank_null_values_are_peers(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.ranks import rank_kernel

    t = pa.table(
        {
            "user_id": pa.array(["u"] * 4),
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "value": pa.array([5.0, None, None, 7.0]),
        }
    )
    out = rank_kernel(t).to_pandas().sort_values("event_id")
    by_ev = dict(zip(out["event_id"], zip(out["rnk"], out["drnk"])))
    assert by_ev[4] == (1, 1) and by_ev[1] == (2, 2)  # DESC: 7 then 5
    assert by_ev[2] == by_ev[3] == (3, 3)  # NULL peers share the rank, last


def test_word_stats_null_group_survives(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.text import word_stats

    t = pa.table(
        {
            "source": pa.array(["s0", None]),
            "text": pa.array(["hello world", "hello there"]),
        }
    )
    out = word_stats(rd.from_arrow(t), group_col="source").to_pandas()
    assert set(out["source"]) == {"s0", "None"}
    hello = out[out["word"] == "hello"]
    assert len(hello) == 2  # one row per group, no crash / garbage index


def test_streaming_interleaved_keys_and_custom_key(ray_session):
    """A drop in pure event-time order interleaves keys; the actor must
    key-cluster internally so the second run of a key sees fresh state.
    Also: the key parameter must actually be honored."""
    from modlyn_ray.stages.streaming import process_ordered_stream

    HOUR = 3_600_000_000
    t = pa.table(
        {
            "user_id": pa.array(["A", "B", "A"]),
            "ingest_ts": pa.array([0, 60_000_000, 3 * HOUR], pa.timestamp("us")),
            "source": pa.array(["w", "w", "w"]),
        }
    )
    out, _ = process_ordered_stream([t], n_actors=2, key="user_id")
    df = out.to_pandas().sort_values("ingest_ts").reset_index(drop=True)
    a = df[df["user_id"] == "A"]["session_id"].tolist()
    assert a == [0, 1]  # 3h gap starts a new session, not stale state


def test_token_counts_null_text_is_zero(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.text import token_counts

    t = pa.table({"text": pa.array(["one two", None])})
    out = token_counts(rd.from_arrow(t)).to_pandas()
    assert out["n_tokens"].tolist() == [2, 0]


# ---- fifth-review fixes: flagship/rank_stats/checkpoint/jaccard ----


def test_pit_attr_only_bucket_schema_consistent(ray_session):
    """doc_attrs for a doc_id with NO sequence rows: the attr-only bucket
    must emit the full window-column schema, not a narrower block."""
    import ray.data as rd

    from modlyn_ray.pipelines.flagship import pit_features

    seqs = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
            "n_tok": pa.array([2], pa.int32()),
            "source": pa.array(["s0"]),
            "ingest_ts": pa.array([100], pa.timestamp("us")),
            "seq_no": pa.array([0], pa.int64()),
        }
    )
    attrs = pa.table(
        {
            "doc_id": pa.array(["d1", "zz-orphan"]),
            "ingest_ts": pa.array([50, 60], pa.timestamp("us")),
            "attr_val": pa.array([1.5, 9.9]),
        }
    )
    # n_buckets=1 wouldn't isolate; use enough buckets that the orphan is
    # likely alone, and just require the pipeline to complete with a
    # stable schema either way
    out = pit_features(
        rd.from_arrow(seqs), rd.from_arrow(attrs), n_buckets=8, detect_skew=False
    ).to_pandas()
    assert len(out) == 1
    assert {"session_id", "cum_n_tok", "cum_row_mix", "lag1_n_tok"} <= set(out.columns)
    assert out.loc[0, "attr_val_asof"] == 1.5


def test_window_kernel_empty_bucket_schema():
    from modlyn_ray.stages.temporal import window_kernel

    t = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "ingest_ts": pa.array([], pa.timestamp("us")),
            "seq_no": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int32()),
        }
    )
    out = window_kernel(
        t, lag_cols=["n_tok"], lead_cols=["n_tok"], backfill_cols=["n_tok"],
        prefix_sum_cols=["n_tok"], rolling_cols=["n_tok"], sessionize=True,
        session_gap_us=1, session_on_source_change=False,
        by="doc_id", ts_col="ingest_ts", tie_col="seq_no",
    )
    assert {"lag1_n_tok", "lead1_n_tok", "session_id", "cum_n_tok",
            "roll_sum_n_tok", "roll_cnt_n_tok", "n_tok_ffill"} <= set(out.column_names)
    assert len(out) == 0


def test_wilcoxon_max_int31_token_not_swallowed_as_sentinel(ray_session):
    """Token id 2^31-1 must be scored, not consumed as the class-size
    sentinel (which now also requires value == 0)."""
    import ray.data as rd

    from modlyn_ray.stages.rank_stats import wilcoxon_scores

    big = 2**31 - 1
    t = pa.table(
        {
            "source": pa.array(["a", "a", "b", "b"]),
            "tokens": pa.array([[big], [big, big], [1], [1]], pa.list_(pa.int64())),
        }
    )
    out = wilcoxon_scores(rd.from_arrow(t)).to_pandas()
    assert set(out["token_id"]) == {1, big}
    assert np.isfinite(out["score"]).all()


def test_wilcoxon_classes_subset_filters(ray_session):
    import ray.data as rd

    from modlyn_ray.stages.rank_stats import wilcoxon_scores

    t = pa.table(
        {
            "source": pa.array(["a", "b", "control", "a", "b"]),
            "tokens": pa.array([[1], [2], [3], [1, 2], [2]], pa.list_(pa.int32())),
        }
    )
    out = wilcoxon_scores(rd.from_arrow(t), classes=["a", "b"]).to_pandas()
    assert set(out["class"]) == {"a", "b"}
    assert 3 not in set(out["token_id"])  # control rows excluded entirely


def test_partitioned_resume_records_empty_partitions(ray_session, tmp_path):
    """A partition producing zero rows must be recorded complete, or every
    later call re-runs the whole build."""
    import ray.data as rd

    from modlyn_ray.state.checkpoint import run_stage_partitioned

    calls = []

    def build(missing):
        calls.append(list(missing))
        t = pa.table(
            {
                "bucket": pa.array([0, 0, 2], pa.int64()),
                "x": pa.array([1, 2, 3], pa.int64()),
            }
        )
        ms = set(int(m) for m in missing)

        def keep(b: pa.Table) -> pa.Table:
            m = np.isin(b["bucket"].to_numpy(zero_copy_only=False), list(ms))
            return b.filter(pa.array(m))

        return rd.from_arrow(t).map_batches(keep, batch_format="pyarrow")

    out_dir = str(tmp_path / "stage")
    run_stage_partitioned(out_dir, "s", build, all_partitions=[0, 1, 2])
    assert calls == [[0, 1, 2]]  # bucket 1 is empty
    run_stage_partitioned(out_dir, "s", build, all_partitions=[0, 1, 2])
    assert calls == [[0, 1, 2]]  # second call: nothing missing, no rebuild


def test_topk_per_class_deterministic_ties(ray_session):
    import ray.data as rd

    from modlyn_ray.eval.jaccard import topk_per_class

    t = pa.table(
        {
            "class": pa.array(["c"] * 4),
            "token_id": pa.array([7, 3, 9, 1], pa.int32()),
            "score": pa.array([-2.0, 2.0, 2.0, 5.0]),
            "method": pa.array(["m"] * 4),
        }
    )
    out = topk_per_class(rd.from_arrow(t), k=3).to_pandas().sort_values("rank")
    # |5| first, then the three |2| ties resolve by token_id asc -> 3 wins
    assert out["token_id"].tolist() == [1, 3, 7]
    assert out["rank"].tolist() == [1, 2, 3]


# ---- sixth-review fixes: schema/synth/api/cli/codecs/readers ----


def test_validate_sequences_empty_and_null_rows():
    from modlyn_ray.schema import SchemaError, validate_sequences_batch

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string()),
        }
    )
    validate_sequences_batch(empty)  # empty blocks are valid, not an error

    nully = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "tokens": pa.array([None], pa.list_(pa.int32())),
            "n_tok": pa.array([5], pa.int32()),
            "source": pa.array(["s"]),
        }
    )
    with pytest.raises(SchemaError, match="null"):
        validate_sequences_batch(nully)  # pc.all's null-skip hid this


def test_tokens_checksum_sensitive_to_token_zero():
    from modlyn_ray.schema import tokens_checksum

    a = pa.table({"tokens": pa.array([[0, 5]], pa.list_(pa.int32()))})
    b = pa.table({"tokens": pa.array([[5]], pa.list_(pa.int32()))})
    assert tokens_checksum(a) != tokens_checksum(b)


def test_synth_marker_rejects_profile_mismatch(tmp_path):
    from modlyn_ray import synth

    d = str(tmp_path / "corpus")
    synth.write_profile(synth.TINY, d)
    synth.write_profile(synth.TINY, d)  # same profile: cached, fine
    with pytest.raises(ValueError, match="different profile"):
        synth.write_profile(synth.SMALL, d)


def test_compare_scores_rejects_duplicate_method_names():
    from modlyn_ray.api import CompareScores

    df1 = pd.DataFrame({"f": [1.0]}, index=["c"])
    df1.attrs["method_name"] = "m"
    df2 = pd.DataFrame({"f": [2.0]}, index=["c"])
    df2.attrs["method_name"] = "m"
    with pytest.raises(ValueError, match="duplicate method_name"):
        CompareScores([df1, df2]).compute_jaccard_comparison()


def test_encode_wav_short_mono_roundtrip():
    from modlyn_ray.stages.codecs import decode_wav, encode_wav

    samples, rate = decode_wav(encode_wav(np.array([0.1, 0.2, 0.3]), 8000))
    assert samples.shape == (3, 1)  # was misencoded as 1 frame x 3 channels
    assert rate == 8000


def test_memory_reader_honors_columns(ray_session):
    from modlyn_ray.sources.readers import load

    t = pa.table({"a": pa.array([1, 2]), "b": pa.array(["x", "y"])})
    ds = load(t, dataset_type="memory", columns=["a"])
    assert ds.schema().names == ["a"]
    with pytest.raises(TypeError, match="columns"):
        load(t, dataset_type="memory", bogus=1)


def test_fullbatch_fit_runs_val_metrics(ray_session):
    from modlyn_ray import synth
    from modlyn_ray.api import SimpleLogReg

    d = synth.ensure_profile(synth.TINY)
    m = SimpleLogReg(f"{d}/sequences", vocab=synth.TINY.vocab)
    m.fit(strategy="fullbatch", max_steps=2, val_fraction=0.25)
    assert m.model.val_history, "val rows were split off but never evaluated"
    assert "val_loss" in m.model.val_history[-1] or "accuracy" in m.model.val_history[-1]
