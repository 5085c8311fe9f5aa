"""Stage-level tests for the token-restructuring operators (tokenops):

- chunk_sequences: windows match a plain-Python reference (non-overlap,
  overlapping stride, drop_remainder); token values byte-identical.
- remap_tokens: broadcast table lookup matches numpy; out-of-range raises.
- pack_concat: concat-and-chunk packs match a python reference (order,
  boundaries, short last pack, token content); broadcast == shuffle path;
  partitioning-invariant.
- pack_greedy: capacity + conservation invariants, deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _mk_seqs(rng, n_rows=200, vocab=1000, max_len=17, n_groups=3, int_keys=False):
    lens = rng.integers(0, max_len, n_rows)
    rows = []
    for i in range(n_rows):
        rows.append(
            {
                "doc_id": i * 7 if int_keys else f"d{i:04d}",
                "source": f"s{int(rng.integers(0, n_groups))}",
                "tokens": rng.integers(0, vocab, lens[i]).astype(np.int32).tolist(),
            }
        )
    df = pd.DataFrame(rows)
    df["n_tok"] = df["tokens"].map(len).astype(np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array(df["doc_id"]),
            "source": pa.array(df["source"]),
            "tokens": pa.array(df["tokens"].tolist(), pa.list_(pa.int32())),
            "n_tok": pa.array(df["n_tok"], pa.int32()),
        }
    )
    return df, tbl


def _ref_chunks(df, C, stride, drop_remainder):
    out = []
    for _, r in df.iterrows():
        toks = r["tokens"]
        starts = range(0, max(len(toks), 0), stride)
        for cno, s in enumerate(starts):
            w = toks[s : s + C]
            if not w:
                continue
            if drop_remainder and len(w) < C:
                continue
            out.append((r["doc_id"], cno, tuple(w)))
    return sorted(out)


def test_chunk_sequences_nonoverlap(ray_session):
    from modlyn_ray.stages.tokenops import chunk_sequences

    rng = np.random.default_rng(11)
    df, tbl = _mk_seqs(rng)
    got = chunk_sequences(rd.from_arrow(tbl), chunk_len=5).to_pandas()
    ref = _ref_chunks(df, 5, 5, False)
    have = sorted(
        (r.doc_id, r.chunk_no, tuple(r.tokens)) for r in got.itertuples()
    )
    assert have == ref
    assert (got["n_tok"] == got["tokens"].map(len)).all()


def test_chunk_sequences_overlap_and_drop(ray_session):
    from modlyn_ray.stages.tokenops import chunk_sequences

    rng = np.random.default_rng(12)
    df, tbl = _mk_seqs(rng, n_rows=80)
    for C, s, drop in [(6, 3, False), (6, 3, True), (4, 4, True), (1, 1, False)]:
        got = chunk_sequences(
            rd.from_arrow(tbl), chunk_len=C, stride=s, drop_remainder=drop
        ).to_pandas()
        ref = _ref_chunks(df, C, s, drop)
        have = sorted(
            (r.doc_id, r.chunk_no, tuple(r.tokens)) for r in got.itertuples()
        )
        assert have == ref, (C, s, drop)


def test_remap_tokens_matches_numpy_and_raises(ray_session):
    import pytest

    from modlyn_ray.stages.tokenops import remap_tokens

    rng = np.random.default_rng(13)
    df, tbl = _mk_seqs(rng, n_rows=60, vocab=500)
    table = rng.permutation(500).astype(np.int32)
    got = remap_tokens(rd.from_arrow(tbl), table, concurrency=(1, 2)).to_pandas()
    got = got.set_index("doc_id")
    for _, r in df.iterrows():
        want = table[np.asarray(r["tokens"], dtype=np.int64)].tolist()
        assert list(got.loc[r["doc_id"], "tokens"]) == want

    bad = remap_tokens(rd.from_arrow(tbl), table[:100], concurrency=(1, 2))
    with pytest.raises(Exception, match="out of range"):
        bad.to_pandas()


def _ref_packs(df, C, emit_tokens=True):
    out = {}
    for g, sub in df.sort_values(["source", "doc_id"]).groupby("source", sort=False):
        stream = [t for toks in sub["tokens"] for t in toks]
        for p in range(0, (len(stream) + C - 1) // C):
            w = stream[p * C : (p + 1) * C]
            out[(g, p)] = (len(w), int(np.sum(w, dtype=np.int64)), tuple(w))
    return out


def test_pack_concat_matches_reference(ray_session):
    from modlyn_ray.stages.tokenops import pack_concat

    rng = np.random.default_rng(14)
    df, tbl = _mk_seqs(rng, n_rows=150)
    C = 32
    got = pack_concat(rd.from_arrow(tbl), C, n_buckets=8).to_pandas()
    ref = _ref_packs(df, C)
    assert len(got) == len(ref)
    for r in got.itertuples():
        n, s, w = ref[(r.source, r.pack_no)]
        assert (r.n_tok, r.tok_sum, tuple(r.tokens)) == (n, s, w)
    # every pack except a group's last is exactly full
    last = got.groupby("source")["pack_no"].max()
    full = got[got.apply(lambda r: r["pack_no"] < last[r["source"]], axis=1)]
    assert (full["n_tok"] == C).all()


def test_pack_concat_partitioning_invariant_and_shuffle_path(ray_session):
    from modlyn_ray.stages.tokenops import pack_concat

    rng = np.random.default_rng(15)
    df, tbl = _mk_seqs(rng, n_rows=120, int_keys=True)
    C = 25

    def norm(p):
        return (
            p.drop(columns=["tokens"], errors="ignore")
            .sort_values(["source", "pack_no"])
            .reset_index(drop=True)
        )

    base = norm(pack_concat(rd.from_arrow(tbl), C, n_buckets=8).to_pandas())
    repart = norm(
        pack_concat(rd.from_arrow(tbl).repartition(13), C, n_buckets=3).to_pandas()
    )
    pd.testing.assert_frame_equal(base, repart)

    shuf = norm(
        pack_concat(
            rd.from_arrow(tbl), C, n_buckets=8, offsets_via="shuffle", emit_tokens=False
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(base, shuf)


def test_pack_greedy_invariants(ray_session):
    from modlyn_ray.stages.tokenops import pack_greedy

    rng = np.random.default_rng(16)
    df, tbl = _mk_seqs(rng, n_rows=300, max_len=40)
    C = 64
    got = pack_greedy(rd.from_arrow(tbl), C, n_buckets=8).to_pandas()
    # conservation: every token counted exactly once
    assert got["n_tok"].sum() == int(df["n_tok"].sum())
    assert got["n_docs"].sum() == (df["n_tok"] > 0).sum() + (df["n_tok"] == 0).sum()
    # capacity: packs with >1 doc never exceed C; singleton packs may
    multi = got[got["n_docs"] > 1]
    assert (multi["n_tok"] <= C).all()
    # deterministic
    again = pack_greedy(rd.from_arrow(tbl), C, n_buckets=8).to_pandas()
    a = got.sort_values(["bucket", "pack_no"]).reset_index(drop=True)
    b = again.sort_values(["bucket", "pack_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_filter_tokens_matches_reference(ray_session):
    from modlyn_ray.stages.tokenops import filter_tokens

    rng = np.random.default_rng(17)
    df, tbl = _mk_seqs(rng, n_rows=120, vocab=300)
    remove = set(rng.choice(300, 40, replace=False).tolist())
    got = filter_tokens(
        rd.from_arrow(tbl), remove, vocab=300, concurrency=(1, 2)
    ).to_pandas().set_index("doc_id")
    for _, r in df.iterrows():
        want = [t for t in r["tokens"] if t not in remove]
        assert list(got.loc[r["doc_id"], "tokens"]) == want
        assert got.loc[r["doc_id"], "n_tok"] == len(want)


def test_dedup_by_token_content(ray_session):
    from modlyn_ray.stages.tokenops import dedup_by_token_content

    rng = np.random.default_rng(18)
    df, _ = _mk_seqs(rng, n_rows=100, vocab=50, max_len=6)
    # plant exact content duplicates with later keys
    dup = df.iloc[:20].copy()
    dup["doc_id"] = [f"z{i:04d}" for i in range(20)]
    allr = pd.concat([df, dup], ignore_index=True)
    tbl = pa.table(
        {
            "doc_id": pa.array(allr["doc_id"]),
            "source": pa.array(allr["source"]),
            "tokens": pa.array(allr["tokens"].tolist(), pa.list_(pa.int32())),
            "n_tok": pa.array(allr["n_tok"], pa.int32()),
        }
    )
    got = dedup_by_token_content(rd.from_arrow(tbl), n_buckets=8).to_pandas()
    # reference: min doc_id per distinct token tuple
    ref = {}
    for _, r in allr.iterrows():
        k = tuple(r["tokens"])
        ref[k] = min(ref.get(k, r["doc_id"]), r["doc_id"])
    assert sorted(got["doc_id"]) == sorted(ref.values())
    # content preserved on kept rows
    kept = got.set_index("doc_id")
    for k, d in ref.items():
        assert tuple(kept.loc[d, "tokens"]) == k
    # partitioning invariance
    again = dedup_by_token_content(
        rd.from_arrow(tbl).repartition(7), n_buckets=3
    ).to_pandas()
    assert sorted(again["doc_id"]) == sorted(got["doc_id"])


def test_hash_split_deterministic_and_matches_sql(ray_session):
    import duckdb

    from modlyn_ray.stages.sampling import hash_split

    rng = np.random.default_rng(19)
    df = pd.DataFrame({"k": [f"key{i}" for i in range(2000)],
                       "v": rng.integers(0, 100, 2000)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = hash_split(rd.from_pandas(df), "k", fr, concurrency=(1, 2)).to_pandas()
    t1 = int(0.8 * 65536); t2 = t1 + int(0.1 * 65536); t3 = t2 + int(0.1 * 65536)
    con = duckdb.connect(); con.register("t", df)
    want = con.execute(f"""
        SELECT k, CASE WHEN h < {t1} THEN 'train'
                       WHEN h < {t2} THEN 'val'
                       WHEN h < {t3} THEN 'test' END AS split
        FROM (SELECT k, ('0x' || substr(md5(k), 1, 4))::INT AS h FROM t)
    """).df()
    m = got.merge(want, on="k", suffixes=("_got", "_sql"))
    assert (m["split_got"] == m["split_sql"]).all()
    # same key -> same split under any partitioning
    again = hash_split(rd.from_pandas(df).repartition(11), "k", fr, concurrency=(1, 2)).to_pandas()
    m2 = got.merge(again, on="k", suffixes=("_a", "_b"))
    assert (m2["split_a"] == m2["split_b"]).all()


def test_hash_split_rejects_oversum(ray_session):
    import pytest

    from modlyn_ray.stages.sampling import hash_split
    import ray.data as rdd

    with pytest.raises(ValueError, match="sum above 1"):
        hash_split(rdd.range(10), "id", {"a": 0.7, "b": 0.5})


def test_pack_concat_rejects_duplicate_keys(ray_session):
    import pytest

    from modlyn_ray.stages.tokenops import pack_concat

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "a", "b"]),
            "source": pa.array(["s", "s", "s"]),
            "tokens": pa.array([[1, 2], [3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, 1], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="must be unique"):
        pack_concat(rd.from_arrow(tbl), 4, n_buckets=2).to_pandas()


def test_pack_concat_bucket_token_ceiling_raises_loud(ray_session):
    """The per-merge-bucket int32-offset ceiling (ADVICE r4) fails LOUDLY
    with n_buckets guidance, never silently corrupting offsets — exercised
    by lowering the injectable ceiling instead of materializing 2^31
    tokens."""
    import pytest

    from modlyn_ray.stages.tokenops import pack_concat

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "source": pa.array(["s", "s", "s"]),
            "tokens": pa.array([[1, 2, 3], [4, 5], [6, 7, 8]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2, 3], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="exceeding int32 list offsets"):
        pack_concat(
            rd.from_arrow(tbl), 4, n_buckets=1, max_bucket_tokens=5
        ).to_pandas()
    # same data passes at the real ceiling
    ok = pack_concat(rd.from_arrow(tbl), 4, n_buckets=1).to_pandas()
    assert int(ok["n_tok"].sum()) == 8


def test_pack_concat_auto_routes_shuffle_above_threshold(ray_session):
    """offsets_via='auto' must pick the distributed shuffle attach once the
    doc count exceeds broadcast_max_docs (no driver-resident index), and the
    routed result must equal the broadcast path's."""
    from modlyn_ray.stages.tokenops import pack_concat

    rng = np.random.default_rng(17)
    df, tbl = _mk_seqs(rng, n_rows=120, int_keys=True)
    C = 25

    def norm(p):
        return (
            p.drop(columns=["tokens"], errors="ignore")
            .sort_values(["source", "pack_no"])
            .reset_index(drop=True)
        )

    base = norm(
        pack_concat(
            rd.from_arrow(tbl), C, n_buckets=8, offsets_via="broadcast",
            emit_tokens=False,
        ).to_pandas()
    )
    auto = norm(
        pack_concat(
            rd.from_arrow(tbl), C, n_buckets=8, broadcast_max_docs=10,
            emit_tokens=False,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(base, auto)


def test_pack_concat_auto_rejects_string_keys_above_threshold(ray_session):
    """auto must not silently fall back to a driver-sized broadcast when the
    count demands shuffle but the key type can't ride windowize."""
    import pytest

    from modlyn_ray.stages.tokenops import pack_concat

    rng = np.random.default_rng(18)
    _, tbl = _mk_seqs(rng, n_rows=40, int_keys=False)
    with pytest.raises(ValueError, match="integer/timestamp"):
        pack_concat(rd.from_arrow(tbl), 16, n_buckets=4, broadcast_max_docs=10)


def test_pack_concat_key_reused_across_groups_ok_both_paths(ray_session):
    """The offset attach is keyed on (group, key): the same key value in two
    different groups must NOT cross-match (the round-4 shuffle path joined on
    key alone and silently duplicated rows)."""
    from modlyn_ray.stages.tokenops import pack_concat

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 1, 2], pa.int64()),
            "source": pa.array(["g1", "g1", "g2", "g2"]),
            "tokens": pa.array([[1, 2, 3], [4, 5], [6], [7, 8, 9, 10]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2, 1, 4], pa.int32()),
        }
    )
    want = {
        ("g1", 0): (4, 1 + 2 + 3 + 4, (1, 2, 3, 4)),
        ("g1", 1): (1, 5, (5,)),
        ("g2", 0): (4, 6 + 7 + 8 + 9, (6, 7, 8, 9)),
        ("g2", 1): (1, 10, (10,)),
    }
    for via in ("broadcast", "shuffle"):
        got = pack_concat(
            rd.from_arrow(tbl), 4, n_buckets=3, offsets_via=via
        ).to_pandas()
        assert len(got) == len(want), via
        for r in got.itertuples():
            n, s, w = want[(r.source, r.pack_no)]
            assert (r.n_tok, r.tok_sum, tuple(r.tokens)) == (n, s, w), via


def test_pack_concat_shuffle_path_rejects_duplicate_keys(ray_session):
    """A duplicate (group, key) pair reaching the shuffle attach produces
    overlapping partial spans; the merge exchange must raise, not emit
    corrupt packs."""
    import pytest

    from modlyn_ray.stages.tokenops import pack_concat

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "source": pa.array(["s", "s", "s"]),
            "tokens": pa.array([[1, 2], [3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, 1], pa.int32()),
        }
    )
    with pytest.raises(Exception, match="overlapping|must be unique"):
        pack_concat(
            rd.from_arrow(tbl), 4, n_buckets=2, offsets_via="shuffle"
        ).to_pandas()


def test_packed_key_factory_exact_and_fallbacks(ray_session):
    from modlyn_ray.stages.tokenops import _packed_key_factory

    tbl = pa.table(
        {
            "source": pa.array(["s1", "s0", "s1", "s0"]),
            "doc_id": pa.array([-5, 7, 7, -5], type=pa.int64()),
            "n_tok": pa.array([1, 1, 1, 1], type=pa.int32()),
        }
    )
    mk = _packed_key_factory(rd.from_arrow(tbl), "source", "doc_id")
    assert mk is not None
    keys = mk(tbl).to_pylist()
    # all four (group, key) pairs are distinct -> four distinct packed ints
    assert len(set(keys)) == 4
    # deterministic across calls / batch layouts
    assert mk(tbl.slice(2, 2)).to_pylist() == keys[2:]

    # string keys can't pack -> None
    stbl = pa.table(
        {
            "source": pa.array(["s0"]),
            "doc_id": pa.array(["d0"]),
            "n_tok": pa.array([1], type=pa.int32()),
        }
    )
    assert _packed_key_factory(rd.from_arrow(stbl), "source", "doc_id") is None

    # a group x key-span product that would overflow int64 -> None
    wide = pa.table(
        {
            "source": pa.array(["s0", "s1", "s2", "s3"]),
            "doc_id": pa.array([0, 2**62, 1, 2], type=pa.int64()),
            "n_tok": pa.array([1, 1, 1, 1], type=pa.int32()),
        }
    )
    assert _packed_key_factory(rd.from_arrow(wide), "source", "doc_id") is None


def test_pack_concat_shuffle_negative_keys_matches_broadcast(ray_session):
    """kmin < 0 exercises the (key - kmin) rebase in the packed-int64
    shuffle attach; both attach paths must agree exactly."""
    from modlyn_ray.stages.tokenops import pack_concat

    rng = np.random.default_rng(23)
    df, tbl = _mk_seqs(rng, n_rows=90, int_keys=True)
    neg = pa.array((df["doc_id"].to_numpy() * 3 - 500).astype(np.int64))
    tbl = tbl.set_column(tbl.schema.get_field_index("doc_id"), "doc_id", neg)

    def norm(p):
        return (
            p.sort_values(["source", "pack_no"]).reset_index(drop=True)
        )

    base = norm(
        pack_concat(rd.from_arrow(tbl), 25, n_buckets=8, emit_tokens=False).to_pandas()
    )
    shuf = norm(
        pack_concat(
            rd.from_arrow(tbl), 25, n_buckets=8, offsets_via="shuffle", emit_tokens=False
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(base, shuf)

    # the packed_keys=False A/B lever (string-composite encoding) is
    # semantically identical
    strk = norm(
        pack_concat(
            rd.from_arrow(tbl), 25, n_buckets=8, offsets_via="shuffle",
            emit_tokens=False, packed_keys=False,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(base, strk)


def test_pack_concat_shuffle_rejects_null_keys_both_encodings(ray_session):
    """Null (group, key) values must raise loudly on the shuffle attach —
    the string-composite encoding's inner join would silently DROP them."""
    import pytest

    from modlyn_ray.stages.tokenops import pack_concat

    tbl = pa.table(
        {
            "doc_id": pa.array([1, None, 3], type=pa.int64()),
            "source": pa.array(["s0", "s0", "s1"]),
            "tokens": pa.array([[1, 2], [3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, 1], pa.int32()),
        }
    )
    for packed in (True, False):
        with pytest.raises(Exception, match="not packable"):
            pack_concat(
                rd.from_arrow(tbl), 4, n_buckets=2,
                offsets_via="shuffle", packed_keys=packed,
            ).to_pandas()
    ntbl = tbl.set_column(
        tbl.schema.get_field_index("source"),
        "source",
        pa.array(["s0", None, "s1"]),
    )
    with pytest.raises(Exception, match="not packable"):
        pack_concat(
            rd.from_arrow(ntbl), 4, n_buckets=2, offsets_via="shuffle"
        ).to_pandas()


def test_pack_concat_materializes_index_once(ray_session):
    """The shuffle path's 2-3 index reads must hit a materialized snapshot,
    not re-execute the upstream pipeline per pass."""
    import ray as _ray

    from modlyn_ray.stages.tokenops import pack_concat

    counter = _ray.remote(
        type("C", (), {
            "__init__": lambda self: setattr(self, "n", 0),
            "bump": lambda self: setattr(self, "n", self.n + 1),
            "get": lambda self: self.n,
        })
    ).remote()

    rng = np.random.default_rng(31)
    _, tbl = _mk_seqs(rng, n_rows=60, int_keys=True)

    def spy(b: pa.Table) -> pa.Table:
        _ray.get(counter.bump.remote())
        return b

    ds = rd.from_arrow(tbl).map_batches(
        spy, batch_format="pyarrow", zero_copy_batch=True
    )
    pack_concat(ds, 25, n_buckets=4, offsets_via="shuffle", emit_tokens=False).to_pandas()
    upstream_runs = _ray.get(counter.get.remote())
    # one pass to materialize the index, one for the full-row attach side,
    # plus the join's schema probe (ONE block — the whole pipeline here
    # because the fixture is single-block); without the materialize the
    # stats and windowize passes each re-run upstream too (4+)
    assert upstream_runs <= 3, upstream_runs
