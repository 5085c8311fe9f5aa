"""Text analysis, dedup and ANN operator tests (oracle = duckdb / numpy)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from modlyn_ray.stages.ann import knn_brute, knn_lsh, make_queries
from modlyn_ray.stages.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash_dedup,
)
from modlyn_ray.stages.text import fingerprint, lang_id, quality_scores, tokenize, word_stats

SF = "/root/testdata/sf0.001"


def test_tokenize_matches_duckdb_split():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    got = tokenize(ds, vocab=1024).select_columns(["doc_id", "n_words", "n_tok"]).to_pandas()
    want = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) AS n_words "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["n_words"].to_numpy() == want["n_words"].to_numpy()).all()
    assert (got["n_tok"] == got["n_words"]).all()


def test_word_stats_matches_duckdb():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    got = (
        word_stats(ds, group_col="source")
        .to_pandas()
        .sort_values(["source", "word"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH ex AS (
          SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
          FROM '{SF}/documents.parquet')
        SELECT source, word, count(*)::BIGINT AS occ,
               count(DISTINCT doc_id)::BIGINT AS df
        FROM ex GROUP BY source, word ORDER BY source, word
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quality_scores():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    got = quality_scores(ds).to_pandas()
    r = got.iloc[0]
    ws = r["text"].split(" ")
    assert r["n_words"] == len(ws)
    assert abs(r["avg_word_len"] - np.mean([len(w) for w in ws])) < 1e-9
    en_stop = {"the", "a", "of", "and", "to"}
    assert abs(r["stop_ratio"] - sum(w in en_stop for w in ws) / len(ws)) < 1e-9
    assert abs(r["distinct_ratio"] - len(set(ws)) / len(ws)) < 1e-9


def test_lang_id():
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4]),
            "text": pa.array(
                [
                    "the cat and the dog of a house",
                    "le chat et la maison de les gens",
                    "der hund und die katze ist gut",
                    "xyz qqq zzz",
                ]
            ),
        }
    )
    got = lang_id(rd.from_arrow(tbl), concurrency=1).to_pandas().sort_values("doc_id")
    assert got["lang_pred"].tolist() == ["en", "fr", "de", "und"]


def test_fingerprint_md5_matches_duckdb():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    got = fingerprint(ds).select_columns(["doc_id", "md5"]).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        f"SELECT doc_id, md5(text) AS md5 FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert got["md5"].tolist() == want["md5"].tolist()


def _dup_docs() -> pa.Table:
    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red green blue yellow purple orange pink black white gray",
    ]
    texts, ids = [], []
    i = 0
    for b in base:
        for _ in range(3):  # exact dups
            texts.append(b)
            ids.append(i)
            i += 1
        # near dup: one word changed
        texts.append(b.replace(b.split()[0], "CHANGED"))
        ids.append(i)
        i += 1
    texts.append("totally different words entirely unique here nothing shared")
    ids.append(i)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def test_exact_dedup():
    tbl = _dup_docs()
    out = exact_dedup(rd.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    # 3 groups of 3 exact dups + 3 near-dups + 1 unique = 7 kept
    assert len(out) == 7
    assert out[out["dup_count"] == 3]["doc_id"].tolist() == [0, 4, 8]
    want = duckdb.sql(
        "SELECT count(*) FROM (SELECT text, min(doc_id) FROM tbl GROUP BY text)"
    ).fetchone()[0]
    assert len(out) == want


def test_minhash_lsh_dedup():
    tbl = _dup_docs()
    out = minhash_lsh_dedup(
        rd.from_arrow(tbl), jaccard_threshold=0.5, num_perm=64, bands=16
    ).to_pandas()
    cl = out.set_index("doc_id")["cluster_id"]
    # exact dups must cluster together
    assert cl[0] == cl[1] == cl[2]
    assert cl[4] == cl[5] == cl[6]
    # near dup (1 of 8 shingles shared < 0.5) must NOT merge; unique stays alone
    assert cl[12] != cl[8]
    assert (out["is_kept"] == (out["doc_id"] == out["cluster_id"])).all()


def test_minhash_similarity_estimate():
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    sigs = minhash_signatures([a, a, "x1 x2 x3 x4 x5"], num_perm=128)
    assert (sigs[0] == sigs[1]).all()
    assert (sigs[0] == sigs[2]).mean() < 0.2


def test_simhash_dedup():
    tbl = _dup_docs()
    pairs = simhash_dedup(rd.from_arrow(tbl), max_hamming=3).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got and (4, 5) in got  # exact dups at hamming 0
    assert all(h <= 3 for h in pairs["hamming"])


def test_embedding_dedup_and_ann():
    rng = np.random.default_rng(0)
    E = rng.standard_normal((200, 16))
    E[10] = E[5] * 1.7 + rng.standard_normal(16) * 0.01  # near-dup pair
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(list(E.astype(np.float32))),
        }
    )
    ds = rd.from_arrow(tbl)
    pairs = embedding_dedup(ds, threshold=0.95, exact=True).to_pandas()
    assert (5, 10) in {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    # LSH variant finds the same pair (hyperplanes rarely split near-identical vecs)
    pairs_lsh = embedding_dedup(ds, threshold=0.95, n_planes=4).to_pandas()
    assert (5, 10) in {tuple(sorted((a, b))) for a, b in zip(pairs_lsh["a"], pairs_lsh["b"])}

    q = make_queries(ds, 5)
    top = knn_brute(ds, q, k=3)
    assert len(top) == 15
    # oracle: numpy full cosine
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    for qi in range(5):
        c = En[qi] @ En.T
        c[qi] = -np.inf
        want = set(np.argsort(-c)[:3])
        got = set(top[top["query_id"] == qi]["neighbor_id"])
        assert got == want
    # LSH recall vs brute (generous threshold at this tiny scale)
    top_lsh = knn_lsh(ds, q, k=3, n_planes=4)
    joined = top.merge(top_lsh, on=["query_id", "neighbor_id"], how="inner")
    assert len(joined) / len(top) >= 0.5


def test_shingle_kernel_flat_matches_per_doc_reference():
    """The cross-doc vectorized shingle/minhash kernels must be
    bit-identical to the definitional per-doc computation (unique word
    n-gram polynomial hashes; multiply-shift min per permutation),
    including short-doc crc32 fallback, empty strings, duplicate docs,
    Arrow vs list input, and docs crossing the 2^16-shingle tile."""
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc

    from modlyn_ray.stages.dedup import _word_shingle_hashes_flat

    def ref_shingles(text: str, n: int) -> np.ndarray:
        ws = text.split(" ")
        if len(ws) < n:
            return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
        P = np.uint64(1099511628211)
        out = []
        with np.errstate(over="ignore"):
            for i in range(len(ws) - n + 1):
                h = np.uint64(0)
                for w in ws[i : i + n]:
                    h = h * P + np.uint64(zlib.crc32(w.encode()))
                out.append(h)
        return np.unique(np.array(out, dtype=np.uint64))

    rng = np.random.default_rng(11)
    texts = [
        " ".join(f"w{v}" for v in rng.integers(0, 80, int(rng.integers(0, 12))))
        for _ in range(400)
    ]
    texts += ["", "a b", texts[0], " ".join(f"t{v}" for v in rng.integers(0, 999, 70000))]
    flat, offs = _word_shingle_hashes_flat(texts, 3)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        seg = flat[offs[i] : offs[i + 1]]
        assert np.array_equal(seg, ref_shingles(t, 3)), i
        assert np.array_equal(seg, np.sort(seg))  # sorted within doc

    # signatures: definitional min over permutations, list vs Arrow input
    num_perm = 32
    rng2 = np.random.default_rng(1)
    a = (
        rng2.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)
    ) | np.uint64(1)
    b = rng2.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    sigs = minhash_signatures(texts, num_perm=num_perm, seed=1)
    sigs_arrow = minhash_signatures(
        pa.array(texts, type=pa.string()), num_perm=num_perm, seed=1
    )
    assert np.array_equal(sigs, sigs_arrow)
    with np.errstate(over="ignore"):
        for i in (0, 5, len(texts) - 2, len(texts) - 1):
            h = ref_shingles(texts[i], 3)
            expect = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
            assert np.array_equal(sigs[i], expect), i
