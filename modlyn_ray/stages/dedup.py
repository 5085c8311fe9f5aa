"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine — the training-data dedup suite (engine extension; the reference has
no dedup, SURVEY §2.7 U4).

Scale design (the ray_guide dedup pattern):
- exact:   content hash in map_batches -> groupby(hash) -> keep first.
  The shuffle moves only (hash, id) key rows when ``keys_only=True``.
- MinHash: per-batch vectorized shingle->minhash signatures (numpy
  min-reduce over universal-hash permutations) -> explode to
  (band_id, band_hash, doc_id) rows -> groupby bands -> candidate pairs ->
  verified by exact n-gram Jaccard -> min-label propagation for clusters.
- SimHash: 64-bit signature per doc; candidates = equal 16-bit chunks
  (4 bands), verified by Hamming distance.
- embedding: random-hyperplane LSH buckets, within-bucket cosine.

All per-batch kernels are numpy-vectorized; shingle base hashes use
crc32 (process-stable). Candidate verification joins are bucket-local.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(
    ds: Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
    fast_hash: bool = True,
) -> Dataset:
    """Keep the min-id row per distinct value of ``col``.

    Adds ``dup_count`` (group size). The shuffle key is a HASH of the
    value (routing only); exactness comes from grouping by the actual
    value inside each hash bucket, so hash collisions can never merge
    distinct payloads — safe at 10^12 rows where 64-bit birthday
    collisions are expected. ``fast_hash=True`` uses polars' vectorized
    64-bit hash; otherwise md5 (slower, Python loop per row).
    """
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        if fast_hash:
            import polars as pl

            h = pl.from_arrow(batch.select([col])).select(
                pl.col(col).hash(seed=0).reinterpret(signed=True).alias("__h")
            )["__h"].to_arrow()
            return batch.append_column("__h", h.cast(pa.int64()))
        vals = batch[col].to_pylist()
        h = [hashlib.md5(str(v).encode()).hexdigest() for v in vals]
        return batch.append_column("__h", pa.array(h))

    def first_per_value(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by the REAL value (collision-proof)
        g = g.sort_values(id_col, kind="stable")
        out = g.groupby(col, as_index=False, sort=False).agg(
            **{c: (c, "first") for c in g.columns if c != col},
            dup_count=(id_col, "size"),
        )
        return out

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    if keep_cols:
        hashed = hashed.select_columns(list({*keep_cols, col, id_col, "__h"}))
    out = hashed.groupby("__h").map_groups(first_per_value, batch_format="pandas")
    return out.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------
def _word_shingle_hashes(texts: list[str], n: int) -> list[np.ndarray]:
    """Per doc: array of distinct crc32 hashes of word n-gram shingles."""
    out = []
    for t in texts:
        ws = t.split(" ")
        if len(ws) < n:
            sh = {zlib.crc32(t.encode())}
        else:
            sh = {
                zlib.crc32(" ".join(ws[i : i + n]).encode())
                for i in range(len(ws) - n + 1)
            }
        out.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
    return out


def minhash_signatures(
    texts: list[str], num_perm: int = 64, ngram: int = 3, seed: int = 1
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures; sig[p] = min over shingles of
    (a_p * h + b_p mod M) — vectorized per doc."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
    sigs = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, h in enumerate(_word_shingle_hashes(texts, ngram)):
        if len(h) == 0:
            continue
        # (S, P): (a*h + b) mod M with python-int safety via float-free mod
        vals = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(MERSENNE)
        sigs[i] = vals.min(axis=0)
    return sigs


def minhash_lsh_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 1,
) -> Dataset:
    """Near-dup clusters: (id_col, cluster_id, is_kept).

    Pipeline: signatures per batch -> explode (band, band_hash, id) ->
    groupby band bucket -> candidate pairs -> verify exact n-gram Jaccard
    -> connected components via iterative min-label propagation (driver
    rounds over a pairs Dataset; candidate set is LSH-pruned so it is
    orders of magnitude smaller than n^2).
    """
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = [str(x) for x in batch[text_col].to_pylist()]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = minhash_signatures(texts, num_perm, ngram, seed)
        n = len(texts)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        # band hash = crc-mix of the band's rows
        resh = sigs.reshape(n, bands, rows_per_band)
        mixed = resh * np.uint64(0x9E3779B97F4A7C15)
        bh = mixed.sum(axis=2, dtype=np.uint64).view(np.int64).ravel()
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g[id_col].to_numpy()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    banded = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=4096)
    cand = (
        banded.groupby(["band", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    cand_pd = cand.to_pandas().drop_duplicates()  # candidate set: small by design
    if len(cand_pd) == 0:
        ids = ds.select_columns([id_col])
        return ids.map_batches(
            lambda b: b.append_column("cluster_id", b[id_col]).append_column(
                "is_kept", pa.array(np.ones(len(b), dtype=bool))
            ),
            batch_format="pyarrow",
        )

    # verify candidates with exact n-gram Jaccard (broadcast the candidate
    # doc texts — candidate ids are a small subset)
    cand_ids = sorted(set(cand_pd["a"]) | set(cand_pd["b"]))
    cand_set = pa.array(cand_ids)
    texts_pd = (
        ds.select_columns([id_col, text_col])
        .map_batches(
            lambda b: b.filter(pc.is_in(b[id_col], value_set=cand_set)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .set_index(id_col)[text_col]
    )
    sh = {i: set(_word_shingle_hashes([texts_pd[i]], ngram)[0].tolist()) for i in cand_ids}
    verified = []
    for a, b in zip(cand_pd["a"], cand_pd["b"]):
        sa, sb = sh[a], sh[b]
        u = len(sa | sb)
        if u and len(sa & sb) / u >= jaccard_threshold:
            verified.append((a, b))

    # union-find on the verified pair set (provably <= candidate set size)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    roots = {i: find(i) for i in cand_ids}

    def label(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        cl = [roots.get(i, i) for i in ids]
        kept = [c == i for i, c in zip(ids, cl)]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": pa.array(cl, type=batch[id_col].type),
                "is_kept": pa.array(kept),
            }
        )

    return ds.select_columns([id_col]).map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------
def simhash_signatures(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over word hashes weighted by term count (vectorized
    bit-vote accumulation per doc)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        if not ws:
            continue
        hs = np.fromiter(
            (zlib.crc32(w.encode()) for w in ws), dtype=np.uint64, count=len(ws)
        )
        # extend crc32 to 64 bits deterministically
        hs = hs * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        votes = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        score = votes.sum(axis=0) * 2 - len(ws)
        out[i] = np.sum((score > 0).astype(np.uint64) << bits)
    return out


def simhash_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> Dataset:
    """Near-dup pairs (a, b, hamming) with hamming <= max_hamming.

    Candidates = docs sharing any of the four 16-bit signature chunks
    (pigeonhole: hamming <= 3 guarantees one equal chunk), grouped by
    (chunk_idx, chunk_value), verified by popcount."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        texts = [str(x) for x in batch[text_col].to_pylist()]
        sig = simhash_signatures(texts)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        chunk_idx = np.tile(np.arange(4, dtype=np.int64), n)
        chunks = np.empty(4 * n, dtype=np.int64)
        for c in range(4):
            chunks[c::4] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk_idx": pa.array(chunk_idx),
                "chunk_val": pa.array(chunks),
                id_col: pa.array(np.repeat(ids, 4)),
                "sig": pa.array(np.repeat(sig.view(np.int64), 4)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(id_col).sort_values(id_col)
        ids = gg[id_col].to_numpy()
        sigs = gg["sig"].to_numpy().view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sigs[ii] ^ sigs[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep], "hamming": ham[keep]})

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow", batch_size=4096)
    out = sigs.groupby(["chunk_idx", "chunk_val"]).map_groups(pairs, batch_format="pandas")
    # dedupe pairs found in multiple chunks
    return out.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH-bucketed)
# ---------------------------------------------------------------------------
def embedding_dedup(
    ds: Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 3,
    exact: bool = False,
) -> Dataset:
    """Pairs (a, b, cosine) with cosine >= threshold.

    Scale path (default): random-hyperplane LSH signature -> groupby bucket
    -> within-bucket exact cosine (numpy matmul). ``exact=True`` puts
    everything in one bucket (brute force; small inputs / oracle parity).
    """
    dim_probe = ds.take(1)[0][emb_col]
    dim = len(dim_probe)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.stack(
            batch[emb_col].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        if exact:
            b = np.zeros(len(emb), dtype=np.int64)
        else:
            b = (emb @ planes > 0).astype(np.int64) @ (1 << np.arange(n_planes))
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(b),
                emb_col: batch[emb_col],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        E = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(E, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        En = E / norm
        C = En @ En.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = C[ii, jj] >= threshold
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "cosine": C[ii, jj][keep]}
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=8192)
    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
