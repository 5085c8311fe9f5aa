"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine — the training-data dedup suite (engine extension; the reference has
no dedup, SURVEY §2.7 U4).

Scale design (the ray_guide dedup pattern):
- exact:   content hash in map_batches -> hash-bucketed vectorized
  keep-first (value-exact inside the bucket, collision-proof).
- MinHash: batch-vectorized shingle->minhash signatures (multiply-shift
  permutations) -> explode to (band_id, band_hash, doc_id) rows ->
  bucketed candidate pairs -> exact n-gram Jaccard verification inside
  union+bucket-groupby joins (shingle sets joined to pairs on both
  sides) -> connected components by iterative hash-partitioned min-label
  propagation. NOTHING materializes on the driver: not candidates, not
  texts, not components — the driver sees only per-round change counts.
- SimHash: 64-bit signature per doc; candidates = equal 16-bit chunks
  (4 bands), verified by tiled (memory-bounded) popcount kernels.
- embedding: random-hyperplane LSH buckets, within-bucket blocked cosine.

Two load-bearing engine patterns live here:
- ``_bucketed_groups``: Ray pays ~ms of overhead PER GROUP in
  map_groups/aggregate — pathological beyond ~10^4 distinct keys — so all
  high-cardinality groupings hash-bucket their keys and run one
  VECTORIZED pandas kernel per bucket.
- ``_attach_payload`` / ``_anti_join``: distributed equi-joins via the
  same union + groupby(crc32-bucket) exchange the as-of join uses.
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
    64-bit hash; otherwise DuckDB's vectorized C md5() kernel (the
    Fingerprinter route — no per-row Python either way).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        if fast_hash:
            import polars as pl

            h = pl.from_arrow(batch.select([col])).select(
                pl.col(col).hash(seed=0).reinterpret(signed=True).alias("__h")
            )["__h"].to_arrow()
            return batch.append_column("__h", h.cast(pa.int64())).replace_schema_metadata(None)
        import duckdb

        tbl = pa.table({"t": pc.cast(batch[col], pa.string())})  # noqa: F841 (duckdb scans it)
        h = duckdb.connect().execute("SELECT md5(t) AS h FROM tbl").arrow().column("h")
        return batch.append_column("__h", h).replace_schema_metadata(None)

    def first_per_value(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by the REAL value (collision-proof).
        # Keep the min-id ROW intact via duplicated(), NOT per-column
        # 'first' aggs — those skip NaN per column and would backfill the
        # kept row's null fields from other rows (a franken-row), and
        # groupby's default dropna=True would silently DELETE null-value
        # rows. dropna=False keeps nulls as one group (SQL GROUP BY).
        g = g.sort_values(id_col, kind="stable")
        sizes = g.groupby(col, sort=False, dropna=False)[id_col].transform("size")
        keep = ~g.duplicated(subset=[col], keep="first")
        out = g.loc[keep].copy()
        out["dup_count"] = sizes.loc[keep].to_numpy()
        return out

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    if keep_cols:
        hashed = hashed.select_columns(list({*keep_cols, col, id_col, "__h"}))
    # group count = distinct values — bucket it (Ray pays ~ms per group in
    # map_groups; first_per_value is vectorized across a bucket's groups)
    out = _bucketed_groups(hashed, ["__h"], first_per_value, n_buckets=32)
    return out.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------
def _as_string_array(texts) -> pa.Array:
    """Normalize a list[str] / Arrow column to a flat pa.string() array with
    the historical ``str(x)`` null treatment (None -> \"None\")."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        return pa.array([str(x) for x in texts], type=pa.string())
    if texts.type != pa.string():
        texts = texts.cast(pa.string())
    if texts.null_count:
        texts = pc.fill_null(texts, "None")
    return texts


def _word_shingle_hashes_flat(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All docs' DISTINCT 64-bit word-n-gram shingle hashes as one flat
    uint64 array plus int64 doc offsets (len m+1); within a doc the hashes
    are sorted ascending.

    Fully vectorized ACROSS docs (no per-doc Python): one Arrow split over
    all texts, crc32 once per DISTINCT word, shingle hash = positional
    polynomial combine of n shifted views over the flat token array, then a
    single lexsort dedupes within every doc at once. Docs shorter than n
    words fall back to crc32(text) (Python only over those rows)."""
    col = _as_string_array(texts)
    m = len(col)
    if m == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    words = pc.split_pattern(col, " ")
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    dic = flat.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    crc = np.array(
        [zlib.crc32(w.encode()) for w in dic.dictionary.to_pylist()], dtype=np.uint64
    )
    h = crc[codes] if len(codes) else np.array([], dtype=np.uint64)
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        total = len(h)
        if total >= n:
            comb = np.zeros(total - n + 1, dtype=np.uint64)
            for k in range(n):
                comb = comb * P + h[k : total - n + 1 + k]
        else:
            comb = np.zeros(0, dtype=np.uint64)
    # shingle-start positions fully inside each doc: doc i contributes
    # comb[offs[i] : offs[i] + max(lens[i]-n+1, 0)]
    k_per_doc = np.maximum(lens - n + 1, 0)
    doc_of = np.repeat(np.arange(m, dtype=np.int64), k_per_doc)
    seg_start = np.repeat(offs[:-1], k_per_doc)
    within = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(k_per_doc)[:-1])), k_per_doc
    )
    seg = comb[seg_start + within]
    # dedupe within every doc in one pass: sort by (doc, hash), keep firsts
    order = np.lexsort((seg, doc_of))
    sd, dd = seg[order], doc_of[order]
    keep = np.ones(len(sd), dtype=bool)
    keep[1:] = (dd[1:] != dd[:-1]) | (sd[1:] != sd[:-1])
    sd, dd = sd[keep], dd[keep]
    # short docs (< n words): crc32 of the whole text, one value each
    short = np.flatnonzero(k_per_doc == 0)
    if len(short):
        short_vals = np.array(
            [zlib.crc32(t.encode()) for t in col.take(pa.array(short)).to_pylist()],
            dtype=np.uint64,
        )
        dd = np.concatenate([dd, short])
        sd = np.concatenate([sd, short_vals])
        order = np.argsort(dd, kind="stable")
        dd, sd = dd[order], sd[order]
    counts = np.bincount(dd, minlength=m)
    out_offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offs[1:])
    return sd, out_offs


def minhash_signatures(
    texts: "list[str] | pa.Array | pa.ChunkedArray",
    num_perm: int = 64,
    ngram: int = 3,
    seed: int = 1,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures; sig[p] = min over shingles of
    the multiply-shift permutation  v = (a_p * h + b_p) mod 2^64.
    Accepts an Arrow string column directly (zero Python-string round-trip).

    Hash family rationale (ADVICE r1): with ODD a_p, x -> a_p*x + b_p mod
    2^64 is a BIJECTION of Z_2^64 whose ordering scrambles the crc32
    inputs (multiply-shift hashing); the wrap-around IS the mod. The naive
    "overflow-free" alternative (small a, mod Mersenne) is monotone in h
    whenever a*h never wraps — every permutation then picks the same min
    shingle and LSH recall collapses (observed: 1/16 band agreement at
    J=0.89 instead of the expected ~10/16)."""
    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    flat_h, offs = _word_shingle_hashes_flat(texts, ngram)
    m = len(offs) - 1
    sigs = np.full((m, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    total = len(flat_h)
    if total == 0:
        return sigs
    # tiled segment-min: permute a tile of shingles (bounded memory), then
    # np.minimum.reduceat over the doc boundaries inside the tile — one
    # numpy call per permutation x ~64k shingles instead of one per doc.
    # Layout matters: (num_perm, tile) with a contiguous multiply per
    # permutation row is ~5x faster than the broadcast h[:,None]*a+b
    # (strided uint64 inner loops defeat SIMD). Every doc has >= 1 shingle
    # (short docs carry the crc32 fallback), so offsets are strictly
    # increasing and reduceat segments are never empty.
    tile = 1 << 16
    vals = np.empty((num_perm, min(tile, total)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for t0 in range(0, total, tile):
            t1 = min(total, t0 + tile)
            seg = flat_h[t0:t1]
            v = vals[:, : t1 - t0]
            for j in range(num_perm):
                np.multiply(seg, a[j], out=v[j])  # wraps mod 2^64
                v[j] += b[j]
            d0 = int(np.searchsorted(offs, t0, side="right")) - 1
            d1 = int(np.searchsorted(offs, t1, side="left"))
            bounds = np.maximum(offs[d0:d1] - t0, 0)
            part = np.minimum.reduceat(v, bounds, axis=1)  # (num_perm, docs)
            np.minimum(sigs[d0:d1], part.T, out=sigs[d0:d1])
    return sigs


def _attach_payload(
    pairs: Dataset,
    payload: Dataset,
    pair_key: str,
    payload_key: str,
    payload_cols: list[str],
    out_names: list[str],
    n_buckets: int = 64,
) -> Dataset:
    """Distributed equi-join of a pairs Dataset against a (key, payload)
    Dataset via the engine's union + groupby(bucket) pattern (same ONE
    shuffle used by asof_join — no driver materialization). Pair rows keep
    all their columns and gain ``out_names`` = payload columns of the row
    whose ``payload_key`` equals the pair's ``pair_key``. Inner-join
    semantics: pairs whose key is absent from payload are dropped."""
    from modlyn_ray.stages.temporal import add_bucket_column

    pair_schema = pairs.schema()
    pair_cols = list(pair_schema.names)
    pair_types = dict(zip(pair_schema.names, pair_schema.types))
    pay_schema = payload.schema()
    pay_types = {
        c: pay_schema.types[pay_schema.names.index(c)] for c in payload_cols
    }

    def pad_pairs(b: pa.Table) -> pa.Table:
        b = b.append_column("__key", b[pair_key])
        for c, o in zip(payload_cols, out_names):
            b = b.append_column(o, pa.nulls(len(b), pay_types[c]))
        return b.append_column("__side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_payload(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {"__key": b[payload_key]}
        for c in pair_cols:
            cols[c] = pa.nulls(n, pair_types[c])
        for c, o in zip(payload_cols, out_names):
            cols[o] = b[c]
        t = pa.table(cols)
        return t.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))

    p_aug = pairs.map_batches(pad_pairs, batch_format="pyarrow", zero_copy_batch=True)
    y_aug = payload.map_batches(pad_payload, batch_format="pyarrow", zero_copy_batch=True)
    both = add_bucket_column(p_aug.union(y_aug), key="__key", n_buckets=n_buckets)

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        ptbl = g.filter(pa.array(side == 0))
        ytbl = g.filter(pa.array(side == 1))
        if len(ptbl) == 0:
            return ptbl.drop_columns(["__side", "bucket", "__key"])
        # index payload rows by key, take per pair row (vectorized)
        ykeys = ytbl["__key"].combine_chunks()
        pkeys = ptbl["__key"].combine_chunks()
        # joint_codes, not pc.index_in: index_in would emit NULL=NULL
        # matches; sentinel codes (-1 pair / -2 payload) never match
        from modlyn_ray.util import joint_codes

        pcodes, ycodes = joint_codes(pkeys, ykeys)
        if len(ycodes):
            order = np.argsort(ycodes, kind="stable")
            ys = ycodes[order]
            pos = np.minimum(np.searchsorted(ys, pcodes), len(ys) - 1)
            valid = ys[pos] == pcodes
            take_np = order[pos]
        else:
            valid = np.zeros(len(pcodes), dtype=bool)
            take_np = np.zeros(0, dtype=np.int64)
        ptbl = ptbl.filter(pa.array(valid))
        idx = pa.array(take_np[valid] if len(ycodes) else take_np)
        out = ptbl.drop_columns(["__side", "bucket", "__key", *out_names])
        for c, o in zip(payload_cols, out_names):
            ycol = ytbl[o].combine_chunks() if isinstance(ytbl[o], pa.ChunkedArray) else ytbl[o]
            out = out.append_column(o, ycol.take(idx))
        return out

    return both.groupby("bucket").map_groups(join_bucket, batch_format="pyarrow")


def _as_arrow_blocks(ds: Dataset) -> Dataset:
    """Normalize block format to Arrow (pandas map_groups emits pandas
    blocks; union of mixed block types breaks downstream groupbys)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)


def _bucketed_groups(
    ds: Dataset, key_cols: list[str], kernel, n_buckets: int = 32
) -> Dataset:
    """Hash-bucket rows by ``key_cols`` and run ONE vectorized pandas
    ``kernel`` per bucket. Ray Data's per-group map_groups / aggregate pays
    ~ms of overhead PER GROUP — pathological beyond ~10^4 distinct keys
    (measured: 50s for a 20k-group Min aggregate). Bucketing keeps every
    key group complete inside one bucket while bounding the group count at
    ``n_buckets``; the kernel does its own (vectorized) per-key work."""

    def add_bkt(b: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(b.select(key_cols)).hash_rows(seed=0).to_numpy()
        return b.append_column(
            "__bkt", pa.array((h % n_buckets).astype(np.int64))
        ).replace_schema_metadata(None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g.drop(columns="__bkt"))

    return (
        ds.map_batches(add_bkt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bkt")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _propagate_min_labels(
    edges: Dataset, max_iters: int = 64, n_buckets: int = 32
) -> Dataset:
    """Connected components by iterative min-label propagation, entirely as
    Dataset ops (the driver holds only the per-round change COUNT, never
    the edge or label sets). ``edges``: (a, b) verified pairs. Returns
    (id, cluster_id) for every id that appears in an edge.

    Runs until the distributed change count reaches 0; ``max_iters`` is a
    SAFETY CAP. Each round propagates along BOTH the graph edges and
    shortcut edges (lab -> id, i.e. pointer jumping: a node adopts its
    label's own current label), so convergence needs O(log diameter)
    rounds, not O(diameter) — a 10^6-long chain of drifting near-dups
    converges in ~20 rounds. Hitting the cap without convergence raises —
    silent mislabeling (split cluster ids, clusters with no ``is_kept``
    row) is worse than failing."""

    def sym(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"u": b["a"], "v": b["b"]}),
                pa.table({"u": b["b"], "v": b["a"]}),
            ]
        )

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()
    # adapt exchange fan-out to the LABEL-SET size: each round pays ~3
    # all-to-all fixed costs per bucket-block, so a small verified-pair
    # graph (the common case after LSH pruning) runs on few buckets while
    # a 10^9-edge graph keeps the caller's full fan-out
    n_edges = edges_sym.count() // 2
    n_buckets = max(1, min(n_buckets, n_edges // 50_000 + 1))

    # initial labels: own id
    labels = _as_arrow_blocks(
        _bucketed_groups(
            edges_sym.map_batches(
                lambda b: pa.table({"id": b["u"], "lab": b["u"]}), batch_format="pyarrow"
            ),
            ["id"],
            lambda df: df.drop_duplicates("id"),
            n_buckets=n_buckets,
        )
    ).materialize()

    changed = -1
    for _ in range(max_iters):
        # propagation edges this round = graph edges + SHORTCUT edges
        # (u=lab, v=id): "candidate label for id is the current label of
        # its label" — pointer jumping riding the SAME attach exchange
        shortcuts = labels.map_batches(
            lambda b: pa.table({"u": b["lab"], "v": b["id"]}), batch_format="pyarrow"
        )
        cand = _attach_payload(
            edges_sym.union(_as_arrow_blocks(shortcuts)), labels,
            pair_key="u", payload_key="id",
            payload_cols=["lab"], out_names=["nlab"], n_buckets=n_buckets,
        ).map_batches(
            lambda b: pa.table(
                {"id": b["v"], "lab": b["nlab"],
                 "__is_old": pa.array(np.zeros(len(b), dtype=np.int8))}
            ),
            batch_format="pyarrow",
        )
        tagged_old = labels.map_batches(
            lambda b: pa.table(
                {"id": b["id"], "lab": b["lab"],
                 "__is_old": pa.array(np.ones(len(b), dtype=np.int8))}
            ),
            batch_format="pyarrow",
        )

        def min_lab(df: pd.DataFrame) -> pd.DataFrame:
            # per id: new = min over old + candidates; changed = new < old.
            # The old label rides as flagged ROWS, not a nullable column —
            # a nullable int64 __old column went through float64 (NaN),
            # losing precision for ids above 2^53 and corrupting the
            # change detector. The change count folds into this exchange.
            g = df.groupby("id", as_index=False).agg(lab=("lab", "min"))
            old = df.loc[df["__is_old"] == 1, ["id", "lab"]].rename(
                columns={"lab": "__old"}
            )
            g = g.merge(old, on="id", how="left")
            g["__chg"] = ((g["lab"] < g["__old"]) & g["__old"].notna()).astype("int64")
            return g[["id", "lab", "__chg"]]

        # repartition BEFORE materialize: the union + sort grow the block
        # count ~3x per round (1000+ tiny blocks by round 5 without this),
        # and per-block fixed costs then dwarf the actual label work
        new_labels = (
            _as_arrow_blocks(
                _bucketed_groups(
                    _as_arrow_blocks(tagged_old.union(_as_arrow_blocks(cand))),
                    ["id"], min_lab, n_buckets=n_buckets,
                )
            )
            .repartition(n_buckets)
            .materialize()
        )
        changed = new_labels.sum("__chg")  # tiny scalar reduce, no shuffle
        labels = new_labels.drop_columns(["__chg"])
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min-label propagation did not converge within max_iters={max_iters} "
            f"rounds ({changed} labels still changing); the component graph's "
            f"diameter exceeds the cap — raise max_iters"
        )
    return labels.map_batches(
        lambda b: pa.table({"id": b["id"], "cluster_id": b["lab"]}),
        batch_format="pyarrow",
    )


def minhash_lsh_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 1,
    n_buckets: int = 64,
    bucket_cap: int = 4096,
) -> Dataset:
    """Near-dup clusters: (id_col, cluster_id, is_kept) — fully distributed.

    Pipeline (no driver-side materialization of candidates, texts, or
    components):
      signatures per batch -> explode (band, band_hash, id) -> groupby band
      bucket -> candidate pairs (degenerate buckets > ``bucket_cap`` emit
      star pairs: O(b) edges that preserve connectivity instead of O(b^2))
      -> distinct pairs (groupby) -> shingle sets joined to pairs on BOTH
      sides via union+bucket-groupby joins -> exact n-gram Jaccard verify
      inside the join task -> connected components via iterative
      hash-partitioned min-label propagation (driver sees only per-round
      change counts) -> full-corpus labeling via one more bucket join.
    """
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = minhash_signatures(batch[text_col], num_perm, ngram, seed)
        n = len(batch)
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

    def cand_kernel(df: pd.DataFrame) -> pd.DataFrame:
        """All (band, band_hash) groups of one bucket at once: segment
        boundaries via numpy; Python iterates only over groups that
        actually hold >= 2 rows (the dup groups — a vanishing fraction)."""
        df = df.sort_values(["band", "band_hash"], kind="stable")
        bnd = df["band"].to_numpy()
        bh = df["band_hash"].to_numpy()
        ids = df[id_col].to_numpy()
        ng = np.r_[True, (bnd[1:] != bnd[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(ng)
        ends = np.r_[starts[1:], len(df)]
        sizes = ends - starts
        out_a, out_b = [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            gids = np.unique(ids[s:e])
            if len(gids) < 2:
                continue
            if len(gids) > bucket_cap:
                # degenerate band (near-identical mass): star pairs keep
                # the component connected with O(b) edges, not O(b^2)
                out_a.append(np.repeat(gids[0], len(gids) - 1))
                out_b.append(gids[1:])
            else:
                ii, jj = np.triu_indices(len(gids), k=1)
                out_a.append(gids[ii])
                out_b.append(gids[jj])
        if not out_a:
            return pd.DataFrame(
                {"a": np.array([], dtype=ids.dtype), "b": np.array([], dtype=ids.dtype)}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).drop_duplicates()

    banded = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=4096)
    cand = _bucketed_groups(banded, ["band", "band_hash"], cand_kernel, n_buckets=32)
    # global distinct: the same pair can surface from bands in different
    # buckets — one more (tiny) bucketed pass, vectorized drop_duplicates
    cand = _bucketed_groups(
        cand, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=16
    )
    cand = _as_arrow_blocks(cand).materialize()

    ids_only = ds.select_columns([id_col])
    self_clusters = ids_only.map_batches(
        lambda b: b.append_column("cluster_id", b[id_col]).append_column(
            "is_kept", pa.array(np.ones(len(b), dtype=bool))
        ),
        batch_format="pyarrow",
    )
    if cand.count() == 0:
        return self_clusters

    # per-doc sorted shingle-hash sets as a list<int64> column (computed
    # once, joined to pairs on both sides — texts never leave the cluster)
    def shingle_batch(b: pa.Table) -> pa.Table:
        # flat hashes arrive sorted within each doc — exactly the
        # list<int64> layout the verify kernel's sorted-merge expects
        flat_u, offs = _word_shingle_hashes_flat(b[text_col], ngram)
        return pa.table(
            {
                id_col: b[id_col],
                "sh": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(flat_u.view(np.int64))
                ),
            }
        )

    shingles = ds.select_columns([id_col, text_col]).map_batches(
        shingle_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    with_a = _attach_payload(
        cand, shingles, pair_key="a", payload_key=id_col,
        payload_cols=["sh"], out_names=["sh_a"], n_buckets=n_buckets,
    )

    # second join attaches sh_b AND verifies inside the same task
    with_b = _attach_payload(
        with_a, shingles, pair_key="b", payload_key=id_col,
        payload_cols=["sh"], out_names=["sh_b"], n_buckets=n_buckets,
    )

    def verify(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"a": b["a"], "b": b["b"]})
        sa = b["sh_a"].combine_chunks() if isinstance(b["sh_a"], pa.ChunkedArray) else b["sh_a"]
        sb = b["sh_b"].combine_chunks() if isinstance(b["sh_b"], pa.ChunkedArray) else b["sh_b"]
        npairs = len(b)
        # vectorized across ALL pairs at once (no per-pair Python loop):
        # joint-code every shingle value, pack (pair_idx, code) into one
        # int64 key per element, then a single set-intersection of the two
        # key arrays; per-pair intersection sizes fall out of one bincount.
        oa = sa.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ob = sb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        la = np.diff(oa - oa[0])
        lb = np.diff(ob - ob[0])
        flat_a = np.asarray(sa.values)[oa[0] : oa[-1]]
        flat_b = np.asarray(sb.values)[ob[0] : ob[-1]]
        uniq, inv = np.unique(np.concatenate([flat_a, flat_b]), return_inverse=True)
        m = np.int64(len(uniq))
        pid_a = np.repeat(np.arange(npairs, dtype=np.int64), la)
        pid_b = np.repeat(np.arange(npairs, dtype=np.int64), lb)
        ka = pid_a * m + inv[: len(flat_a)]
        kb = pid_b * m + inv[len(flat_a) :]
        # per-pair shingle sets are unique, so (pair, code) keys are unique
        common = np.intersect1d(ka, kb, assume_unique=True)
        inter = np.bincount(common // m, minlength=npairs).astype(np.float64)
        u = la + lb - inter
        keep = (u > 0) & (inter / np.maximum(u, 1) >= jaccard_threshold)
        return pa.table({"a": b["a"], "b": b["b"]}).filter(pa.array(keep))

    verified = with_b.map_batches(verify, batch_format="pyarrow").materialize()
    if verified.count() == 0:
        return self_clusters

    roots = _propagate_min_labels(verified, n_buckets=max(8, n_buckets // 2))

    # full-corpus labeling: one more bucket join of ids against roots;
    # ids without a root cluster to themselves
    labeled = _attach_payload(
        ids_only.map_batches(
            lambda b: pa.table({id_col: b[id_col], "__orig": b[id_col]}),
            batch_format="pyarrow",
        ),
        roots, pair_key=id_col, payload_key="id",
        payload_cols=["cluster_id"], out_names=["cluster_id"], n_buckets=n_buckets,
    )

    def finish_hit(b: pa.Table) -> pa.Table:
        kept = pc.equal(b["__orig"], b["cluster_id"])
        return pa.table(
            {id_col: b["__orig"], "cluster_id": b["cluster_id"], "is_kept": kept}
        )

    in_roots = labeled.map_batches(finish_hit, batch_format="pyarrow")

    # ids NOT in any verified component: self clusters. Anti-join via the
    # same bucket pattern: tag ids, drop those matched in roots.
    def finish_miss(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "cluster_id": b[id_col],
                "is_kept": pa.array(np.ones(len(b), dtype=bool)),
            }
        )

    root_ids = roots.map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow"
    )
    missed = _anti_join(ids_only, root_ids, left_key=id_col, right_key="id",
                        n_buckets=n_buckets)
    return in_roots.union(missed.map_batches(finish_miss, batch_format="pyarrow"))


def _anti_join(
    left: Dataset, right: Dataset, left_key: str, right_key: str, n_buckets: int = 64
) -> Dataset:
    """Distributed anti-join (left rows whose key is absent from right)
    via the union + groupby(bucket) pattern."""
    from modlyn_ray.stages.temporal import add_bucket_column

    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))

    def pad_l(b: pa.Table) -> pa.Table:
        b = b.append_column("__key", b[left_key])
        return b.append_column("__side", pa.array(np.zeros(len(b), dtype=np.int8)))

    def pad_r(b: pa.Table) -> pa.Table:
        cols = {"__key": b[right_key]}
        for c in lcols:
            cols[c] = pa.nulls(len(b), ltypes[c])
        return pa.table(cols).append_column(
            "__side", pa.array(np.ones(len(b), dtype=np.int8))
        )

    both = add_bucket_column(
        left.map_batches(pad_l, batch_format="pyarrow").union(
            right.map_batches(pad_r, batch_format="pyarrow")
        ),
        key="__key",
        n_buckets=n_buckets,
    )

    def keep_unmatched(g: pa.Table) -> pa.Table:
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        ltbl = g.filter(pa.array(side == 0))
        rkeys = g.filter(pa.array(side == 1))["__key"].combine_chunks()
        if len(ltbl) == 0:
            return ltbl.drop_columns(["__side", "bucket", "__key"])
        # joint_codes, not pc.index_in: index_in matches a null key to a
        # null in value_set (NULL=NULL), which would wrongly DROP null-key
        # left rows — the NOT EXISTS contract keeps them (util.joint_codes)
        from modlyn_ray.util import joint_codes

        lcodes, rcodes = joint_codes(ltbl["__key"].combine_chunks(), rkeys)
        hit = np.isin(lcodes, rcodes)
        return ltbl.filter(pa.array(~hit)).drop_columns(["__side", "bucket", "__key"])

    return both.groupby("bucket").map_groups(keep_unmatched, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------
def simhash_signatures(texts: "list[str] | pa.Array | pa.ChunkedArray") -> np.ndarray:
    """64-bit SimHash over word hashes weighted by term count — fully
    batch-vectorized: one Arrow split over all texts, crc32 per DISTINCT
    word (dictionary encode), then 64 bincount bit-votes across every doc
    at once (no per-doc Python loop). Accepts an Arrow string column
    directly (no Python-string round-trip)."""
    col = _as_string_array(texts)
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    words = pc.split_pattern(col, " ")
    flat = words.flatten()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    dic = flat.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    crc = np.array(
        [zlib.crc32(w.encode()) for w in dic.dictionary.to_pylist()], dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        # extend crc32 to 64 bits deterministically
        h = crc[codes] * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(row_idx, weights=bit, minlength=n)
        out |= (2 * ones - lens > 0).astype(np.uint64) << np.uint64(b)
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
        sig = simhash_signatures(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(batch)
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

    def _tile_pairs(ids, sigs, out_a, out_b, out_h):
        """Tiled hamming pair generation for ONE chunk group: memory
        bounded at TILE^2 regardless of the group size (an adversarial
        all-identical-chunk input would otherwise allocate O(b^2) at
        once); compute stays O(b^2), inherent to the "all pairs within
        hamming<=k" contract."""
        n = len(ids)
        TILE = 2048
        for si in range(0, n, TILE):
            ei = min(si + TILE, n)
            for sj in range(si, n, TILE):
                ej = min(sj + TILE, n)
                x = sigs[si:ei, None] ^ sigs[None, sj:ej]
                ham = np.zeros(x.shape, dtype=np.int64)
                v = x
                for _ in range(64):
                    ham += (v & np.uint64(1)).astype(np.int64)
                    v = v >> np.uint64(1)
                jj_g = np.arange(sj, ej)[None, :]
                ii_g = np.arange(si, ei)[:, None]
                keep = (ham <= max_hamming) & (jj_g > ii_g)
                ai, bj = np.nonzero(keep)
                if len(ai):
                    out_a.append(ids[ai + si])
                    out_b.append(ids[bj + sj])
                    out_h.append(ham[keep])

    def pair_kernel(df: pd.DataFrame) -> pd.DataFrame:
        """All (chunk_idx, chunk_val) groups of one bucket; Python touches
        only groups with >= 2 members."""
        df = df.sort_values(["chunk_idx", "chunk_val", id_col], kind="stable")
        ci = df["chunk_idx"].to_numpy()
        cv = df["chunk_val"].to_numpy()
        ids = df[id_col].to_numpy()
        sg = df["sig"].to_numpy().view(np.uint64)
        ng = np.r_[True, (ci[1:] != ci[:-1]) | (cv[1:] != cv[:-1])]
        starts = np.flatnonzero(ng)
        ends = np.r_[starts[1:], len(df)]
        sizes = ends - starts
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            gids, first = np.unique(ids[s:e], return_index=True)
            if len(gids) < 2:
                continue
            _tile_pairs(gids, sg[s:e][first], out_a, out_b, out_h)
        if not out_a:
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=ids.dtype),
                    "b": np.array([], dtype=ids.dtype),
                    "hamming": np.array([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        ).drop_duplicates(["a", "b"])

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow", batch_size=4096)
    out = _bucketed_groups(sigs, ["chunk_idx", "chunk_val"], pair_kernel, n_buckets=32)
    # dedupe pairs found via chunks living in different buckets (hamming is
    # identical wherever the pair surfaces)
    return _bucketed_groups(
        out, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), n_buckets=16
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
    probe = ds.take(1)
    if not probe:  # empty input: pairs of nothing is an empty pairs table
        import ray.data as _rd

        sch = dict(zip(ds.schema().names, ds.schema().types))
        return _rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=sch[id_col]),
                    "b": pa.array([], type=sch[id_col]),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        )
    dim = len(probe[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # np.stack([]) raises
            return pa.table(
                {
                    id_col: batch[id_col],
                    "bucket": pa.array([], type=pa.int64()),
                    emb_col: batch[emb_col],
                }
            )
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
        n = len(ids)
        # blocked matmul: cosine tile of TILE x n rows at a time — memory
        # bounded even for a degenerate single-bucket input (O(b^2) full
        # similarity matrices would OOM at ~10^5 vectors)
        TILE = 2048
        out_a, out_b, out_c = [], [], []
        for s in range(0, n, TILE):
            e = min(s + TILE, n)
            C = En[s:e] @ En.T  # (tile, n)
            jj_g = np.arange(n)[None, :]
            ii_g = np.arange(s, e)[:, None]
            keep = (C >= threshold) & (jj_g > ii_g)
            ai, bj = np.nonzero(keep)
            if len(ai):
                out_a.append(ids[ai + s])
                out_b.append(ids[bj])
                out_c.append(C[keep])
        if not out_a:
            # typed empty frame: an untyped one would emit a: double blocks
            # that clash with string/int id blocks downstream (same guard
            # as cand_kernel / pair_kernel)
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=ids.dtype),
                    "b": pd.Series([], dtype=ids.dtype),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=8192)
    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
