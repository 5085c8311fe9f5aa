"""Deterministic synthetic-data generator for the engine's input tables.

Mirrors the reference's seeded test fixture
(/root/reference/tests/test_dataset_type_alias.py:42-45 — seeded
``np.random.default_rng``, low-cardinality class labels) scaled up to the
``input_hint`` schema, with the properties FIXTURES.md requires:

- Zipf-distributed doc_id row counts (one heavy doc for skew tests)
- Zipf token draws over a fixed vocab, variable lengths
- per-row event time ``ingest_ts`` that is monotone-ish per doc with
  duplicates, out-of-file-order rows and session-sized gaps
- a deterministic ``seq_no`` tie-breaker
- one rare class with <= 3 rows (exercises the rare-class filter,
  /root/reference/docs/quickstart.ipynb:142-144)
- a ``doc_attrs`` as-of right side with multiple versions per doc, ~80%
  doc overlap, distinct payload values per version

Byte-identical output for a given (profile | explicit params): everything is
derived from ``np.random.default_rng(seed)`` with a fixed draw order.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from modlyn_ray.schema import DOC_ATTRS_SCHEMA, SEQUENCES_SCHEMA

EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)
SESSION_GAP_US = 3_600_000_000  # 1h — gaps larger than this split sessions


@dataclass(frozen=True)
class SynthProfile:
    name: str
    seed: int
    n_rows: int
    vocab: int
    n_docs: int
    n_sources: int
    max_len: int
    n_shards: int = 1


# FIXTURES.md §1 sizes.
TINY = SynthProfile("tiny", seed=0, n_rows=64, vocab=8, n_docs=12, n_sources=3, max_len=12)
SMALL = SynthProfile("small", seed=1, n_rows=10_000, vocab=512, n_docs=200, n_sources=6, max_len=48)
BENCH = SynthProfile(
    "bench", seed=2, n_rows=2_000_000, vocab=32_768, n_docs=20_000, n_sources=8, max_len=48, n_shards=32
)
# SCALE: the scaling-efficiency corpus (4x BENCH). A ~10s workload is
# dominated by fixed per-run orchestration (planning, worker dispatch,
# driver folds) that does NOT shrink with more CPUs; the scaling criterion
# compares throughputs, so the measured job must be long enough to
# amortize those — this is also the regime the 100 TB target lives in.
SCALE = SynthProfile(
    "scale", seed=3, n_rows=8_000_000, vocab=32_768, n_docs=80_000, n_sources=8, max_len=48, n_shards=64
)
# SCALE32: 4x SCALE for the north-rule scaling measurement — at ~10s the
# 32-CPU job is still part fixed cost; a minutes-long job isolates the
# data-proportional throughput the efficiency ratio is meant to compare.
SCALE32 = SynthProfile(
    "scale32", seed=4, n_rows=32_000_000, vocab=32_768, n_docs=320_000, n_sources=8, max_len=48, n_shards=128
)

PROFILES = {p.name: p for p in (TINY, SMALL, BENCH, SCALE, SCALE32)}


def _zipf_weights(n: int, a: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def make_sequences(profile: SynthProfile) -> pa.Table:
    """Generate the sequences table for a profile (deterministic)."""
    rng = np.random.default_rng(profile.seed)
    n, v, d, s = profile.n_rows, profile.vocab, profile.n_docs, profile.n_sources

    # --- doc assignment: Zipfian so a few heavy doc_ids exist -------------
    doc_idx = rng.choice(d, size=n, p=_zipf_weights(d, a=1.1))
    # force doc 0 heavy (~8% of rows) for skew tests
    heavy_mask = rng.random(n) < 0.04
    doc_idx[heavy_mask] = 0

    # --- per-row source (class label analog of modlyn's cell_line) -------
    # doc-level bias + per-row noise so source changes WITHIN a doc timeline
    # (needed by source-boundary sessionization, SURVEY §2.9 W4).
    doc_pref = rng.integers(0, s, size=d)
    src_idx = np.where(rng.random(n) < 0.7, doc_pref[doc_idx], rng.integers(0, s, size=n))
    # force a rare class: last source id appears <= 3 times
    rare = s - 1
    src_idx[src_idx == rare] = 0
    rare_rows = rng.choice(n, size=min(3, n), replace=False)
    src_idx[rare_rows] = rare

    # --- tokens: Zipf over vocab, variable lengths ------------------------
    lengths = rng.integers(1, profile.max_len + 1, size=n).astype(np.int64)
    total = int(lengths.sum())
    flat = rng.choice(v, size=total, p=_zipf_weights(v, a=1.05)).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    # --- event time: monotone-ish per doc with dups / gaps ----------------
    # per-row step drawn iid; order rows by (doc, arrival) then assign
    # cumulative time per doc. 5% duplicate-ts steps, 2% session gaps.
    step = rng.integers(1, 60_000_000, size=n).astype(np.int64)  # <= 60 s
    step[rng.random(n) < 0.05] = 0  # duplicate timestamps
    gap_rows = rng.random(n) < 0.02
    step[gap_rows] += SESSION_GAP_US + 1  # session-splitting gaps
    order = np.argsort(doc_idx, kind="stable")
    sorted_docs = doc_idx[order]
    sorted_steps = step[order]
    cum = np.cumsum(sorted_steps)
    new_group = np.r_[True, sorted_docs[1:] != sorted_docs[:-1]]
    starts = np.flatnonzero(new_group)
    group_id = np.cumsum(new_group) - 1
    prev_cum = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
    ts = np.empty(n, dtype=np.int64)
    ts[order] = EPOCH_US + (cum - prev_cum[group_id])

    seq_no = np.arange(n, dtype=np.int64)
    # shuffle file order so the input is NOT time-sorted (sort correctness)
    perm = rng.permutation(n)

    doc_names = np.char.add("doc", np.char.zfill(doc_idx.astype("U6"), 6))
    src_names = np.char.add("src_", src_idx.astype("U2"))

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_names),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(src_names),
            "ingest_ts": pa.array(ts, type=pa.timestamp("us")),
            "seq_no": pa.array(seq_no),
        },
        schema=SEQUENCES_SCHEMA,
    )
    return tbl.take(pa.array(perm))


def make_doc_attrs(profile: SynthProfile) -> pa.Table:
    """As-of right side: several attribute versions per doc (FIXTURES.md §2)."""
    rng = np.random.default_rng(profile.seed + 1000)
    d = profile.n_docs
    covered = rng.random(d) < 0.8  # ~80% overlap with sequences doc_ids
    doc_ids = np.flatnonzero(covered)
    n_ver = rng.integers(1, 6, size=len(doc_ids))
    rep_doc = np.repeat(doc_ids, n_ver)
    m = len(rep_doc)
    # version times spread across (and beyond) the sequences time range;
    # some versions are AFTER the last sequence row (must never match).
    span = max(profile.n_rows, 64) * 30_000_000 // max(1, d)
    ts = EPOCH_US + rng.integers(-span, span * 4, size=m).astype(np.int64)
    ver_no = np.concatenate([np.arange(k) for k in n_ver]) if m else np.array([], dtype=np.int64)
    attr_val = rep_doc.astype(np.float64) * 1000.0 + ver_no
    names = np.char.add("doc", np.char.zfill(rep_doc.astype("U6"), 6))
    return pa.table(
        {
            "doc_id": pa.array(names),
            "ingest_ts": pa.array(ts, type=pa.timestamp("us")),
            "attr_val": pa.array(attr_val),
        },
        schema=DOC_ATTRS_SCHEMA,
    )


def write_profile(profile: SynthProfile, out_dir: str, overwrite: bool = False) -> str:
    """Write sequences/ (sharded) + doc_attrs.parquet under out_dir; cached.

    Sharded layout mirrors the reference's directory-of-zarr-shards store
    (/root/reference/docs/quickstart.ipynb:97-108) as a directory of Parquet
    files readable by a single ``ray.data.read_parquet(dir)``.
    """
    marker = os.path.join(out_dir, "_SYNTH_DONE")
    if os.path.exists(marker) and not overwrite:
        # the marker records WHICH profile was written: an out_dir holding
        # a different profile's data must not be silently returned as-is
        with open(marker) as f:
            recorded = f.read().strip()
        if recorded == f"{profile}":
            return out_dir
        raise ValueError(
            f"synth: {out_dir} holds a different profile ({recorded!r}); "
            "pass overwrite=True or a fresh out_dir"
        )
    os.makedirs(os.path.join(out_dir, "sequences"), exist_ok=True)
    tbl = make_sequences(profile)
    shard = max(1, len(tbl) // profile.n_shards)
    for i in range(profile.n_shards):
        lo = i * shard
        hi = len(tbl) if i == profile.n_shards - 1 else min(len(tbl), (i + 1) * shard)
        if lo >= len(tbl):
            break
        pq.write_table(tbl.slice(lo, hi - lo), os.path.join(out_dir, "sequences", f"part-{i:05d}.parquet"))
    pq.write_table(make_doc_attrs(profile), os.path.join(out_dir, "doc_attrs.parquet"))
    with open(marker, "w") as f:
        f.write(f"{profile}\n")
    return out_dir


def default_dir(profile: SynthProfile) -> str:
    return f"/tmp/modlyn_ray_synth/{profile.name}_seed{profile.seed}_n{profile.n_rows}"


def ensure_profile(profile: SynthProfile) -> str:
    """Generate (once) and return the directory for a profile."""
    return write_profile(profile, default_dir(profile))
