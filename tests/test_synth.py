"""Generator determinism + fixture-invariant tests (FIXTURES.md §1, §4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from modlyn_ray import synth
from modlyn_ray.schema import validate_sequences_batch, tokens_checksum


def test_deterministic():
    a = synth.make_sequences(synth.TINY)
    b = synth.make_sequences(synth.TINY)
    assert a.equals(b)
    assert synth.make_doc_attrs(synth.TINY).equals(synth.make_doc_attrs(synth.TINY))


def test_tiny_shape_matches_reference_fixture():
    # mirrors /root/reference/tests/test_dataset_type_alias.py:43-44 (64 rows,
    # vocab 8, 3 classes)
    t = synth.make_sequences(synth.TINY)
    assert len(t) == 64
    flat = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    assert flat.min() >= 0 and flat.max() < 8
    assert len(set(t["source"].to_pylist())) == 3


def test_invariants():
    t = synth.make_sequences(synth.SMALL)
    validate_sequences_batch(t)  # raises on violation
    # seq_no unique tie-breaker
    seq = t["seq_no"].to_numpy()
    assert len(np.unique(seq)) == len(seq)
    # rare class present with <= 3 rows
    counts = pc.value_counts(t["source"]).to_pylist()
    assert min(c["counts"] for c in counts) <= 3
    # skew: heaviest doc holds a large share
    dcounts = pc.value_counts(t["doc_id"]).to_pylist()
    top = max(c["counts"] for c in dcounts)
    assert top > len(t) * 0.03
    # duplicate timestamps exist within at least one doc (tie-break matters)
    import pandas as pd

    df = t.select(["doc_id", "ingest_ts"]).to_pandas()
    assert df.duplicated().any()


def test_checksum_order_insensitive():
    t = synth.make_sequences(synth.TINY)
    perm = np.random.default_rng(7).permutation(len(t))
    shuffled = t.take(pa.array(perm))
    assert tokens_checksum(t) == tokens_checksum(shuffled)
    # sensitive to a token value change
    mutated = synth.make_sequences(synth.TINY).to_pydict()
    mutated["tokens"][0] = list(mutated["tokens"][0])
    mutated["tokens"][0][0] = (mutated["tokens"][0][0] + 1) % 8
    mt = pa.table(mutated, schema=t.schema)
    assert tokens_checksum(t) != tokens_checksum(mt)


def test_doc_attrs_overlap():
    seqs = synth.make_sequences(synth.SMALL)
    attrs = synth.make_doc_attrs(synth.SMALL)
    sdocs = set(seqs["doc_id"].to_pylist())
    adocs = set(attrs["doc_id"].to_pylist())
    assert 0.3 < len(sdocs & adocs) / len(sdocs | adocs) < 1.0
    # several versions per doc on average
    assert len(attrs) > len(adocs) * 1.5
