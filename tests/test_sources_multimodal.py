"""Reader registry aliases + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from modlyn_ray import synth
from modlyn_ray.sources.readers import load, normalize_reader, sniff_layout
from modlyn_ray.stages.multimodal import MediaFeaturizer, featurize_media, make_media


def test_alias_normalization():
    # mirrors the reference's alias test (tests/test_dataset_type_alias.py:54,62-63)
    for alias in ["parquet", "pq", "dir", "shards", "lazy"]:
        assert normalize_reader(alias) == "parquet"
    # the reference's out-of-core backend aliases (incl. its typo alias)
    for alias in ["dask", "arrayloaders-dask", "arrayloaders-dasd", "dask-arrayloader"]:
        assert normalize_reader(alias) == "parquet"
    for alias in ["memory", "in-memory", "in_memory", "InMemory"]:
        assert normalize_reader(alias) == "memory"
    with pytest.raises(ValueError, match="unknown dataset type"):
        normalize_reader("zarr")


def test_facade_records_normalized_dataset_type(tiny_dir):
    from modlyn_ray.api import SimpleLogReg

    m = SimpleLogReg(f"{tiny_dir}/sequences", vocab=8)
    m.fit(max_steps=2, batch_size=16, dataset_type="arrayloaders-dasd")
    assert m.dataset_type == "parquet"  # normalized, like datamodule.dataset_type


def test_load_parquet_and_memory(tiny_dir):
    ds = load(f"{tiny_dir}/sequences", "shards", columns=["doc_id", "n_tok"])
    assert ds.schema().names == ["doc_id", "n_tok"]  # projection pushdown
    assert ds.count() == 64
    tbl = synth.make_sequences(synth.TINY)
    ds2 = load(tbl, "in-memory")
    assert ds2.count() == 64
    assert sniff_layout(f"{tiny_dir}/sequences") == "sharded"
    assert sniff_layout(f"{tiny_dir}/doc_attrs.parquet") == "single"


def test_media_featurize_plumbing():
    tbl = make_media(48)
    out = featurize_media(rd.from_arrow(tbl), feature_dim=8, concurrency=1).to_pandas()
    assert len(out) == 48
    assert "payload" not in out.columns  # heavy bytes dropped after decode
    assert out["features"].map(len).eq(8).all()
    # deterministic: same payload -> same features
    out2 = featurize_media(rd.from_arrow(tbl), feature_dim=8, concurrency=1).to_pandas()
    f1 = np.stack(out.sort_values("media_id")["features"].to_numpy())
    f2 = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(f1, f2)


def test_media_strict_mode_raises_without_decoder():
    feat = MediaFeaturizer(decode="strict")
    if not feat.has_pil:
        with pytest.raises(NotImplementedError, match="real media decode"):
            feat(make_media(2))
