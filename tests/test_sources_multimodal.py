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
        with pytest.raises(NotImplementedError, match="strict decode"):
            feat(make_media(2))


# ---------------------------------------------------------------------------
# real stdlib codecs (stages/codecs.py): PNG + PCM WAV


def test_png_round_trip_every_filter_and_layout():
    from modlyn_ray.stages import codecs

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            data = codecs.encode_png(img, filters=filters)
            out = codecs.decode_png(data)
            np.testing.assert_array_equal(out, img)


def test_png_rejects_bad_input():
    from modlyn_ray.stages import codecs

    with pytest.raises(ValueError, match="bad signature"):
        codecs.decode_png(b"not a png at all")


def test_wav_round_trip_exact_int16():
    from modlyn_ray.stages import codecs

    rng = np.random.default_rng(8)
    pcm = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    x = pcm.astype(np.float32) / 32768.0
    samples, rate = codecs.decode_wav(codecs.encode_wav(x, 16000))
    assert rate == 16000
    np.testing.assert_array_equal((samples * 32768.0).astype(np.int16), pcm)


def test_wav_full_scale_all_widths():
    """A full-scale 1.0 sample must clip to the max PCM code, not wrap.

    Regression: the width=4 quantizer used to clip in float32, where
    2^31 - 1 rounds up to 2^31 and the int32 cast wraps to INT32_MIN."""
    from modlyn_ray.stages import codecs

    x = np.array([[1.0], [-1.0], [0.0]], dtype=np.float32)
    for width, top in ((1, 127 / 128.0), (2, 32767 / 32768.0), (4, (2**31 - 1) / 2**31)):
        samples, rate = codecs.decode_wav(codecs.encode_wav(x, 8000, width=width))
        assert rate == 8000
        assert samples[0, 0] == pytest.approx(top, abs=1e-9)
        assert samples[1, 0] == -1.0
        assert samples[2, 0] == pytest.approx(0.0, abs=1 / 127.0)


def test_media_real_decode_end_to_end():
    from modlyn_ray.stages.multimodal import make_real_media

    tbl = make_real_media(16)
    out = featurize_media(
        rd.from_arrow(tbl), feature_dim=12, decode="real", concurrency=1
    ).to_pandas()
    assert len(out) == 16 and out["features"].map(len).eq(12).all()
    feats = np.stack(out.sort_values("media_id")["features"].to_numpy())
    assert np.isfinite(feats).all()
    # features are content-derived, not metadata echoes: the image rows'
    # channel slot (index 2) must match the PNG's actual channel count
    feat = MediaFeaturizer(feature_dim=12, decode="real")
    local = feat(tbl).to_pandas().sort_values("media_id")
    np.testing.assert_allclose(
        np.stack(local["features"].to_numpy()), feats, rtol=1e-6
    )
    from modlyn_ray.stages import codecs

    img0 = codecs.decode_png(tbl["payload"][0].as_py())
    assert feats[0, 2] == img0.shape[2]
    assert abs(feats[0, 3] - img0.astype(np.float32).mean() / 255.0) < 1e-5


def test_media_real_decode_rejects_unknown_container():
    feat = MediaFeaturizer(decode="real")
    with pytest.raises(NotImplementedError, match="libav"):
        feat(make_media(2))  # random bytes: neither PNG nor RIFF
