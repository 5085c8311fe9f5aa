"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video are carried as Arrow ``binary`` columns plus metadata
(kind, width/height or sample rate, codec). The Ray-side plumbing — schema,
actor-pool signature, batch sizing for large payloads, output layout — is
real and tested. Decode modes:

- ``decode="real"`` — REAL decoding via the pure-stdlib codecs in
  stages/codecs.py: PNG images (zlib inflate + scanline un-filtering) and
  PCM WAV audio (stdlib ``wave``) become genuine content-derived feature
  vectors. Video containers still need libav (absent here) and raise.
- ``decode="fake"`` — deterministic feature vector from the payload bytes
  (plumbing tests over arbitrary binary).
- ``decode="strict"`` — raises NotImplementedError (integrators wire a
  full PIL/libav decoder).

Scale notes: binary rows are wide — callers should use a small
``batch_size`` (default 256) and let blocks stay under
DataContext.target_max_block_size; the actor pool amortizes decoder init.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from modlyn_ray.stages import codecs

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta_w", pa.int32()),  # image width / audio sample-rate
        pa.field("meta_h", pa.int32()),  # image height / channels
    ]
)


def make_media(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes() for s in rng.integers(128, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_w": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
            "meta_h": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def make_real_media(n: int = 32, seed: int = 13) -> pa.Table:
    """Deterministic REAL media table: PNG image and PCM-WAV audio payloads
    built by the stdlib codecs (every PNG filter type exercised)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, mw, mh = [], [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 2 == 0:
            h, w = int(rng.integers(4, 24)), int(rng.integers(4, 24))
            c = int(rng.choice([1, 2, 3, 4]))
            img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            payloads.append(codecs.encode_png(img, filters=[0, 1, 2, 3, 4]))
            kinds.append("image")
            mw.append(w)
            mh.append(h)
        else:
            rate = int(rng.choice([8000, 16000]))
            ch = int(rng.choice([1, 2]))
            t = rng.uniform(0.01, 0.05)
            x = rng.standard_normal((int(rate * t), ch)).astype(np.float32) * 0.2
            payloads.append(codecs.encode_wav(x, rate))
            kinds.append("audio")
            mw.append(rate)
            mh.append(ch)
    return pa.table(
        {
            "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_w": pa.array(np.asarray(mw, dtype=np.int32)),
            "meta_h": pa.array(np.asarray(mh, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaFeaturizer:
    """Actor-pool decode/feature-extract stage.

    __init__ loads the (stub) decoder once per actor; __call__ maps a batch
    of binary payloads to fixed-size feature vectors. Real integrations
    replace ``_decode_fake`` with e.g. PIL decode + resize + CNN features.
    """

    def __init__(self, feature_dim: int = 16, decode: str = "fake"):
        if decode not in ("fake", "strict", "real"):
            raise ValueError(decode)
        # fail at construction, not mid-batch: real features need a 5-wide
        # image head + >=1 thumbnail bin; the fake path draws from a 32-byte
        # sha256 digest (16 uint16 values max).
        if decode == "real" and feature_dim < 6:
            raise ValueError(
                f"decode='real' needs feature_dim >= 6, got {feature_dim}"
            )
        # strict falls through to the fake path when PIL is importable, so
        # it shares the digest-width bound
        if decode in ("fake", "strict") and not 1 <= feature_dim <= 16:
            raise ValueError(
                f"decode={decode!r} needs 1 <= feature_dim <= 16, got {feature_dim}"
            )
        self.decode = decode
        self.dim = feature_dim
        try:  # a full decoder (video containers etc.) would load here
            import PIL  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def _decode_fake(self, payloads: list[bytes]) -> np.ndarray:
        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            digest = hashlib.sha256(p).digest()
            out[i] = np.frombuffer(digest[: self.dim * 2], dtype=np.uint16).astype(
                np.float32
            )[: self.dim] / 65535.0
        return out

    def _image_features(self, img: np.ndarray) -> np.ndarray:
        """[log1p(h), log1p(w), channels, mean, std, gray thumbnail bins]."""
        h, w, c = img.shape
        x = img.astype(np.float32) / 255.0
        gray = x.mean(axis=2)
        k = self.dim - 5
        # block-mean pool the grayscale plane onto a fixed 1-D grid
        edges = np.linspace(0, gray.size, k + 1).astype(np.int64)
        flat = gray.ravel()
        sums = np.add.reduceat(flat, edges[:-1])
        thumb = sums / np.maximum(np.diff(edges), 1)
        head = np.array(
            [np.log1p(h), np.log1p(w), float(c), x.mean(), x.std()], dtype=np.float32
        )
        return np.concatenate([head, thumb.astype(np.float32)])

    def _audio_features(self, samples: np.ndarray, rate: int) -> np.ndarray:
        """[log1p(duration), channels, rms, zero-cross rate, envelope bins]."""
        n, ch = samples.shape
        mono = samples.mean(axis=1)
        rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
        zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
        k = self.dim - 4
        if n == 0:  # zero-frame PCM is valid WAV; emit an all-zero envelope
            env = np.zeros(k, dtype=np.float32)
        else:
            edges = np.linspace(0, n, k + 1).astype(np.int64)
            env = np.add.reduceat(np.abs(mono), edges[:-1]) / np.maximum(
                np.diff(edges), 1
            )
        head = np.array(
            [np.log1p(n / max(rate, 1)), float(ch), rms, zcr], dtype=np.float32
        )
        return np.concatenate([head, env.astype(np.float32)])

    def _decode_real(self, payloads: list[bytes]) -> np.ndarray:
        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p[:8] == b"\x89PNG\r\n\x1a\n":
                out[i] = self._image_features(codecs.decode_png(p))
            elif p[:4] == b"RIFF":
                out[i] = self._audio_features(*codecs.decode_wav(p))
            else:
                raise NotImplementedError(
                    "decode='real' handles PNG images and PCM WAV audio "
                    "(pure-stdlib codecs); video containers require libav, "
                    "which is not in this environment"
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "strict" and not self.has_pil:
            raise NotImplementedError(
                "strict decode requires a full media library (PIL/libav) not "
                "present in this environment; decode='real' covers PNG/WAV "
                "via stdlib codecs, decode='fake' covers plumbing tests"
            )
        payloads = batch["payload"].to_pylist()
        feats = (
            self._decode_real(payloads)
            if self.decode == "real"
            else self._decode_fake(payloads)
        )
        sizes = np.asarray([len(p) for p in payloads], dtype=np.int64)
        return (
            batch.drop_columns(["payload"])  # decoded outputs drop the heavy bytes
            .append_column("payload_bytes", pa.array(sizes))
            .append_column(
                "features", pa.array(list(feats), type=pa.list_(pa.float32()))
            )
            .replace_schema_metadata(None)
        )


def featurize_media(
    ds: Dataset,
    feature_dim: int = 16,
    decode: str = "fake",
    concurrency: int = 2,
    batch_size: int = 256,
) -> Dataset:
    from modlyn_ray.util import pool_bounds

    concurrency = pool_bounds(concurrency)
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"feature_dim": feature_dim, "decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
