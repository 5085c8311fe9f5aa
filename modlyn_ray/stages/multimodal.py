"""Multimodal columns: opaque binary payloads with typed metadata.

Image/audio/video are carried as Arrow ``binary`` columns plus metadata
(kind, width/height or sample rate, codec). The Ray-side plumbing — schema,
actor-pool signature, batch sizing for large payloads, output layout — is
real and tested; the actual decode is STUBBED (PIL / libav are not in this
container): ``decode="fake"`` produces a deterministic feature vector from
the payload bytes, ``decode="strict"`` raises NotImplementedError so
integrators wire a real decoder.

Scale notes: binary rows are wide — callers should use a small
``batch_size`` (default 256) and let blocks stay under
DataContext.target_max_block_size; the actor pool amortizes decoder init.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

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


class MediaFeaturizer:
    """Actor-pool decode/feature-extract stage.

    __init__ loads the (stub) decoder once per actor; __call__ maps a batch
    of binary payloads to fixed-size feature vectors. Real integrations
    replace ``_decode_fake`` with e.g. PIL decode + resize + CNN features.
    """

    def __init__(self, feature_dim: int = 16, decode: str = "fake"):
        if decode not in ("fake", "strict"):
            raise ValueError(decode)
        self.decode = decode
        self.dim = feature_dim
        try:  # real decoder would be loaded here, once per actor
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "strict" and not self.has_pil:
            raise NotImplementedError(
                "real media decode requires an image/audio library not present "
                "in this environment; use decode='fake' for plumbing tests"
            )
        payloads = batch["payload"].to_pylist()
        feats = self._decode_fake(payloads)
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
