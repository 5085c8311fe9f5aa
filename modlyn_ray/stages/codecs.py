"""Pure-stdlib media codecs: PNG and PCM-WAV decode (plus fixture encoders).

The container has no PIL / libav, but both formats are decodable from
public specs with stdlib primitives alone:

- PNG (ISO/IEC 15948): zlib-inflate the IDAT stream, then reverse the
  per-scanline filters (None/Sub/Up/Average/Paeth). 8-bit depth,
  non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA) — the layouts real thumbnail pipelines emit.
- WAV: RIFF parse via the stdlib ``wave`` module; 8/16/32-bit PCM frames
  -> float32 samples normalized to [-1, 1].

These make the multimodal actor stage (stages/multimodal.py) a REAL
decoder where the reference's environment would use PIL — the encoders
below exist so tests can build genuine on-disk fixtures and assert
byte-exact round-trips. Filters 1/3/4 have sequential data dependencies
within a row (each pixel needs the reconstructed left neighbor), so those
rows decode in a per-pixel loop; Sub is vectorized via a per-lane modular
cumsum and None/Up rows are pure numpy. Thumbnails are small — the actor
amortizes nothing heavier than these loops.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG -> uint8 array (h, w, channels)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    filt = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = int(filt[y, 0])
        row = filt[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256 per spec
        elif ftype == 1:  # Sub: recon[x] = row[x] + recon[x-bpp]
            # per-lane modular cumsum vectorizes the sequential dependency
            lanes = row.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 3:  # Average
            r = out[y]
            for x in range(stride):
                left = int(r[x - bpp]) if x >= bpp else 0
                r[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            r = out[y]
            for x in range(stride):
                left = int(r[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                r[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode a uint8 (h, w, c) array as PNG (test-fixture helper).

    ``filters`` optionally forces a per-row filter type (cycled), so tests
    can exercise every un-filter path in decode_png.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    bpp = c
    rows = bytearray()
    for y in range(h):
        ftype = filters[y % len(filters)] if filters else 0
        cur = flat[y].astype(np.int64)
        prev = flat[y - 1].astype(np.int64) if y else np.zeros(w * c, dtype=np.int64)
        left = np.zeros(w * c, dtype=np.int64)
        left[bpp:] = cur[:-bpp]
        ul = np.zeros(w * c, dtype=np.int64)
        ul[bpp:] = prev[:-bpp]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            enc = cur - ((left + prev) >> 1)
        elif ftype == 4:
            pred = np.empty(w * c, dtype=np.int64)
            for x in range(w * c):
                pred[x] = _paeth(int(left[x]), int(prev[x]), int(ul[x]))
            enc = cur - pred
        else:
            raise ValueError(ftype)
        rows.append(ftype)
        rows += (enc % 256).astype(np.uint8).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes -> (float32 samples (n, channels) in [-1, 1],
    sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int, width: int = 2) -> bytes:
    """Encode float32 samples (n, channels) in [-1, 1] as PCM WAV bytes."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        # 1-D input is ALWAYS mono (n samples) — the old > 8-column
        # heuristic misencoded short mono clips as multi-channel
        samples = samples[:, None]
    elif samples.shape[0] == 1 and samples.shape[1] > 8:
        samples = samples.T  # tolerate legacy (1, n) mono input
    # quantize in float64: 2^31 - 1 is not representable in float32, so a
    # float32 clip would round a full-scale 1.0 sample up to 2^31 and the
    # int32 cast would wrap to INT32_MIN
    if width == 2:
        pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2")
    elif width == 1:
        pcm = (np.clip(samples * 128.0, -128, 127) + 128).astype(np.uint8)
    elif width == 4:
        pcm = np.clip(samples * 2147483648.0, -(1 << 31), (1 << 31) - 1).astype("<i4")
    else:
        raise ValueError(width)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(width)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
