"""Stdlib-only media codecs for the multimodal operators (SURVEY.md
§2 Part C.5 — closes the repo's last codec stub).

Two deliberately simple, fully public container formats whose
decode/encode is pure ``struct`` + numpy — no image/audio libraries
exist in this environment, and none are needed for them:

- **BMP** (Windows bitmap, BITMAPINFOHEADER, uncompressed 24-bit
  BI_RGB): 14-byte file header + 40-byte info header + bottom-up
  (or top-down when height < 0) pixel rows, each padded to 4 bytes,
  channels stored B,G,R.
- **WAV** (RIFF/WAVE, PCM 16-bit): RIFF chunk stream with a ``fmt ``
  chunk (format tag 1 = integer PCM) and a ``data`` chunk of
  little-endian int16 frames, channel-interleaved.

The decoded representation is numpy: ``(h, w, 3) uint8`` for images
(B,G,R channel order — exactly as stored, so encode(decode(x))
round-trips bit-identically), ``((n_frames, channels) int16, rate)``
for audio. Everything is vectorized — header parsing is O(1) and the
pixel/sample payload moves as one ``frombuffer``/``reshape``; there is
never a per-pixel Python loop, so the per-row decode cost inside an
Arrow batch is a memcpy, which is what lets these run under
``mapInPandas`` at scale.

Unsupported variants (compressed BMP, non-24-bit depths, float or
8-bit WAV, other mimes entirely) raise ``ValueError``/
``NotImplementedError`` with the accepted envelope named — same
refuse-loudly posture as the engine's budget guards.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> ``(h, w, 3) uint8`` (B,G,R order,
    top row first)."""
    if len(data) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        raise ValueError(f"BMP too short: {len(data)} bytes")
    magic, _fsize, _r1, _r2, offset = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _ncolors,
        _nimportant,
    ) = _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB BMP is supported "
            f"(got {bpp}-bit, compression {compression})"
        )
    if planes != 1 or width <= 0 or height == 0:
        raise ValueError(f"bad BMP geometry: planes={planes} {width}x{height}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = offset + stride * height
    if len(data) < need:
        raise ValueError(f"BMP truncated: {len(data)} < {need} bytes")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=offset)
    img = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    return img.copy() if top_down else img[::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """``(h, w, 3) uint8`` (B,G,R, top row first) -> uncompressed
    24-bit BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = img[::-1].reshape(h, w * 3)  # bottom-up
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    body = padded.tobytes()
    head = _BMP_FILE_HDR.pack(b"BM", offset + len(body), 0, 0, offset)
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return head + info + body


# ---------------------------------------------------------------- WAV

_RIFF_HDR = struct.Struct("<4sI4s")
_CHUNK_HDR = struct.Struct("<4sI")
_FMT_PCM = struct.Struct("<HHIIHH")


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM 16-bit RIFF/WAVE -> ``((n_frames, channels) int16, rate)``."""
    if len(data) < _RIFF_HDR.size:
        raise ValueError(f"WAV too short: {len(data)} bytes")
    riff, _size, wave = _RIFF_HDR.unpack_from(data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file ({riff!r}/{wave!r})")
    pos, fmt, payload = _RIFF_HDR.size, None, None
    while pos + _CHUNK_HDR.size <= len(data):
        cid, csize = _CHUNK_HDR.unpack_from(data, pos)
        body = data[pos + _CHUNK_HDR.size : pos + _CHUNK_HDR.size + csize]
        if cid == b"fmt " and len(body) >= _FMT_PCM.size:
            fmt = _FMT_PCM.unpack_from(body, 0)
        elif cid == b"data":
            payload = body
        pos += _CHUNK_HDR.size + csize + (csize & 1)  # chunks pad to even
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only integer PCM 16-bit WAV is supported "
            f"(got format {audio_format}, {bits}-bit)"
        )
    if channels < 1 or rate < 1:
        raise ValueError(f"bad WAV fmt: channels={channels} rate={rate}")
    n = len(payload) // (2 * channels)
    samples = np.frombuffer(
        payload, dtype="<i2", count=n * channels
    ).reshape(n, channels)
    return samples.copy(), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """``(n_frames, channels) int16`` + rate -> PCM 16-bit WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError(f"need (n, ch) int16, got {samples.shape} {samples.dtype}")
    channels = samples.shape[1]
    payload = samples.astype("<i2").tobytes()
    fmt = _FMT_PCM.pack(1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    chunks = (
        _CHUNK_HDR.pack(b"fmt ", len(fmt))
        + fmt
        + _CHUNK_HDR.pack(b"data", len(payload))
        + payload
    )
    return _RIFF_HDR.pack(b"RIFF", 4 + len(chunks), b"WAVE") + chunks


# ------------------------------------------------------- flat samples

SUPPORTED_MIMES = ("image/bmp", "audio/wav", "audio/x-wav")


def decode_samples(content: bytes, mime: str) -> np.ndarray:
    """Decode to the flat sample stream the feature operators consume:
    pixel channel bytes (uint8) for images, PCM sample values (int16)
    for audio — both as int64 so downstream stats share one dtype."""
    if mime == "image/bmp":
        return decode_bmp(content).reshape(-1).astype(np.int64)
    if mime in ("audio/wav", "audio/x-wav"):
        return decode_wav(content)[0].reshape(-1).astype(np.int64)
    raise NotImplementedError(
        f"no codec for {mime!r}: supported mimes are {SUPPORTED_MIMES} "
        f"(or pass fake=True for the deterministic byte-math mode)"
    )


def decode_payload_bytes(content: bytes, mime: str) -> bytes:
    """Decode to the raw DECODED payload bytes (pixel array / PCM
    frames, headers and row padding stripped) — what frame sampling
    windows over: the container framing is not signal."""
    if mime == "image/bmp":
        return decode_bmp(content).tobytes()
    if mime in ("audio/wav", "audio/x-wav"):
        return decode_wav(content)[0].tobytes()
    raise NotImplementedError(
        f"no codec for {mime!r}: supported mimes are {SUPPORTED_MIMES} "
        f"(or pass fake=True for the deterministic byte-math mode)"
    )
