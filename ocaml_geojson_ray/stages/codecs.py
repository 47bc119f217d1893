"""From-scratch media codecs for UNCOMPRESSED container formats.

No image/audio libraries exist in this container, so compressed
formats (JPEG/PNG/MP3/...) stay honestly stubbed in multimodal.py —
but the uncompressed containers are plain public file formats
(struct-packed headers + raw samples), so their decode kernels can be
REAL:

- **BMP** (Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB,
  bottom-up rows, 4-byte row padding) — encode/decode to (h, w, 3)
  uint8 RGB, fully numpy-vectorized over the pixel buffer.
- **WAV** (RIFF PCM, 16-bit little-endian mono/stereo) —
  encode/decode to float64 in [-1, 1).

Both round-trip bit-exactly (pinned in tests/test_stages.py), giving
the multimodal pipeline a real decode path end-to-end; only the
compressed-codec kernels remain stubs.
"""

from __future__ import annotations

import struct

import numpy as np


# -- BMP (24-bit uncompressed) ----------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB .bmp bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    # rows bottom-up, channels BGR
    rows = img[::-1, :, ::-1]
    buf = np.zeros((h, stride), dtype=np.uint8)
    buf[:, :row_bytes] = rows.reshape(h, row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + info + buf.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB .bmp bytes → (h, w, 3) uint8 RGB (vectorized).

    Supports the plain BITMAPINFOHEADER layout this module writes plus
    top-down (negative height) variants; anything compressed or not
    24-bit raises ValueError (caller records errors-as-data or falls
    back to the stub)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BI_RGB supported")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("bad dimensions")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP")
    buf = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = buf.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


# -- WAV (RIFF PCM16) -------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1) (n,) or (n, channels) → PCM16 .wav."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                      byte_rate, ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 .wav bytes → (samples float64 in [-1, 1), sample_rate).
    Mono returns (n,), multi-channel (n, ch). Walks RIFF chunks; only
    format tag 1 (PCM) at 16 bits is supported."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    ch = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("bad fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise ValueError("only PCM supported")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if ch is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    pcm = np.frombuffer(payload, dtype="<i2")
    if ch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % ch].reshape(-1, ch)
    return pcm.astype(np.float64) / 32768.0, int(rate)
