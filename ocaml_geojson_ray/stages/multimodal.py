"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as Arrow ``binary`` columns with
sidecar metadata columns; decode / feature-extract / resize /
frame-sample run as actor-pool map_batches stages.

Decode kernels (round 3): **uncompressed containers decode for REAL**
— BMP (24-bit BI_RGB) and WAV (PCM16) are plain struct-packed public
formats, implemented from scratch in stages/codecs.py and round-trip
bit-exactly. Compressed codecs (JPEG/PNG/MP3/...) remain honestly
STUBBED (no image/audio libraries exist in this container): such
payloads produce a ``decode_error`` row (errors-as-data, the repo's
parse/mine rule) — or, with ``fake=True``, the deterministic stand-in
decoder seeded by the payload hash, which keeps schema/batching
testable for arbitrary mimes.

Scale notes: binary payloads are large → small ``batch_size`` (64 by
default) and ``batch_format="pyarrow"`` (pandas would copy the bytes
into object cells); blocks stay bounded because the payload column is
dropped right after feature extraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .codecs import decode_bmp, decode_wav, encode_bmp, encode_wav

IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_batch(batch: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table from an id column (test source)."""
    ids = batch["id"].to_numpy()
    payloads, mimes, ws, hs = [], [], [], []
    for i in ids:
        rng = np.random.default_rng(int(i) + 1000)
        payloads.append(rng.bytes(payload_bytes))
        mimes.append("image/fake")
        ws.append(int(rng.integers(16, 64)))
        hs.append(int(rng.integers(16, 64)))
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        }
    )


def synth_pixels(media_id: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for one media id — the
    planted ground truth the decode self-checks against."""
    rng = np.random.default_rng(int(media_id) + 7000)
    h = int(rng.integers(16, 64))
    w = int(rng.integers(16, 64))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def synth_bmp_media_batch(batch: pa.Table) -> pa.Table:
    """REAL media table from an id column: payloads are valid 24-bit
    .bmp files (codecs.encode_bmp over deterministic pixels)."""
    ids = batch["id"].to_numpy()
    payloads, ws, hs = [], [], []
    for i in ids:
        img = synth_pixels(int(i))
        payloads.append(encode_bmp(img))
        hs.append(img.shape[0])
        ws.append(img.shape[1])
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp"] * len(ids), pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        }
    )


def synth_wav_media_batch(batch: pa.Table, n_samples: int = 4096,
                          sample_rate: int = 16000) -> pa.Table:
    """REAL audio table from an id column: payloads are valid PCM16
    .wav files over a deterministic tone+noise signal."""
    ids = batch["id"].to_numpy()
    payloads = []
    for i in ids:
        rng = np.random.default_rng(int(i) + 9000)
        t = np.arange(n_samples) / sample_rate
        f = float(rng.uniform(100, 2000))
        x = 0.5 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(n_samples)
        payloads.append(encode_wav(x, sample_rate))
    return pa.table(
        {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage.

    ``image/bmp`` payloads decode for REAL (codecs.decode_bmp, from
    scratch — 24-bit uncompressed). Other mimes: compressed decoders
    (PIL/libjpeg) are absent from this container, so with
    ``fake=True`` the deterministic stand-in (seeded by the payload
    hash) runs; otherwise the row gets a ``decode_error`` and null
    features — errors-as-data, nothing raises out of the batch fn.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    @staticmethod
    def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def _decode(self, payload: bytes, mime: str, w: int, h: int):
        """→ (img | None, error | None)."""
        if mime == "image/bmp":
            try:
                return decode_bmp(payload), None
            except ValueError as e:
                return None, f"bmp: {e}"
        if self.fake:
            return self._fake_decode(payload, w, h), None
        return None, f"no decoder for {mime} (compressed codecs stubbed)"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        feats: list = []
        errs: list = []
        for p, m, w, h in zip(payloads, mimes, ws, hs):
            img, err = self._decode(p, m, w, h)
            if img is None:
                feats.append(None)
                errs.append(err)
            else:
                # feature-extract: per-channel mean + std (vectorized)
                feats.append(
                    np.concatenate([img.mean(axis=(0, 1)),
                                    img.std(axis=(0, 1))]).tolist()
                )
                errs.append(None)
        out = batch.drop_columns(["payload"])  # drop big bytes ASAP
        out = out.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float64()))
        )
        return out.append_column("decode_error", pa.array(errs, pa.string()))


class ResizeImage:
    """Nearest-neighbor resize stage. For ``image/bmp`` the whole path
    is REAL: decode_bmp → resize → encode_bmp (``resized`` is a valid
    .bmp). Other mimes resize the fake decode when ``fake=True``
    (raw-pixel output), else error out per row."""

    def __init__(self, out_w: int = 32, out_h: int = 32, fake: bool = False):
        self.out_w = out_w
        self.out_h = out_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        outs: list = []
        errs: list = []
        for p, m, w, h in zip(payloads, mimes, ws, hs):
            if m == "image/bmp":
                try:
                    img = decode_bmp(p)
                except ValueError as e:
                    outs.append(None)
                    errs.append(f"bmp: {e}")
                    continue
                h, w = img.shape[:2]
            elif self.fake:
                img = DecodeImage._fake_decode(p, w, h)
            else:
                outs.append(None)
                errs.append(f"no decoder for {m} (compressed codecs stubbed)")
                continue
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = img[np.ix_(yi, xi)]
            outs.append(encode_bmp(small) if m == "image/bmp"
                        else small.tobytes())
            errs.append(None)
        out = batch.drop_columns(["payload"])
        out = out.append_column("resized", pa.array(outs, pa.binary()))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        out = out.set_column(
            out.schema.get_field_index("width"), "width",
            pa.array([self.out_w] * len(batch), pa.int32()),
        )
        return out.set_column(
            out.schema.get_field_index("height"), "height",
            pa.array([self.out_h] * len(batch), pa.int32()),
        )


class AudioFeatures:
    """Audio feature-extract stage (the third modality).

    ``audio/wav`` (PCM16) decodes for REAL (codecs.decode_wav, from
    scratch); compressed codecs (libsndfile/ffmpeg territory) remain
    stubbed — with ``fake=True`` a deterministic PCM stand-in derives
    from the payload hash, else the row errors out. Features (RMS
    energy, zero-crossing rate, spectral centroid) are the same
    vectorized kernels either way."""

    def __init__(self, fake: bool = False, sample_rate: int = 16000):
        self.fake = fake
        self.sr = sample_rate

    @staticmethod
    def _fake_pcm(payload: bytes, n: int = 4096) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(n)

    @staticmethod
    def _features(x: np.ndarray) -> list:
        rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        mag = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
        freqs = np.arange(len(mag), dtype=np.float64)
        cent = float((mag * freqs).sum() / max(mag.sum(), 1e-12))
        return [rms, zcr, cent]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = (batch["mime"].to_pylist()
                 if "mime" in batch.column_names else [""] * len(payloads))
        feats: list = []
        errs: list = []
        for p, m in zip(payloads, mimes):
            if m == "audio/wav":
                try:
                    x, _rate = decode_wav(p)
                    if x.ndim == 2:
                        x = x.mean(axis=1)  # downmix for the features
                    feats.append(self._features(x))
                    errs.append(None)
                    continue
                except ValueError as e:
                    feats.append(None)
                    errs.append(f"wav: {e}")
                    continue
            if self.fake:
                feats.append(self._features(self._fake_pcm(p)))
                errs.append(None)
            else:
                feats.append(None)
                errs.append(f"no decoder for {m} (compressed codecs stubbed)")
        out = batch.drop_columns(["payload"])  # drop big bytes ASAP
        out = out.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float64()))
        )
        return out.append_column("decode_error", pa.array(errs, pa.string()))


def frame_sample_batch(batch: pa.Table, every: int = 10) -> pa.Table:
    """Video frame-sampling plumbing: one row per sampled frame index
    (the decode itself would live in an actor like DecodeImage).
    Vectorized ragged explode: per-row sample counts → np.repeat ids +
    a reset-at-boundary cumulative index (no per-frame Python)."""
    ids = np.asarray(batch["media_id"].to_pylist(), dtype=np.int64)
    if "n_frames" in batch.column_names:
        nf = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        nf = np.full(len(batch), 30, dtype=np.int64)
    counts = np.maximum(0, -(-nf // every))  # ceil(nf / every)
    out_id = np.repeat(ids, counts)
    idx = np.arange(counts.sum(), dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = idx - np.repeat(starts, counts)
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array((within * every).astype(np.int32),
                                  pa.int32()),
        }
    )
