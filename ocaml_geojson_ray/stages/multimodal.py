"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as Arrow ``binary`` columns with
sidecar metadata columns; decode / feature-extract / resize /
frame-sample run as actor-pool map_batches stages. The decode kernels
themselves are STUBBED (no image/audio libraries exist in this
container): ``DecodeImage`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by
the payload hash) produces a (h, w, 3) uint8 array so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested end-to-end.

Scale notes: binary payloads are large → small ``batch_size`` (64 by
default) and ``batch_format="pyarrow"`` (pandas would copy the bytes
into object cells); blocks stay bounded because the payload column is
dropped right after feature extraction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


class DecodeImage:
    """Actor-pool decode stage.

    Real decoders (PIL/libjpeg etc.) are not available in this
    container — STUB: with ``fake=False`` this raises
    ``NotImplementedError`` at construction, making the gap explicit;
    with ``fake=True`` a deterministic stand-in decoder derives pixels
    from the payload hash (stable across runs/actors).
    """

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in "
                "this environment; construct with fake=True for the "
                "deterministic stand-in"
            )

    @staticmethod
    def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        feats = np.empty((len(payloads), 6), dtype=np.float64)
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            img = self._fake_decode(p, w, h)
            # feature-extract: per-channel mean + std (vectorized)
            feats[i, :3] = img.mean(axis=(0, 1))
            feats[i, 3:] = img.std(axis=(0, 1))
        out = batch.drop_columns(["payload"])  # drop big bytes ASAP
        return out.append_column(
            "image_features",
            pa.array([row.tolist() for row in feats], pa.list_(pa.float64())),
        )


class ResizeImage:
    """Resize plumbing (nearest-neighbor on the fake decode) — shows the
    actor signature + output schema for a real resize stage."""

    def __init__(self, out_w: int = 32, out_h: int = 32, fake: bool = False):
        if not fake:
            raise NotImplementedError("see DecodeImage: no image libs here")
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        outs = []
        for p, w, h in zip(payloads, ws, hs):
            img = DecodeImage._fake_decode(p, w, h)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            outs.append(img[np.ix_(yi, xi)].tobytes())
        out = batch.drop_columns(["payload"])
        out = out.append_column("resized", pa.array(outs, pa.binary()))
        out = out.set_column(
            out.schema.get_field_index("width"), "width",
            pa.array([self.out_w] * len(batch), pa.int32()),
        )
        return out.set_column(
            out.schema.get_field_index("height"), "height",
            pa.array([self.out_h] * len(batch), pa.int32()),
        )


class AudioFeatures:
    """Audio feature-extract plumbing (the third modality).

    STUB like DecodeImage: real codecs (libsndfile/ffmpeg) are absent;
    ``fake=True`` derives a deterministic PCM buffer from the payload
    hash and emits real vectorized features (RMS energy, zero-crossing
    rate, spectral-centroid stand-in) so schema/batching are tested."""

    def __init__(self, fake: bool = False, sample_rate: int = 16000):
        if not fake:
            raise NotImplementedError(
                "audio decoding requires an audio library not present in "
                "this environment; construct with fake=True for the "
                "deterministic stand-in"
            )
        self.sr = sample_rate

    @staticmethod
    def _fake_pcm(payload: bytes, n: int = 4096) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.empty((len(payloads), 3), dtype=np.float64)
        for i, p in enumerate(payloads):
            x = self._fake_pcm(p)
            feats[i, 0] = float(np.sqrt((x * x).mean()))          # RMS
            feats[i, 1] = float((np.diff(np.signbit(x)) != 0).mean())  # ZCR
            mag = np.abs(np.fft.rfft(x))
            freqs = np.arange(len(mag), dtype=np.float64)
            feats[i, 2] = float((mag * freqs).sum() / max(mag.sum(), 1e-12))
        out = batch.drop_columns(["payload"])  # drop big bytes ASAP
        return out.append_column(
            "audio_features",
            pa.array([row.tolist() for row in feats], pa.list_(pa.float64())),
        )


def frame_sample_batch(batch: pa.Table, every: int = 10) -> pa.Table:
    """Video frame-sampling plumbing: one row per sampled frame index
    (the decode itself would live in an actor like DecodeImage)."""
    ids = batch["media_id"].to_pylist()
    n_frames = batch["n_frames"].to_pylist() if "n_frames" in batch.column_names \
        else [30] * len(batch)
    out_id, out_frame = [], []
    for mid, nf in zip(ids, n_frames):
        for f in range(0, int(nf), every):
            out_id.append(mid)
            out_frame.append(f)
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
        }
    )
