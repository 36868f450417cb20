"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Compressed image/audio/video codecs (JPEG/PNG/ffmpeg) are NOT in this
container, so those decode kernels are STUBS (clearly marked) — but the
pipeline is REAL end-to-end for PPM (P6), a public header+raw-RGB format
that decodes with nothing but ``np.frombuffer``: real pixel decode, real
nearest-neighbor resize, real pixel-statistics features.  Everything
Ray-side — the binary-column schema, actor-pool signatures, batch sizing
for wide binary rows, and the output layout — is shared by both paths,
so swapping the stub for PIL/torchaudio/ffmpeg changes ONE method.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..scale import autoscale_pool

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        pa.field("payload", pa.large_binary()),  # opaque encoded bytes
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

REAL_DECODERS_AVAILABLE = False  # flipped when PIL/av are importable
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as binary PPM (P6) — the
    textbook header + raw RGB layout (public format, Netpbm)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to an (H, W, 3) uint8 array with pure
    numpy — a REAL pixel decode that needs no media library.  Handles
    the format's comment lines and arbitrary whitespace between header
    tokens; raises ValueError on anything malformed (truncated raster,
    maxval != 255, wrong magic)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments running to end-of-line; raster starts after
    # the single whitespace byte following maxval
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    pos += 1  # the single whitespace separating header from raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index grids — one fancy-index
    gather, no Python pixel loops.  Index mapping is the standard
    floor((i + 0.5) * in/out) sample-center rule."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows[:, None], cols[None, :]]


def synth_image(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic (H, W, 3) uint8 test image: per-channel affine
    gradients seeded by the id — cheap, unique per id, and with known
    closed-form channel means for the featurizer tests."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.int64)
    r = (xs * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (ys * 255 // max(h - 1, 1)).astype(np.uint8)
    b = np.full((h, w), media_id % 256, np.uint8)
    return np.stack([r, g, b], axis=-1)


def synthesize_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic media rows derived from the documents table: image
    rows carry REAL binary-PPM payloads (gradient images sized by id) so
    the true decode path runs end-to-end; audio/video rows carry opaque
    utf-8 bytes and exercise the stub path."""
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text").to_pylist()
    mtype = np.where(
        doc_id % 3 == 0, "image", np.where(doc_id % 3 == 1, "audio", "video")
    )
    widths = (doc_id % 48 + 8).astype(np.int32)
    heights = (doc_id % 32 + 8).astype(np.int32)
    payloads = [
        encode_ppm(synth_image(int(i), int(w), int(h)))
        if t == "image"
        else s.encode()
        for i, w, h, t, s in zip(doc_id, widths, heights, mtype, text)
    ]
    return pa.table(
        {
            "media_id": pa.array(doc_id, pa.int64()),
            "media_type": pa.array(mtype).cast(pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "duration_ms": pa.array((doc_id * 33 % 60000).astype(np.int32)),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: decode payload → fixed-size feature vector.

    ``__init__`` loads the model once per actor; ``__call__`` processes a
    batch.  Batch size MUST be small for wide binary rows (see
    ``multimodal_features``) so batch × concurrency fits worker heap.

    Two decode paths share the output layout:
    - P6 PPM payloads take the REAL path — ``decode_ppm`` pixels →
      per-channel mean/std + aspect features (``decoded_real=True``).
    - Everything else (JPEG/PNG/audio/video — codecs absent in this
      container) takes the marked STUB path: a deterministic 8-float
      digest of the payload bytes.  Real codec wiring replaces ONE
      method (``_decode_stub``)."""

    FEATURE_DIM = 8

    def __init__(self):
        self._model = "pixel-stats-featurizer-v1"  # loaded once per actor

    def _decode_stub(self, payload: bytes, media_type: str) -> np.ndarray:
        # STUB: deterministic pseudo-features from a sha256 of the payload.
        # A real codec decodes pixels/samples here (PIL/av when available).
        d = hashlib.sha256(payload or b"").digest()
        return (
            np.frombuffer(d[: self.FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            / np.iinfo(np.uint32).max
        )

    def _featurize_pixels(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        f = np.empty(self.FEATURE_DIM, np.float64)
        flat = img.reshape(-1, 3).astype(np.float64) / 255.0
        f[0:3] = flat.mean(axis=0)
        f[3:6] = flat.std(axis=0)
        f[6] = w / h
        f[7] = (h * w) / 2**20  # megapixels
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats, real = [], []
        for p, t in zip(payloads, types):
            if p is not None and p.startswith(b"P6"):
                feats.append(self._featurize_pixels(decode_ppm(p)))
                real.append(True)
            else:
                feats.append(self._decode_stub(p, t))
                real.append(False)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "payload_bytes": pa.array(
                    [len(p or b"") for p in payloads], pa.int64()
                ),
                "decoded_real": pa.array(real, pa.bool_()),
                "features": pa.array(
                    [list(f) for f in feats], pa.list_(pa.float64())
                ),
            }
        )


class ResizeImages:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode,
    image rows only (other media types pass through untouched).  The
    whole stage is REAL for PPM payloads — no media library involved."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        out_p, out_w, out_h = [], [], []
        for p, w, h in zip(payloads, widths, heights):
            if p is not None and p.startswith(b"P6"):
                img = resize_nearest(decode_ppm(p), self.out_h, self.out_w)
                out_p.append(encode_ppm(img))
                out_w.append(self.out_w)
                out_h.append(self.out_h)
            else:
                out_p.append(p)
                out_w.append(w)
                out_h.append(h)
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["payload"] = pa.array(out_p, pa.large_binary())
        cols["width"] = pa.array(out_w, pa.int32())
        cols["height"] = pa.array(out_h, pa.int32())
        return pa.table(cols)


def multimodal_features(media: ray.data.Dataset) -> ray.data.Dataset:
    """Decode/feature-extract pipeline over a media table.

    batch_size is small and the format stays ``pyarrow`` end-to-end:
    binary payloads do not survive pandas round-trips cleanly (object
    dtype) and large rows need small batches (SURVEY.md §4 memory row)."""
    return media.map_batches(
        DecodeAndFeaturize,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows → small batches
        concurrency=autoscale_pool(),
        num_cpus=1,
    )
