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


def _parse_ppm_at(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one P6 image starting at ``pos``; returns (image, next_pos).
    Handles the format's comment lines and arbitrary whitespace between
    header tokens; raises ValueError on anything malformed (truncated
    raster, maxval != 255, wrong magic)."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments running to end-of-line; raster starts after
    # the single whitespace byte following maxval
    pos, tokens = pos + 2, []
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
    return (
        np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3),
        pos + w * h * 3,
    )


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode one binary PPM (P6) to an (H, W, 3) uint8 array with pure
    numpy — a REAL pixel decode that needs no media library."""
    img, _ = _parse_ppm_at(payload, 0)
    return img


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Decode a concatenated-P6 stream (this repo's synthetic 'video'
    container: frames are back-to-back PPM images) into a frame list."""
    frames, pos = [], 0
    while pos < len(payload):
        img, pos = _parse_ppm_at(payload, pos)
        frames.append(img)
    return frames


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Serialize mono int16 PCM as a canonical 44-byte-header WAV (RIFF)
    file — the public format, no audio library involved."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM WAV with pure numpy/struct: returns
    (samples int16, sample_rate).  Walks RIFF chunks (so extra chunks
    like LIST are skipped, not assumed absent); raises ValueError on
    compressed / non-mono / non-16-bit payloads."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
            fmt = rate
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            if len(body) != size:
                raise ValueError("truncated data chunk")
            return np.frombuffer(body[: size - size % 2], dtype=np.int16), fmt
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> np.ndarray:
    """Real signal statistics from decoded PCM: duration, RMS, peak,
    zero-crossing rate, and a 4-bin spectral-free energy profile
    (quartile RMS) — all vectorized numpy."""
    f = np.zeros(dim, np.float64)
    if not len(samples):
        return f
    x = samples.astype(np.float64) / 32768.0
    f[0] = len(x) / rate  # seconds
    f[1] = float(np.sqrt(np.mean(x * x)))  # rms
    f[2] = float(np.abs(x).max())  # peak
    f[3] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))  # zcr
    for i, part in enumerate(np.array_split(x, 4)):
        f[4 + i] = float(np.sqrt(np.mean(part * part))) if len(part) else 0.0
    return f


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


def synth_audio(media_id: int) -> np.ndarray:
    """Deterministic short int16 waveform: a sawtooth whose period and
    length derive from the id.  n_samples = (id % 50 + 10) * 16 — i.e.
    10-59 ms at 16 kHz, so payloads stay small in tests."""
    n = (media_id % 50 + 10) * 16
    step = media_id % 31 + 1
    return ((np.arange(n, dtype=np.int64) * step * 257) % 65536 - 32768).astype(
        np.int16
    )


VIDEO_FRAME_W, VIDEO_FRAME_H = 8, 6


def synth_video(media_id: int) -> bytes:
    """Deterministic concatenated-P6 'video': (id % 4 + 2) gradient
    frames of 8×6, each seeded by (id, frame_idx)."""
    n_frames = media_id % 4 + 2
    return b"".join(
        encode_ppm(
            synth_image(media_id * 1000 + f, VIDEO_FRAME_W, VIDEO_FRAME_H)
        )
        for f in range(n_frames)
    )


def synthesize_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic media rows derived from the documents table — ALL
    THREE modalities carry REAL decodable payloads (no media library in
    the loop): images are binary PPM, audio is 16-bit PCM WAV, video is
    a concatenated-PPM frame stream.  The stub path stays reachable for
    payloads in codec formats this container cannot decode."""
    doc_id = docs.column("doc_id").to_numpy()
    mtype = np.where(
        doc_id % 3 == 0, "image", np.where(doc_id % 3 == 1, "audio", "video")
    )
    widths = np.where(
        mtype == "image", doc_id % 48 + 8,
        np.where(mtype == "video", VIDEO_FRAME_W, 0),
    ).astype(np.int32)
    heights = np.where(
        mtype == "image", doc_id % 32 + 8,
        np.where(mtype == "video", VIDEO_FRAME_H, 0),
    ).astype(np.int32)
    payloads, durations = [], []
    for i, w, h, t in zip(doc_id, widths, heights, mtype):
        i = int(i)
        if t == "image":
            payloads.append(encode_ppm(synth_image(i, int(w), int(h))))
            durations.append(0)
        elif t == "audio":
            s = synth_audio(i)
            payloads.append(encode_wav(s))
            durations.append(len(s) * 1000 // 16000)
        else:
            payloads.append(synth_video(i))
            durations.append((i % 4 + 2) * 33)
    return pa.table(
        {
            "media_id": pa.array(doc_id, pa.int64()),
            "media_type": pa.array(mtype).cast(pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "duration_ms": pa.array(np.asarray(durations, np.int32)),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: decode payload → fixed-size feature vector.

    ``__init__`` loads the model once per actor; ``__call__`` processes a
    batch.  Batch size MUST be small for wide binary rows (see
    ``multimodal_features``) so batch × concurrency fits worker heap.

    Decode routing (by content sniffing, so a mislabeled row cannot
    crash the real path), all sharing the output layout:
    - ``P6`` payloads → REAL pixel path (``decode_ppm_stream``): one
      frame = image features; several = video (mean per-frame stats +
      frame count).
    - ``RIFF/WAVE`` payloads → REAL PCM path (``decode_wav`` →
      ``audio_features``).
    - Anything else (JPEG/PNG/MP3/H.264 — codecs absent in this
      container) → marked STUB path: a deterministic 8-float digest of
      the payload bytes.  Real codec wiring replaces ONE method
      (``_decode_stub``)."""

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
                frames = decode_ppm_stream(p)
                if len(frames) == 1:
                    feats.append(self._featurize_pixels(frames[0]))
                else:
                    per = np.stack(
                        [self._featurize_pixels(f) for f in frames]
                    ).mean(axis=0)
                    per[7] = len(frames)
                    feats.append(per)
                real.append(True)
            elif p is not None and p.startswith(b"RIFF"):
                feats.append(audio_features(*decode_wav(p), dim=self.FEATURE_DIM))
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
                # works for single images AND concatenated-frame streams
                out_p.append(
                    b"".join(
                        encode_ppm(resize_nearest(f, self.out_h, self.out_w))
                        for f in decode_ppm_stream(p)
                    )
                )
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


class FrameSampleVideos:
    """Actor-pool stage: sample every ``stride``-th frame out of video
    payloads (concatenated-P6 streams) — one OUTPUT ROW PER SAMPLED
    FRAME, each a standalone single-image PPM, so downstream image
    stages (featurize, resize) consume frames like any other image.
    Non-video rows are dropped: this is a frame-extraction operator."""

    def __init__(self, stride: int = 2):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": [], "frame_idx": [], "payload": [], "width": [], "height": []}
        for i, t, p in zip(ids, types, payloads):
            if t != "video" or p is None or not p.startswith(b"P6"):
                continue
            for fi, frame in enumerate(decode_ppm_stream(p)):
                if fi % self.stride:
                    continue
                out["media_id"].append(i)
                out["frame_idx"].append(fi)
                out["payload"].append(encode_ppm(frame))
                out["height"].append(frame.shape[0])
                out["width"].append(frame.shape[1])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "payload": pa.array(out["payload"], pa.large_binary()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
            }
        )


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
