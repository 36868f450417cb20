"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the
decode kernels are STUBS (clearly marked); everything Ray-side — the
binary-column schema, actor-pool signatures, batch sizing for wide binary
rows, and the output layout — is real and tested.  Swapping the stub for
PIL/torchaudio/ffmpeg changes ONE method.
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


def synthesize_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic fake media rows derived from the documents table
    (payload = utf-8 text bytes; metadata derived arithmetically) — lets
    the plumbing be exercised without real media files."""
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text").to_pylist()
    payloads = [t.encode() for t in text]
    return pa.table(
        {
            "media_id": pa.array(doc_id, pa.int64()),
            "media_type": pa.array(
                np.where(doc_id % 3 == 0, "image", np.where(doc_id % 3 == 1, "audio", "video"))
            ).cast(pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array((doc_id % 640 + 32).astype(np.int32)),
            "height": pa.array((doc_id % 480 + 32).astype(np.int32)),
            "duration_ms": pa.array((doc_id * 33 % 60000).astype(np.int32)),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: decode payload → fixed-size feature vector.

    ``__init__`` loads the (stub) model once per actor; ``__call__``
    processes a batch.  Batch size MUST be small for wide binary rows
    (see ``multimodal_features``) so batch × concurrency fits worker heap.

    The stub feature is a deterministic 8-float digest of the payload
    bytes — real decoders drop into ``_decode``.
    """

    FEATURE_DIM = 8

    def __init__(self):
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError(
                "real decoder wiring goes here (PIL/av available)"
            )
        self._model = "stub-digest-featurizer-v1"  # loaded once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        # STUB: deterministic pseudo-features from a sha256 of the payload.
        # A real implementation decodes pixels/samples here.
        d = hashlib.sha256(payload or b"").digest()
        return (
            np.frombuffer(d[: self.FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            / np.iinfo(np.uint32).max
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = np.stack([self._decode(p, t) for p, t in zip(payloads, types)])
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "payload_bytes": pa.array(
                    [len(p or b"") for p in payloads], pa.int64()
                ),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
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
