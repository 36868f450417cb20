"""Deterministic hashing: key→partition assignment and content digests.

Partition assignment must be stable across processes AND across runs
(resume matches new events to previously committed partitions), so Python's
per-process-salted ``hash()`` is unusable.  We use pandas'
``hash_pandas_object`` (SipHash-1-3 with a fixed key), which is vectorized,
deterministic for a pinned pandas version, and fast.  A cluster runs one
pinned image, so cross-node stability holds; the manifest records the
partition count so a resume can detect a mismatch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Separator that cannot appear inside repo/path values.
_KEY_SEP = "\x00"

# Identity of the key→hash mapping.  Partition routing is ``key_hash % P``,
# so a lake's partition layout is a function of this algorithm: every
# manifest records the version it was committed under, and resume REFUSES a
# lake written by a different version (keys would silently migrate
# partitions, mis-applying per-partition checkpoint pruning and duplicating
# rows across partition files).  Bump this whenever the mapping changes.
#   v1: polars hash of '\x00'-joined composite string (pandas fallback)
#   v2: polars two-column row hash — no joined-string materialization (the
#       join alone measured 43.5ms vs 16.0ms for the whole v2 hash per
#       524Ki rows; exactness never depends on the hash — winner folds
#       collision-check the real strings)
# The constant reflects the ACTIVE path: a polars-less environment falls
# back to the v1 pandas mapping and must not stamp manifests as v2.
try:
    import polars as _pl  # noqa: F401

    KEY_HASH_VERSION = 2
except ImportError:  # pragma: no cover - polars is in the pinned image
    KEY_HASH_VERSION = 1


def key_hash(repo: pa.ChunkedArray | pa.Array, path: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized uint64 hash of the upsert key ``(repo, path)``.

    Hashing the full composite key spreads a hot repo's paths uniformly
    across partitions — this IS the salting strategy for hot repos (the key
    is ``(repo, path)``, so splitting a repo by path-hash preserves per-key
    ordering; SURVEY.md §7 known-hard #2).

    Deterministic across processes for a pinned polars version (the row
    hash seeds are fixed); a cluster runs one pinned image.  No composite
    boundary ambiguity: the columns hash separately and combine, so
    ("ab","c") can never collide-by-construction with ("a","bc").
    """
    try:
        import polars as pl

        # Hashes the Arrow buffers directly (no per-row Python objects, no
        # concatenated-string allocation) — 3.4× the v1 join+hash.
        df = pl.DataFrame({"r": pl.from_arrow(repo), "p": pl.from_arrow(path)})
        return df.hash_rows().to_numpy()
    except ImportError:
        combined = pc.binary_join_element_wise(repo, path, _KEY_SEP)
        if isinstance(combined, pa.ChunkedArray):
            combined = combined.combine_chunks()
        ser = combined.to_pandas()
        # categorize=False is REQUIRED for correctness: the categorize fast
        # path hashes via the series' category layout, so the same value
        # hashes differently in different batches — which would scatter one
        # key across partitions. categorize=False hashes value bytes.
        return pd.util.hash_pandas_object(ser, index=False, categorize=False).to_numpy()


def partition_ids(
    repo: pa.ChunkedArray | pa.Array,
    path: pa.ChunkedArray | pa.Array,
    num_partitions: int,
) -> np.ndarray:
    """Partition id per row: ``key_hash(repo, path) % num_partitions``."""
    return (key_hash(repo, path) % np.uint64(num_partitions)).astype(np.int64)


def sha256_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 hex digest of a string/binary column (null → null).

    The per-row invariant vs the reference replay semantics (BASELINE.json
    ``input_hint``): final-state rows must match on ``sha256(content)``.
    Runs only over merge-surviving rows, not the raw event stream.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    # The digest itself is inherently per-row, but iterating Arrow SCALARS
    # is not: one pyarrow scalar + as_buffer allocation per row measured
    # ~2x the raw hash cost on KB-scale contents.  Slice the values buffer
    # directly through one memoryview over int64 offsets instead.
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8
    )
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    valid = (
        arr.is_valid().to_numpy(zero_copy_only=False) if arr.null_count else None
    )
    sha = hashlib.sha256
    out: list[str | None] = [None] * n
    if valid is None:
        for i in range(n):
            out[i] = sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
    else:
        for i in range(n):
            if valid[i]:
                out[i] = sha(data[offsets[i]:offsets[i + 1]]).hexdigest()
    return pa.array(out, type=pa.string())


def table_digest(tbl: pa.Table, sort_keys: list[str]) -> str:
    """Order-independent digest of a table: sha256 over rows sorted by keys.

    Used in manifests so idempotence tests can compare partition content
    without re-reading data files.  Vectorized: per column, values are cast
    to string, null-filled with a sentinel, joined into ONE buffer via an
    Arrow kernel, and the raw data+offset buffers are hashed — no Python
    loop over rows (this runs inside every partition commit).
    """
    if len(tbl) == 0:
        return hashlib.sha256(b"empty").hexdigest()
    tbl = tbl.sort_by([(k, "ascending") for k in sort_keys])
    h = hashlib.sha256()
    for name in sorted(tbl.column_names):
        h.update(name.encode())
        col = tbl.column(name)
        if pa.types.is_list(col.type):
            # list state columns (the aggregate lake's bottom-k samples):
            # hash rebased offsets + the flattened values' string cast —
            # deterministic for the same logical content regardless of
            # chunking/slicing (null list rows hash as empty lists)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            arr = arr.fill_null([])
            off = arr.offsets.to_numpy(zero_copy_only=False).astype("int64")
            h.update((off - off[0]).tobytes())
            col = arr.values.slice(off[0], off[-1] - off[0])
        if col.type != pa.string():
            col = col.cast(pa.string())
        col = pc.fill_null(col, "\x01<null>")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arr = arr.cast(pa.large_string())
        # hash offsets (value boundaries) + data bytes
        for buf in arr.buffers()[1:]:
            if buf is not None:
                h.update(buf)
    return h.hexdigest()
