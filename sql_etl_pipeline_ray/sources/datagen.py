"""Deterministic synthetic change-event generator.

Mirrors the reference's seeding discipline (its generator seeds Faker /
numpy / random with 42, ``src/sample_data_generator.py:21-27``) but
generates OUR data model (FIXTURES.md §1-3): a change-event log over
repo-files keys ``(repo, path)`` with

- a strictly monotonic, globally unique ``lsn``,
- op mix ≈ I/U/D with every key's first event an insert (plus a small
  orphan set of U/D events on never-inserted keys, for the anti-join
  audit — the reference's orphan checks, ``sql/etl_transformations.sql:200-210``),
- hot-key skew (one hot repo holding ~half the keys),
- LSN-bucketed file layout ``lsn_bucket=K/events.parquet`` so resume can
  prune whole files; rows are shuffled *within* a bucket (merge must sort),
- an optional schema-evolution epoch: events past a threshold LSN carry an
  added ``size_bytes`` column (written int32 in the first evolved bucket,
  int64 after → unify widens) and ``lang`` as ``large_string``.

Generation is CHUNKED (bucket-at-a-time) so 100M+-event bench logs never
hold the whole table in memory: the only global state is two int arrays
(key id and op code per event); content/commit strings are pure per-row
functions of (key_id, lsn) — slice-independent, so any chunking produces
byte-identical events.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["py", "js", "go", "rs", "java", "c", "md"])
_WORDS = np.array(
    "scan filter merge batch shuffle commit index vector stream actor "
    "buffer column schema offset lineage digest replay window upsert".split()
)
_OPS = np.array(["I", "U", "D", "P"], dtype=object)


@dataclass
class ChangeLogSpec:
    n_keys: int = 1000
    n_events: int = 5000
    seed: int = 42
    num_buckets: int = 8
    n_orgs: int = 10
    hot_repo_share: float = 0.5  # fraction of keys living in one hot repo
    delete_frac: float = 0.10
    orphan_frac: float = 0.01  # events targeting never-inserted keys
    evolve_after_frac: float | None = None  # e.g. 0.6 → schema evolves at 60% LSN
    content_pad: int = 0  # max extra repeated filler lines per row (sizes content)
    # fraction of would-be updates emitted as op='P' PARTIAL updates
    # (null = unchanged: the patch carries a new commit id; lang/content
    # stay null).  0.0 adds no RNG draws, so existing seeds/logs are
    # byte-stable.
    patch_frac: float = 0.0
    # "inline" writes classic single-file buckets; "sidestore" splits each
    # bucket into a content-free META file (all columns except content,
    # plus a content_null bool) and a sibling ``events.content.parquet``
    # holding (lsn, content) SORTED BY LSN in small row groups — the
    # late-materialization log layout: phase 2 fetches only the row
    # groups that contain winner LSNs, and on update-heavy logs winners
    # concentrate in the log tail, so most early content row groups are
    # never read.  Same events either way (replay results identical).
    layout: str = "inline"


def _keys(spec: ChangeLogSpec) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic key universe: (repo, path, lang) per key id."""
    rng = np.random.default_rng(spec.seed)
    kid = np.arange(spec.n_keys)
    n_hot = int(spec.n_keys * spec.hot_repo_share)
    # hot repo gets the first n_hot keys; the rest spread over orgs/repos
    repo = np.where(
        kid < n_hot,
        "org0/hot-repo",
        pd.Series(kid % spec.n_orgs).map("org{}".format).to_numpy(dtype=object)
        + pd.Series(kid % 37).map("/repo{}".format).to_numpy(dtype=object),
    ).astype(object)
    path = (
        pd.Series(kid % 23).map("src/mod_{}".format).to_numpy(dtype=object)
        + pd.Series(kid).map("/file_{}.py".format).to_numpy(dtype=object)
    )
    lang = LANGS[rng.integers(0, len(LANGS), spec.n_keys)]
    return repo, path, lang


def _plan(spec: ChangeLogSpec) -> tuple[np.ndarray, np.ndarray]:
    """Global event plan: (key_id, op_code) per event — two int arrays only.

    op codes: 0=I, 1=U, 2=D, 3=P (partial update).  First event per key is
    an insert, except a small orphan set whose keys never see an insert."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    key_ids = rng.integers(0, spec.n_keys, n)
    op_code = np.ones(n, dtype=np.uint8)
    op_code[rng.random(n) < spec.delete_frac] = 2
    # first occurrence per key via scatter-min — identical result to
    # np.unique(return_index=True) but without its full sort (176s -> 7s
    # at 300M events)
    first_of_key = np.full(spec.n_keys, n, dtype=np.int64)
    np.minimum.at(first_of_key, key_ids, np.arange(n, dtype=np.int64))
    first_mask = np.zeros(n, dtype=bool)
    first_mask[first_of_key[first_of_key < n]] = True
    orphan = first_mask & (rng.random(n) < spec.orphan_frac)
    op_code[first_mask & ~orphan] = 0
    op_code[orphan] = np.where(rng.random(int(orphan.sum())) < 0.5, 1, 2)
    if spec.patch_frac:
        # only full updates become patches (first-inserts and deletes keep
        # their roles); drawn last so patch_frac=0 leaves the RNG stream —
        # and therefore every existing log — untouched
        op_code[(op_code == 1) & (rng.random(n) < spec.patch_frac)] = 3
    return key_ids, op_code


def _evolve_lsn(spec: ChangeLogSpec) -> int:
    """Schema-evolution threshold, snapped UP to an LSN-bucket edge so a
    bucket file is either wholly pre- or wholly post-evolution."""
    edges = np.linspace(0, spec.n_events, spec.num_buckets + 1).astype(int)
    target = spec.n_events * spec.evolve_after_frac
    return int(edges[np.searchsorted(edges, target)])


def _content_slice(key_ids: np.ndarray, lsns: np.ndarray, pad: int) -> pd.Series:
    """Pure per-row pseudo-source content — no RNG stream, so generation is
    chunking-invariant."""
    w = _WORDS[(key_ids * 7 + lsns * 13) % len(_WORDS)]
    w2 = _WORDS[(key_ids * 11 + lsns * 3 + 5) % len(_WORDS)]
    w3 = _WORDS[(key_ids + lsns * 17 + 11) % len(_WORDS)]
    s = (
        "def f_"
        + pd.Series(key_ids).astype(str)
        + "_v"
        + pd.Series(lsns).astype(str)
        + "():\n    return "
        + pd.Series(w)
        + " "
        + pd.Series(w2)
        + "("
        + pd.Series(w3)
        + ")\n"
    )
    if pad:
        s = s + pd.Series(np.full(len(key_ids), "# filler line of code\n")).str.repeat(
            lsns % (pad + 1)
        )
    return s


def _commits_slice(key_ids: np.ndarray, lsns: np.ndarray) -> pd.Series:
    """Deterministic 40-hex commit ids (pure per-row function)."""
    v = (key_ids.astype(np.uint64) * np.uint64(2654435761) + lsns.astype(np.uint64)) & np.uint64(
        (1 << 63) - 1
    )
    # astype(object): map() on an EMPTY series keeps the uint64 dtype,
    # which Arrow then rejects as a string column (empty-bucket edge)
    return pd.Series(v).map("{:040x}".format).astype(object)


def _gen_rows(
    spec: ChangeLogSpec,
    idx: np.ndarray,
    key_ids: np.ndarray,
    op_code: np.ndarray,
    universe: tuple[np.ndarray, np.ndarray, np.ndarray],
    evolve_lsn: int | None,
) -> pa.Table:
    """Generate the events at absolute event indices ``idx`` (any order).

    Content/commit are pure per-row functions of (key_id, lsn), so an
    arbitrary index set generates byte-identically to a contiguous slice —
    this is what lets bucket writers stream a PERMUTED bucket in bounded
    chunks instead of materializing it whole."""
    repo_u, path_u, lang_u = universe
    kid = key_ids[idx]
    oc = op_code[idx]
    lsn = (idx + 1).astype(np.int64)
    content = _content_slice(kid, lsn, spec.content_pad)
    content[oc >= 2] = None  # deletes carry nothing; patches leave it unchanged
    lang = pd.Series(lang_u[kid], dtype=object)
    lang[oc == 3] = None  # a patch updates commit only; null = unchanged
    tbl = pa.table(
        {
            "lsn": lsn,
            "op": pa.array(_OPS[oc], type=pa.string()),
            "repo": pa.array(repo_u[kid], type=pa.string()),
            "path": pa.array(path_u[kid], type=pa.string()),
            "commit": pa.array(_commits_slice(kid, lsn), type=pa.string()),
            "lang": pa.array(lang, type=pa.string(), from_pandas=True),
            "content": pa.array(content, type=pa.string()),
        }
    )
    if evolve_lsn is not None:
        size_bytes = np.where(
            lsn > evolve_lsn, pd.Series(content).fillna("").str.len().to_numpy(), -1
        )
        # null on patches: size_bytes derives from content, which a patch
        # leaves unchanged (a 0 here would "patch" the column to 0)
        size_bytes = np.where(oc == 3, -1, size_bytes)
        sb = pa.array(
            np.where(size_bytes < 0, None, size_bytes), type=pa.int64(), from_pandas=True
        )
        tbl = tbl.append_column("size_bytes", sb)
    return tbl


def _gen_slice(
    spec: ChangeLogSpec,
    start: int,
    end: int,
    key_ids: np.ndarray,
    op_code: np.ndarray,
    universe: tuple[np.ndarray, np.ndarray, np.ndarray],
    evolve_lsn: int | None,
) -> pa.Table:
    return _gen_rows(
        spec, np.arange(start, end, dtype=np.int64), key_ids, op_code,
        universe, evolve_lsn,
    )


def generate_change_log(spec: ChangeLogSpec) -> pa.Table:
    """Full change-event table in memory (LSN-ascending) — test scales."""
    key_ids, op_code = _plan(spec)
    universe = _keys(spec)
    evolve = _evolve_lsn(spec) if spec.evolve_after_frac is not None else None
    return _gen_slice(spec, 0, spec.n_events, key_ids, op_code, universe, evolve)


def _apply_bucket_physical_schema(
    part: pa.Table,
    k: int,
    bucket_min_lsn: int,
    evolve_lsn: int | None,
    first_evolved_bucket: int | None,
) -> pa.Table:
    """Per-bucket physical-schema mangling for the evolution epoch (a
    bucket is wholly pre- or wholly post-evolution by construction)."""
    if evolve_lsn is None:
        return part
    if bucket_min_lsn <= evolve_lsn:
        # pre-evolution bucket: physical schema has no size_bytes
        return part.drop_columns(["size_bytes"])
    idx = part.schema.get_field_index("lang")
    part = part.set_column(
        idx,
        pa.field("lang", pa.large_string()),
        part.column("lang").cast(pa.large_string()),
    )
    if k == first_evolved_bucket:
        i = part.schema.get_field_index("size_bytes")
        part = part.set_column(
            i,
            pa.field("size_bytes", pa.int32()),
            part.column("size_bytes").cast(pa.int32()),
        )
    return part


# One generated+written chunk per Parquet row group.  Small row groups
# (128Ki rows, not pyarrow's 1M default) let the reader split a bucket file
# into multiple blocks WITHOUT re-decoding whole groups per block — a
# single-row-group file caps read parallelism at one task per file and
# re-splitting it duplicates decode work (measured: 32 blocks over 16
# one-group files was SLOWER than 16 blocks).  Mirrors what a production
# binlog archiver should do for a scan-parallel lake.
_BUCKET_CHUNK_ROWS = 128 * 1024


def _write_bucket(
    spec: ChangeLogSpec,
    k: int,
    edges: np.ndarray,
    key_ids: np.ndarray,
    op_code: np.ndarray,
    universe,
    evolve_lsn: int | None,
    first_evolved_bucket: int | None,
    out_dir: str,
) -> str:
    """Stream one LSN bucket to Parquet in PERMUTED 128Ki-row chunks.

    The within-bucket shuffle is a precomputed permutation of the bucket's
    event indices; each chunk generates exactly the rows at its permuted
    indices (``_gen_rows`` is index-set-invariant) and becomes one row
    group.  Writer memory is O(chunk), not O(bucket) — materializing whole
    4.7M-row padded buckets across 16 parallel workers OOM'd a 125 GiB
    box; this bounds generation memory at ANY bucket size."""
    start, end = int(edges[k]), int(edges[k + 1])
    n_rows = end - start
    rng = np.random.default_rng(spec.seed + 2 + k)
    perm = rng.permutation(n_rows)
    bucket_min_lsn = start + 1
    d = os.path.join(out_dir, f"lsn_bucket={k}")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "events.parquet")
    sidestore = getattr(spec, "layout", "inline") == "sidestore"
    writer = None
    try:
        for i in range(0, max(n_rows, 1), _BUCKET_CHUNK_ROWS):
            idx = start + perm[i : i + _BUCKET_CHUNK_ROWS]
            part = _gen_rows(spec, idx, key_ids, op_code, universe, evolve_lsn)
            part = _apply_bucket_physical_schema(
                part, k, bucket_min_lsn, evolve_lsn, first_evolved_bucket
            )
            if sidestore:
                import pyarrow.compute as pc

                content = part.column("content")
                part = part.drop_columns(["content"]).append_column(
                    "content_null", pc.is_null(content).combine_chunks()
                )
            if writer is None:
                writer = pq.ParquetWriter(p, part.schema)
            if len(part):
                writer.write_table(part, row_group_size=_BUCKET_CHUNK_ROWS)
    finally:
        if writer is not None:
            writer.close()
    if sidestore:
        # second, LSN-ORDERED generation pass for the content side file
        # (``_gen_rows`` is index-set-invariant, so re-generating in lsn
        # order produces the same rows); non-null content only, small row
        # groups so winner-LSN pruning has granularity to work with
        import pyarrow.compute as pc

        cp = p[: -len(".parquet")] + ".content.parquet"
        cwriter = None
        try:
            for i in range(0, max(n_rows, 1), _BUCKET_CHUNK_ROWS):
                idx = start + np.arange(i, min(i + _BUCKET_CHUNK_ROWS, n_rows))
                part = _gen_rows(
                    spec, idx, key_ids, op_code, universe, evolve_lsn
                )
                part = _apply_bucket_physical_schema(
                    part, k, bucket_min_lsn, evolve_lsn, first_evolved_bucket
                )
                tbl = part.select(["lsn", "content"]).filter(
                    pc.is_valid(part.column("content"))
                )
                if cwriter is None:
                    cwriter = pq.ParquetWriter(cp, tbl.schema)
                if len(tbl):
                    cwriter.write_table(tbl, row_group_size=_CONTENT_RG_ROWS)
        finally:
            if cwriter is not None:
                cwriter.close()
    return p


# Fork-shared plan arrays for parallel bucket writers (see write_change_log:
# children of a fork() inherit this dict copy-on-write, so the multi-GB plan
# never serializes).  Only ever populated around the Pool lifetime.
_FORK_SHARED: dict = {}

# content side-file row-group size: the pruning granularity for phase-2
# winner fetches (small enough that tail-concentrated winners leave most
# early row groups untouched, large enough for sane compression/metadata)
_CONTENT_RG_ROWS = 4096


def _write_bucket_fork(args) -> str:
    spec, k, edges, evolve_lsn, first_evolved_bucket, out_dir = args
    key_ids, op_code, universe = _FORK_SHARED["plan"]
    return _write_bucket(
        spec, k, edges, key_ids, op_code, universe, evolve_lsn,
        first_evolved_bucket, out_dir,
    )


def write_change_log(
    spec: ChangeLogSpec, out_dir: str, processes: int | None = None
) -> list[str]:
    """Write the log as LSN-bucketed Parquet, one bucket per task (bounded
    memory at bench scales; buckets generate in PARALLEL when ``processes``
    > 1 — slice-invariant content makes any split byte-identical); returns
    bucket file paths.

    Rows are shuffled within each bucket (out of LSN order inside a file —
    the merge must sort, FIXTURES.md §2).  Evolved buckets are written with
    the evolved physical schema (int32 ``size_bytes`` in the first evolved
    bucket, ``large_string`` lang) to exercise schema unification at read.
    """
    key_ids, op_code = _plan(spec)
    universe = _keys(spec)
    n = spec.n_events
    edges = np.linspace(0, n, spec.num_buckets + 1).astype(int)
    evolve_lsn = _evolve_lsn(spec) if spec.evolve_after_frac is not None else None
    first_evolved_bucket = None
    if evolve_lsn is not None:
        for k in range(spec.num_buckets):
            if int(edges[k]) + 1 > evolve_lsn:
                first_evolved_bucket = k
                break
    if processes and processes > 1 and spec.num_buckets > 1:
        import multiprocessing as mp

        # The plan arrays are GBs at bench scale (300M events = 2.7 GB+
        # of int arrays plus the key-universe object arrays).  Passing
        # them through pool args pickles them once PER BUCKET TASK —
        # measured as tens of minutes of serialization at 300M events
        # before any bucket was written.  fork-inherited module globals
        # share them copy-on-write with ZERO serialization.
        _FORK_SHARED["plan"] = (key_ids, op_code, universe)
        try:
            small_args = [
                (spec, k, edges, evolve_lsn, first_evolved_bucket, out_dir)
                for k in range(spec.num_buckets)
            ]
            with mp.get_context("fork").Pool(min(processes, spec.num_buckets)) as pool:
                return pool.map(_write_bucket_fork, small_args)
        finally:
            _FORK_SHARED.clear()
    return [
        _write_bucket(
            spec, k, edges, key_ids, op_code, universe, evolve_lsn,
            first_evolved_bucket, out_dir,
        )
        for k in range(spec.num_buckets)
    ]


def replay_oracle(events: pa.Table) -> pd.DataFrame:
    """Single-process reference fold: the ground truth for golden tests.

    Applies events in LSN order: I/U set the row (upsert — the reference's
    ``INSERT ... ON CONFLICT DO UPDATE``, sql/etl_transformations.sql:27-38),
    D tombstones it.  Final state = live rows, with per-row
    ``sha256(content)``.  Deliberately naive (dict fold) — correctness
    oracle, not a performance path.
    """
    import hashlib

    df = events.to_pandas().sort_values("lsn")
    state: dict[tuple[str, str], dict] = {}
    extra_cols = [c for c in df.columns if c not in ("lsn", "op", "repo", "path", "commit", "lang", "content")]
    def _sha(content):
        return (
            hashlib.sha256(content.encode()).hexdigest()
            if isinstance(content, str)
            else None
        )

    for row in df.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        elif row.op == "P":
            # partial update: null = unchanged; applies over the current
            # image (all-null if the key is absent — deleted or orphan)
            prev = state.get(key, {})
            rec = {"repo": row.repo, "path": row.path, "lsn": row.lsn}
            for c in ("commit", "lang", "content", *extra_cols):
                new = getattr(row, c)
                rec[c] = new if not pd.isna(new) else prev.get(c)
            rec["content_sha256"] = _sha(rec["content"])
            state[key] = rec
        else:
            rec = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "content": row.content,
                "lsn": row.lsn,
                "content_sha256": _sha(row.content),
            }
            for c in extra_cols:
                rec[c] = getattr(row, c)
            state[key] = rec
    out = pd.DataFrame(list(state.values()))
    if len(out):
        out = out.sort_values(["repo", "path"]).reset_index(drop=True)
    return out
