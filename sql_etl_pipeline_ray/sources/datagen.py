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

Everything is vectorized numpy/pandas/pyarrow; content strings are
deterministic pseudo-source text so ``sha256(content)`` is reproducible.
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
    content_pad: int = 0  # extra repeated filler words per row (sizes content)


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


def _content(key_ids: np.ndarray, lsns: np.ndarray, seed: int, pad: int) -> pd.Series:
    """Deterministic pseudo-source content per (key, lsn)."""
    rng = np.random.default_rng(seed + 1)
    w = _WORDS[rng.integers(0, len(_WORDS), (len(key_ids), 3))]
    body = pd.Series(w[:, 0]) + " " + pd.Series(w[:, 1]) + "(" + pd.Series(w[:, 2]) + ")"
    s = (
        "def f_"
        + pd.Series(key_ids).astype(str)
        + "_v"
        + pd.Series(lsns).astype(str)
        + "():\n    return "
        + body
        + "\n"
    )
    if pad:
        filler = pd.Series(np.full(len(key_ids), "# filler line of code\n")).str.repeat(
            rng.integers(0, pad + 1, len(key_ids))
        )
        s = s + filler
    return s


def _commits(key_ids: np.ndarray, lsns: np.ndarray) -> pd.Series:
    """Deterministic 40-hex commit ids."""
    v = (key_ids.astype(np.uint64) * np.uint64(2654435761) + lsns.astype(np.uint64)) & np.uint64(
        (1 << 63) - 1
    )
    return pd.Series(v).map("{:040x}".format)


def _evolve_lsn(spec: ChangeLogSpec) -> int:
    """Schema-evolution threshold, snapped UP to an LSN-bucket edge so a
    bucket file is either wholly pre- or wholly post-evolution."""
    edges = np.linspace(0, spec.n_events, spec.num_buckets + 1).astype(int)
    target = spec.n_events * spec.evolve_after_frac
    return int(edges[np.searchsorted(edges, target)])


def generate_change_log(spec: ChangeLogSpec) -> pa.Table:
    """Build the full change-event table in memory (LSN-ascending)."""
    rng = np.random.default_rng(spec.seed)
    repo_u, path_u, lang_u = _keys(spec)

    n = spec.n_events
    lsn = np.arange(1, n + 1, dtype=np.int64)
    # Skewed key choice: hot-repo keys (ids < n_hot) drawn ~uniformly means
    # the hot repo naturally receives ~hot_repo_share of events.
    key_ids = rng.integers(0, spec.n_keys, n)

    op = np.where(rng.random(n) < spec.delete_frac, "D", "U").astype(object)
    # First event per key is an insert.
    first_mask = np.zeros(n, dtype=bool)
    _, first_idx = np.unique(key_ids, return_index=True)
    first_mask[first_idx] = True
    # Orphans: flip a few first-events to U/D so their key never gets an I.
    orphan = first_mask & (rng.random(n) < spec.orphan_frac)
    op[first_mask & ~orphan] = "I"
    op[orphan] = np.where(rng.random(int(orphan.sum())) < 0.5, "U", "D")

    content = _content(key_ids, lsn, spec.seed, spec.content_pad)
    content[op == "D"] = None
    commit = _commits(key_ids, lsn)

    tbl = pa.table(
        {
            "lsn": lsn,
            "op": pa.array(op, type=pa.string()),
            "repo": pa.array(repo_u[key_ids], type=pa.string()),
            "path": pa.array(path_u[key_ids], type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": pa.array(lang_u[key_ids], type=pa.string()),
            "content": pa.array(content, type=pa.string()),
        }
    )
    if spec.evolve_after_frac is not None:
        evolve_lsn = _evolve_lsn(spec)
        size_bytes = np.where(
            lsn > evolve_lsn, pd.Series(content).fillna("").str.len().to_numpy(), -1
        )
        sb = pa.array(
            np.where(size_bytes < 0, None, size_bytes), type=pa.int64(), from_pandas=True
        )
        tbl = tbl.append_column("size_bytes", sb)
    return tbl


def write_change_log(spec: ChangeLogSpec, out_dir: str) -> list[str]:
    """Write the log as LSN-bucketed Parquet; returns bucket file paths.

    Rows are shuffled within each bucket (out of LSN order inside a file —
    the merge must sort, FIXTURES.md §2).  Evolved buckets are written with
    the evolved physical schema (int32 ``size_bytes`` in the first evolved
    bucket, ``large_string`` lang) to exercise schema unification at read.
    """
    tbl = generate_change_log(spec)
    n = len(tbl)
    edges = np.linspace(0, n, spec.num_buckets + 1).astype(int)
    rng = np.random.default_rng(spec.seed + 2)
    evolve_lsn = _evolve_lsn(spec) if spec.evolve_after_frac is not None else None
    paths = []
    first_evolved_written = False
    for k in range(spec.num_buckets):
        part = tbl.slice(edges[k], edges[k + 1] - edges[k])
        perm = rng.permutation(len(part))
        part = part.take(perm)
        bucket_min_lsn = int(tbl.column("lsn")[edges[k]].as_py())
        if evolve_lsn is not None and "size_bytes" in part.column_names:
            if bucket_min_lsn <= evolve_lsn:
                # pre-evolution bucket: physical schema has no size_bytes
                part = part.drop_columns(["size_bytes"])
            else:
                idx = part.schema.get_field_index("lang")
                part = part.set_column(
                    idx, pa.field("lang", pa.large_string()), part.column("lang").cast(pa.large_string())
                )
                if not first_evolved_written:
                    i = part.schema.get_field_index("size_bytes")
                    part = part.set_column(
                        i,
                        pa.field("size_bytes", pa.int32()),
                        part.column("size_bytes").cast(pa.int32()),
                    )
                    first_evolved_written = True
        d = os.path.join(out_dir, f"lsn_bucket={k}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "events.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


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
    for row in df.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            rec = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "content": row.content,
                "lsn": row.lsn,
                "content_sha256": hashlib.sha256(row.content.encode()).hexdigest()
                if isinstance(row.content, str)
                else None,
            }
            for c in extra_cols:
                rec[c] = getattr(row, c)
            state[key] = rec
    out = pd.DataFrame(list(state.values()))
    if len(out):
        out = out.sort_values(["repo", "path"]).reset_index(drop=True)
    return out
