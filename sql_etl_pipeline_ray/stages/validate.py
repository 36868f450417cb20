"""Declarative validation-rule engine.

The reference declares per-table rule dicts (``src/data_validator.py:
22-60``: required fields, unique keys, email regex, phone length, positive
numerics) and runs a WARN-ONLY pass before transform (issues logged, data
still flows — ``src/etl_pipeline.py:163-167``).  We compile the same rule
shapes to vectorized Arrow checks and aggregate violation counts per batch
(partial counts summed at the end — never a driver-side row loop).

Hard invariants (bad op, null key) are enforced inline by the replay's
normalize stage; THIS engine is the audit/reporting pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..schemas import VALID_OPS


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # non_null | in_set | regex | non_negative | length_between | non_null_unless
    column: str
    severity: str = "warn"  # warn | fail
    params: dict[str, Any] = field(default_factory=dict)

    def violations(self, batch: pa.Table) -> int:
        if self.column not in batch.column_names:
            return len(batch)  # missing column: every row violates
        col = batch.column(self.column)
        if self.kind == "non_null":
            ok = pc.is_valid(col)
        elif self.kind == "in_set":
            ok = pc.is_in(col, value_set=pa.array(self.params["values"]))
        elif self.kind == "regex":
            ok = pc.match_substring_regex(
                pc.cast(col, pa.string()), self.params["pattern"]
            )
            ok = pc.fill_null(ok, False)
        elif self.kind == "non_negative":
            ok = pc.fill_null(pc.greater_equal(col, pa.scalar(0)), False)
        elif self.kind == "length_between":
            ln = pc.utf8_length(pc.cast(col, pa.string()))
            ok = pc.and_(
                pc.greater_equal(ln, pa.scalar(self.params["lo"])),
                pc.less_equal(ln, pa.scalar(self.params["hi"])),
            )
            ok = pc.fill_null(ok, False)
        elif self.kind == "non_null_unless":
            other = batch.column(self.params["other"])
            exempt = pc.is_in(other, value_set=pa.array(self.params["other_values"]))
            ok = pc.or_(pc.is_valid(col), exempt)
        else:
            raise ValueError(f"unknown rule kind {self.kind}")
        return len(batch) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)


# The change-event ruleset: the CDC analogue of the reference's customers/
# products rules (required/unique/regex/positive → here: key presence, op
# vocabulary, commit shape, content-on-upsert, lang vocabulary).
CHANGE_EVENT_RULES = [
    Rule("lsn_present", "non_null", "lsn", severity="fail"),
    Rule("op_valid", "in_set", "op", severity="fail", params={"values": list(VALID_OPS)}),
    Rule("repo_present", "non_null", "repo", severity="fail"),
    Rule("path_present", "non_null", "path", severity="fail"),
    Rule(
        "content_present_on_upsert",
        "non_null_unless",
        "content",
        params={"other": "op", "other_values": ["D"]},
    ),
    Rule("commit_is_hex40", "regex", "commit", params={"pattern": r"^[0-9a-f]{40}$"}),
    Rule(
        "lang_vocabulary",
        "in_set",
        "lang",
        params={"values": ["py", "js", "go", "rs", "java", "c", "md"]},
    ),
    Rule("lsn_non_negative", "non_negative", "lsn"),
]


def validate_events(
    ds: ray.data.Dataset, rules: list[Rule] | None = None
) -> pa.Table:
    """Audit a change-event Dataset against the ruleset.

    Returns (rule, severity, violations, rows_checked) — per-batch partial
    counts reduced by a grouped sum (the A7 validation-counter mapping).
    A 'fail' rule with violations is the caller's signal to abort;
    mirroring the reference, this function itself only reports."""
    rules = rules if rules is not None else CHANGE_EVENT_RULES

    def count_batch(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rule": [r.name for r in rules],
                "severity": [r.severity for r in rules],
                "violations": pa.array(
                    [r.violations(batch) for r in rules], pa.int64()
                ),
                "rows_checked": pa.array([len(batch)] * len(rules), pa.int64()),
            }
        )

    out = (
        ds.map_batches(count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["rule", "severity"])
        .aggregate(
            Sum("violations", alias_name="violations"),
            Sum("rows_checked", alias_name="rows_checked"),
        )
        .to_pandas()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def unique_lsn_check(ds: ray.data.Dataset) -> int:
    """Exact duplicate-LSN count (the reference's unique-key rule,
    src/data_validator.py:157-165) — two-level grouped count so only
    (lsn, n) pairs shuffle."""
    from ray.data.aggregate import Count

    dups = (
        ds.select_columns(["lsn"])
        .groupby("lsn")
        .aggregate(Count(alias_name="n"))
        .filter(expr="n > 1")
    )
    return dups.count()


def null_quality_gate(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    threshold: float = 0.10,
) -> pa.Table:
    """Table-level null-fraction quality gate (the reference's
    NULL_THRESHOLD=10% config, config/config.py:53): per-column null
    fraction vs the threshold, computed as per-batch partial (nulls, rows)
    counts reduced by one grouped sum — no full-column materialization.

    Returns (column, nulls, rows, null_fraction, exceeds_threshold)."""
    # Resolve the column list ONCE from the dataset's unified schema: under
    # schema evolution a late-added column appears only in some batches, and
    # a per-batch column list would compute its null fraction over just the
    # batches that carry it — understating the table-level fraction the
    # reference's NULL_THRESHOLD gate measures.  With a fixed list, a batch
    # missing the column counts it as all-null (len(batch) below).
    schema = ds.schema()
    cols_resolved = columns or [
        n for n in (schema.names if schema is not None else [])
        if not n.startswith("_")
    ]

    def count_batch(batch: pa.Table) -> pa.Table:
        cols = cols_resolved
        return pa.table(
            {
                "column": cols,
                "nulls": pa.array(
                    [batch.column(c).null_count if c in batch.column_names else len(batch) for c in cols],
                    pa.int64(),
                ),
                "rows": pa.array([len(batch)] * len(cols), pa.int64()),
            }
        )

    df = (
        ds.map_batches(count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(Sum("nulls", alias_name="nulls"), Sum("rows", alias_name="rows"))
        .to_pandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    df["null_fraction"] = (df["nulls"] / df["rows"].clip(lower=1)).round(6)
    df["exceeds_threshold"] = df["null_fraction"] > threshold
    return pa.Table.from_pandas(df, preserve_index=False)
