"""Validation-rule engine tests (reference parity: warn-only audit with the
dirty-fixture shapes of tests/test_data_validator.py:25-53)."""

import pyarrow as pa
import ray.data

from sql_etl_pipeline_ray.stages.validate import (
    CHANGE_EVENT_RULES,
    Rule,
    unique_lsn_check,
    validate_events,
)


def dirty_events() -> pa.Table:
    return pa.table(
        {
            "lsn": [1, 2, 3, 3, None],
            "op": ["I", "X", "U", "D", "I"],
            "repo": ["r", None, "r", "r", "r"],
            "path": ["a", "b", "c", "a", "d"],
            "commit": ["0" * 40, "not-hex", "f" * 40, "0" * 40, "1" * 40],
            "lang": ["py", "py", "klingon", "py", "js"],
            "content": ["x", "y", None, None, "z"],
        }
    )


def test_rule_counts():
    ds = ray.data.from_arrow(dirty_events())
    report = validate_events(ds).to_pandas().set_index("rule")
    assert report.loc["lsn_present", "violations"] == 1
    assert report.loc["op_valid", "violations"] == 1
    assert report.loc["repo_present", "violations"] == 1
    # content null allowed on D (row 4) but not on U (row 3)
    assert report.loc["content_present_on_upsert", "violations"] == 1
    assert report.loc["commit_is_hex40", "violations"] == 1
    assert report.loc["lang_vocabulary", "violations"] == 1
    assert (report["rows_checked"] == 5).all()
    # severities preserved (warn-only flow: engine reports, never raises)
    assert report.loc["op_valid", "severity"] == "fail"
    assert report.loc["lang_vocabulary", "severity"] == "warn"


def test_unique_lsn_check():
    ds = ray.data.from_arrow(dirty_events().drop_null())
    assert unique_lsn_check(ray.data.from_arrow(dirty_events())) == 1  # lsn 3 twice


def test_missing_column_counts_all_rows():
    tbl = pa.table({"lsn": [1, 2], "op": ["I", "U"], "repo": ["r", "r"], "path": ["a", "b"]})
    ds = ray.data.from_arrow(tbl)
    rules = [Rule("content_missing", "non_null", "content")]
    report = validate_events(ds, rules).to_pandas()
    assert report["violations"].iloc[0] == 2


def test_clean_log_no_fail_violations(tmp_path):
    from sql_etl_pipeline_ray.sources.change_log import read_change_log, scan_change_log
    from sql_etl_pipeline_ray.sources.datagen import ChangeLogSpec, write_change_log

    d = str(tmp_path / "log")
    write_change_log(ChangeLogSpec(n_keys=100, n_events=500, num_buckets=2), d)
    report = validate_events(read_change_log(scan_change_log(d))).to_pandas()
    fails = report[report["severity"] == "fail"]
    assert (fails["violations"] == 0).all()


def test_null_quality_gate_flags_high_null_columns():
    """The reference's NULL_THRESHOLD table gate: content is 2/5 null in
    the dirty fixture (flagged at 10%), lsn 1/5 (flagged), path 0 (clean)."""
    from sql_etl_pipeline_ray.stages.validate import null_quality_gate

    ds = ray.data.from_arrow(dirty_events())
    rep = null_quality_gate(ds, threshold=0.10).to_pandas().set_index("column")
    assert rep.loc["content", "nulls"] == 2
    assert bool(rep.loc["content", "exceeds_threshold"])
    assert rep.loc["path", "nulls"] == 0
    assert not bool(rep.loc["path", "exceeds_threshold"])
    assert (rep["rows"] == 5).all()


def test_empty_strings_to_null_cleanse():
    """The M7 cleanse mutation: trim + '' -> NULL on string columns only;
    non-string and already-null values untouched."""
    import pyarrow as pa

    from sql_etl_pipeline_ray.stages.normalize import empty_strings_to_null

    t = pa.table(
        {
            "s": pa.array(["  a  ", "", "   ", None, "b"]),
            "ls": pa.array(["x", ""], pa.large_string()).take(
                pa.array([0, 1, 1, 0, 1])
            ),
            "n": pa.array([1, 2, 3, 4, 5]),
        }
    )
    out = empty_strings_to_null(t)
    assert out.column("s").to_pylist() == ["a", None, None, None, "b"]
    assert out.column("ls").to_pylist() == ["x", None, None, "x", None]
    assert out.column("n").to_pylist() == [1, 2, 3, 4, 5]

    # column subset: only the named column is touched
    out2 = empty_strings_to_null(t, columns=["s"])
    assert out2.column("ls").to_pylist() == ["x", "", "", "x", ""]
