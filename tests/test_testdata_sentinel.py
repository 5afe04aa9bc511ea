"""The encoding-drift sentinel itself: passes on the real testdata,
names the column on a synthetic drift."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_dsl_spark.testdata_sentinel import (assert_testdata,
                                               check_testdata)


def test_real_testdata_is_clean():
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        assert check_testdata(f"/root/testdata/{sf}") == []


def test_known_timestamp_encodings_accepted(tmp_path):
    # every cell of the validated ENCODINGS matrix passes the sentinel
    for unit, tz in [("us", "UTC"), ("us", None), ("ns", None),
                     ("ns", "UTC"), ("ms", None)]:
        t = pa.table({"event_id": pa.array([1], pa.int64()),
                      "ts": pa.array([0], pa.timestamp(unit, tz)),
                      "user_id": pa.array([1], pa.int64()),
                      "event_type": pa.array(["a"]),
                      "value": pa.array([1.0]),
                      "props": pa.array(["{}"])})
        pq.write_table(t, tmp_path / "events.parquet")
        probs = [p for p in check_testdata(str(tmp_path))
                 if p.startswith("events")]
        assert probs == [], (unit, tz, probs)


def test_drift_is_named(tmp_path):
    # a sixth encoding (non-UTC zone — parquet cannot even store a
    # seconds unit, pyarrow silently widens it to ms) and a
    # type-family flip both surface with table.column names
    t = pa.table({"event_id": pa.array([1], pa.int64()),
                  "ts": pa.array([0], pa.timestamp(
                      "us", "America/New_York")),
                  "user_id": pa.array([1], pa.int64()),
                  "event_type": pa.array(["a"]),
                  "value": pa.array(["oops"]),      # double -> string
                  "props": pa.array(["{}"])})
    pq.write_table(t, tmp_path / "events.parquet")
    probs = [p for p in check_testdata(str(tmp_path))
             if p.startswith("events")]
    assert any("events.ts" in p and "NEW timestamp encoding" in p
               for p in probs)
    assert any("events.value" in p for p in probs)
    with pytest.raises(RuntimeError) as ei:
        # missing-table findings from the other nine tables also fire;
        # the message must lead with the drifted columns
        assert_testdata(str(tmp_path))
    assert "events.ts" in str(ei.value)


def test_missing_file_reported(tmp_path):
    probs = check_testdata(str(tmp_path))
    assert any(p.startswith("events: file missing") for p in probs)
