"""Regression tests for engine <-> session conf coupling.

Round-1 postmortem: every driver correctness entry failed with
PARQUET_TYPE_ILLEGAL because spark.sql.legacy.parquet.nanosAsLong was
set only inside session.get_session(), and the DRIVER supplies its own
bare SparkSession.  These tests exercise exactly that path: an engine
constructed over a session that does NOT carry the engine's confs.
"""

import subprocess
import sys

import pytest

from flink_dsl_spark import FsqlEngine
from flink_dsl_spark.engine import _REQUIRED_CONFS

SF_DIR = "/root/testdata/sf0.001"


def test_engine_sets_required_confs_on_caller_session(spark):
    # Simulate a caller-supplied session missing the engine confs.
    for k in _REQUIRED_CONFS:
        spark.conf.unset(k)
    try:
        eng = FsqlEngine(spark)
        for k, v in _REQUIRED_CONFS.items():
            assert spark.conf.get(k) == v, k
        # The exact round-1 failure: nano-timestamp parquet load.
        eng.register_parquet("bare_events", f"{SF_DIR}/events.parquet",
                             event_time_col="ts")
        out = eng.sql("select count(*) as cnt from bare_events").collect()
        assert out[0]["cnt"] > 0
        ts_type = dict(eng.catalog.get("bare_events").dtypes)["ts"]
        assert ts_type == "timestamp"
    finally:
        for k, v in _REQUIRED_CONFS.items():
            spark.conf.set(k, v)


_SUBPROCESS_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# A deliberately bare session: no engine confs, like the driver's.
spark = (SparkSession.builder.master("local[2]")
         .appName("bare-driver-shaped")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

import __spark_entry__ as entry_mod

df = entry_mod.queries()["q01_pricing_summary"](spark, "/root/testdata/sf0.001")
rows = df.collect()
assert len(rows) > 0, "q01 returned no rows"
print("BARE_SESSION_OK", len(rows))
"""


@pytest.mark.slow
def test_driver_shaped_bare_session_subprocess():
    """Run q01 through __spark_entry__ from a fresh process whose
    SparkSession has none of get_session()'s confs — the exact code path
    the driver's correctness harness exercises."""
    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROCESS_SCRIPT],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "BARE_SESSION_OK" in proc.stdout
