"""Shared pytest fixtures: one local SparkSession per test session.

Mirrors the driver's runtime: local mode, AQE on, UTC session timezone so
timestamp values compare cleanly against DuckDB's naive timestamps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("flink-audit-sessions-example-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # real Python tracebacks when an Arrow worker dies mid-batch
        # (a transient "worker exited unexpectedly" is unactionable
        # without this)
        .config("spark.python.worker.faulthandler.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


class FakeState:
    """Minimal applyInPandasWithState GroupState stand-in for direct
    state-fn unit drives — ONE definition (four near-identical copies
    lived in the stream test files until review r11c; any future
    contract change — e.g. timeout semantics — lands here once). The
    superset of every drive's needs: seedable value, timeout flag,
    remove/setTimeoutDuration recording."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms
