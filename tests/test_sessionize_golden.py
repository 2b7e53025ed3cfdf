"""Golden sessionization fixture — port of the reference's end-to-end test
(``TestAuditSession.java:35-81``, FIXTURES.md §2).

Four audits, gap=1200 s. Expected: two sessions —
wdyson denies=10 [10:00, 10:30) and bob denies=2 [10:10, 10:40).
Encodes the three key semantics: event_count weighting, allowed events
extend-but-add-0, multi-event accumulation.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from flink_audit_sessions_example_spark.operators import audit_denied_sessions


def _audit(user, repo, result, event_count, ts):
    return Row(
        reqUser=user, repo=repo, result=result, event_count=event_count,
        evtTime=dt.datetime.fromisoformat(ts),
    )


FIXTURE = [
    _audit("wdyson", "cm_kafka", 0, 10, "2022-09-26T10:00:00"),
    _audit("wdyson", "cm_hive", 1, 1, "2022-09-26T10:10:00"),
    _audit("bob", "cm_hive", 0, 1, "2022-09-26T10:10:00"),
    _audit("bob", "cm_hive", 0, 1, "2022-09-26T10:20:00"),
]


def test_golden_sessions(spark):
    audits = spark.createDataFrame(
        FIXTURE,
        "reqUser string, repo string, result int, event_count int, evtTime timestamp",
    )
    out = audit_denied_sessions(audits, gap_seconds=1200)
    rows = {r["reqUser"]: r for r in out.collect()}
    assert set(rows) == {"wdyson", "bob"}

    w = rows["wdyson"]
    assert w["denies"] == 10  # denied event weighted by event_count
    assert w["start"] == dt.datetime(2022, 9, 26, 10, 0, 0)
    # allowed 10:10 event joins the session and extends end to 10:10+20min
    assert w["end"] == dt.datetime(2022, 9, 26, 10, 30, 0)

    b = rows["bob"]
    assert b["denies"] == 2  # two denied events, 10 min apart, merged
    assert b["start"] == dt.datetime(2022, 9, 26, 10, 10, 0)
    assert b["end"] == dt.datetime(2022, 9, 26, 10, 40, 0)


def test_null_user_dropped_and_all_allowed_session_filtered(spark):
    extra = [
        _audit(None, "cm_hdfs", 0, 5, "2022-09-26T10:00:00"),
        _audit("alice", "cm_hdfs", 1, 3, "2022-09-26T10:00:00"),
    ]
    audits = spark.createDataFrame(
        FIXTURE + extra,
        "reqUser string, repo string, result int, event_count int, evtTime timestamp",
    )
    out = audit_denied_sessions(audits, gap_seconds=1200)
    users = {r["reqUser"] for r in out.collect()}
    # null user dropped pre-shuffle; alice's allowed-only session dropped by HAVING
    assert users == {"wdyson", "bob"}
