"""Deterministic JSONL audit-tree harness for the file-source operators.

The reference's source surface (``src_file_monitor`` + ``src_file_datefilter``,
``App.java:36-47`` / ``DateFileFilter.java:11-39``) reads JSON-lines audit
files under bare ``YYYYMMDD/`` date directories. The driver's correctness
gate only provides parquet tables, so this module materializes — once per
process, deterministically — the reference's on-disk layout from the
``events`` table: every event becomes one Ranger-audit JSON line
(``user_id → reqUser``, ``ts → evtTime``, ``event_type == 'error' →
result=0``, ``floor(value) → event_count``) in the date directory of its
timestamp. File-source queries then scan this tree with the real source
operators and are oracle-checked against the originating ``events`` table.

Driver-side generation (pyarrow, no Spark job) is deliberate: the tree is a
test harness, not a data path; production trees already exist on disk.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import tempfile

_FIELDS = ("event_id", "ts", "user_id", "event_type", "value")


def audit_tree_path(sf_dir: str) -> str:
    """Materialize (or reuse) the audit tree for ``sf_dir``; returns its root.

    Content is a pure function of the events table, so an existing tree is
    reused as-is; creation is atomic (staging dir + rename) so concurrent
    callers can't observe a partial tree.
    """
    # cache key includes the SOURCE FILE identity (size + mtime), not just
    # the path: the round driver regenerates /root/testdata between
    # rounds, and a path-keyed cache would silently serve a tree built
    # from the previous round's events table
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    tag = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"audit-tree-{tag}")
    if os.path.isdir(root):
        return root

    import pyarrow.parquet as pq

    # pyarrow requires a list (a tuple raises ValueError since 15.x)
    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=list(_FIELDS)
    )
    rows = tbl.sort_by("event_id").to_pylist()

    by_day: dict[str, list[str]] = {}
    for r in rows:
        ts = r["ts"]
        evt_time = ts.strftime("%Y-%m-%d %H:%M:%S.") + f"{ts.microsecond // 1000:03d}"
        rec = {
            "repoType": 9,
            "repo": r["event_type"],
            "reqUser": None if r["user_id"] is None else f"user_{r['user_id']}",
            "evtTime": evt_time,
            "result": 0 if r["event_type"] == "error" else 1,
            "event_count": int(math.floor(r["value"])),
            "seq_num": r["event_id"],
            "logType": "RangerAudit",
        }
        by_day.setdefault(ts.strftime("%Y%m%d"), []).append(json.dumps(rec))

    staging = f"{root}.tmp-{os.getpid()}"
    os.makedirs(staging, exist_ok=True)
    for day, lines in by_day.items():
        os.makedirs(os.path.join(staging, day), exist_ok=True)
        with open(os.path.join(staging, day, "audit.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
    try:
        os.rename(staging, root)
    except OSError:  # lost the race: another process finished first
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return root
