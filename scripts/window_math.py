#!/usr/bin/env python
"""Rotation/window arithmetic for the driver's 50-row correctness gate.

Implements the drain plan documented in ``plans/__init__.py`` so the
next round's ``_FRONT_KEYS`` is computed, not hand-derived:

- §2 / reference-surface keys keep the strict 2-round invariant
  (re-verify every key whose last driver row is round N−2).
- Extended keys hash-green in ≥ ``STRETCH_AFTER`` historical windows may
  stretch to a 3-round cycle; they re-enter the front at their
  3-round deadline instead.
- Slots left over go to first registrations from the queue (printed as
  a count — the queue order lives in ``plans/__init__.py``).

Usage: ``python scripts/window_math.py <next_round>`` from the repo
root, with ``CORRECTNESS_r0*.json`` present. New/changed keys for the
next round are not knowable here — subtract them from the free-slot
count by hand.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
STRETCH_AFTER = 3  # green windows before a key may stretch to 3 rounds

#: reference-surface (§2) keys — never stretched past 2 rounds
CORE_KEYS = frozenset(
    "src_file_monitor src_file_datefilter xform_parse_json flt_valid_user "
    "time_watermark key_by_user win_session agg_denied_sum win_wrap_result "
    "flt_nonzero xform_format_string".split()
)


def classify(
    registry: "list[str]",
    history: "dict[int, dict]",
    next_round: int,
    *,
    core_keys: frozenset = CORE_KEYS,
    stretch_after: int = STRETCH_AFTER,
):
    """Pure window arithmetic (unit-tested in tests/test_window_math.py):
    → (must, may3, failed_last, never) where ``must`` is the strict
    2-round due list (fresh failures FIRST), ``may3`` the stretched keys
    at their 3-round deadline, both (last_row, key)-sorted."""
    last_row: dict[str, int] = {}
    rows_by_key: dict[str, list[tuple[int, bool]]] = {}
    failed_last: set[str] = set()
    for rnd, rows in sorted(history.items()):
        for k, v in rows.items():
            if k not in registry:
                continue
            last_row[k] = max(last_row.get(k, 0), rnd)
            rows_by_key.setdefault(k, []).append(
                (rnd, bool(v.get("hash_match")))
            )
    # stretch eligibility = CURRENT green STREAK (most recent rows
    # backwards), not lifetime green count: a key that just went RED
    # must not be rewarded with a lazier cadence — it goes to the
    # FRONT of the next window instead.
    green_streak: dict[str, int] = {}
    for k, rows in rows_by_key.items():
        streak = 0
        for _, green in reversed(sorted(rows)):
            if not green:
                break
            streak += 1
        green_streak[k] = streak
        if rows and not sorted(rows)[-1][1]:
            failed_last.add(k)

    must = []   # strict 2-round keys due this round (+ fresh failures)
    may3 = []   # stretchable keys at their 3-round deadline
    for k in registry:
        if k not in last_row:
            continue  # never-verified: reported via `never`, not `must`
        lr = last_row[k]
        if k in failed_last:
            must.append((0, k))  # red row: re-verify FIRST, never later
            continue
        stretchable = (
            k not in core_keys and green_streak.get(k, 0) >= stretch_after
        )
        if not stretchable and lr <= next_round - 2:
            must.append((lr, k))
        elif stretchable and lr <= next_round - 3:
            may3.append((lr, k))
    must.sort()
    may3.sort()
    never = [k for k in registry if k not in last_row]
    return must, may3, failed_last, never


def main() -> None:
    next_round = int(sys.argv[1])
    from __spark_entry__ import queries

    registry = list(queries())
    history: dict[int, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        history[int(m.group(1))] = json.load(open(path))

    must, may3, failed_last, never = classify(registry, history, next_round)
    # never-verified keys lead the prefix (they have NO driver row at
    # all, so they outrank every merely-stale key) and consume slots —
    # pasting the output verbatim must not over-allocate the queue
    # (r9 advice: they were previously printed but excluded from both
    # the prefix and the free-slot arithmetic).
    front = never + [k for _, k in must] + [k for _, k in may3]
    free = WINDOW - len(front)
    print(f"# r{next_round} window (size {WINDOW})")
    if failed_last:
        print(f"RED in their latest row (front-loaded): {sorted(failed_last)}")
    if never:
        print(f"never-verified keys (front-loaded FIRST): {len(never)}")
    print(f"strict 2-round keys due (incl. red): {len(must)}")
    print(f"3-round-deadline stretched keys due: {len(may3)}")
    print(f"free slots for new/changed + queue registrations: {free}")
    print("\n# proposed _FRONT_KEYS prefix (oldest first):")
    for k in front[:WINDOW]:
        print(f'    "{k}",')
    if len(front) > WINDOW:
        print(
            f"# OVERFLOW: {len(front) - WINDOW} due keys beyond the "
            "window — tighten by staleness order above"
        )
    # staged queues: suggest drains for the free slots, in queue order
    try:
        from flink_audit_sessions_example_spark.plans.staged_r11 import (
            STAGED_R11_QUERIES,
        )
        from flink_audit_sessions_example_spark.plans.staged_r12 import (
            STAGED_R12_QUERIES,
        )

        queue = [
            k
            for k in list(STAGED_R11_QUERIES) + list(STAGED_R12_QUERIES)
            if k not in registry
        ]
    except ImportError:  # queues drained and modules retired
        queue = []
    if queue and free > 0:
        print(f"\n# drain suggestions for the {free} free slots "
              "(queue order):")
        for k in queue[:free]:
            print(f'    "{k}",')
        if len(queue) > free:
            print(f"# {len(queue) - free} more waiting: "
                  f"{queue[free:]}")


if __name__ == "__main__":
    main()
