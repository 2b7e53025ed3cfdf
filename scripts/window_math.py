#!/usr/bin/env python
"""Rotation/window arithmetic for the driver's 50-row correctness gate.

Implements the drain plan documented in ``plans/__init__.py`` so the
next round's ``_FRONT_KEYS`` is computed, not hand-derived:

- §2 / reference-surface keys keep the strict 2-round invariant
  (re-verify every key whose last driver row is round N−2).
- Extended keys with a green STREAK ≥ ``STRETCH_AFTER`` stretch to a
  3-round cycle; they re-enter the front at their 3-round deadline.
- Extended keys with a green streak ≥ ``STRETCH4_AFTER`` stretch
  further to a 4-round cycle (the r11 rung — r10 verdict #1: at 135+
  live keys the 2/3 ladder alone over-subscribes the 50-slot window).
- Extended keys with a green streak ≥ ``STRETCH5_AFTER`` stretch to a
  5-round cycle (the r12 rung: the registry reached 161 keys incl. the
  r15 queue — steady-state demand 11/2 + 150/4 ≈ 43 fits the window,
  but the synchronized drain cohorts' re-verification waves no longer
  do; the r11 ladder slips 30 key-rounds over r13–r21 at this size,
  the 3-rung ladder slips ZERO — table in simulate_rotation.py).
- Slots left over go first to queue registrations, then to PULL-FORWARD
  of next round's oldest due keys (printed below) — verifying them a
  round early desynchronizes the drain cohorts, whose synchronized
  re-verification waves are what over-subscribe future windows.

Rung calibration (``scripts/simulate_rotation.py`` replays the policy
against the real CORRECTNESS history, all-green assumption,
staleness-greedy 50-slot windows with pull-forward): the r10-verdict
ladder (≥3-streak → 3-round, ≥5 → 4-round) still slips 76 key-rounds
over r11–r19 because the 36-key r10 drain cohort re-synchronizes at
strict-2 cadence; (≥1 → 3-round, ≥4 → 4-round) slips ZERO. The ≥1 rung
is sound because a driver-environment divergence for a given
(plan, oracle) pair can only surface on its FIRST driver row or after
the pair CHANGES — r10's sole red row (the HUGEINT oracle typing) was
exactly a first-row failure — and changed keys re-front-load as
new/changed while red rows reset the streak and front-load with
priority 0; unchanged pairs are additionally replayed against DuckDB
locally on every suite run (tests/test_oracle_parity.py) and before
every commit (/verify at sf0.01). Core §2 keys stay at strict-2
regardless: they are the reference surface.

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
STRETCH_AFTER = 1  # green streak before a key may stretch to 3 rounds
STRETCH4_AFTER = 3  # green streak before a key may stretch to 4 rounds
STRETCH5_AFTER = 5  # green streak before a key may stretch to 5 rounds

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
    stretch4_after: int = STRETCH4_AFTER,
    stretch5_after: "int | None" = STRETCH5_AFTER,
):
    """Pure window arithmetic (unit-tested in tests/test_window_math.py):
    → (must, may3, may4, may5, failed_last, never) where ``must`` is the
    strict 2-round due list (fresh failures FIRST), ``may3``/``may4``/
    ``may5`` the stretched keys at their 3-/4-/5-round deadlines, each
    (last_row, key)-sorted. The ladder is exclusive by streak depth: a
    ≥``stretch5_after``-green key lives ONLY on the 5-round cycle
    (``stretch5_after=None`` disables the rung — the pre-r12 ladder)."""
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
    may4 = []   # long-stable keys at their 4-round deadline
    may5 = []   # deepest-streak keys at their 5-round deadline
    for k in registry:
        if k not in last_row:
            continue  # never-verified: reported via `never`, not `must`
        lr = last_row[k]
        if k in failed_last:
            must.append((0, k))  # red row: re-verify FIRST, never later
            continue
        streak = green_streak.get(k, 0)
        if k in core_keys or streak < stretch_after:
            if lr <= next_round - 2:
                must.append((lr, k))
        elif streak < stretch4_after:
            if lr <= next_round - 3:
                may3.append((lr, k))
        elif stretch5_after is None or streak < stretch5_after:
            if lr <= next_round - 4:
                may4.append((lr, k))
        elif lr <= next_round - 5:
            may5.append((lr, k))
    must.sort()
    may3.sort()
    may4.sort()
    may5.sort()
    never = [k for k in registry if k not in last_row]
    return must, may3, may4, may5, failed_last, never


def main() -> None:
    next_round = int(sys.argv[1])
    from __spark_entry__ import queries

    registry = list(queries())
    history: dict[int, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        history[int(m.group(1))] = json.load(open(path))

    must, may3, may4, may5, failed_last, never = classify(
        registry, history, next_round
    )
    # never-verified keys lead the prefix (they have NO driver row at
    # all, so they outrank every merely-stale key) and consume slots —
    # pasting the output verbatim must not over-allocate the queue
    # (r9 advice: they were previously printed but excluded from both
    # the prefix and the free-slot arithmetic).
    front = (
        never
        + [k for _, k in must]
        + [k for _, k in may3]
        + [k for _, k in may4]
        + [k for _, k in may5]
    )
    free = WINDOW - len(front)
    print(f"# r{next_round} window (size {WINDOW})")
    if failed_last:
        print(f"RED in their latest row (front-loaded): {sorted(failed_last)}")
    if never:
        print(f"never-verified keys (front-loaded FIRST): {len(never)}")
    print(f"strict 2-round keys due (incl. red): {len(must)}")
    print(f"3-round-deadline stretched keys due: {len(may3)}")
    print(f"4-round-deadline long-stable keys due: {len(may4)}")
    print(f"5-round-deadline deepest-streak keys due: {len(may5)}")
    print(f"free slots for new/changed + queue registrations: {free}")
    print("\n# proposed _FRONT_KEYS prefix (oldest first):")
    for k in front[:WINDOW]:
        print(f'    "{k}",')
    if len(front) > WINDOW:
        print(
            f"# OVERFLOW: {len(front) - WINDOW} due keys beyond the "
            "window — tighten by staleness order above"
        )
    # staged queues: suggest drains for the free slots, in queue order.
    # Glob-discovered (plans/staging.py) so a new staged_r<N>.py is
    # covered the day it lands and import errors inside one PROPAGATE
    # instead of reading as an empty queue (r10 advice / r11 review).
    from flink_audit_sessions_example_spark.plans.staging import (
        staged_queues,
    )

    queue = []
    for _rnd, staged, _oracles in staged_queues():
        queue.extend(k for k in staged if k not in registry)
    if queue and free > 0:
        print(f"\n# drain suggestions for the {free} free slots "
              "(queue order):")
        for k in queue[:free]:
            print(f'    "{k}",')
        if len(queue) > free:
            print(f"# {len(queue) - free} more waiting: "
                  f"{queue[free:]}")
    # pull-forward: slots still spare after the queue go to NEXT round's
    # oldest due keys — verifying them a round early desynchronizes the
    # drain cohorts whose waves over-subscribe future windows (see the
    # module docstring; simulate_rotation.py quantifies it).
    spare = free - len(queue)
    if spare > 0:
        window_now = front[:WINDOW] + queue
        hyp = dict(history)
        hyp[next_round] = {k: {"hash_match": True} for k in window_now}
        m2, y3, y4, y5, _, _ = classify(
            registry + [k for k in queue if k not in registry],
            hyp,
            next_round + 1,
        )
        nxt = [
            k
            for _, k in sorted(m2 + y3 + y4 + y5)
            if k not in window_now
        ]
        if nxt:
            print(f"\n# pull-forward suggestions for the {spare} spare "
                  f"slots (r{next_round + 1}'s oldest due keys):")
            for k in nxt[:spare]:
                print(f'    "{k}",')


if __name__ == "__main__":
    main()
