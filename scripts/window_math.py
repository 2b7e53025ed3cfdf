#!/usr/bin/env python
"""Rotation/window arithmetic for the driver's 50-row correctness gate.

Implements the drain plan documented in ``plans/__init__.py`` so the
next round's ``_FRONT_KEYS`` is computed, not hand-derived:

- §2 / reference-surface keys keep the strict 2-round invariant
  (re-verify every key whose last driver row is round N−2).
- Extended keys stretch to longer cycles as their green driver-row
  STREAK deepens, per ``LADDER`` — ``((min_streak, cycle), ...)``
  descending; a key takes the first rung its streak reaches, and a key
  below every rung stays strict-2. The r13 ladder is
  (≥7 → 8-round, ≥5 → 6, ≥3 → 5, ≥1 → 5) — see the LADDER comment
  below for the calibration history (166-key r12 horizon → the r12
  ladder; 206-key r13 horizon after the seven-queue drain + the
  staged r22/r23/r24 queues → this one). Each rung is sound for the
  same reason as the first: divergence only surfaces on a pair's
  FIRST driver row or after it changes, deep-streak keys are the
  least likely to change, and every unchanged pair replays against
  DuckDB on every local suite run regardless of its driver cadence.
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
#: (min_green_streak, cycle_rounds), descending by streak — a key takes
#: the FIRST rung its streak reaches; below every rung = strict 2-round.
#: r13 RE-CALIBRATION (simulate_rotation.py at the TRUE shipped
#: horizon of 206 keys — the 191-key live registry after the
#: seven-queue drain + the staged r22/r23/r24 queues, all
#: glob-discovered): the r12 ladder ((7,6),(5,5),(3,4),(1,4)) slips 49
#: key-rounds over 9 rounds here — the 35-key r13 drain cohort
#: re-verifies as one synchronized wave the short cycles can't absorb
#: — and every one-rung stretch still slips 4–15. The adopted ladder
#: stretches all four rungs (≥7-streak → 8-round cycle, ≥5 → 6,
#: ≥3 → 5, ≥1 → 5): ZERO slipped key-rounds, the only zero in the
#: candidate table (simulate_rotation.py). Soundness is the same
#: first-row argument: a (plan, oracle) divergence surfaces on the
#: key's FIRST driver row or when the pair changes (changed keys
#: re-front-load as new), deep-streak keys are the least likely to
#: change, and every unchanged pair still replays against DuckDB on
#: every suite run and before every commit.
#: r14 RE-CHECK (simulate_rotation.py at the 221-key horizon — the
#: 206-key live registry after the r14 drain + the staged r25/r26/r27
#: queues): this ladder STILL scores 0 slipped key-rounds over 9
#: rounds and remains the candidate table's only zero (next best:
#: stretch E at 29). No recalibration needed.
#: r15 RE-CHECK (236-key horizon — 226 live after the r15 drain + the
#: staged r29/r30 queues): still 0 slipped key-rounds, still the only
#: zero (next best: stretch E at 95). No recalibration needed.
LADDER: "tuple[tuple[int, int], ...]" = ((7, 8), (5, 6), (3, 5), (1, 5))

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
    ladder: "tuple[tuple[int, int], ...]" = LADDER,
):
    """Pure window arithmetic (unit-tested in tests/test_window_math.py):
    → (dues, failed_last, never) where ``dues`` maps each cycle length
    to its (last_row, key)-sorted due list — ``dues[2]`` is the strict
    2-round list (fresh failures FIRST, priority 0). The ladder is
    exclusive by streak depth: a key lives ONLY on the first rung its
    streak reaches (core keys always on the strict 2-round cycle)."""
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

    cycles = sorted({2, *(c for _, c in ladder)})
    dues: "dict[int, list]" = {c: [] for c in cycles}
    for k in registry:
        if k not in last_row:
            continue  # never-verified: reported via `never`, not dues
        lr = last_row[k]
        if k in failed_last:
            dues[2].append((0, k))  # red row: re-verify FIRST
            continue
        streak = green_streak.get(k, 0)
        cycle = 2
        if k not in core_keys:
            for min_streak, c in ladder:
                if streak >= min_streak:
                    cycle = c
                    break
        if lr <= next_round - cycle:
            dues[cycle].append((lr, k))
    for c in cycles:
        dues[c].sort()
    never = [k for k in registry if k not in last_row]
    return dues, failed_last, never


def main() -> None:
    next_round = int(sys.argv[1])
    from __spark_entry__ import queries

    registry = list(queries())
    history: dict[int, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        history[int(m.group(1))] = json.load(open(path))

    dues, failed_last, never = classify(registry, history, next_round)
    # never-verified keys lead the prefix (they have NO driver row at
    # all, so they outrank every merely-stale key) and consume slots —
    # pasting the output verbatim must not over-allocate the queue
    # (r9 advice: they were previously printed but excluded from both
    # the prefix and the free-slot arithmetic).
    front = never + [
        k
        for cycle in sorted(dues)
        for _, k in dues[cycle]
    ]
    free = WINDOW - len(front)
    print(f"# r{next_round} window (size {WINDOW})")
    if failed_last:
        print(f"RED in their latest row (front-loaded): {sorted(failed_last)}")
    if never:
        print(f"never-verified keys (front-loaded FIRST): {len(never)}")
    for cycle in sorted(dues):
        label = "strict 2-round keys due (incl. red)" if cycle == 2 else (
            f"{cycle}-round-deadline stretched keys due"
        )
        print(f"{label}: {len(dues[cycle])}")
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
        dues2, _, _ = classify(
            registry + [k for k in queue if k not in registry],
            hyp,
            next_round + 1,
        )
        nxt = [
            k
            for _, k in sorted(
                t for lst in dues2.values() for t in lst
            )
            if k not in window_now
        ]
        if nxt:
            print(f"\n# pull-forward suggestions for the {spare} spare "
                  f"slots (r{next_round + 1}'s oldest due keys):")
            for k in nxt[:spare]:
                print(f'    "{k}",')


if __name__ == "__main__":
    main()
