#!/usr/bin/env python
"""Rotation-ladder calibration: replay a cadence policy forward against
the REAL CORRECTNESS history and count deadline slips.

This is how the r11 ladder constants in ``window_math.py`` were chosen
(r10 verdict #1 asked for the arithmetic to be re-closed mechanically).
Model: each future round, ``classify`` produces the due list under the
candidate ladder; the 50-slot window takes the due keys
staleness-greedy, then fills spare slots by pulling forward the NEXT
round's oldest due keys; every verified key is assumed green (the
all-green assumption is the RIGHT one for capacity planning — a red row
front-loads with priority 0 and only tightens the schedule the sim
already has to absorb). A "slip" is a due key left outside its round's
window — a broken cadence deadline.

Measured on the r1–r10 history + the r11 drain (10 queue keys), the
r11 calibration chose (≥1 → 3-round, ≥4 → 4-round): 0 slips at 145
keys. RE-CALIBRATED r12: the registry reached 161 keys (the r12 drain
+ dedup_incremental + the staged r15 queue, which consumes future
slots the moment it registers), and two-rung ladders no longer absorb
the drain cohorts' synchronized re-verification waves:

==================================  ========================
ladder (rungs by streak → cycle)    slipped key-rounds, 12 rds
==================================  ========================
≥1→3, ≥4→4 (the r11 two-rung)        55 (over 9 rounds)
≥1→3, ≥3→4, ≥5→5 (three-rung)         8
≥1→3, ≥3→4, ≥5→5, ≥8→6               7
≥1→3, ≥3→4, ≥5→5, ≥7→6               0   ← adopted
==================================  ========================

(Re-run this script for the live numbers; the table is the r12
snapshot.) The ≥1 rung is sound because driver-vs-local divergence for
a (plan, oracle) pair can only surface on its FIRST driver row or
after the pair changes (changed keys re-front-load as new; red rows
reset the streak); the SAME argument covers the deeper rungs — a
≥5-green key is the least likely to diverge and every unchanged pair
is still replayed against DuckDB locally on every suite run and before
every commit, so the 5-round cycle bounds only DRIVER-row staleness,
not test coverage.

Usage: ``python scripts/simulate_rotation.py [rounds]`` from the repo
root. Prints the table above recomputed from the CURRENT history, so
future rung changes re-justify themselves the same way.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from window_math import LADDER, WINDOW, classify  # noqa: E402


def load_history() -> "dict[int, dict]":
    history: dict[int, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        history[int(m.group(1))] = json.load(open(path))
    return history


def simulate(
    registry: "list[str]",
    base_history: "dict[int, dict]",
    *,
    ladder: "tuple[tuple[int, int], ...]",
    rounds: int,
    verbose: bool = False,
) -> int:
    """Total slipped key-rounds over the horizon under the ladder."""
    history = {r: dict(v) for r, v in base_history.items()}
    start = max(history) + 1
    slipped = 0
    for rnd in range(start, start + rounds):
        dues, _, never = classify(registry, history, rnd, ladder=ladder)
        due = never + [
            k for cycle in sorted(dues) for _, k in dues[cycle]
        ]
        window = due[:WINDOW]
        slipped += max(0, len(due) - WINDOW)
        if len(window) < WINDOW:
            # pull-forward: spare slots take next round's oldest dues
            hyp = dict(history)
            hyp[rnd] = {k: {"hash_match": True} for k in window}
            d2, _, _ = classify(registry, hyp, rnd + 1, ladder=ladder)
            nxt = [
                k
                for _, k in sorted(
                    t for lst in d2.values() for t in lst
                )
                if k not in window
            ]
            window = window + nxt[: WINDOW - len(window)]
        history[rnd] = {k: {"hash_match": True} for k in window}
        if verbose:
            print(f"  r{rnd}: due={len(due)} "
                  f"slip={max(0, len(due) - WINDOW)}")
    return slipped


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    from __spark_entry__ import queries

    # model the POST-drain registry: staged-queue keys consume future
    # slots the moment they register, so capacity planning must include
    # them (glob discovery shared with window_math — plans/staging.py)
    from flink_audit_sessions_example_spark.plans.staging import (
        staged_queues,
    )

    registry = list(queries())
    for _rnd, staged, _oracles in staged_queues():
        registry.extend(k for k in staged if k not in registry)
    history = load_history()
    print(f"# ladder calibration over {rounds} rounds, "
          f"{len(registry)} keys, window {WINDOW}")
    candidates = [
        ("r11 two-rung", ((4, 4), (1, 3))),
        ("three-rung", ((5, 5), (3, 4), (1, 3))),
        ("four-rung >=8->6", ((8, 6), (5, 5), (3, 4), (1, 3))),
        ("r12 four-rung >=7->6", ((7, 6), (5, 5), (3, 4), (1, 4))),
        ("ADOPTED four-rung", LADDER),
        ("five-rung >=9->7", ((9, 7), (7, 6), (5, 5), (3, 4), (1, 3))),
        ("stretch A >=7->7", ((7, 7), (5, 5), (3, 4), (1, 4))),
        ("stretch B >=7->7,5->6", ((7, 7), (5, 6), (3, 4), (1, 4))),
        ("stretch C >=7->8,5->6", ((7, 8), (5, 6), (3, 5), (1, 4))),
        ("stretch D >=9->8", ((9, 8), (7, 7), (5, 6), (3, 5), (1, 4))),
        ("stretch E >=7->8,5->7", ((7, 8), (5, 7), (3, 5), (1, 4))),
        ("stretch F >=7->9,5->6", ((7, 9), (5, 6), (3, 5), (1, 4))),
        ("ADOPTED r13 stretch G", ((7, 8), (5, 6), (3, 5), (1, 5))),
        ("stretch H >=9->9", ((9, 9), (7, 8), (5, 6), (3, 5), (1, 4))),
    ]
    for name, ladder in candidates:
        total = simulate(
            registry, history, ladder=ladder, rounds=rounds,
        )
        print(f"{name} {ladder}: {total} slipped key-rounds")


if __name__ == "__main__":
    main()
