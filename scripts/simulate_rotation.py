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

Measured on the r1–r10 history + the r11 drain (10 queue keys):

======================  =========================
ladder (3-round, 4-round rung)  slipped key-rounds, r11–r19
======================  =========================
streak ≥3, ≥5 (r10 verdict)   76
streak ≥2, ≥5                 28
streak ≥1, ≥5                  0
streak ≥1, ≥4                  0   ← adopted (deepest safety margin:
                                    a 4-round rung bounds worst-case
                                    staleness tighter than ≥5 would)
streak ≥2, ≥4                 18
======================  =========================

The synchronized 36-key r10 drain cohort is what breaks the
conservative ladders: under a strict-2 first rung it re-verifies en
masse every second round. The ≥1 rung is sound because driver-vs-local
divergence for a (plan, oracle) pair can only surface on its FIRST
driver row or after the pair changes (changed keys re-front-load as
new; red rows reset the streak); unchanged pairs are replayed against
DuckDB locally on every suite run and before every commit.

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

from window_math import WINDOW, classify  # noqa: E402


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
    stretch_after: int,
    stretch4_after: int,
    rounds: int,
    verbose: bool = False,
) -> int:
    """Total slipped key-rounds over the horizon under the ladder."""
    history = {r: dict(v) for r, v in base_history.items()}
    start = max(history) + 1
    slipped = 0
    for rnd in range(start, start + rounds):
        must, may3, may4, _, never = classify(
            registry, history, rnd,
            stretch_after=stretch_after, stretch4_after=stretch4_after,
        )
        due = (
            never
            + [k for _, k in must]
            + [k for _, k in may3]
            + [k for _, k in may4]
        )
        window = due[:WINDOW]
        slipped += max(0, len(due) - WINDOW)
        if len(window) < WINDOW:
            # pull-forward: spare slots take next round's oldest dues
            hyp = dict(history)
            hyp[rnd] = {k: {"hash_match": True} for k in window}
            m2, y3, y4, _, _ = classify(
                registry, hyp, rnd + 1,
                stretch_after=stretch_after, stretch4_after=stretch4_after,
            )
            nxt = [k for _, k in sorted(m2 + y3 + y4) if k not in window]
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
    for s3, s4 in [(3, 5), (2, 5), (1, 5), (1, 4), (2, 4)]:
        total = simulate(
            registry, history,
            stretch_after=s3, stretch4_after=s4, rounds=rounds,
        )
        print(f"3-round rung @ streak>={s3}, 4-round rung @ streak>={s4}: "
              f"{total} slipped key-rounds")


if __name__ == "__main__":
    main()
