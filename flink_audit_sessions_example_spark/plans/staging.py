"""Staged-queue discovery — ONE iterator for every consumer.

The HUGEINT oracle-type gate (``tests/test_oracle_parity.py``), the
rotation arithmetic (``scripts/window_math.py``) and the capacity
simulator (``scripts/simulate_rotation.py``) all need "every staged
queue that currently exists". A hardcoded round tuple in each (the
pre-r11 state) silently stops covering the NEXT queue the day
``staged_r14.py`` lands — exactly how the defect class the HUGEINT
gate kills would resurface (review r11 #2). Discovery is therefore by
FILESYSTEM GLOB over this package: a new ``staged_r<N>.py`` is covered
the moment it exists, a retired module vanishes naturally, and any
import error inside a staged module PROPAGATES (no swallowed
ModuleNotFoundError — the r10 advice #3 failure mode is structurally
gone along with the try/except that caused it).
"""

from __future__ import annotations

import glob
import importlib
import os
import re
from collections.abc import Iterator


def staged_queues() -> "Iterator[tuple[int, dict, dict]]":
    """Yield ``(round, STAGED_Rn_QUERIES, STAGED_Rn_ORACLES)`` for every
    ``plans/staged_r<N>.py`` present, ascending by round. Import errors
    inside a staged module propagate — a broken queue must surface, not
    read as empty."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(pkg_dir, "staged_r*.py")):
        m = re.fullmatch(r"staged_r(\d+)\.py", os.path.basename(path))
        if m:
            rounds.append(int(m.group(1)))
    # sort by the PARSED round, not the path string — lexicographic
    # order misfiles mixed-digit-count rounds (staged_r9 after
    # staged_r14), perturbing the queue-drain order window_math prints.
    for rnd in sorted(rounds):
        mod = importlib.import_module(f"{__package__}.staged_r{rnd}")
        yield (
            rnd,
            getattr(mod, f"STAGED_R{rnd}_QUERIES"),
            getattr(mod, f"STAGED_R{rnd}_ORACLES"),
        )
