"""The r10+ rotation arithmetic (scripts/window_math.py::classify) —
pure-logic pins for the drain-plan protocol: strict 2-round invariant,
green-STREAK ladder eligibility (r12: generalized to a
``((min_streak, cycle), ...)`` rung table), red-row front-loading,
core-key exemption, never-verified detection."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)
from window_math import LADDER, classify  # noqa: E402

G = {"hash_match": True}
R = {"hash_match": False}

#: the historical two-rung ladders, for pinning rung-boundary semantics
L3 = ((5, 4), (3, 3))   # 3-round at streak>=3, 4-round at streak>=5


def _keys(dues, cycle):
    return [k for _, k in dues.get(cycle, [])]


def test_strict_two_round_and_stretch():
    registry = ["fresh", "stale2", "streak3", "streak3_due"]
    history = {
        5: {"streak3_due": G},
        6: {"streak3": G, "streak3_due": G},
        7: {"stale2": G, "streak3": G, "streak3_due": G},
        8: {"fresh": G, "streak3": G},
        # streak3_due last verified r7 with a 3-green streak
    }
    dues, failed, never = classify(
        registry, history, 10, core_keys=frozenset(), ladder=L3
    )
    # stale2: only 1 green row -> below every rung -> strict 2-round
    assert "stale2" in _keys(dues, 2)
    # fresh (lr=8, 1 green): due at r10 under strict rule
    assert "fresh" in _keys(dues, 2)
    # streak3: 3-green streak, lr=8 -> stretched, due r11 not r10
    assert "streak3" not in _keys(dues, 2)
    assert "streak3" not in _keys(dues, 3)
    # streak3_due: 3-green streak but lr=7 <= 10-3 -> at its deadline
    assert "streak3_due" in _keys(dues, 3)
    assert not failed and not never


def test_rungs_are_exclusive_by_streak_depth():
    # a >=5-green extended key lives ONLY on the deeper cycle
    registry = ["deep_fresh", "deep_due", "mid_streak", "core_deep"]
    history = {
        3: {"deep_due": G},
        4: {"deep_fresh": G, "deep_due": G, "core_deep": G},
        5: {"deep_fresh": G, "deep_due": G, "core_deep": G},
        6: {"deep_fresh": G, "deep_due": G, "mid_streak": G, "core_deep": G},
        7: {"deep_fresh": G, "deep_due": G, "mid_streak": G, "core_deep": G},
        8: {"deep_fresh": G, "mid_streak": G, "core_deep": G},
        # deep_due: 5-green streak, last row r7 -> 4-round deadline at r11
        # deep_fresh: 5-green streak, last row r8 -> not due until r12
        # mid_streak: 3-green streak -> 3-round cycle (due r11)
        # core_deep: 5-green but CORE -> strict 2-round
    }
    dues, failed, never = classify(
        registry, history, 11,
        core_keys=frozenset({"core_deep"}), ladder=L3,
    )
    assert _keys(dues, 4) == ["deep_due"]
    assert "deep_fresh" not in _keys(dues, 4)
    assert _keys(dues, 3) == ["mid_streak"]
    assert _keys(dues, 2) == ["core_deep"]
    assert not failed and not never


def test_red_row_resets_streak_and_front_loads():
    registry = ["went_red"]
    history = {
        6: {"went_red": G},
        7: {"went_red": G},
        8: {"went_red": R},  # lifetime greens = 2... but latest is RED
    }
    dues, failed, never = classify(
        registry, history, 9, core_keys=frozenset(), ladder=((2, 3),)
    )
    assert failed == {"went_red"}
    # priority 0: ahead of every merely-stale key in the strict list
    assert dues[2][0] == (0, "went_red")
    assert not never


def test_core_keys_never_stretch():
    registry = ["core1"]
    history = {r: {"core1": G} for r in (5, 6, 7, 8)}
    dues, _, _ = classify(
        registry, history, 10,
        core_keys=frozenset({"core1"}), ladder=((3, 3),),
    )
    # 4-green streak, but core keys keep the strict 2-round invariant
    assert "core1" in _keys(dues, 2)


def test_never_verified_detected_and_ordering():
    registry = ["old", "older", "brand_new"]
    history = {
        5: {"older": G},
        6: {"old": G},
    }
    dues, failed, never = classify(
        registry, history, 8, core_keys=frozenset(), ladder=((3, 3),)
    )
    assert never == ["brand_new"]
    # staleness order inside the strict list: older (lr=5) before old
    assert _keys(dues, 2) == ["older", "old"]
    assert not failed


def test_r13_four_rung_ladder_depths():
    """The adopted LADDER: streak 1/3/5/7 -> cycles 5/5/6/8 (the r13
    re-calibration at the TRUE shipped horizon of 206 glob-discovered
    keys: the 35-key r13 drain cohort re-verifies as one synchronized
    wave that slips 49 key-rounds under the r12 ladder and 4-15 under
    every one-rung stretch; this all-rung stretch is the candidate
    table's only ZERO — see simulate_rotation.py); a key takes the
    FIRST rung its streak reaches, exclusively."""
    assert LADDER == ((7, 8), (5, 6), (3, 5), (1, 5))
    registry = [f"s{n}" for n in (0, 1, 3, 5, 7)]
    history = {}
    # build exact streaks: key s{n} gets n consecutive green rows ending
    # at round 8 (so last_row=8 for all verified keys)
    for n in (1, 3, 5, 7):
        for r in range(9 - n, 9):
            history.setdefault(r, {})[f"s{n}"] = G
    expected_cycle = {"s1": 5, "s3": 5, "s5": 6, "s7": 8}
    for key, cyc in expected_cycle.items():
        # one round BEFORE the deadline: not due anywhere
        dues, _, _ = classify(
            registry, history, 8 + cyc - 1, core_keys=frozenset()
        )
        assert all(key not in _keys(dues, c) for c in dues), (key, cyc)
        # at the deadline: due on exactly its own cycle
        dues, _, _ = classify(
            registry, history, 8 + cyc, core_keys=frozenset()
        )
        assert key in _keys(dues, cyc), (key, cyc)
        assert all(
            key not in _keys(dues, c) for c in dues if c != cyc
        ), (key, cyc)
    # s0 never verified
    _, _, never = classify(registry, history, 9, core_keys=frozenset())
    assert never == ["s0"]
