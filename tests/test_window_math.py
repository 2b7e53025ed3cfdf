"""The r10+ rotation arithmetic (scripts/window_math.py::classify) —
pure-logic pins for the drain-plan protocol: strict 2-round invariant,
green-STREAK stretch eligibility, red-row front-loading, core-key
exemption, never-verified detection."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)
from window_math import classify  # noqa: E402

G = {"hash_match": True}
R = {"hash_match": False}


def test_strict_two_round_and_stretch():
    registry = ["fresh", "stale2", "streak3", "streak3_due"]
    history = {
        5: {"streak3_due": G},
        6: {"streak3": G, "streak3_due": G},
        7: {"stale2": G, "streak3": G, "streak3_due": G},
        8: {"fresh": G, "streak3": G},
        # streak3_due last verified r7 with a 3-green streak
    }
    must, may3, may4, may5, failed, never = classify(
        registry, history, 10, core_keys=frozenset(), stretch_after=3,
        stretch4_after=5, stretch5_after=None,
    )
    must_keys = [k for _, k in must]
    # stale2: only 1 green window -> strict 2-round -> due (lr=7 <= 8)
    assert "stale2" in must_keys
    # fresh (lr=8, 1 green): due at r10 under strict rule
    assert "fresh" in must_keys
    # streak3: 3-green streak, lr=8 -> stretched, due r11 not r10
    assert "streak3" not in must_keys
    assert "streak3" not in [k for _, k in may3]
    # streak3_due: 3-green streak but lr=7 <= 10-3 -> at its deadline
    assert "streak3_due" in [k for _, k in may3]
    assert not failed and not never


def test_four_round_rung_for_long_stable_keys():
    # the r11 ladder rung: ≥stretch4_after-green extended keys move to a
    # 4-round cycle EXCLUSIVELY (they leave the 3-round list entirely)
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
        # mid_streak: 3-green streak -> stays on the 3-round cycle (due r11)
        # core_deep: 5-green but CORE -> strict 2-round (due r10 already)
    }
    must, may3, may4, may5, failed, never = classify(
        registry, history, 11,
        core_keys=frozenset({"core_deep"}),
        stretch_after=3, stretch4_after=5, stretch5_after=None,
    )
    assert [k for _, k in may4] == ["deep_due"]
    assert "deep_fresh" not in [k for _, k in may4]
    assert [k for _, k in may3] == ["mid_streak"]
    assert [k for _, k in must] == ["core_deep"]
    assert not failed and not never


def test_red_row_resets_streak_and_front_loads():
    registry = ["went_red"]
    history = {
        6: {"went_red": G},
        7: {"went_red": G},
        8: {"went_red": R},  # lifetime greens = 2... but latest is RED
    }
    must, may3, may4, may5, failed, never = classify(
        registry, history, 9, core_keys=frozenset(), stretch_after=2
    )
    # lifetime green count (2) would have stretched it; the STREAK is 0
    # and the red latest row front-loads it with priority 0
    assert failed == {"went_red"}
    assert must and must[0] == (0, "went_red")
    assert not may3


def test_core_keys_never_stretch():
    registry = ["core1"]
    history = {r: {"core1": G} for r in (5, 6, 7, 8)}
    must, may3, may4, may5, _, _ = classify(
        registry, history, 10,
        core_keys=frozenset({"core1"}), stretch_after=3,
    )
    # 4-green streak, but core keys keep the strict 2-round invariant:
    # lr=8 <= 10-2 -> due in the strict list
    assert [k for _, k in must] == ["core1"] and not may3


def test_never_verified_detected_and_ordering():
    registry = ["old", "older", "brand_new"]
    history = {
        5: {"older": G},
        6: {"old": G},
    }
    must, may3, may4, may5, failed, never = classify(
        registry, history, 8, core_keys=frozenset(), stretch_after=3
    )
    assert never == ["brand_new"]
    # never-verified keys live ONLY in `never` (main() prepends them to
    # the prefix and charges them against the free-slot count — the r9
    # advice fix); must holds keys WITH history, staleness order:
    # older (lr=5) before old (lr=6)
    assert [k for _, k in must] == ["older", "old"]


def test_five_round_rung_for_deepest_streak_keys():
    """The r12 rung: >=stretch5_after-green extended keys move to a
    5-round cycle EXCLUSIVELY (they leave the 4-round list), and
    stretch5_after=None restores the two-rung r11 ladder."""
    registry = ["deepest_due", "deepest_fresh", "four_cycle"]
    history = {
        r: {"deepest_due": G, "deepest_fresh": G, "four_cycle": G}
        for r in (3, 4, 5, 6, 7)
    }
    history[8] = {"deepest_fresh": G, "four_cycle": G}
    # deepest_due: 5-green streak, lr=7 -> 5-round deadline at r12
    # deepest_fresh: 6-green streak, lr=8 -> not due until r13
    # four_cycle gets only a 4-green streak via a red at r4
    history[4] = dict(history[4]); history[4]["four_cycle"] = R
    must, may3, may4, may5, failed, never = classify(
        registry, history, 12, core_keys=frozenset(),
        stretch_after=1, stretch4_after=3, stretch5_after=5,
    )
    assert [k for _, k in may5] == ["deepest_due"]
    assert "deepest_fresh" not in [k for _, k in may5]
    # four_cycle: streak 4 (>=3, <5) -> 4-round cycle, lr=8 -> due r12
    assert [k for _, k in may4] == ["four_cycle"]
    assert not must and not may3 and not failed and not never
    # rung disabled -> both deep keys fold back into the 4-round list
    m2, y3, y4, y5, _, _ = classify(
        registry, history, 12, core_keys=frozenset(),
        stretch_after=1, stretch4_after=3, stretch5_after=None,
    )
    assert not y5
    assert "deepest_due" in [k for _, k in y4]
