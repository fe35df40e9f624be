"""Rotation-fairness gate for __spark_entry__._rotate (round-13 fix).

The grading driver records CORRECTNESS rows for the FIRST 50 names in
``queries()`` order.  Round 12 showed never-recorded additions keyed
``(cur-3, 0, pos)`` sort BEFORE entries genuinely graded 3 rounds ago
(keyed ``(cur-3, 1, pos)``), so each round's additions displaced the
tail of the oldest cohort — two r12 additions pushed the two r9-graded
entries to slate positions 50/51, stretching them to a 4-round wait.

Round 13 flips the tiebreak: seen entries key ``0``, unseen ``1``.
These tests pin (a) the tiebreak itself, (b) a multi-round slate
simulation with 2 additions+folds per round at the 150-entry cap
showing no live entry ever exceeds a 3-round wait, and (c) that the
live slate front is exactly the oldest cohort.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def _rotate_with(monkeypatch, names, seen):
    monkeypatch.setattr(entrymod, "_last_recorded_round", lambda: dict(seen))
    return entrymod._rotate(list(names))


def test_waiting_entries_outrank_same_age_additions(monkeypatch):
    # `old` genuinely graded 3 rounds ago; `new_*` never recorded.
    # Before the fix the unseen entries sorted first; now `old` must.
    seen = {"old": 9, "recent": 11, "filler": 12}
    order = _rotate_with(
        monkeypatch, ["new_a", "recent", "old", "filler", "new_b"], seen
    )
    assert order == ["old", "new_a", "new_b", "recent", "filler"]


def test_slate_simulation_no_entry_waits_beyond_3_rounds(monkeypatch):
    """150-entry registry, 50 driver slots, 2 folds + 2 unseen additions
    per round for 12 simulated rounds: every graded entry's wait since
    its previous grade is <= 3 rounds, and unseen additions are graded
    within 3 rounds of registration."""
    n_slots, cap, start = 50, 150, 13
    names = [f"q{i:03d}" for i in range(cap)]
    # steady-state prior: three 50-entry cohorts graded r10/r11/r12
    seen = {n: start - 3 + (i // n_slots) for i, n in enumerate(names)}
    registered = {n: seen[n] for n in names}  # proxy: round first known
    next_id = cap
    max_wait = 0
    for rnd in range(start, start + 12):
        slate = _rotate_with(monkeypatch, names, seen)[:n_slots]
        for n in slate:
            prev = seen.get(n, registered[n])
            max_wait = max(max_wait, rnd - prev)
            seen[n] = rnd
        # fold 2 (drop the most recently graded — worst case for the
        # old cohorts is losing none of their members) and add 2 unseen
        for victim in sorted(names, key=lambda n: -seen.get(n, registered[n]))[:2]:
            names.remove(victim)
            seen.pop(victim, None)
        for _ in range(2):
            fresh = f"q{next_id:03d}"
            next_id += 1
            names.append(fresh)
            registered[fresh] = rnd
        assert len(names) == cap
    assert max_wait <= 3, f"an entry waited {max_wait} rounds for a grade"


def test_live_slate_front_is_the_oldest_cohort():
    """On the real CORRECTNESS files: no name outside the first 50 of
    queries() may have an older last-grade than any name inside it
    (unseen names count as graded ``cur - 3``, tiebreak after seen)."""
    seen = entrymod._last_recorded_round()
    cur = max(seen.values(), default=0) + 1
    order = list(entrymod.queries())
    front, rest = order[:50], order[50:]

    def grade(n):
        return (seen[n], 0) if n in seen else (cur - 3, 1)

    worst_front = max(grade(n) for n in front)
    best_rest = min(grade(n) for n in rest)
    assert worst_front <= best_rest
