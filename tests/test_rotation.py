"""Rotation-fairness gate for __spark_entry__._rotate (round-13 fix).

The grading driver records CORRECTNESS rows for the FIRST 50 names in
``queries()`` order.  Round 12 showed never-recorded additions keyed
``(cur-3, 0, pos)`` sort BEFORE entries genuinely graded 3 rounds ago
(keyed ``(cur-3, 1, pos)``), so each round's additions displaced the
tail of the oldest cohort — two r12 additions pushed the two r9-graded
entries to slate positions 50/51, stretching them to a 4-round wait.

Round 13 keyed unseen entries AFTER the equally-stale cohort, which
round 14 found starves them permanently once the registry exceeds the
150 = 3×50 rotation capacity: every cohort is then exactly 50, so the
two never-graded round-13 additions sat at slate positions 50/51 in
EVERY future round — a query with no driver correctness row ever, kept
out by entries merely 3 rounds stale.  Round 14 keys unseen entries
``(cur-3, -1, pos)``: ahead of the equally-stale cohort (they are
strictly more urgent — never proven vs proven 3 rounds ago), still
behind anything genuinely older (entries waiting 4+ rounds keep
priority, the round-13 guarantee that matters).  Past capacity the
displaced cohort tail waits 4 rounds once — with 152 > 150 someone
must.

These tests pin (a) the tiebreak (4+-round waiters outrank additions),
(b) a multi-round slate simulation at the cap showing no live entry
exceeds a 3-round wait, (c) that the live slate front is the oldest
cohort, and (d) that never-graded entries reach the slate even when
every cohort is full — the round-14 starvation regression test.
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


def test_slate_simulation_bounded_waits_with_churn(monkeypatch):
    """150-entry registry, 50 driver slots, 2 folds + 2 unseen additions
    per round for 12 simulated rounds: unseen additions are graded
    within 3 rounds of registration (never starve), and every graded
    entry's wait since its previous grade is <= 4 rounds — the 3-round
    steady state plus the one-round displacement the additions cost at
    capacity (someone must wait when churn keeps the registry full;
    round 13's <= 3 bound silently held only because the additions were
    the ones waiting, forever)."""
    n_slots, cap, start = 50, 150, 13
    names = [f"q{i:03d}" for i in range(cap)]
    # steady-state prior: three 50-entry cohorts graded r10/r11/r12
    seen = {n: start - 3 + (i // n_slots) for i, n in enumerate(names)}
    registered = {n: seen[n] for n in names}  # proxy: round first known
    next_id = cap
    max_graded_wait = 0
    max_unseen_wait = 0
    for rnd in range(start, start + 12):
        slate = _rotate_with(monkeypatch, names, seen)[:n_slots]
        for n in slate:
            if n in seen:
                max_graded_wait = max(max_graded_wait, rnd - seen[n])
            else:
                max_unseen_wait = max(max_unseen_wait, rnd - registered[n])
            seen[n] = rnd
        # every pending unseen entry must be within its 3-round promise
        for n in names:
            if n not in seen:
                assert rnd - registered[n] < 3, f"{n} starving"
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
    assert max_unseen_wait <= 3, f"an addition waited {max_unseen_wait} rounds"
    assert max_graded_wait <= 4, f"a graded entry waited {max_graded_wait} rounds"


def test_live_slate_front_is_the_oldest_cohort():
    """On the real CORRECTNESS files: no name outside the first 50 of
    queries() may have an older last-grade than any name inside it
    (unseen names count as graded ``cur - 3``, tiebreak after seen)."""
    seen = entrymod._last_recorded_round()
    cur = max(seen.values(), default=0) + 1
    order = list(entrymod.queries())
    front, rest = order[:50], order[50:]

    def grade(n):
        return (seen[n], 0) if n in seen else (cur - 3, -1)

    worst_front = max(grade(n) for n in front)
    best_rest = min(grade(n) for n in rest)
    assert worst_front <= best_rest


def test_never_graded_entries_cannot_starve_past_capacity(monkeypatch):
    """152 entries / 50 slots with three FULL 50-entry cohorts (the live
    round-14 shape): the 2 never-graded entries must reach the slate now
    — under the round-13 tiebreak they keyed after the equally-stale
    cohort and stayed at positions 50/51 every round, forever."""
    names = [f"q{i:03d}" for i in range(150)] + ["new_a", "new_b"]
    seen = {f"q{i:03d}": 11 + (i // 50) for i in range(150)}
    slate = _rotate_with(monkeypatch, names, seen)[:50]
    assert "new_a" in slate and "new_b" in slate
    # and they never displace anything genuinely older than their
    # synthetic cohort
    seen["q000"] = 9
    slate = _rotate_with(monkeypatch, names, seen)[:50]
    assert slate[0] == "q000"
