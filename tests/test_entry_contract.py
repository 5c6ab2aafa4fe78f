"""Driver-contract pins for __spark_entry__.py: registry shape and the
self-maintaining rotation ordering (the driver verifies only the FIRST
50 ``queries()`` entries per round, so ordering bugs silently starve
entries of their correctness gate — worth a real test, not a comment).

No SparkSession needed: these test the registry plumbing, not the
queries themselves (tools/check_oracle.py and the driver cover those).
"""

from __future__ import annotations

import json

import __spark_entry__ as entrymod


def test_registry_keys_unique_and_oracle_subset():
    reg = entrymod._registry()
    q = entrymod.queries()
    assert set(reg) == set(q)
    o = entrymod.oracle_sql()
    # every oracle key must name a real query (a typo'd oracle entry
    # would silently never be compared)
    assert set(o) <= set(reg), sorted(set(o) - set(reg))
    # round 11 retired the rows-only class entirely: the xxhash64-based
    # LSH entries carry oracle_twin VALUES oracles and the GK sketch
    # entry carries a bounded-error oracle — EVERY registry entry must
    # now be value-checked
    oracle_less = set(reg) - set(o)
    assert oracle_less == set(), sorted(oracle_less)


def _staleness(k, last, osql):
    rnd, failed, no_oracle, consec = last.get(k, (0, False, False, 0))
    if (failed and consec <= entrymod._RETRY_ROUNDS) or (
        no_oracle and k in osql
    ):
        return 0
    return rnd


def test_rotation_orders_least_recently_checked_first():
    last = entrymod._last_driver_checked()
    osql = entrymod.oracle_sql()
    order = list(entrymod.queries())
    stale = [_staleness(k, last, osql) for k in order]
    # non-decreasing: an entry can never sit behind one checked later
    assert stale == sorted(stale)
    # retry-first entries (never-checked, last-check-failed, or
    # newly-oracled rows-only) must lead the window
    n_lead = sum(1 for s in stale if s == 0)
    assert order[:n_lead] == [
        k for k in order if _staleness(k, last, osql) == 0
    ]


def test_last_checked_reads_correctness_files(tmp_path, monkeypatch):
    # point the scanner at a synthetic history and check the fold:
    # newest record per key wins, and its status (failed / rows-only)
    # rides along for the retry-first rules
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {}, "b": {}, "c": {"hash_match": False}})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps(
            {
                "b": {},
                "c": {"hash_match": True},
                "d": {"hash_match": False, "err": None},
                "e": {"err": "no_oracle"},
                "f": {"err": "boom"},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json")  # ignored
    import pathlib

    real_resolve = pathlib.Path.resolve

    def fake_resolve(self):
        p = real_resolve(self)
        if p.name == "__spark_entry__.py":
            return tmp_path / "__spark_entry__.py"
        return p

    monkeypatch.setattr(pathlib.Path, "resolve", fake_resolve)
    last = entrymod._last_driver_checked()
    assert last == {
        "a": (1, False, False, 0),
        "b": (3, False, False, 0),
        # r03's pass supersedes r01's failure — fixed entries stop
        # jumping the queue once the driver has seen the fix
        "c": (3, False, False, 0),
        "d": (3, True, False, 1),   # genuine mismatch → retry-first
        "e": (3, False, True, 0),   # rows-only → retry-first iff now oracled
        "f": (3, True, False, 1),   # hard error → retry-first
    }


def test_permanent_failure_cannot_pin_a_slot(tmp_path, monkeypatch):
    # an entry that fails EVERY round is boosted for _RETRY_ROUNDS
    # consecutive retries, then falls back to normal staleness order —
    # its own fresh failure records must not re-boost it forever
    n = entrymod._RETRY_ROUNDS
    for r in range(1, n + 3):
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text(
            json.dumps({"perma": {"hash_match": False}, "ok": {}})
        )
    import pathlib

    real_resolve = pathlib.Path.resolve

    def fake_resolve(self):
        p = real_resolve(self)
        if p.name == "__spark_entry__.py":
            return tmp_path / "__spark_entry__.py"
        return p

    monkeypatch.setattr(pathlib.Path, "resolve", fake_resolve)
    last = entrymod._last_driver_checked()
    newest = n + 2
    assert last["perma"] == (newest, True, False, newest)
    # beyond the bound: no boost — normal (recent) staleness applies
    assert _staleness("perma", last, {}) == newest
    # within the bound a failure still jumps the queue
    short = {"fresh": (newest, True, False, 1)}
    assert _staleness("fresh", short, {}) == 0
    # exactly at the bound: still boosted (retry-first for N rounds)
    at_bound = {"edge": (newest, True, False, n)}
    assert _staleness("edge", at_bound, {}) == 0
    # a pass resets the run — subsequent single failure boosts again
    (tmp_path / f"CORRECTNESS_r{n + 3:02d}.json").write_text(
        json.dumps({"perma": {"hash_match": True}})
    )
    (tmp_path / f"CORRECTNESS_r{n + 4:02d}.json").write_text(
        json.dumps({"perma": {"hash_match": False}})
    )
    last = entrymod._last_driver_checked()
    assert last["perma"] == (n + 4, True, False, 1)
    assert _staleness("perma", last, {}) == 0


def test_failed_and_newly_oracled_entries_jump_the_queue():
    # the six round-8 fixes (2 genuine r07 mismatches + 4 queries whose
    # oracle was added after their last rows-only record) must re-enter
    # the very next driver window, not wait out the full cadence
    last = entrymod._last_driver_checked()
    osql = entrymod.oracle_sql()
    order = list(entrymod.queries())
    boosted = [
        k
        for k in order
        if last.get(k, (0, False, False, 0))[0] > 0
        and _staleness(k, last, osql) == 0
    ]
    assert set(boosted) <= set(order[:50])


def test_window_holds_the_full_stale_set():
    # with <= 50 never-checked entries, all of them must be in the
    # window the driver will verify next round
    last = entrymod._last_driver_checked()
    order = list(entrymod.queries())
    never = [k for k in order if last.get(k, (0,))[0] == 0]
    if len(never) <= 50:
        assert set(never) <= set(order[:50])
