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
    # the documented rows-only exceptions are the ONLY oracle-less ones
    oracle_less = set(reg) - set(o)
    # round 8 converted the SRP-LSH tier (ann_topk/ann_recall/
    # embedding_dups/knn_graph — deterministic hyperplanes inlined)
    # and the IVF tier (switched to the md5-seeded distributed build)
    # to full oracles; these four are structurally non-mirrorable
    # (xxhash64-based minhash/simhash candidates, the GK sketch)
    assert oracle_less == {
        "minhash_pairs", "percentiles_approx",
        "minhash_incremental", "simhash_pairs",
    }, sorted(oracle_less)


def _staleness(k, last, osql):
    rnd, failed, no_oracle = last.get(k, (0, False, False))
    if failed or (no_oracle and k in osql):
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
        "a": (1, False, False),
        "b": (3, False, False),
        # r03's pass supersedes r01's failure — fixed entries stop
        # jumping the queue once the driver has seen the fix
        "c": (3, False, False),
        "d": (3, True, False),   # genuine mismatch → retry-first
        "e": (3, False, True),   # rows-only → retry-first iff now oracled
        "f": (3, True, False),   # hard error → retry-first
    }


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
        if last.get(k, (0, False, False))[0] > 0
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
