"""The host-noise guard's window-selection policy (bench.py
``_guarded_windows`` / ``_window_degraded`` / ``_window_better``,
shared with tools/sf1_gate.py) — Spark-free unit pins so a future
bench edit can't silently break the rules the BASELINE.md reading
protocol depends on. Round 13 established keep-the-better-window by
probe efficiency; round 14 made the policy STEAL-AWARE: the probe is
a 2-3 s point sample of steal that bursts on a 2-minute scale, so a
window's integrated steal decides degradation and preference, with
the probe as tie-break/fallback (BASELINE.md round-14: the clean
window that retook four false breaches carried a WORSE entry probe
than the storm window it replaced)."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _guarded_windows, _window_better, _window_degraded


def _runner(script):
    """run_window stub: pops the next scripted (steal, eff) pair; the
    window payload records which run produced it."""
    calls = []

    def run(entry_eff):
        i = len(calls)
        calls.append(entry_eff)
        steal, eff = script[i]
        return (f"window{i}", steal, eff)

    return run, calls


class TestWindowDegraded:
    # round-15 re-basing (ADVICE r14 + the round-14 census): with the
    # steal delta available, a sub-eff_min probe alone is this host's
    # STRUCTURAL ceiling (~0.62-0.65 at zero steal), not weather — only
    # the storm floor (default 0.55, under every census clean reading)
    # degrades a steal-clean window.
    def test_clean_steal_subfloor_probe_is_not_degraded(self):
        # the dead-rerun case the census exposed: 0.64% steal, probe
        # 0.63 — every r14 bench window burned its rerun budget here
        assert not _window_degraded(0.63, 0.64, 0.85, 2.0)
        assert not _window_degraded(0.57, 0.6, 0.85, 2.0)

    def test_clean_steal_storm_probe_degrades(self):
        # sibling-core contention: invisible to steal, probe collapses
        assert _window_degraded(0.5, 0.3, 0.85, 2.0)

    def test_storm_floor_override(self):
        assert _window_degraded(0.63, 0.5, 0.85, 2.0, eff_storm=0.7)
        assert not _window_degraded(0.5, 0.5, 0.85, 2.0, eff_storm=0.4)

    def test_steal_over_ceiling_degrades_despite_clean_probe(self):
        # the r14 storm case: probe sampled a quiet edge, body stormy
        assert _window_degraded(0.95, 3.3, 0.85, 2.0)

    def test_gram_floor_degrades_clean_cpu_window(self):
        # round 18 (VERDICT r17 task 4): the r17 sf1 gate kept windows
        # at gram 0.007-0.01 as "clean" (CPU probe 0.78, steal <1%)
        # while knn_graph read 2x its band — with a gram reading
        # supplied, sub-floor bandwidth degrades the window
        assert _window_degraded(0.78, 0.5, 0.85, 2.0, gram=0.01)
        assert _window_degraded(
            0.78, 0.5, 0.85, 2.0, gram=0.04, gram_floor=0.05
        )
        # at/above the floor: the existing axes decide, unchanged
        assert not _window_degraded(0.78, 0.5, 0.85, 2.0, gram=0.05)
        assert not _window_degraded(0.78, 0.5, 0.85, 2.0, gram=0.17)
        # no gram reading supplied (headline suite): policy unchanged
        assert not _window_degraded(0.78, 0.5, 0.85, 2.0)
        # gram cannot UN-degrade a stormy window
        assert _window_degraded(0.95, 3.3, 0.85, 2.0, gram=0.17)

    def test_clean_window(self):
        assert not _window_degraded(0.9, 0.5, 0.85, 2.0)

    def test_missing_steal_falls_back_to_probe_alone(self):
        # off-Linux: no steal delta, so eff_min governs alone
        assert not _window_degraded(0.9, None, 0.85, 2.0)
        assert _window_degraded(0.7, None, 0.85, 2.0)


class TestWindowBetter:
    def test_clean_beats_dirty_even_with_worse_probe(self):
        # THE round-14 case: clean retake had entry probe 0.57 vs the
        # storm window's 0.592 — steal must out-vote the probe
        assert _window_better(0.57, 0.6, 0.592, 15.5)

    def test_dirty_loses_even_with_better_probe(self):
        # above the ~6% probe zone a true storm loses regardless
        assert not _window_better(0.9, 8.0, 0.6, 0.5)

    def test_both_dirty_less_steal_wins(self):
        # (probes above the storm floor — the r17 backstop rules first)
        assert _window_better(0.6, 3.0, 0.9, 8.0)
        assert not _window_better(0.9, 8.0, 0.6, 3.0)

    def test_storm_floor_backstop_outranks_steal(self):
        # VERDICT r16 #5: the r16 driver-final kept a probe-0.442
        # window over a 5.92%-steal probe-0.604 one on the less-steal
        # rule — per the census the sub-floor window's readings were
        # 1.3-2.3x inflated while even a 32%-steal probe-0.624 control
        # read near-band. A sub-storm-floor window never displaces an
        # above-floor one, regardless of steal.
        assert not _window_better(0.442, 1.0, 0.604, 5.92)
        assert _window_better(0.604, 5.92, 0.442, 1.0)
        # even above the 6% zone
        assert not _window_better(0.5, 3.0, 0.9, 8.0)
        assert _window_better(0.9, 8.0, 0.5, 3.0)
        # both sub-floor: existing rules resume (sub-zone probe decides)
        assert _window_better(0.52, 1.0, 0.44, 1.0)

    def test_gram_floor_backstop(self):
        # round 18 (VERDICT r17 task 4): when BOTH windows carry a
        # gram reading, a sub-gram-floor window (bandwidth-collapsed:
        # the r17 census proved gram 0.007-0.01 dilates the
        # knn_graph/semantic_dedup class ~2x) never displaces — nor
        # survives against — an above-floor one, regardless of steal
        assert not _window_better(
            0.7, 0.3, 0.6, 5.0, gram2=0.01, gram1=0.09
        )
        assert _window_better(
            0.6, 5.0, 0.7, 0.3, gram2=0.09, gram1=0.01
        )
        # CPU storm floor still outranks the gram backstop: a window
        # under the CPU floor loses even with the better gram reading
        assert not _window_better(
            0.4, 0.5, 0.7, 0.5, gram2=0.1, gram1=0.01
        )
        # either gram missing -> existing rules resume unchanged
        assert _window_better(0.9, 0.2, 0.6, 0.1, gram2=None, gram1=0.01)
        assert not _window_better(0.6, 0.1, 0.9, 0.2, gram2=0.2, gram1=None)
        # both sub-gram-floor: existing rules resume (probe decides)
        assert _window_better(
            0.9, 0.2, 0.6, 0.1, gram2=0.01, gram1=0.02
        )
        # custom floor honored
        assert _window_better(
            0.6, 5.0, 0.7, 0.3, gram2=0.3, gram1=0.2, gram_floor=0.25
        )

    def test_both_clean_subceiling_steal_is_noise_probe_decides(self):
        # 0.1% vs 0.2% are both clean windows — the probe difference
        # is the real signal, not the steal jitter
        assert _window_better(0.9, 0.2, 0.6, 0.1)
        assert not _window_better(0.6, 0.1, 0.9, 0.2)

    def test_sub_zone_probe_outranks_steal(self):
        # THE round-16 case: 5.92% steal at probe 0.604 measured
        # BETTER (ratio 1.361) than 1.37% steal at probe 0.581
        # (1.510) — below the ~6% zone the probe decides
        assert _window_better(0.604, 5.92, 0.581, 1.37)
        assert not _window_better(0.581, 1.37, 0.604, 5.92)
        # hysteresis: probes within 0.02 -> sub-zone steal breaks tie
        # (the r15 steal-gradient note: 1.6% reads 4-19% over 0.4%)
        assert _window_better(0.60, 0.4, 0.59, 1.6)
        assert not _window_better(0.59, 1.6, 0.60, 0.4)
        # the zone boundary: 8% is outside, clean-beats-dirty rules
        assert not _window_better(0.9, 8.0, 0.55, 1.0)

    def test_missing_steal_compares_probes(self):
        assert _window_better(0.8, None, 0.6, None)
        # one side missing steal reads as not-dirty — probe decides
        # against a clean counterpart, but a DIRTY counterpart loses
        # (unless the challenger probes under the storm floor — r17
        # backstop: a sub-floor window never wins)
        assert _window_better(0.8, None, 0.6, 1.0)
        assert not _window_better(0.5, None, 0.6, 9.0)
        assert _window_better(0.56, None, 0.6, 9.0)
        assert not _window_better(0.56, 3.0, 0.6, None)


class TestGuardedWindows:
    def test_healthy_window_runs_once(self):
        run, calls = _runner([(0.2, 0.95)])
        kept, windows, steals = _guarded_windows(
            run, lambda: 1 / 0, 0.95, 0.85, 1
        )
        assert kept == ("window0", 0.2, 0.95)
        assert windows == [0.95]
        assert steals == [0.2]
        assert len(calls) == 1  # probe never fires on a clean window

    def test_degraded_reruns_and_keeps_lower_steal(self):
        run, calls = _runner([(15.5, 0.66), (0.6, 0.57)])
        kept, windows, steals = _guarded_windows(
            run, lambda: 0.57, 0.66, 0.85, 1
        )
        # the retake wins on steal despite its WORSE probe reading
        assert kept == ("window1", 0.6, 0.57)
        assert windows == [0.66, 0.57]
        assert steals == [15.5, 0.6]
        assert len(calls) == 2

    def test_high_steal_alone_triggers_rerun(self):
        # probe above the floor, steal above the ceiling; probes tie
        # within hysteresis so the sub-zone steal breaks it
        run, calls = _runner([(3.3, 0.9), (0.3, 0.9)])
        kept, _, steals = _guarded_windows(run, lambda: 0.9, 0.9, 0.85, 1)
        assert kept == ("window1", 0.3, 0.9)
        assert steals == [3.3, 0.3]

    def test_degraded_rerun_storm_floor_backstop(self):
        # first window: clean steal but probe under the storm floor
        # (sibling contention); retake lands ABOVE the probe zone (a
        # true steal storm). Through r16 the first window won on steal
        # — the exact loophole VERDICT r16 #5 flagged (driver-final
        # kept a probe-0.442 window): census says the sub-floor
        # window's readings are the more inflated ones, so the
        # above-floor retake now wins regardless of steal.
        run, _ = _runner([(0.5, 0.50), (9.0, 0.58)])
        kept, windows, _ = _guarded_windows(run, lambda: 0.58, 0.50, 0.85, 1)
        assert kept == ("window1", 9.0, 0.58)

    def test_degraded_rerun_sub_zone_probe_wins(self):
        # r16 refinement: sibling-collapsed first window (probe 0.50,
        # clean steal) vs a 4%-steal retake probing 0.58 — sub-zone,
        # the probe decides and the retake wins (the 0.487-probe
        # window this round was garbage despite 1.29% steal)
        run, _ = _runner([(0.5, 0.50), (4.0, 0.58)])
        kept, windows, _ = _guarded_windows(run, lambda: 0.58, 0.50, 0.85, 1)
        assert kept == ("window1", 4.0, 0.58)
        assert windows == [0.50, 0.58]

    def test_rerun_budget_bounds_the_loop(self):
        # every window degraded: exactly 1 + reruns windows run
        run, calls = _runner([(0.1, 0.5)] * 4)
        _, windows, _ = _guarded_windows(run, lambda: 0.5, 0.5, 0.85, 3)
        assert len(windows) == 4
        assert len(calls) == 4

    def test_zero_reruns_disables_the_guard(self):
        run, calls = _runner([(9.0, 0.4)])
        kept, windows, _ = _guarded_windows(run, lambda: 1 / 0, 0.4, 0.85, 0)
        assert kept == ("window0", 9.0, 0.4)
        assert windows == [0.4]

    def test_early_stop_once_a_window_is_clean(self):
        run, calls = _runner([(5.0, 0.6), (0.2, 0.9), (0.0, 0.99)])
        kept, windows, _ = _guarded_windows(run, lambda: 0.9, 0.6, 0.85, 5)
        assert kept == ("window1", 0.2, 0.9)
        assert windows == [0.6, 0.9]
        assert len(calls) == 2  # budget remained but the window was clean

    def test_early_stop_on_first_clean_steal_window(self):
        # the ADVICE r14 dead-path fix: a clean-steal window with this
        # host's structural ~0.63 probe must NOT burn a rerun
        run, calls = _runner([(0.64, 0.63), (0.0, 0.99)])
        kept, windows, _ = _guarded_windows(run, lambda: 0.99, 0.63, 0.85, 5)
        assert kept == ("window0", 0.64, 0.63)
        assert windows == [0.63]
        assert len(calls) == 1

    def test_missing_steal_reduces_to_probe_policy(self):
        # off-Linux: steal None everywhere — round-13 behavior exactly
        run, _ = _runner([(None, 0.66), (None, 0.70)])
        kept, windows, steals = _guarded_windows(
            run, lambda: 0.7, 0.66, 0.85, 1
        )
        assert kept == ("window1", None, 0.70)
        assert steals == [None, None]


class TestGatesTierHonesty:
    """tools/gates.py summary honesty (ADVICE r14): missing tiers and
    red absorbed artifacts must fail the bad-exit check; green live
    and green absorbed tiers must not."""

    def _gates(self):
        import importlib
        import sys as _sys
        import os as _os

        _sys.path.insert(
            0,
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                "tools",
            ),
        )
        return importlib.import_module("gates")

    def test_missing_tier_is_bad(self):
        g = self._gates()
        assert g._tier_bad(None)
        assert g._tier_bad({"skipped": True, "artifact_missing": True})

    def test_unparsed_or_nonzero_exit_is_bad(self):
        g = self._gates()
        assert g._tier_bad({"exit": 0, "parsed": None})
        assert g._tier_bad({"exit": 1, "ratio_paired": 1.2})

    def test_absorbed_red_artifact_is_bad(self):
        g = self._gates()
        # a kept artifact recording breaches must not be laundered
        assert g._tier_bad(
            {"exit": None, "absorbed": True, "breaches": ["knn_graph"]}
        )
        assert g._tier_bad(
            {"exit": None, "absorbed": True, "counts": {"ok": 170, "fail": 2}}
        )

    def test_green_live_and_absorbed_pass(self):
        g = self._gates()
        assert not g._tier_bad({"exit": 0, "ratio_paired": 1.36, "breaches": None})
        assert not g._tier_bad(
            {"exit": None, "absorbed": True, "breaches": []}
        )
        assert not g._tier_bad(
            {"exit": 0, "counts": {"ok": 172, "fail": 0, "rows_only": 0}}
        )

    def test_last_json_line_skips_trailing_noise(self):
        g = self._gates()
        assert g._last_json_line('x\n{"a": 1}\n# note\n') == {"a": 1}
        assert g._last_json_line("no json here") is None


class TestCensusAttempts:
    """Round-16 policy (VERDICT r15 #2): census attempts carry the FULL
    bench record — per-query and duckdb maps — not just totals."""

    def test_append_census_attempt_full_record(self, tmp_path):
        import json

        import bench

        p = str(tmp_path / "census.json")
        rec = {
            "metric": "headline_queries_total",
            "value": 5.0,
            "queries": {"tpch_q1": 0.4},
            "duckdb_queries": {"tpch_q1": 0.1},
            "ratio_paired": 1.36,
        }
        bench.append_census_attempt(p, rec, "first window")
        bench.append_census_attempt(p, rec)
        doc = json.loads(open(p).read())
        assert len(doc["attempts"]) == 2
        a = doc["attempts"][0]
        assert a["queries"] == {"tpch_q1": 0.4}
        assert a["duckdb_queries"] == {"tpch_q1": 0.1}
        assert a["note"] == "first window"
        assert "utc" in a
        # no note -> no empty-note key noise
        assert "note" not in doc["attempts"][1]

    def test_append_preserves_probe_only_entries(self, tmp_path):
        import json

        import bench

        p = str(tmp_path / "census.json")
        with open(p, "w") as f:
            json.dump({"round": 16, "probe_only": [{"efficiency": 0.6}]}, f)
        bench.append_census_attempt(p, {"value": 1.0})
        doc = json.loads(open(p).read())
        assert doc["round"] == 16
        assert doc["probe_only"] == [{"efficiency": 0.6}]
        assert doc["attempts"][0]["value"] == 1.0

    def test_corrupt_census_file_recovers(self, tmp_path):
        # ADVICE r17: a truncated census must not raise and discard the
        # bench window — the corrupt bytes move aside, the attempt lands
        import json
        import os

        import bench

        p = str(tmp_path / "census.json")
        with open(p, "w") as f:
            f.write('{"round": 17, "attempts": [{"va')  # truncated
        bench.append_census_attempt(p, {"value": 2.0}, "after corruption")
        doc = json.loads(open(p).read())
        assert doc["recovered_from_corrupt"] is True
        assert doc["attempts"][0]["value"] == 2.0
        assert os.path.exists(p + ".corrupt")


class TestSlowModeWatch:
    """Sub-breach slow-mode watch (VERDICT r16 #1): the r16 gate read
    semantic_dedup 3.991 s at 0.16% steal with green stages — over
    1.2x the 3.3 pin but under the 1.5x trip — and recorded nothing.
    watch_entry() must land evidence for exactly that signature."""

    def _import(self):
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            ),
        )
        from sf1_gate import watch_entry

        return watch_entry

    def test_r16_signature_records(self):
        watch_entry = self._import()
        times = {
            "semantic_dedup": 3.991,
            "semantic_dedup_assign": 1.8,
            "semantic_dedup_pairs": 0.9,
        }
        gate = {
            "semantic_dedup": 3.3,
            "semantic_dedup_assign": 2.3,
            "semantic_dedup_pairs": 1.4,
        }
        w = watch_entry(times, gate, [], 0.16, 0.62)
        assert w is not None
        assert w["reading_sec"] == 3.991
        assert w["pin"] == 3.3
        assert w["stage_times"] == {
            "semantic_dedup_assign": 1.8,
            "semantic_dedup_pairs": 0.9,
        }
        assert w["steal_pct_of_busy"] == 0.16
        assert w["efficiency"] == 0.62

    def test_typical_reading_stays_silent(self):
        watch_entry = self._import()
        times = {"semantic_dedup": 2.5, "semantic_dedup_assign": 1.8,
                 "semantic_dedup_pairs": 0.9}
        gate = {"semantic_dedup": 3.3, "semantic_dedup_assign": 2.3,
                "semantic_dedup_pairs": 1.4}
        assert watch_entry(times, gate, [], 0.2, 0.62) is None

    def test_breach_or_red_stage_defers_to_adjudication(self):
        watch_entry = self._import()
        times = {"semantic_dedup": 5.5, "semantic_dedup_assign": 3.0,
                 "semantic_dedup_pairs": 0.9}
        gate = {"semantic_dedup": 3.3, "semantic_dedup_assign": 2.3,
                "semantic_dedup_pairs": 1.4}
        # full-op breached -> the existing slow_mode_events arm owns it
        assert watch_entry(times, gate, ["semantic_dedup"], 0.2, 0.6) is None
        # a red stage pin means attribution, not the bimodal mode
        assert (
            watch_entry(times, gate, ["semantic_dedup_assign"], 0.2, 0.6)
            is None
        )
