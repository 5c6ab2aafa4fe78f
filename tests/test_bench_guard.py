"""The bench host-noise guard's window-selection policy (bench.py
``_guarded_windows``) — Spark-free unit pins so a future bench edit
can't silently break the keep-the-better-window rule the round-13
BASELINE.md protocol depends on (ratios are interpretable only next to
their efficiency; three same-day identical-code runs read 1.256/1.291/
1.514 at 0.63/0.70/0.58)."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _guarded_windows


def _runner(effs):
    """run_window stub: pops the next scripted efficiency; the window
    payload records which run produced it."""
    calls = []

    def run(entry_eff):
        i = len(calls)
        calls.append(entry_eff)
        return (f"window{i}", effs[i])

    return run, calls


class TestGuardedWindows:
    def test_healthy_window_runs_once(self):
        run, calls = _runner([0.95])
        kept, windows = _guarded_windows(run, lambda: 1 / 0, 0.95, 0.85, 1)
        assert kept == ("window0", 0.95)
        assert windows == [0.95]
        assert len(calls) == 1  # probe never fires on a clean window

    def test_degraded_reruns_and_keeps_better(self):
        run, calls = _runner([0.66, 0.70])
        kept, windows = _guarded_windows(run, lambda: 0.7, 0.66, 0.85, 1)
        assert kept == ("window1", 0.70)
        assert windows == [0.66, 0.70]
        assert len(calls) == 2

    def test_degraded_rerun_worse_keeps_first(self):
        run, _ = _runner([0.70, 0.58])
        kept, windows = _guarded_windows(run, lambda: 0.58, 0.70, 0.85, 1)
        assert kept == ("window0", 0.70)
        assert windows == [0.70, 0.58]

    def test_rerun_budget_bounds_the_loop(self):
        # every window degraded: exactly 1 + reruns windows run
        run, calls = _runner([0.5, 0.5, 0.5, 0.5])
        _, windows = _guarded_windows(run, lambda: 0.5, 0.5, 0.85, 3)
        assert len(windows) == 4
        assert len(calls) == 4

    def test_zero_reruns_disables_the_guard(self):
        run, calls = _runner([0.4])
        kept, windows = _guarded_windows(run, lambda: 1 / 0, 0.4, 0.85, 0)
        assert kept == ("window0", 0.4)
        assert windows == [0.4]

    def test_early_stop_once_a_window_clears_the_floor(self):
        run, calls = _runner([0.6, 0.9, 0.99])
        kept, windows = _guarded_windows(run, lambda: 0.9, 0.6, 0.85, 5)
        assert kept == ("window1", 0.9)
        assert windows == [0.6, 0.9]
        assert len(calls) == 2  # budget remained but the floor was met
