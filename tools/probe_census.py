"""Host-efficiency probe census: run bench.py's parallel-efficiency
probe standalone (no Spark JVM) N times and record each reading
together with the /proc/stat STEAL delta across the probe, so a
sub-floor reading can be attributed: steal > ~2% of busy time during
the probe means hypervisor-level vCPU oversubscription (external
weather); steal ~0 with a low reading means the ceiling is structural
(e.g. all-core clocks below single-core boost — invisible from a
guest without cpufreq sysfs, which this VM does not expose).

VERDICT r13 §Next-round #1 accepts either a >=0.85 bench window or a
committed multi-attempt census showing the host never delivers one;
this tool is the census instrument. Appends probe entries to
BENCH_CENSUS_r14.json-style files via --append.

Usage: python tools/probe_census.py [--n N] [--append CENSUS.json]
       python tools/probe_census.py --append CENSUS.json \
           --attempt BENCH_rNN.json [--note "..."]

The --attempt form copies an existing bench artifact (the FULL record,
per-query and duckdb maps included) into the census's attempts list —
the r16 fix for round 15's totals-only attempts (VERDICT r15 #2).
bench.py can also self-record: set SPARK_GRAFT_BENCH_CENSUS=<file>
(and optionally SPARK_GRAFT_BENCH_NOTE) before a run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ONE weather-attribution primitive: bench._stat_snapshot /
# bench._steal_pct are the same functions the bench and gate windows
# use, so the census and the gates cannot drift on what "steal" means
# (ADVICE r14: this file used to carry a divergent copy that raised on
# an unreadable /proc/stat and read a missing steal field as 0).
from bench import (  # noqa: E402
    _host_parallel_efficiency,
    _stat_snapshot,
    _steal_pct,
    append_census_attempt,
)


def probe_once():
    s0 = _stat_snapshot()
    t0 = time.time()
    eff = _host_parallel_efficiency(min(32, os.cpu_count() or 32))
    wall = time.time() - t0
    s1 = _stat_snapshot()
    # _stat_snapshot returns None off-Linux / short cpu line — the
    # census then records the probe with explicitly-null attribution
    # (same "steal unavailable" state the gates fall back on)
    dbusy = s1[0] - s0[0] if s0 and s1 else None
    dsteal = s1[1] - s0[1] if s0 and s1 else None
    return {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "efficiency": eff,
        "probe_wall_sec": round(wall, 1),
        "busy_jiffies": dbusy,
        "steal_jiffies": dsteal,
        # steal as a share of the work the probe actually did: the
        # direct measure of "an external tenant took our cycles"
        "steal_pct_of_busy": _steal_pct(s0, s1),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }


def main():
    argv = sys.argv[1:]
    n = 1
    append = None
    if "--n" in argv:
        i = argv.index("--n")
        n = int(argv[i + 1])
        del argv[i : i + 2]
    if "--append" in argv:
        i = argv.index("--append")
        append = argv[i + 1]
        del argv[i : i + 2]
    if "--attempt" in argv:
        i = argv.index("--attempt")
        bench_artifact = argv[i + 1]
        del argv[i : i + 2]
        note = ""
        if "--note" in argv:
            i = argv.index("--note")
            note = argv[i + 1]
            del argv[i : i + 2]
        if not append:
            sys.exit("--attempt requires --append CENSUS.json")
        with open(bench_artifact) as f:
            record = json.load(f)
        append_census_attempt(append, record, note)
        print(
            f"appended {bench_artifact} as a full attempt record to "
            f"{append}",
            file=sys.stderr,
        )
        return
    results = []
    for k in range(n):
        r = probe_once()
        results.append(r)
        print(json.dumps(r))
    if append:
        doc = {"round": None, "attempts": []}
        if os.path.exists(append):
            with open(append) as f:
                doc = json.load(f)
        doc.setdefault("probe_only", []).extend(results)
        with open(append, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"appended {n} probe reading(s) to {append}", file=sys.stderr)


if __name__ == "__main__":
    main()
