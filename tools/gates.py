"""One runner for all three standing performance gates, one summary
artifact (VERDICT r13 §Next-round #8): the headline sf0.1 paired
bench (bench.py), the sf1 regression gate, and the sf10
k-scales-with-n gate each emit their own JSON today, and every
verdict re-derives the reading protocol (efficiency + steal next to
every number) from BASELINE.md prose. This tool runs the tiers
SEQUENTIALLY (they are timing runs — concurrency inflates the Spark
side, BASELINE.md round-8), keeps each tier's own artifact, and
writes a single GATES_rNN.json whose summary line carries the
per-tier efficiency and steal readings next to the headline numbers.

Usage:
    python tools/gates.py --round 14 [--skip bench,sf1,sf10]
        # writes BENCH_rNN.json / BENCH_SF1_rNN.json /
        # BENCH_SF10_rNN.json (unless skipped) and GATES_rNN.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run(cmd, log_path):
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            cmd,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=log,
            text=True,
        )
    parsed = _last_json_line(proc.stdout)
    return {
        "cmd": " ".join(cmd),
        "exit": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "parsed": parsed,
        "stderr_log": log_path,
    }


def main():
    argv = sys.argv[1:]
    rnd = None
    skip = set()
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        del argv[i : i + 2]
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    if rnd is None:
        raise SystemExit("--round N is required (names the artifacts)")

    py = sys.executable

    def _absorb(path):
        """A skipped tier whose artifact already exists (e.g. an
        adjudicated run kept from earlier in the round) still belongs
        in the summary — absorb it instead of dropping the tier."""
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return {
                "cmd": f"(absorbed existing artifact {os.path.basename(path)})",
                "exit": 0,
                "wall_sec": 0.0,
                "parsed": json.load(f),
                "stderr_log": None,
            }

    tiers = {}
    if "bench" not in skip:
        r = _run([py, "bench.py"], f"/tmp/gates_r{rnd}_bench.stderr")
        if r["parsed"]:
            with open(os.path.join(REPO, f"BENCH_r{rnd:02d}.json"), "w") as f:
                f.write(json.dumps(r["parsed"]) + "\n")
        tiers["headline_sf0.1"] = r
    else:
        r = _absorb(os.path.join(REPO, f"BENCH_r{rnd:02d}.json"))
        if r:
            tiers["headline_sf0.1"] = r
    if "sf1" not in skip:
        out = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
        tiers["sf1_gate"] = _run(
            [py, "tools/sf1_gate.py", "--out", out],
            f"/tmp/gates_r{rnd}_sf1.stderr",
        )
    else:
        r = _absorb(os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json"))
        if r:
            tiers["sf1_gate"] = r
    if "sf10" not in skip:
        out = os.path.join(REPO, f"BENCH_SF10_r{rnd:02d}.json")
        tiers["sf10_gate"] = _run(
            [py, "tools/sf1_gate.py", "--sf10", "--out", out],
            f"/tmp/gates_r{rnd}_sf10.stderr",
        )
    else:
        r = _absorb(os.path.join(REPO, f"BENCH_SF10_r{rnd:02d}.json"))
        if r:
            tiers["sf10_gate"] = r

    def _tier_summary(key):
        r = tiers.get(key)
        if not r or not r["parsed"]:
            return None
        p = r["parsed"]
        return {
            "efficiency": p.get("host_parallel_efficiency"),
            "steal_pct_of_busy": p.get("steal_pct_of_busy"),
            "breaches": p.get("breaches"),
            "ratio_paired": p.get("ratio_paired"),
            "exit": r["exit"],
        }

    summary = {
        k: _tier_summary(k)
        for k in ("headline_sf0.1", "sf1_gate", "sf10_gate")
        if k in tiers
    }
    doc = {
        "round": rnd,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "reading_protocol": (
            "every number is interpretable only next to its tier's "
            "efficiency AND steal_pct_of_busy; steal wins when they "
            "disagree (BASELINE.md round-14)"
        ),
        "summary": summary,
        "tiers": tiers,
    }
    out = os.path.join(REPO, f"GATES_r{rnd:02d}.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"wrote": out, "summary": summary}))
    bad = [
        k
        for k, v in summary.items()
        if v is None or v["exit"] != 0
    ]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
