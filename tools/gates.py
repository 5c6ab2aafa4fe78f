"""One runner for ALL standing per-round gates, one summary artifact
(VERDICT r13 §Next-round #8; registry tier added per VERDICT r14 #4):
the headline sf0.1 paired bench (bench.py), the sf1 regression gate,
the sf10 k-scales-with-n gate, and the full-registry correctness
drain (tools/check_oracle.py) each emit their own JSON; this tool
runs the tiers SEQUENTIALLY (they are timing runs — concurrency
inflates the Spark side, BASELINE.md round-8), keeps each tier's own
artifact, and writes a single GATES_rNN.json whose summary line
carries the per-tier efficiency and steal readings next to the
headline numbers, so one command proves correctness + perf + weather
per round.

Usage:
    python tools/gates.py --round 15 [--skip bench,sf1,sf10,registry]
        # writes BENCH_rNN.json / BENCH_SF1_rNN.json /
        # BENCH_SF10_rNN.json / CHECKS_rNN.json (unless skipped)
        # and GATES_rNN.json

Skip semantics (ADVICE r14): a skipped tier whose artifact already
exists this round is ABSORBED (marked ``absorbed: true``, exit
``null`` — the run that produced it carried the exit); a skipped tier
with NO artifact is recorded as ``{skipped, artifact_missing}`` and
fails the bad-exit check — tier coverage is never silently absent
from the summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # __spark_entry__ (registry tier sizing)


def _tier_bad(v):
    """A summary tier is bad when it is absent/missing, a live run
    exited non-zero, or an ABSORBED artifact itself records breaches
    or failures — absorption must not launder a red artifact
    (ADVICE r14). Module-level so tests/test_bench_guard.py can pin
    the policy Spark-free."""
    if v is None or v.get("artifact_missing"):
        return True
    if v.get("parsed", "x") is None:
        return True
    if v.get("exit") not in (0, None):
        return True
    if v.get("breaches"):
        return True
    c = v.get("counts")
    if c and c.get("fail"):
        return True
    return False


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run(cmd, log_path, parse_file=None, extra_env=None):
    """Run one tier; ``parsed`` comes from the last stdout JSON line,
    or from ``parse_file`` for tools that write their artifact
    directly (check_oracle)."""
    t0 = time.time()
    env = None
    if extra_env:
        env = dict(os.environ)
        env.update(extra_env)
    with open(log_path, "w") as log:
        proc = subprocess.run(
            cmd,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=log,
            text=True,
            env=env,
        )
    if parse_file is not None:
        parsed = None
        if os.path.exists(parse_file):
            with open(parse_file) as f:
                parsed = json.load(f)
    else:
        parsed = _last_json_line(proc.stdout)
    return {
        "cmd": " ".join(cmd),
        "exit": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        # per-tier completion stamp (ADVICE r17: a re-assembled GATES
        # file stamped only one top-level utc over tiers taken from
        # separate runs — provenance belongs in the artifact itself)
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
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
        in the summary — absorb it, explicitly marked: the absorbed
        run's exit code is not knowable here (ADVICE r14: a hardcoded
        exit 0 made absorbed tiers indistinguishable from green live
        runs)."""
        if not os.path.exists(path):
            return {
                "skipped": True,
                "artifact_missing": True,
                "artifact": os.path.basename(path),
            }
        with open(path) as f:
            return {
                "cmd": f"(absorbed existing artifact {os.path.basename(path)})",
                "absorbed": True,
                "exit": None,
                "wall_sec": 0.0,
                # when the absorbed tier actually ran (ADVICE r17:
                # composite files must carry per-tier provenance)
                "artifact_mtime_utc": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ",
                    time.gmtime(os.path.getmtime(path)),
                ),
                "parsed": json.load(f),
                "stderr_log": None,
            }

    tiers = {}
    if "bench" not in skip:
        # every headline window self-records a FULL attempt (per-query
        # + duckdb maps) in the round census — VERDICT r15 #2
        r = _run(
            [py, "bench.py"],
            f"/tmp/gates_r{rnd}_bench.stderr",
            extra_env={
                "SPARK_GRAFT_BENCH_CENSUS": os.path.join(
                    REPO, f"BENCH_CENSUS_r{rnd:02d}.json"
                ),
                "SPARK_GRAFT_BENCH_NOTE": os.environ.get(
                    "SPARK_GRAFT_BENCH_NOTE", "gates.py headline tier"
                ),
            },
        )
        if r["parsed"]:
            with open(os.path.join(REPO, f"BENCH_r{rnd:02d}.json"), "w") as f:
                f.write(json.dumps(r["parsed"]) + "\n")
        tiers["headline_sf0.1"] = r
    else:
        tiers["headline_sf0.1"] = _absorb(
            os.path.join(REPO, f"BENCH_r{rnd:02d}.json")
        )
    if "sf1" not in skip:
        out = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
        tiers["sf1_gate"] = _run(
            [py, "tools/sf1_gate.py", "--out", out],
            f"/tmp/gates_r{rnd}_sf1.stderr",
        )
    else:
        tiers["sf1_gate"] = _absorb(
            os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
        )
    if "sf10" not in skip:
        out = os.path.join(REPO, f"BENCH_SF10_r{rnd:02d}.json")
        tiers["sf10_gate"] = _run(
            [py, "tools/sf1_gate.py", "--sf10", "--out", out],
            f"/tmp/gates_r{rnd}_sf10.stderr",
        )
    else:
        tiers["sf10_gate"] = _absorb(
            os.path.join(REPO, f"BENCH_SF10_r{rnd:02d}.json")
        )
    checks_out = os.path.join(REPO, f"CHECKS_r{rnd:02d}.json")
    if "registry" not in skip:
        # full drain: every registry entry, least-recently-driver-
        # checked first (the order is irrelevant at full count — it is
        # simply "all of them"); ~13 min at sf0.01
        import __spark_entry__ as entrymod

        n = len(entrymod.queries())
        tiers["registry"] = _run(
            [
                py,
                "tools/check_oracle.py",
                "/root/testdata/sf0.01",
                "--stale",
                str(n),
                "--json",
                checks_out,
            ],
            f"/tmp/gates_r{rnd}_registry.stderr",
            parse_file=checks_out,
        )
    else:
        tiers["registry"] = _absorb(checks_out)

    def _tier_summary(key):
        r = tiers.get(key)
        if r is None:
            return None
        if r.get("skipped"):
            return {"skipped": True, "artifact_missing": True}
        if not r["parsed"]:
            return {"exit": r["exit"], "parsed": None}
        p = r["parsed"]
        s = {
            "efficiency": p.get("host_parallel_efficiency"),
            "steal_pct_of_busy": p.get("steal_pct_of_busy"),
            "breaches": p.get("breaches"),
            "ratio_paired": p.get("ratio_paired"),
            "exit": r["exit"],
        }
        if key == "registry":
            s = {"counts": p.get("counts"), "exit": r["exit"]}
        if r.get("absorbed"):
            s["absorbed"] = True
        return s

    summary = {
        k: _tier_summary(k)
        for k in ("headline_sf0.1", "sf1_gate", "sf10_gate", "registry")
    }
    doc = {
        "round": rnd,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # true when any tier was absorbed from an earlier run rather
        # than executed by this invocation (ADVICE r17: the composite
        # nature must be visible in the artifact, not only git history)
        "assembled": any(t.get("absorbed") for t in tiers.values()),
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

    bad = [k for k, v in summary.items() if _tier_bad(v)]
    if bad:
        print(f"# BAD tiers: {', '.join(bad)}", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
