"""Capture `.explain("formatted")` output for the bench headline queries
into plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLANS_ROUND, default r18) — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

    python tools/capture_plans.py <tag> [sf_dir] [query ...]

`tag` is e.g. `before` or `after`; with no query names, captures every
bench headliner (BENCH_QUERIES + UNTWINNED_QUERIES). The session mirrors
bench.py's (shuffle partitions, AQE off) so the captured plan is the one
the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
import bench
from datafusion_functions_json_spark.sources import session_defaults


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or (bench.BENCH_QUERIES + bench.UNTWINNED_QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)

    # master mirrors the bench's core count (round 18): partition widths
    # in the captured plans must be the ones the bench actually runs —
    # byte-derived spread widths cap at defaultParallelism, so a local[4]
    # capture would hide a 32→6 width change. Default stays 4 (the r17
    # capture grain) unless SPARK_GRAFT_CPUS says otherwise.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spark = session_defaults(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
