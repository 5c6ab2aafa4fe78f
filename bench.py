"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headliners cover the engine's three pillars: JSON extraction (the
reference's whole surface), relational composition (Catalyst-native),
and the pipeline operators (dedup/similarity/text) — each timed to
completion of its terminal action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from datafusion_functions_json_spark.sources import session_defaults

BENCH_QUERIES = [
    # JSON extraction surface
    "json_agg",            # contains-filter + int-extract + group agg
    "json_get_int",        # plain per-row extraction at scale
    "nested_get_str",      # 4-level path on synthesized nested docs
    "multi_extract",       # fused 5-field extraction, one parse per doc
    "union_roundtrip",     # union struct + to_text + is_null
    # relational
    "tpch_q1",
    "events_hourly",
    "orders_join",
    # pipeline operators
    "token_count",
    "fingerprint",
    "lang_id",
    "cosine_topk",
    "minhash_pairs",
    "simhash_pairs",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = session_defaults(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup OUTSIDE the timed region: parquet footer reads, whole-stage
    # codegen compilation, and the Python-UDF worker pool (one worker per
    # core) — none of which recur in steady state.
    from datafusion_functions_json_spark import json_get_int
    from datafusion_functions_json_spark.operators import dedup
    from datafusion_functions_json_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").repartition(int(cpus))
    ev.select(json_get_int("props", "k")).count()
    load_table(spark, sf_dir, "lineitem").count()
    docs_warm = load_table(spark, sf_dir, "documents").limit(64)
    dedup.minhash_dup_pairs(
        docs_warm, "doc_id", "text", num_perm=32, bands=8, mode="word", n=3
    ).count()
    dedup.simhash_dup_pairs(docs_warm, "doc_id", "text").count()

    qs = entrymod.queries()
    times = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # terminal action: count() drives the full computation without
        # collecting wide results to the driver
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
