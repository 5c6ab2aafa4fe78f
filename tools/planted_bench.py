"""Planted near-dup density measurement (VERDICT r16 #2).

The driver corpus has no near-duplicates and the .benchdata replica
corpora have ~10x VERBATIM text copies (tools/sf1_bench.py key-offsets
doc_id but keeps text — measured round 17: the sf1 corpus carries
250,600 true near-dup pairs), so neither supports a controlled density
curve. This tool builds a DUP-FREE base corpus at the requested scale
and plants near-dups at requested densities, then measures — for
minhash_dup_pairs and simhash_dup_pairs under the registry configs —

- candidate JOIN volume (``band_candidate_stats``: join_rows /
  distinct_pairs / max_bucket): the pre-verification cost that blows
  up when banding parameters are too loose for the corpus's duplicate
  density;
- wall time of the full operator (cache cleared first — the operators
  return live-cached results, and a plan-matched cache hit would time
  a read, not the work);
- recall against the planted ground truth. A planted pair counts
  toward ground truth only if it clears the operator's own
  verification bar (exact word-3-gram Jaccard >= threshold for
  minhash; hamming <= max_hamming for simhash) — the mutation is
  lossy by design, so a few planted pairs legitimately fall below.

Dup-free scaling: replica ``r`` of a base doc deterministically
PERMUTES token order (sort by xxhash64(token, doc_id, r) — word-3-gram
shingle sets become disjoint, killing minhash similarity) and replaces
8 hashed token positions with replica-tagged markers (changing the
token SET, killing simhash equality — simhash votes over unique tokens
and is order-insensitive, so permutation alone would leave all
replicas hamming-0). Planting then adds a copy of a ``density_pct``%
xxhash64 sample under doc_id + 10^9 with exactly ONE token replaced
(word-3-gram Jaccard ~0.85-0.95 on the ~54-token synthetic docs —
above the registry threshold 0.8 for almost all docs). Everything is
Spark-side Column ops; nothing collects to the driver.

Usage:
    python tools/planted_bench.py [--replicas 10] [--densities 0,1,2,5]
        [--out PLANTED_r17.json]
    python tools/planted_bench.py --replicas 100 --densities 2 ...

Source: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1 (5,000 base docs →
50k at --replicas 10, 500k at --replicas 100). Corpora cache under
.benchdata/planted/. Results ledger: BASELINE.md round-17 section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANT_OFFSET = 1_000_000_000
REP_OFFSET = 1_000_000
MARKER = "xqzreplacedtoken"
N_REPLICA_MUTATIONS = 8


def _mutate(toks, positions_of, marker_of):
    """Replace the token at each position in ``positions_of`` (a Column
    of int array) with ``marker_of(position)``."""
    from pyspark.sql import functions as F

    return F.transform(
        toks,
        lambda t, i: F.when(
            F.array_contains(positions_of, i), marker_of(i)
        ).otherwise(t),
    )


def build_distinct_corpus(docs, replicas: int):
    """``replicas`` mutually-dissimilar copies of every base doc:
    replica 0 is the original; replica r permutes token order and
    replaces 8 hashed positions with replica-tagged markers."""
    from pyspark.sql import functions as F

    base = docs.select("doc_id", "text")
    parts = [base]
    for r in range(1, replicas):
        toks = F.split(F.col("text"), " ")
        # deterministic permutation: sort tokens by a (token, doc, r)
        # hash — shingle sets of different replicas become disjoint
        permuted = F.transform(
            F.array_sort(
                F.transform(
                    toks,
                    lambda t, i: F.struct(
                        F.xxhash64(t, F.col("doc_id"), F.lit(r), i).alias(
                            "h"
                        ),
                        t.alias("t"),
                    ),
                )
            ),
            lambda s: s["t"],
        )
        # replace 8 hashed positions with replica-tagged markers so the
        # token SET differs too (simhash is order-insensitive)
        n = F.size(permuted)
        positions = F.array_distinct(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col("doc_id"), F.lit(r), F.lit(k)), n
                    ).cast("int")
                    for k in range(N_REPLICA_MUTATIONS)
                ]
            )
        )
        mutated = _mutate(
            permuted,
            positions,
            lambda i: F.concat(
                F.lit(f"{MARKER}{r}x"), i.cast("string")
            ),
        )
        parts.append(
            base.select(
                (F.col("doc_id") + r * REP_OFFSET).alias("doc_id"),
                F.array_join(mutated, " ").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def plant_near_dups(corpus, density_pct: float, offset: int = PLANT_OFFSET):
    """Union ``corpus`` with near-dup copies of a deterministic
    ``density_pct``% sample: doc_id + ``offset``, ONE token replaced."""
    from pyspark.sql import functions as F

    sample = corpus.filter(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(10_000))
        < int(density_pct * 100)
    )
    toks = F.split(F.col("text"), " ")
    tgt = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)), F.size(toks))
    mutated = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(i == tgt, F.lit(MARKER)).otherwise(t),
        ),
        " ",
    )
    extra = sample.select(
        (F.col("doc_id") + offset).alias("doc_id"), mutated.alias("text")
    )
    return corpus.unionByName(extra)


def main():
    from pyspark.sql import SparkSession, functions as F

    from bench import (
        _host_parallel_efficiency,
        _stat_snapshot,
        _steal_pct,
    )
    from datafusion_functions_json_spark.operators import dedup
    from datafusion_functions_json_spark.sources.io import session_defaults

    replicas = 10
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])
    densities = [0.0, 1.0, 2.0, 5.0]
    if "--densities" in sys.argv:
        densities = [
            float(d)
            for d in sys.argv[sys.argv.index("--densities") + 1].split(",")
        ]
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src = os.path.join(src_dir, "documents.parquet")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"spark-graft-planted-x{replicas}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-graft-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    spark = session_defaults(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # registry configs (__spark_entry__._MINHASH_CFG / _SIMHASH_CFG)
    MH = {"num_perm": 32, "bands": 8, "seed": 42, "n": 3, "threshold": 0.8}
    SH = {"max_hamming": 3, "block_bits": 16}

    docs = spark.read.parquet(src)
    cache_dir = os.path.join(REPO, ".benchdata", "planted")
    os.makedirs(cache_dir, exist_ok=True)
    base_path = os.path.join(cache_dir, f"distinct_x{replicas}.parquet")
    if not os.path.exists(base_path):
        build_distinct_corpus(docs, replicas).repartition(32).write.mode(
            "overwrite"
        ).parquet(base_path)
    base = spark.read.parquet(base_path)
    n_docs = base.count()

    entry_eff = _host_parallel_efficiency(min(32, os.cpu_count() or 32))
    stat0 = _stat_snapshot()
    records = []
    for d in densities:
        corpus_path = os.path.join(
            cache_dir, f"planted_x{replicas}_d{d:g}.parquet"
        )
        if not os.path.exists(corpus_path):
            plant_near_dups(base, d).repartition(32).write.mode(
                "overwrite"
            ).parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        n_planted = corpus.filter(F.col("doc_id") >= PLANT_OFFSET).count()

        rec = {
            "replicas": replicas,
            "density_pct": d,
            "docs": n_docs,
            "planted": n_planted,
        }

        # ---------------- minhash: candidate volume, wall, recall
        fam = {k: MH[k] for k in ("num_perm", "seed", "n")}
        idx = dedup.minhash_index(
            corpus, "doc_id", "text", mode="word", **fam
        ).persist()
        idx.count()
        rec["minhash_candidates"] = dedup.minhash_candidate_stats(
            idx, num_perm=MH["num_perm"], bands=MH["bands"]
        )
        # ground truth: planted pairs whose exact word-3-gram Jaccard
        # clears the operator's own threshold (the verification bar)
        h_orig = idx.filter(F.col("id") < PLANT_OFFSET).select(
            F.col("id").alias("o_id"), F.col("hashes").alias("ha")
        )
        h_dup = idx.filter(F.col("id") >= PLANT_OFFSET).select(
            (F.col("id") - PLANT_OFFSET).alias("o_id"),
            F.col("hashes").alias("hb"),
        )
        gt = (
            h_orig.join(h_dup, "o_id")
            .select(
                "o_id",
                dedup.jaccard_tokens(F.col("ha"), F.col("hb")).alias("j"),
            )
            .filter(F.col("j") >= MH["threshold"])
        )
        gt_n = gt.count()
        idx.unpersist()
        spark.catalog.clearCache()  # time the WORK, not a cache read
        t0 = time.time()
        pairs = dedup.minhash_dup_pairs(
            corpus, "doc_id", "text", mode="word", **MH
        )
        found = pairs.count()
        rec["minhash_wall_sec"] = round(time.time() - t0, 3)
        hit = pairs.filter(
            (F.col("id_b") - F.col("id_a")) == PLANT_OFFSET
        ).count()
        pairs.unpersist()
        rec["minhash_pairs_found"] = found
        rec["minhash_ground_truth"] = gt_n
        rec["minhash_planted_hits"] = hit
        rec["minhash_recall"] = round(hit / gt_n, 4) if gt_n else None

        # ---------------- simhash: candidate volume, wall, recall
        rec["simhash_candidates"] = dedup.simhash_candidate_stats(
            corpus, "doc_id", "text", block_bits=SH["block_bits"]
        )
        sh = corpus.select(
            "doc_id", dedup.simhash("text").alias("sh")
        ).persist()
        sh.count()
        s_orig = sh.filter(F.col("doc_id") < PLANT_OFFSET).select(
            F.col("doc_id").alias("o_id"), F.col("sh").alias("sa")
        )
        s_dup = sh.filter(F.col("doc_id") >= PLANT_OFFSET).select(
            (F.col("doc_id") - PLANT_OFFSET).alias("o_id"),
            F.col("sh").alias("sb"),
        )
        sgt = (
            s_orig.join(s_dup, "o_id")
            .select(
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias(
                    "ham"
                )
            )
            .filter(F.col("ham") <= SH["max_hamming"])
            .count()
        )
        sh.unpersist()
        spark.catalog.clearCache()
        t0 = time.time()
        spairs = dedup.simhash_dup_pairs(corpus, "doc_id", "text", **SH)
        sfound = spairs.count()
        rec["simhash_wall_sec"] = round(time.time() - t0, 3)
        shit = spairs.filter(
            (F.col("id_b") - F.col("id_a")) == PLANT_OFFSET
        ).count()
        spairs.unpersist()
        rec["simhash_pairs_found"] = sfound
        rec["simhash_ground_truth"] = sgt
        rec["simhash_planted_hits"] = shit
        rec["simhash_recall"] = round(shit / sgt, 4) if sgt else None

        records.append(rec)
        print(f"# d={d}%: {json.dumps(rec)}", file=sys.stderr)

    steal = _steal_pct(stat0, _stat_snapshot())
    exit_eff = _host_parallel_efficiency(min(32, os.cpu_count() or 32))
    doc = {
        "metric": "planted_density",
        "replicas": replicas,
        "source": src,
        "minhash_cfg": MH,
        "simhash_cfg": SH,
        "records": records,
        "steal_pct_of_busy": steal,
        "host_parallel_efficiency": round(min(entry_eff, exit_eff), 3),
        "unit": "sec",
    }
    line = json.dumps(doc)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
