"""Distributed connected components over a pair/edge DataFrame.

The near-dup operators (``minhash_dup_pairs``, ``simhash_dup_pairs``,
``ngram_jaccard_pairs``) emit *pair* graphs; true dedup clustering needs
the transitive closure — A~B and B~C put A,B,C in one group even when
(A,C) never met in a band. This module computes that closure with the
alternating **large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the standard
O(log n)-round formulation for shuffle-based engines:

* **large-star**: every node points its larger neighbors at the minimum
  of its neighborhood (incl. itself).
* **small-star**: every node points its smaller-or-equal neighbors (and
  itself) at that minimum.

Each phase is expressed as groupBy-min + a same-key equi-join — both
sides shuffle on the node id, no ``collect_set`` (a high-degree hub
never materializes its adjacency list in one row), no driver-side graph.
Rounds double the "reach" of small labels, so convergence is
logarithmic in component diameter — a 100 TB pair graph with billion-node
components converges in ~30 rounds of bounded shuffles.

Iteration hygiene for Spark: each round ends in ``localCheckpoint`` to
truncate lineage (otherwise the plan doubles per round and the optimizer
chokes), and convergence is detected from a single-action checksum
(count + order-insensitive hash-sum of the edge set).

Reference scope note: the reference engine has no graph operator — this
belongs to the LLM-pipeline extension suite (dedup clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "dedup_by_components",
    "dedup_keep_best",
    "dup_provenance",
    "pagerank",
]


def _large_star(e: DataFrame) -> DataFrame:
    # symmetrize, then for each u: m = min(N(u) ∪ {u}); emit (v, m) for v > u
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = und.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("_m"))
    return (
        und.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient toward the smaller endpoint, then for each u:
    # m = min(N<(u)); emit (v, m) for each smaller neighbor v, plus (u, m)
    o = (
        e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    m = o.groupBy("src").agg(F.min("dst").alias("_m"))
    body = (
        o.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    head = m.select("src", F.col("_m").alias("dst"))
    return body.union(head).distinct()


def _checksum(e: DataFrame):
    # bit_xor: order-insensitive and overflow-free under ANSI mode (the
    # edge set is distinct, so xor-cancellation of duplicates is moot)
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
    ).collect()[0]
    return (row.c, row.h)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """Label every vertex of ``edges`` with the minimum vertex id of its
    connected component. Returns ``(node, comp)`` — one row per distinct
    vertex that appears in the edge list (isolated vertices never appear;
    callers owning a vertex table can left-join and ``coalesce(comp,
    node)``).

    Vertex ids may be any orderable type (the min-id is the canonical
    component representative). Self-loops and duplicate/reversed edges
    are tolerated — a vertex appearing ONLY in self-loops is its own
    singleton component (the src!=dst propagation filter must not erase
    it from the output, honoring the one-row-per-vertex contract).
    """
    e_all = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    self_loops = (
        e_all.filter(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("node"))
        .distinct()
    )
    e = e_all.filter(F.col("src") != F.col("dst")).localCheckpoint()
    prev = _checksum(e)
    if prev[0] > 0:
        for _ in range(max_iter):
            e = _small_star(_large_star(e)).localCheckpoint()
            cur = _checksum(e)
            if cur == prev:
                break
            prev = cur
    # converged edge set is a star forest: src → component-min. Roots
    # appear only on the dst side — add their self-mapping.
    mapping = (
        e.select(F.col("src").alias("node"), F.col("dst").alias("comp"))
        .union(e.select(F.col("dst").alias("node"), F.col("dst").alias("comp")))
        .distinct()
    )
    lonely = self_loops.join(mapping, "node", "left_anti")
    return mapping.union(lonely.select("node", F.col("node").alias("comp")))


def dedup_by_components(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep exactly one row (the minimum id) per duplicate *component* of
    the pair graph — the exact clustering that ``minhash_dedup``'s
    one-shot pair removal approximates. Rows never mentioned in
    ``pairs`` survive untouched (left-anti against non-representatives)."""
    cc = connected_components(pairs, id_a, id_b)
    losers = cc.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def _ranked_components(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str,
    id_a: str,
    id_b: str,
) -> DataFrame:
    """Shared keep-policy ranking for :func:`dedup_keep_best` and
    :func:`dup_provenance`: ``(comp, node, _rn)`` with ``_rn = 1`` on
    the representative (max score, ties → min id; NULL/absent scores
    last). ONE definition, so the survivor set and the audit mapping
    cannot disagree about who was kept."""
    from pyspark.sql import Window

    cc = connected_components(pairs, id_a, id_b)
    scored = cc.join(
        df.select(F.col(id_col).alias("node"), F.col(score_col).alias("_s")),
        "node",
        "left",
    )
    w = Window.partitionBy("comp").orderBy(
        F.col("_s").desc_nulls_last(), F.col("node").asc()
    )
    return scored.withColumn("_rn", F.row_number().over(w)).select(
        "comp", "node", "_rn"
    )


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep the HIGHEST-``score_col`` row per duplicate component (ties →
    minimum id) — canonical-document selection, the form of near-dup
    removal production corpora actually ship: inside a duplicate chain
    you keep the best-quality copy, not an arbitrary/min-id one.

    Rows never mentioned in ``pairs`` survive untouched. A pair-graph id
    missing from ``df`` simply loses (NULL score sorts last), so stale
    edges cannot resurrect deleted rows.

    100 TB shape: the component table holds only duped nodes (typically
    a small fraction of the corpus), so the score join, the per-component
    rank window, and its sort all shuffle that small table — the full
    corpus is touched only by the final id-keyed left-anti join. (The
    ``rn > 1`` losers filter cannot plan as WindowGroupLimit — every
    row's rank is consumed — but the sort it pays is per-component over
    dup nodes only, never corpus-wide.)
    """
    ranked = _ranked_components(df, id_col, pairs, score_col, id_a, id_b)
    losers = ranked.filter(F.col("_rn") > 1).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def dup_provenance(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Audit table for component dedup: one row ``(dropped_id, kept_id)``
    per REMOVED duplicate, naming the representative that replaced it —
    the provenance record a compliance/debugging pass needs after
    :func:`dedup_by_components` (``score_col=None``: representative =
    min id) or :func:`dedup_keep_best` (representative = argmax score,
    ties → min id; the SAME ranking, so the two outputs compose
    exactly).

    Same 100 TB shape as the dedup ops: everything here shuffles only
    the dup-node component table; the corpus is never touched (callers
    join back on ``dropped_id``/``kept_id`` if they need payloads).
    """
    if score_col is None:
        cc = connected_components(pairs, id_a, id_b)
        return (
            cc.filter(F.col("node") != F.col("comp"))
            .select(
                F.col("node").alias("dropped_id"),
                F.col("comp").alias("kept_id"),
            )
        )
    ranked = _ranked_components(df, id_col, pairs, score_col, id_a, id_b)
    winners = ranked.filter(F.col("_rn") == 1).select(
        "comp", F.col("node").alias("kept_id")
    )
    return (
        ranked.filter(F.col("_rn") > 1)
        .select("comp", F.col("node").alias("dropped_id"))
        .join(winners, "comp")
        .select("dropped_id", "kept_id")
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    round_decimals: int | None = 6,
) -> DataFrame:
    """PageRank over a directed edge DataFrame: ``(node, rank)``.

    Power iteration, normalized to sum≈1: each round distributes every
    node's rank over its out-edges (one join keyed on ``src``),
    aggregates contributions by target (one hash agg keyed on ``dst``),
    and applies the damping teleport. Dangling nodes' (no out-edges)
    rank re-enters through the teleport term uniformly — the standard
    simplification; ranks are renormalized each round so the total
    stays 1 regardless.

    Scale shape per round: ONE shuffle join (ranks ⋈ out-degree edges,
    both keyed on the node) + ONE keyed hash agg with map-side partials
    — the same cost profile as the connected-components rounds, with
    ``localCheckpoint`` truncating lineage per iteration. A hot page
    (high in-degree) is a skewed AGGREGATION key, which partial
    aggregation flattens before the exchange — not a join hot spot.
    Fixed ``iters`` keeps the plan deterministic, and the dangling-mass
    renormalization folds into the plan as a broadcast 1-row total — the
    eager ``localCheckpoint`` is the only action per round;
    ``round_decimals`` pins float summation order so results are
    engine-reproducible.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # checkpoint ONCE: without it the scan + distinct + degree agg +
    # join rebuild from source on EVERY round (the loop's lineage would
    # re-derive `out` iters times — the docstring's one-join-per-round
    # cost only holds with the build materialized)
    out = e.join(deg, "src").localCheckpoint()  # (src, dst, _deg)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            out.join(ranks, out["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        raw = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    (1.0 - damping) / n_nodes
                    + damping * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
            # cached so the total branch and the renormalize branch
            # below share ONE computation of the contribution subtree
            # (the crossJoin plan otherwise contains it twice per round)
            .persist()
        )
        # renormalize (dangling mass) via a broadcast 1-row total —
        # stays in-plan, so the eager localCheckpoint is the round's
        # ONLY action (no separate driver collect round-trip)
        total = raw.agg(F.sum("rank").alias("_total"))
        ranks = (
            raw.crossJoin(F.broadcast(total))
            .select("node", (F.col("rank") / F.col("_total")).alias("rank"))
            .localCheckpoint()
        )
        raw.unpersist()
    if round_decimals is not None:
        ranks = ranks.withColumn("rank", F.round("rank", round_decimals))
    return ranks
