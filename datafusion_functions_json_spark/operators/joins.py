"""Temporal joins the built-in operator set lacks: as-of join.

An as-of join attaches, to every left row, the payload of the nearest
right row for the same key at-or-before (``backward``) or at-or-after
(``forward``) the left timestamp — the canonical time-series enrichment
(trades→quotes, events→latest-order). Spark has no ASOF JOIN; a naive
encoding is a non-equi range join (O(n·m) per key or a broadcast-only
plan). This implementation is the distributed merge formulation:

1. tag both sides and UNION them (right rows carry their payload as one
   struct column, left rows carry a typed null),
2. hash-partition by the join key and sort each partition by
   ``(ts, side-tag)`` — exactly one shuffle per side, the same cost
   profile as a sort-merge equi-join, and
3. a running ``last(payload, ignorenulls=True)`` window over
   ``rows between unbounded preceding and current row`` lands the
   nearest right payload on every left row in O(n) per partition.

Pure Catalyst: no UDF, no per-key loop, no cross product, no collect.
At 100 TB the plan is shuffle+sort+window — AQE's skew-split applies to
the exchange, and a hot key degrades to a big sorted partition rather
than an n×m blow-up. Inclusive-bound tie handling rides the sort order
(right-before-left at equal timestamps for ``>=``, after for ``>``), so
semantics match DuckDB/kdb ``asof`` including equal-timestamp matches.

Null semantics mirror SQL comparisons: right rows with a null key or
null timestamp can never match and are dropped; left rows with a null
key or timestamp survive with a null payload (left-join contract).
Among right rows tied on (key, timestamp) the matched payload is one of
the tied rows (unspecified which — same contract as DuckDB ASOF); pass
``tiebreak`` columns to make the pick deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join", "salted_join", "bloom_prefilter_join"]


def _epoch_seconds(df: DataFrame, colname: str) -> "F.Column":
    """``colname`` as epoch seconds (double). Numeric columns cast
    directly; TIMESTAMP/DATE go through a TIMESTAMP cast first (Spark
    forbids TIMESTAMP_NTZ→DOUBLE; NTZ→TIMESTAMP interprets in the
    session time zone — a fixed offset per session, so the bucketing
    and the refine predicate stay mutually consistent, and ordering
    matches a native NTZ comparison under any fixed-offset zone)."""
    dt = df.schema[colname].dataType
    c = F.col(colname)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        c = c.cast("timestamp")
    return c.cast("double")


def _normalize_on(on):
    """-> list of (left_col, right_col) pairs."""
    if isinstance(on, str):
        return [(on, on)]
    pairs = []
    for item in on:
        if isinstance(item, str):
            pairs.append((item, item))
        else:
            lc, rc = item
            pairs.append((lc, rc))
    return pairs


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    payload,
    *,
    direction: str = "backward",
    allow_exact: bool = True,
    tiebreak=None,
    prefix: str = "",
) -> DataFrame:
    """As-of join ``left`` to ``right``.

    Parameters
    ----------
    on : str | list[str] | list[(left_col, right_col)]
        Equi-join key(s); pair form when the sides name them differently.
    left_ts / right_ts : str
        Ordering (timestamp or any orderable) column on each side.
    payload : list[str]
        Right-side columns to attach. ``right_ts`` may be included to
        expose the matched timestamp.
    direction : "backward" | "forward"
        backward = nearest right at-or-before the left timestamp
        (``left_ts >= right_ts``); forward = nearest at-or-after.
    allow_exact : bool
        Include equal timestamps (``>=``/``<=``); False makes the bound
        strict (``>``/``<``).
    tiebreak : list[str] | None
        Extra right-side sort columns breaking (key, ts) ties
        deterministically (ascending; the LAST row in this order wins).
    prefix : str
        Prefix for the attached payload column names (collision escape).

    Returns the left rows (all columns, original order within each
    partition-key group not guaranteed) plus one ``prefix + name``
    column per payload entry, null where no right row qualifies.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    pairs = _normalize_on(on)
    lkeys = [lc for lc, _ in pairs]
    payload = list(payload)
    tiebreak = list(tiebreak or [])

    # Right side: keys renamed to the left's names; payload as one struct.
    # Tiebreak columns ride inside the struct tail so the window's
    # last() over the refined sort picks the intended row.
    right_sel = [F.col(rc).alias(lc) for lc, rc in pairs]
    right_sel.append(F.col(right_ts).alias("__ats"))
    right_sel.append(F.struct(*[F.col(c) for c in payload]).alias("__pay"))
    right_sel.extend(F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak))
    r = right.select(*right_sel)
    # null key / null ts right rows can never match (SQL comparison
    # semantics); drop them before the shuffle
    cond = F.col("__ats").isNotNull()
    for k in lkeys:
        cond = cond & F.col(k).isNotNull()
    r = r.filter(cond)
    pay_type = r.schema["__pay"].dataType

    # Sort-tag encodes the bound: at equal timestamps, inclusive bounds
    # want the right row BEFORE the left row (so the running last() has
    # seen it), strict bounds after.
    right_tag = 0 if allow_exact else 2
    r = r.withColumn("__tag", F.lit(right_tag))

    lcols = left.columns
    left_sel = [F.col(c) for c in lcols]
    left_sel.append(F.col(left_ts).alias("__ats"))
    left_sel.append(F.lit(None).cast(pay_type).alias("__pay"))
    left_sel.extend(
        F.lit(None).cast(r.schema[f"__tb{i}"].dataType).alias(f"__tb{i}")
        for i in range(len(tiebreak))
    )
    l = left.select(*left_sel).withColumn("__tag", F.lit(1))

    # union by name: right rows carry nulls for the left's non-key columns
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("__ats").asc_nulls_first()]
    else:
        order = [F.col("__ats").desc_nulls_first()]
    order.append(F.col("__tag").asc())
    order.extend(F.col(f"__tb{i}").asc_nulls_first() for i in range(len(tiebreak)))
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w))

    out = matched.filter(F.col("__tag") == 1).select(
        *lcols,
        *[F.col("__m")[c].alias(prefix + c) for c in payload],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    payload,
    *,
    on=None,
    bucket_seconds: float = 3600.0,
    prefix: str = "",
) -> DataFrame:
    """Point-in-interval join: each point row is paired with every
    interval row (same equi key, if given) whose half-open window
    ``[start_ts, end_ts)`` contains the point — 1:N inner-join output.

    Spark plans a bare ``p.ts >= i.s AND p.ts < i.e`` predicate as a
    BroadcastNestedLoopJoin (O(n·m) work, broadcast-only). This is the
    bucketized formulation instead: intervals explode to one row per
    covered time bucket (``sequence`` of ``floor(epoch/width)``), points
    compute their single bucket, both sides hash-shuffle on
    ``(keys…, bucket)``, and the exact predicate refines after the
    equi-join. A (point, interval) pair meets in exactly ONE bucket (the
    point's), so no dedup is needed. At 100 TB that is the plan you
    want: two keyed shuffles + a hash join, AQE-splittable, no
    broadcast requirement and no quadratic corner.

    ``bucket_seconds`` should be on the order of the TYPICAL interval
    length: the explode factor is ``ceil(len/width)+1`` per interval (a
    pathological interval spanning millions of buckets will fail loudly
    in ``sequence``'s length check rather than silently flooding).

    Interval rows with a null key, start, or end never match and are
    dropped; point rows only appear in the output when matched (inner
    join; compose with a left anti-join for the unmatched set).
    """
    pairs = _normalize_on(on) if on is not None else []
    lkeys = [lc for lc, _ in pairs]
    payload = list(payload)
    if bucket_seconds <= 0:
        raise ValueError(
            f"bucket_seconds must be positive, got {bucket_seconds} "
            "(zero would floor(inf) inside the plan; negative would "
            "misalign every bucket)"
        )
    w = float(bucket_seconds)

    isel = [F.col(rc).alias(lc) for lc, rc in pairs]
    isel.append(_epoch_seconds(intervals, start_ts).alias("__s"))
    isel.append(_epoch_seconds(intervals, end_ts).alias("__e"))
    isel.append(F.struct(*[F.col(c) for c in payload]).alias("__pay"))
    iv = intervals.select(*isel)
    cond = F.col("__s").isNotNull() & F.col("__e").isNotNull() & (
        F.col("__s") < F.col("__e")
    )
    for k in lkeys:
        cond = cond & F.col(k).isNotNull()
    iv = iv.filter(cond).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / w).cast("long"),
                # end is exclusive, but a window ending exactly on a
                # boundary just explodes one refinable extra bucket
                F.floor(F.col("__e") / w).cast("long"),
            )
        ),
    )

    pts = points.withColumn("__p", _epoch_seconds(points, point_ts)).withColumn(
        "__bucket", F.floor(F.col("__p") / w).cast("long")
    )

    join_cond = pts["__bucket"] == iv["__bucket"]
    for k in lkeys:
        join_cond = join_cond & (pts[k] == iv[k])
    joined = pts.join(iv, join_cond, "inner").filter(
        (pts["__p"] >= iv["__s"]) & (pts["__p"] < iv["__e"])
    )
    return joined.select(
        *[pts[c] for c in points.columns],
        *[iv["__pay"][c].alias(prefix + c) for c in payload],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on,
    *,
    how: str = "inner",
    salts: int = 16,
    salt_on: list | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: ``left`` (the big, possibly skewed side)
    is salted into ``salts`` sub-keys and ``right`` is replicated once
    per salt, so a hot join key fans out across ``salts`` reducers
    instead of melting one. Output is row-for-row identical to
    ``left.join(right, on, how)``.

    This is the classic manual salting pattern for when AQE's skew-join
    split cannot help: AQE only splits SORT-MERGE join partitions after
    seeing runtime sizes, and cannot split an aggregation-fed exchange
    or help a shuffle-hash join executor that OOMs before AQE sees it.
    Cost model: right side is materialized ``salts`` times into the
    shuffle (size_right × salts bytes) — use it when right is too big
    to broadcast but small enough to replicate; keep ``salts`` at the
    hot-key multiplicity you need to flatten, not higher.

    The salt must be DETERMINISTIC per left row across task retries —
    a random salt inside a shuffle can lose/duplicate rows when a stage
    partially recomputes. Default salt hashes all left columns; pass
    ``salt_on`` (e.g. a unique id) to make it a cheap single-column
    hash.

    ``how`` is restricted to left-preserving joins (``inner``, ``left``,
    ``left_semi``, ``left_anti``): the replicated right side would emit
    ``salts`` copies of every unmatched right row under right/full
    joins.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r}"
        )
    if salts < 2:
        raise ValueError("salts must be >= 2")
    pairs = _normalize_on(on)
    salt_cols = [F.col(c) for c in (salt_on or left.columns)]
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salts)).cast("int")
    )
    r = right.withColumn(
        "__rsalt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    cond = l["__salt"] == r["__rsalt"]
    for lc, rc in pairs:
        cond = cond & (l[lc] == r[rc])
    out = l.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return out.drop("__salt")
    out = out.drop(l["__salt"]).drop(r["__rsalt"])
    # same-named keys: keep only the left side's copy, like join(on=str)
    same = [lc for lc, rc in pairs if lc == rc]
    for k in same:
        out = out.drop(r[k])
    if same:
        # plain join(on=str) HOISTS the key columns first; mirror that
        # ordering so this really is the drop-in replacement the
        # contract claims (positional consumers — union, insertInto —
        # would otherwise silently misalign)
        left_rest = [c for c in left.columns if c not in same]
        right_rest = [c for c in right.columns if c not in same]
        out = out.select(
            *[l[k] for k in same],
            *[l[c] for c in left_rest],
            *[r[c] for c in right_rest],
        )
    return out


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on,
    *,
    how: str = "inner",
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    max_build_rows: int = 50_000_000,
) -> DataFrame:
    """Join with a Bloom-filter pre-pass on the big side — the classic
    100 TB shuffle reducer for selective joins where the small side is
    too LARGE to broadcast as exact keys but its Bloom filter is a few
    MBs. The big side drops rows whose join key cannot possibly match
    BEFORE the join's exchange, so shuffle volume scales with the
    match rate instead of the corpus. The result is EXACTLY the plain
    ``big.join(small, on, how)``: the filter only has false positives,
    and the real join removes them (hence ``how`` is restricted to
    inner/semi shapes — an outer/anti join would need the dropped
    rows).

    Engine-consistent hashing: both sides hash the key JVM-side with
    ``xxhash64`` (h1) and ``xxhash64(key, 1)`` (h2); probe positions
    are double-hashed ``(h1 + i*h2) mod num_bits`` in uint64 numpy
    arithmetic, identical in the build and probe paths. The build
    collects the small side's DISTINCT (h1, h2) pairs driver-side —
    16 bytes per distinct key, guarded by ``max_build_rows`` (beyond
    it you want Spark's own runtime row-level filtering / a plain
    shuffle join, not a driver bitmap); the probe ships one
    ``num_bits/8``-byte bitmap per executor via broadcast and tests
    membership in one Arrow-batched numpy pass.

    False-positive rate ~ (1 - e^(-k*n/m))^k; the 1 MiB default
    (2^23 bits, k=5) holds ~1 M keys under 1% FP. Size ``num_bits``
    ~10x the distinct-key count for that regime.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/semi joins, got {how!r}: "
            "outer/anti shapes need the rows the prefilter drops"
        )
    if isinstance(on, str):
        big_key, small_key = on, on
    else:
        big_key, small_key = on

    # xxhash64 is TYPE-sensitive (an int and a long holding the same
    # value hash differently) while the join's equality coerces — so
    # mismatched key widths must hash through one common type on BOTH
    # sides or every true match silently misses the bitmap (false
    # negatives, breaking the exactness contract). Coerce the common
    # integral/fractional cases; refuse exotic mixes loudly.
    dt_big = dict(big.dtypes)[big_key]
    dt_small = dict(small.dtypes)[small_key]
    common = None
    if dt_big != dt_small:
        integral = {"tinyint", "smallint", "int", "bigint"}
        numeric = integral | {"float", "double"}
        if dt_big in integral and dt_small in integral:
            common = "bigint"
        elif dt_big in numeric and dt_small in numeric:
            common = "double"
        else:
            raise ValueError(
                f"join key types differ ({big_key}: {dt_big} vs "
                f"{small_key}: {dt_small}) and cannot be safely hash-"
                "coerced; cast them to one type before "
                "bloom_prefilter_join"
            )

    def _hash_pair(col):
        c = F.col(col) if isinstance(col, str) else col
        if common is not None:
            c = c.cast(common)
        return F.xxhash64(c), F.xxhash64(c, F.lit(1))

    # build: distinct key hashes from the small side, JVM-computed.
    # NULL keys are dropped BEFORE hashing (xxhash64(NULL) returns the
    # seed, not NULL — a post-hash null check is dead code) so the
    # bitmap never admits big-side NULL keys, which can't join anyway.
    sh1, sh2 = _hash_pair(small_key)
    hashes = (
        small.where(F.col(small_key).isNotNull())
        .select(sh1.alias("_h1"), sh2.alias("_h2"))
        .distinct()
        .persist()  # count() guards, toPandas() collects: one compute
    )
    try:
        n_keys = hashes.count()
        if n_keys > max_build_rows:
            raise ValueError(
                f"small side has {n_keys} distinct keys, over the "
                f"{max_build_rows} driver-side build bound — at that size "
                "use a plain shuffle join (AQE) instead of a driver-built "
                "bloom"
            )
        pdf = hashes.toPandas()
    finally:
        hashes.unpersist()
    m = int(num_bits)
    bits = np.zeros(m, dtype=bool)
    h1 = pdf["_h1"].to_numpy().astype(np.uint64)
    h2 = pdf["_h2"].to_numpy().astype(np.uint64)
    for i in range(num_hashes):
        bits[((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)] = True
    bc = big.sparkSession.sparkContext.broadcast(np.packbits(bits))
    k = num_hashes

    @F.pandas_udf("boolean")
    def _might_contain(a: pd.Series, b: pd.Series) -> pd.Series:
        bm = bc.value  # PACKED bitmap: test bits in place — unpacking
        # 8x per Arrow batch on the hot probe path is allocation churn
        ha = a.to_numpy().astype(np.uint64)
        hb = b.to_numpy().astype(np.uint64)
        keep = np.ones(len(ha), dtype=bool)
        for i in range(k):
            idx = ((ha + np.uint64(i) * hb) % np.uint64(m)).astype(np.int64)
            keep &= ((bm[idx >> 3] >> (7 - (idx & 7))) & 1).astype(bool)
        return pd.Series(keep)

    # optimizer fence, not a semantic claim (membership is pure):
    # without it Catalyst's join-condition inference COPIES the bloom
    # predicate onto the small side too — every small-side row tested
    # against its own filter, pure waste. Fenced, the filter stays
    # exactly where the algorithm puts it: on the big side, above its
    # scan filters, below the join.
    bh1, bh2 = _hash_pair(big_key)
    pref = big.filter(_might_contain.asNondeterministic()(bh1, bh2))
    cond = pref[big_key] == small[small_key] if big_key != small_key else big_key
    return pref.join(small, cond, how)
