"""Data-quality constraint validation — the gate a training pipeline
runs before consuming a corpus (Deequ-style, Spark-first): declare
row-level constraints, get one result row per constraint with the
violation metric and a pass flag.

Scale shape: EVERY constraint compiles into the SAME single global
aggregation — one scan, map-side partial aggregates, a 1-row reduce —
then a plan-time explode fans the metrics out to one row per check. No
per-check passes, no driver-side loops over data; ``unique`` adds a
distinct count (two-phase Expand) inside the same agg. At 100 TB this
is the cost of one ``count(*)``, regardless of how many constraints are
declared.

Check specs (tuples, first element is the kind):

* ``("not_null", col)`` — metric: NULL count;
* ``("unique", col)`` — metric: ``count - countDistinct`` over non-null
  values (duplicate surplus);
* ``("min_value", col, lo)`` / ``("max_value", col, hi)`` — metric:
  rows below / above the bound (NULLs don't count; pair with
  ``not_null``);
* ``("between", col, lo, hi)`` — metric: rows outside [lo, hi];
* ``("in_set", col, values)`` — metric: non-null rows outside the set;
* ``("matches", col, regex)`` — metric: non-null rows not matching
  (write patterns in the Java-regex/RE2 common subset so any engine
  reproduces them — same rule as text.PII_PATTERNS).

A constraint passes iff its metric is 0, so the result is trivially
oracle-checkable: each metric is one ANSI-SQL aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints", "CHECK_KINDS"]

CHECK_KINDS = ("not_null", "unique", "min_value", "max_value", "between", "in_set", "matches")


def _violations(spec):
    """(label, violation-count Column) for one check spec."""
    kind, col = spec[0], spec[1]
    c = F.col(col)
    if kind == "not_null":
        return F.count(F.when(c.isNull(), F.lit(1)))
    if kind == "unique":
        return F.count(c) - F.countDistinct(c)
    if kind == "min_value":
        return F.count(F.when(c < F.lit(spec[2]), F.lit(1)))
    if kind == "max_value":
        return F.count(F.when(c > F.lit(spec[2]), F.lit(1)))
    if kind == "between":
        lo, hi = spec[2], spec[3]
        return F.count(F.when((c < F.lit(lo)) | (c > F.lit(hi)), F.lit(1)))
    if kind == "in_set":
        return F.count(F.when(c.isNotNull() & ~c.isin(list(spec[2])), F.lit(1)))
    if kind == "matches":
        return F.count(F.when(c.isNotNull() & ~c.rlike(spec[2]), F.lit(1)))
    raise ValueError(f"unknown check kind {spec[0]!r}; expected one of {CHECK_KINDS}")


def check_constraints(df: DataFrame, checks) -> DataFrame:
    """Validate ``checks`` (see module doc) in ONE aggregation pass.

    Returns ``(check, target, violations, passed)`` with one row per
    constraint, in declaration order (add an ``orderBy`` only if a
    global sort is genuinely wanted — the driver/oracle comparison is
    order-insensitive).
    """
    checks = list(checks)
    if not checks:
        raise ValueError("at least one check is required")
    aggs = []
    for i, spec in enumerate(checks):
        if spec[0] not in CHECK_KINDS:
            raise ValueError(
                f"unknown check kind {spec[0]!r}; expected one of {CHECK_KINDS}"
            )
        aggs.append(_violations(spec).cast("bigint").alias(f"_m{i}"))
    row = df.agg(*aggs)
    out = F.array(
        *(
            F.struct(
                F.lit(str(spec[0])).alias("check"),
                F.lit(str(spec[1])).alias("target"),
                F.col(f"_m{i}").alias("violations"),
                (F.col(f"_m{i}") == 0).alias("passed"),
            )
            for i, spec in enumerate(checks)
        )
    )
    return row.select(F.explode(out).alias("_r")).select("_r.*")
