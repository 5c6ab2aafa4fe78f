"""Plan inspection helpers — the Spark analog of the reference's
plan-shape test utilities (reference: tests/utils/mod.rs:283-288 captures
EXPLAIN output for assertions). Used by our tests and by users checking
that pushdown/codegen happened."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "arrow_eval_count",
    "has_pushed_filter",
    "plan_size_bytes",
    "wholestage_codegen_spans",
]


def explain_str(df: DataFrame, mode: str = "simple") -> str:
    """EXPLAIN output as a string (simple mode lists each node once)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        if mode == "simple":
            df.explain()
        else:
            df.explain(mode)
    return buf.getvalue()


def plan_size_bytes(df: DataFrame):
    """The optimizer's ``sizeInBytes`` estimate for ``df`` — free (no
    action; file sources report summed file size). This is the shared
    input-size statistic behind every ``'auto'`` tier choice
    (``cosine_topk(impl='auto')``, ``json_extract_multi(tier='auto')``).

    Returns ``None`` when the JVM plan stats are unreachable — notably
    under **Spark Connect**, where ``df._jdf`` does not exist. Callers
    MUST treat ``None`` as "large/unknown" and take their conservative
    tier: the large-input code path is never catastrophically wrong on
    small inputs, the reverse is."""
    try:
        sz = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
    # Long.MaxValue is Catalyst's "statistics unknown" sentinel (e.g.
    # some local relations) — report it as unknown, not as a real size
    return None if sz >= (1 << 63) - 1 else sz


def arrow_eval_count(df: DataFrame) -> int:
    """Number of ArrowEvalPython nodes — each is one JVM→Python round
    trip per batch. Our eager call un-nesting exists to keep this at 1
    for chained JSON lookups."""
    return explain_str(df).count("ArrowEvalPython")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the scan's PushedFilters contains ``fragment``."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen spans (``*(n)`` markers)."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", explain_str(df))))
