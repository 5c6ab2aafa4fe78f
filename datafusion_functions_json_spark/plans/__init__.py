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
