"""SQL-surface registration — the Spark analog of the reference's
``register_all`` (reference: src/lib.rs:69-96): 13 functions + the 3
aliases (``json_len``, ``json_keys``, ``scalar_to_json``).

Spark SQL has no ``->``/``->>``/``?`` operators and PySpark has no parser
hooks (SURVEY.md §2.2), so SQL users call the named functions:

    SELECT json_get_str(props, 'k'), count(*)
    FROM events WHERE json_contains(props, 'k') GROUP BY 1

Deltas from the Python API, inherent to the SQL boundary (documented,
SURVEY.md §7.4):

* literal-vs-column path elements can't be told apart inside a UDF, so a
  NULL path literal yields NULL rows rather than the reference's plan
  error, and the one-column-path-element restriction is not enforced;
* ``json_get`` returns the union struct with ``type_id = 0`` null-arm
  rows (no JVM-side rewrap around a SQL UDF call site); use
  ``json_is_null``/``json_union_to_text`` which treat it as NULL.
"""

from __future__ import annotations

import itertools

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .functions import kernels, udfs
from .functions.udfs import RETURN_TYPES
from .union import UNION_DDL

__all__ = ["register_all"]

_SQL_KERNELS = {
    "json_get": kernels.kernel_json_get,
    "json_get_str": kernels.kernel_json_get_str,
    "json_get_int": kernels.kernel_json_get_int,
    "json_get_float": kernels.kernel_json_get_float,
    "json_get_bool": kernels.kernel_json_get_bool,
    "json_get_json": kernels.kernel_json_get_json,
    "json_get_array": kernels.kernel_json_get_array,
    "json_as_text": kernels.kernel_json_as_text,
    "json_contains": kernels.kernel_json_contains,
    "json_length": kernels.kernel_json_length,
    "json_object_keys": kernels.kernel_json_object_keys,
}


def _elem(v):
    if v is None or v != v:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return None
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _make_sql_udf(fn_key: str):
    kernel = _SQL_KERNELS[fn_key]
    ret = RETURN_TYPES[fn_key]
    # Bind concrete functions, NOT the udfs module: module objects holding
    # lru_cache wrappers pickle by qualified-name import, which breaks on
    # workers without this package on sys.path.
    wrap = udfs._wrap_result
    elem = _elem

    def _paths(key_cols):
        if not key_cols:
            return itertools.repeat(())
        cols = [[elem(v) for v in k] for k in key_cols]
        return list(zip(*cols))

    def _json_text(js):
        # Union-struct first argument (nested SQL call like
        # json_get(json_get(j,'a'),'b')): continue the lookup through the
        # container members, like the reference's nested_json_array
        # (reference: src/common_union.rs:49-57). Scalar members => NULL
        # => nested lookup misses.
        if isinstance(js, pd.DataFrame):
            return js["array"].combine_first(js["object"])
        return js

    if fn_key == "json_get":

        def fn(js: pd.Series, *key_cols: pd.Series) -> pd.DataFrame:
            return wrap(fn_key, kernel(_json_text(js), _paths(key_cols)))

    else:

        def fn(js: pd.Series, *key_cols: pd.Series) -> pd.Series:
            return wrap(fn_key, kernel(_json_text(js), _paths(key_cols)))

    fn.__name__ = fn_key
    return F.pandas_udf(fn, ret)


def _from_scalar_udf():
    """SQL-surface json_from_scalar: per-value python-type dispatch (the
    SQL boundary erases static types; the reference dispatches on the
    Arrow type at plan time — same arms, reference:
    src/json_from_scalar.rs:48-68)."""
    import numpy as _np

    def classify(v):
        none7 = (None, None, None, None, None, None)
        if v is None:
            return (None,) + none7[:6]
        if isinstance(v, (bool, _np.bool_)):
            return (1, bool(v), None, None, None, None, None)
        if isinstance(v, (int, _np.integer)):
            return (2, None, int(v), None, None, None, None)
        if isinstance(v, (float, _np.floating)):
            if v != v:  # NaN from a nullable int column means NULL
                return (None,) + none7[:6]
            return (3, None, None, float(v), None, None, None)
        if isinstance(v, str):
            return (4, None, None, None, v, None, None)
        return (None,) + none7[:6]

    def fn(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [classify(v) for v in s],
            columns=["type_id", "bool", "int", "float", "str", "array", "object"],
            dtype=object,
        )

    fn.__name__ = "json_from_scalar"
    return F.pandas_udf(fn, UNION_DDL)


def _union_is_null_udf():
    def fn(u: pd.DataFrame) -> pd.Series:
        tid = u["type_id"]
        return (tid.isna() | (tid == 0)).astype(bool)

    fn.__name__ = "json_is_null"
    return F.pandas_udf(fn, "boolean")


def register_all(spark: SparkSession) -> None:
    """Register every JSON function for the SQL surface (reference:
    src/lib.rs:69-96 — aliases included)."""
    names = {}
    for fn_key in _SQL_KERNELS:
        names[fn_key] = _make_sql_udf(fn_key)
    names["json_len"] = names["json_length"]  # reference: src/json_length.rs:29
    names["json_keys"] = names["json_object_keys"]  # src/json_object_keys.rs:29
    names["json_union_to_text"] = udfs.union_to_text_udf()
    names["json_is_null"] = _union_is_null_udf()
    names["json_from_scalar"] = _from_scalar_udf()
    names["scalar_to_json"] = names["json_from_scalar"]  # src/json_from_scalar.rs:31
    for name, udf in names.items():
        spark.udf.register(name, udf)
