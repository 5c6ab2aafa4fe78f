"""The JSON "union" value type — Spark representation.

The reference models dynamically-typed JSON values as an Arrow sparse union
of 7 members (reference: src/common_union.rs:78-205). Arrow unions don't
round-trip through shuffles or Parquet (the reference grew
``json_union_to_text`` precisely because Parquet rejects unions —
reference: src/json_union_to_text.rs:25-27), so the Spark-native
representation is a tagged struct (SURVEY.md §7.2):

    STRUCT<type_id TINYINT, bool BOOLEAN, int BIGINT, float DOUBLE,
           str STRING, array STRING, object STRING>

type_id values match the reference's union type-id constants (reference:
src/common_union.rs:176-182). The null arm (JSON null AND lookup-miss —
both collapse, reference: src/common_union.rs:53) is normalized to a
WHOLE-STRUCT NULL at the Column-API layer so that ``IS NULL`` behaves like
the reference's union-null (reference: tests/main.rs:1612-1729), matching
the dictionary null-masking intent of src/common.rs:587-598. Struct rows
with ``type_id = 0`` (possible via the SQL-registered surface, where no
JVM-side rewrap happens) are treated as null-arm by every consumer here.

This struct round-trips through Parquet, shuffles, and Arrow batches in
every Spark version — no custom datasource or Catalyst type needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "UNION_SCHEMA",
    "UNION_DDL",
    "TYPE_ID_NULL",
    "TYPE_ID_BOOL",
    "TYPE_ID_INT",
    "TYPE_ID_FLOAT",
    "TYPE_ID_STR",
    "TYPE_ID_ARRAY",
    "TYPE_ID_OBJECT",
    "mask_null_arm",
    "union_container_text",
    "json_is_null",
    "format_union_value",
]

TYPE_ID_NULL = 0
TYPE_ID_BOOL = 1
TYPE_ID_INT = 2
TYPE_ID_FLOAT = 3
TYPE_ID_STR = 4
TYPE_ID_ARRAY = 5
TYPE_ID_OBJECT = 6

UNION_SCHEMA = T.StructType(
    [
        T.StructField("type_id", T.ByteType()),
        T.StructField("bool", T.BooleanType()),
        T.StructField("int", T.LongType()),
        T.StructField("float", T.DoubleType()),
        T.StructField("str", T.StringType()),
        T.StructField("array", T.StringType()),
        T.StructField("object", T.StringType()),
    ]
)

UNION_DDL = (
    "struct<type_id:tinyint,bool:boolean,int:bigint,float:double,"
    "str:string,array:string,object:string>"
)


def mask_null_arm(u: Column) -> Column:
    """Normalize null-arm rows (type_id=0) to a whole-struct NULL — the
    Spark equivalent of the reference's dictionary null-masking
    (reference: src/common.rs:587-598), giving ``IS NULL`` parity with the
    union's null member (reference: tests/main.rs:1710-1729).

    JVM-side CASE; cheap, stays inside whole-stage codegen.
    """
    return F.when(u.getField("type_id") == TYPE_ID_NULL, F.lit(None).cast(UNION_DDL)).otherwise(u)


def union_container_text(u: Column) -> Column:
    """Raw JSON text of the union's container members — used to continue a
    path lookup into a union value (reference: src/common_union.rs:49-57
    ``nested_json_array`` extracts only array/object members; scalar
    members yield NULL => nested lookup misses)."""
    return F.coalesce(u.getField("array"), u.getField("object"))


def json_is_null(u: Column) -> Column:
    """True when the union value is the null arm (JSON null or lookup
    miss) — the reference's ``IS NULL`` semantics on the union
    (reference: tests/main.rs:1612-1729)."""
    return u.isNull() | u.getField("type_id").isNull() | (u.getField("type_id") == TYPE_ID_NULL)


def format_union_value(row) -> str:
    """Display formatter mirroring the reference test harness's union
    rendering: ``{str=abc}``, ``{int=1}``, ``{null=}`` … (reference:
    tests/main.rs golden tables). For tests/debugging only — not engine
    behavior."""
    if row is None:
        return "{null=}"
    tid = row["type_id"]
    if tid is None or tid == TYPE_ID_NULL:
        return "{null=}"
    if tid == TYPE_ID_BOOL:
        return "{bool=%s}" % ("true" if row["bool"] else "false")
    if tid == TYPE_ID_INT:
        return "{int=%d}" % row["int"]
    if tid == TYPE_ID_FLOAT:
        v = float(row["float"])
        if v != v:
            return "{float=NaN}"  # Rust Display casing
        if v in (float("inf"), float("-inf")):
            return "{float=%sinf}" % ("-" if v < 0 else "")
        return "{float=%s}" % (int(v) if v.is_integer() else v)
    if tid == TYPE_ID_STR:
        return "{str=%s}" % row["str"]
    if tid == TYPE_ID_ARRAY:
        return "{array=%s}" % row["array"]
    if tid == TYPE_ID_OBJECT:
        return "{object=%s}" % row["object"]
    return "{null=}"
