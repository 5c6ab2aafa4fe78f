"""Native tier — pure-JVM fast paths for a subset of the surface
(SURVEY.md §7.1: "native tier (where provably equivalent, used
opportunistically for speed)").

These avoid the JVM→Python Arrow hop entirely by mapping onto Spark
built-ins. They are NOT drop-in equivalent to the exact tier in every
corner; each function documents its equivalence envelope, and
tests/test_native.py pins both the agreements and the known divergences.
Use them when your data fits the envelope (the common analytics case);
the exact tier remains the default everywhere else.

Envelope summary:

* ``json_as_text_native`` — `get_json_object` with a '$.k[i]' path.
  Agrees with ``json_as_text`` for: string/int/bool values, missing
  keys, JSON null, invalid JSON. Diverges on: float reserialization
  (`4.2e-1` → `0.42`), container values (minified by Jackson, raw in the
  exact tier), keys containing '.', '[', quotes (path syntax).
* ``json_length_native`` (path-less) — coalesce of
  `json_array_length` / `size(json_object_keys)`. Agrees except:
  documents with trailing garbage (strict Jackson parse vs streaming).
* ``json_object_keys_native`` (path-less) — Spark's `json_object_keys`.
  Same envelope as above.
* ``json_get_int_native`` / ``json_get_float_native`` — get_json_object
  + try-cast. Agrees for int/float/missing/null; diverges on string
  coercions ('1.5' string → NULL in exact tier int getter, and Spark
  casts accept forms Rust rejects, e.g. whitespace).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "JsonProfile",
    "recommend_tier",
    "tier_callable",
    "jsonpath",
    "json_as_text_native",
    "json_length_native",
    "json_object_keys_native",
    "json_get_int_native",
    "json_get_float_native",
    "parse_variant",
    "variant_extract",
    "json_get_variant",
    "json_union_to_text_native",
    "json_get_int_variant",
    "json_get_str_variant",
    "json_get_float_variant",
    "json_get_bool_variant",
    "json_get_json_variant",
    "json_get_array_variant",
    "json_object_keys_variant",
    "json_length_variant",
    "json_as_text_variant",
    "json_contains_variant",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def jsonpath(path) -> str:
    """Render our variadic path model as a Spark JSONPath string.
    Raises for keys the syntax can't express (dots/brackets/quotes) —
    those need the exact tier."""
    out = "$"
    for p in path:
        if isinstance(p, str):
            if any(ch in p for ch in ".[]'\"$*"):
                raise ValueError(
                    f"key {p!r} is not expressible in JSONPath syntax; "
                    "use the exact tier"
                )
            out += f".{p}"
        else:
            i = int(p)
            if i < 0:
                raise ValueError("negative index; use the exact tier")
            out += f"[{i}]"
    return out


def json_as_text_native(json_col, *path) -> Column:
    """``->>`` via get_json_object (JVM, codegen). See envelope above."""
    return F.get_json_object(F.ltrim(_col(json_col)), jsonpath(path))


def _size(c: Column) -> Column:
    """size() that yields NULL for NULL input regardless of the
    ``spark.sql.ansi.enabled`` setting — with ANSI off, legacy
    ``sizeOfNull`` makes size(NULL) return -1, which would turn
    missing/scalar paths into -1 instead of NULL and diverge from the
    exact tier. -1 is unreachable for a real collection, so nullif is
    exact."""
    return F.nullif(F.size(c), F.lit(-1))


def json_length_native(json_col) -> Column:
    """Path-less json_length via built-ins."""
    c = F.ltrim(_col(json_col))
    return F.coalesce(
        F.json_array_length(c).cast("bigint"),
        _size(F.json_object_keys(c)).cast("bigint"),
    )


def json_object_keys_native(json_col) -> Column:
    """Path-less json_object_keys via the Spark built-in."""
    return F.json_object_keys(F.ltrim(_col(json_col)))


def json_get_int_native(json_col, *path) -> Column:
    """Int getter for documents whose values are JSON numbers (no string
    coercion parity). try_cast: NULL on mismatch even under ANSI."""
    return F.get_json_object(F.ltrim(_col(json_col)), jsonpath(path)).try_cast(
        "bigint"
    )


def json_get_float_native(json_col, *path) -> Column:
    t = F.get_json_object(F.ltrim(_col(json_col)), jsonpath(path))
    # reject bools explicitly (a cast would not, in some Spark versions)
    return F.when(~t.isin("true", "false"), t.try_cast("double"))


# ---------------------------------------------------------------- variant
# Spark 4's native VariantType: the engine's own binary JSON encoding.
# try_parse_json tolerates invalid docs (NULL); variant_get traverses with
# JSONPath and casts. Envelope: same path-syntax limits as above; string
# coercions differ from the exact tier (variant_get '123' string -> 123
# under int target); float raw text is re-encoded. Fastest JVM tier for
# repeated extraction from the same column (parse once into variant).


def parse_variant(json_col) -> Column:
    """Parse JSON text into a VariantType value (NULL for invalid)."""
    return F.try_parse_json(F.ltrim(_col(json_col)))


def variant_extract(json_col, path, dtype: str) -> Column:
    """Extract a typed value at ``path`` via the variant encoding.
    Uses ``try_variant_get``: a value that cannot cast to ``dtype``
    (e.g. an OBJECT at an int-getter path) yields NULL — the strict
    ``variant_get`` raises INVALID_VARIANT_CAST at runtime, which would
    turn a data property into a task failure and break the engine's
    never-throw contract (reference: src/common.rs:559-578)."""
    return F.try_variant_get(parse_variant(json_col), jsonpath(path), dtype)


def json_get_int_variant(json_col, *path) -> Column:
    return variant_extract(json_col, path, "bigint")


def json_get_str_variant(json_col, *path) -> Column:
    return variant_extract(json_col, path, "string")


def json_get_float_variant(json_col, *path) -> Column:
    return variant_extract(json_col, path, "double")


# one kernel, one definition: _try_variant was a byte-identical copy of
# variant_extract (both wrap try_variant_get — NULL on cast mismatch,
# the exact tier's null-on-mismatch contract); keep the internal name
# as an alias so the getter bodies below read uniformly
_try_variant = variant_extract


def json_get_bool_variant(json_col, *path) -> Column:
    return _try_variant(json_col, path, "boolean")


def json_get_json_variant(json_col, *path) -> Column:
    """``json_get_json`` on the variant tier: JSON text of the value at
    ``path``, any type. Envelope: the document is RE-SERIALIZED from the
    variant encoding (minified, Jackson rules) — ints/strings/bools/null
    and containers round-trip byte-identically to DuckDB's json_extract
    rendering, but raw-slice fidelity is lost (`4.2e-1` → `0.42`, object
    whitespace dropped); the exact tier keeps the verbatim bytes."""
    return F.to_json(_try_variant(json_col, path, "variant"))


def json_get_array_variant(json_col, *path) -> Column:
    """``json_get_array`` on the variant tier: array<string> of the
    element JSON texts at ``path`` (literal ``null`` elements render as
    'null', like the exact tier). Same re-serialization envelope as
    :func:`json_get_json_variant`; non-arrays/missing → NULL."""
    return F.transform(
        _try_variant(json_col, path, "array<variant>"),
        lambda e: F.to_json(e),
    )


def json_object_keys_variant(json_col, *path) -> Column:
    """``json_object_keys`` WITH path support on the variant tier (the
    non-variant native twin is path-less): keys in document order;
    non-objects/missing → NULL."""
    return F.map_keys(_try_variant(json_col, path, "map<string,variant>"))


_VARIANT_DTYPES = {
    "str": "string",
    "int": "bigint",
    "float": "double",
    "bool": "boolean",
    "text": "string",
}


def variant_field(v: Column, path, kind: str) -> Column:
    """Build one typed extraction over an ALREADY-PARSED variant value
    ``v`` (e.g. a lambda-bound variable) — the shared kernel behind the
    single-field twins and :func:`..multi.json_extract_multi`'s
    ``tier='variant'`` fused path, where ``v`` is bound once per row so
    the parse is never repeated per field."""
    p = jsonpath(path)
    if kind == "exists":
        return F.try_variant_get(v, p, "variant").isNotNull()
    if kind == "length":
        return F.coalesce(
            _size(F.try_variant_get(v, p, "array<variant>")).cast("bigint"),
            _size(F.try_variant_get(v, p, "map<string,variant>")).cast("bigint"),
        )
    return F.try_variant_get(v, p, _VARIANT_DTYPES[kind])


def json_get_variant(json_col, *path) -> Column:
    """``json_get`` (the union-typed ``->``) on the variant tier: the
    SAME tagged-union struct as the exact tier
    (``STRUCT<type_id, bool, int, float, str, array, object>``,
    union.py), built entirely from JVM variant expressions — type
    dispatch via ``schema_of_variant``, the parsed value lambda-bound
    once per row. Null taxonomy matches the exact tier: missing path /
    invalid doc / JSON null / integer beyond i64 ⇒ whole-struct NULL
    (the null-arm normalization of union.py).

    Envelope beyond the shared JSONPath limits: containers/floats are
    RE-SERIALIZED (minified, ``4.2e-1`` → ``0.42``) where the exact
    tier keeps raw slices, and integral JSON floats (``5.0``, ``-0.0``)
    re-encode as DECIMAL(p,0) and land in the INT arm instead of the
    float arm. Pinned in tests/test_native.py."""
    from ..union import UNION_DDL

    v = _try_variant(json_col, path, "variant")

    def build(x):
        sch = F.schema_of_variant(x)
        is_bool = sch == F.lit("BOOLEAN")
        is_int = sch == F.lit("BIGINT")
        is_dec0 = sch.rlike(r"^DECIMAL\([0-9]+,0\)$")
        is_float = (sch == F.lit("DOUBLE")) | sch.rlike(r"^DECIMAL\([0-9]+,[1-9]")
        is_str = sch == F.lit("STRING")
        is_arr = sch.startswith("ARRAY")
        is_obj = sch.startswith("OBJECT") | sch.startswith("STRUCT") | sch.startswith("MAP")
        int_arm = F.when(
            is_int | is_dec0, F.try_variant_get(x, "$", "bigint")
        )
        null_like = (
            x.isNull()
            | F.is_variant_null(x)
            | (sch == F.lit("VOID"))
            # integer beyond i64 (DECIMAL(p,0) that won't cast): the
            # reference's overflow -> null arm
            | (is_dec0 & int_arm.isNull())
        )
        u = F.struct(
            F.when(is_bool, F.lit(1))
            .when(is_int | is_dec0, F.lit(2))
            .when(is_float, F.lit(3))
            .when(is_str, F.lit(4))
            .when(is_arr, F.lit(5))
            .when(is_obj, F.lit(6))
            .cast("tinyint")
            .alias("type_id"),
            F.when(is_bool, F.try_variant_get(x, "$", "boolean")).alias("bool"),
            int_arm.alias("int"),
            F.when(is_float, F.try_variant_get(x, "$", "double")).alias("float"),
            F.when(is_str, F.try_variant_get(x, "$", "string")).alias("str"),
            F.when(is_arr, F.to_json(x)).alias("array"),
            F.when(is_obj, F.to_json(x)).alias("object"),
        )
        return F.when(null_like, F.lit(None).cast(UNION_DDL)).otherwise(
            u.cast(UNION_DDL)
        )

    return F.transform(F.array(v), build)[0]


def json_union_to_text_native(u) -> Column:
    """``json_union_to_text`` as pure Column expressions over the
    tagged-union struct — pairs with :func:`json_get_variant` for a
    zero-hop union roundtrip. The draw is DEPLOYMENT reach (no Python
    workers / Arrow memory in the plan), not throughput: the full
    variant-built roundtrip measured ~2x the exact fused tier at sf0.1,
    so the exact kernel remains the default. Arm rendering:

    * null arm / whole-struct NULL → SQL NULL;
    * bool → ``true``/``false``; int → digits;
    * str → JSON-quoted via Jackson (``to_json(array(s))`` with the
      brackets stripped — byte-identical escaping to the exact tier for
      quotes/backslashes/control chars, raw UTF-8 beyond ASCII);
    * array/object → the stored raw text;
    * float → Spark's double→string cast. ENVELOPE: agrees with the
      exact tier's serde-style rendering for plain-decimal magnitudes
      (roughly ``1e-3 <= |x| < 1e7``, and exact halves like ``5.0``);
      DIVERGES in exponent notation (``1.0E17`` vs ``1e+17``) — use the
      exact tier when exponent-range floats must round-trip."""
    u = _col(u) if isinstance(u, str) else u
    # unwrap JsonColumn (exact-tier json_get output): its getField /
    # [] mean JSON PATH navigation, not struct-field access — rebuild a
    # plain Column around the same expression handle
    if type(u) is not Column:
        u = Column(u._jc)
    tid = u.getField("type_id")
    quoted = F.to_json(F.array(u.getField("str")))
    return (
        F.when(u.isNull() | tid.isNull() | (tid == 0), F.lit(None).cast("string"))
        .when(tid == 1, F.when(u.getField("bool"), "true").otherwise("false"))
        .when(tid == 2, u.getField("int").cast("string"))
        .when(tid == 3, u.getField("float").cast("string"))
        # strip the to_json(array(...)) brackets: substring(2, len-2)
        .when(tid == 4, quoted.substr(F.lit(2), F.length(quoted) - 2))
        .when(tid == 5, u.getField("array"))
        .when(tid == 6, u.getField("object"))
    )


def json_as_text_variant(json_col, *path) -> Column:
    """``->>`` (``json_as_text``) on the variant tier: Spark's variant
    string cast already implements the operator's rendering — scalars as
    bare text ('s', '1', 'true'), containers as their JSON text, JSON
    null and missing paths as SQL NULL. Envelope: containers and floats
    are RE-SERIALIZED from the variant encoding (minified / Jackson
    float rules) where the exact tier keeps the verbatim document bytes
    (reference renders the raw slice, src/common_union.rs:168-190)."""
    return _try_variant(json_col, path, "string")


def json_contains_variant(json_col, *path) -> Column:
    """``?`` (``json_contains``) on the variant tier. The reference
    semantics (src/json_contains.rs:19-106) require present-null ⇒ TRUE
    — and Spark's variant model distinguishes exactly that:
    ``try_variant_get(.., 'variant')`` is SQL NULL only for MISSING
    paths (or invalid/NULL documents), while a present JSON null comes
    back as a non-null variant (testable with ``is_variant_null``). So
    ``IS NOT NULL`` on the variant extraction is the complete operator:
    present-null ⇒ true, missing ⇒ false, invalid/NULL doc ⇒ false.
    No re-serialization is involved, so unlike the getter twins this one
    has NO envelope caveat beyond JSONPath key-syntax limits."""
    if not path:
        raise ValueError(
            "The 'json_contains' function requires 2 or more arguments."
        )
    return _try_variant(json_col, path, "variant").isNotNull()


def json_length_variant(json_col, *path) -> Column:
    """``json_length`` WITH path support on the variant tier: array
    element count or object key count; scalars/missing → NULL."""
    return F.coalesce(
        _size(_try_variant(json_col, path, "array<variant>")).cast("bigint"),
        _size(_try_variant(json_col, path, "map<string,variant>")).cast("bigint"),
    )


# ------------------------------------------------------------- tier picker
# The per-function equivalence envelopes above are precise but spread
# across 20 docstrings; recommend_tier() folds them into one decision so
# users describe their DATA once instead of hand-picking twins.


@dataclass(frozen=True)
class JsonProfile:
    """What is true of your JSON columns and how you consume results —
    the facts the per-function equivalence envelopes turn on. Every
    flag defaults to the permissive value (the common analytics case);
    set a flag True when the property applies and :func:`recommend_tier`
    will keep the affected functions on the exact tier.

    * ``special_key_chars`` — object keys can contain ``.``, ``[``,
      or quotes. JSONPath (every JVM tier) cannot address such keys;
      the exact tier's list-of-keys paths can.
    * ``trailing_garbage`` — documents may carry bytes after the JSON
      value. Jackson/variant parse strictly (NULL); the exact tier's
      streaming parser reads the leading value.
    * ``needs_raw_slices`` — extracted floats/containers must keep the
      verbatim document bytes (``4.2e-1`` stays ``4.2e-1``). JVM tiers
      re-serialize (minified, ``0.42``).
    * ``mixed_types_at_paths`` — values at queried paths may have
      unexpected types, so the typed getters' coercion rules matter
      (the exact tier implements the reference's Rust parse rules;
      Spark casts accept more, e.g. ``'123'`` string → 123).
    * ``integral_float_arm`` — JSON floats with zero fraction (``5.0``)
      must land in the union's FLOAT arm. The variant encoding turns
      them into DECIMAL(p,0), which :func:`json_get_variant` maps to
      the int arm.
    * ``exponent_floats`` — union-to-text must render exponent-range
      floats serde-style (``1e+17``); Spark's double→string cast says
      ``1.0E17``.
    * ``paths_on_length_keys`` — callers pass PATH arguments to
      ``json_length`` / ``json_object_keys`` (``json_length(j, 'a')``).
      Their ``_native`` twins are path-less (the Spark built-ins they
      wrap take only the document), so recommending 'native' would hand
      back a narrower signature that raises ``TypeError`` on the first
      path call; with this flag those two drop to variant (which
      supports paths) or exact.
    * ``no_python_workers`` — the deployment cannot run Python UDFs
      (pure-JVM executors, no Arrow memory budget). Prefer a JVM tier
      wherever one is equivalent, even where the exact tier measured
      faster; functions with no equivalent JVM tier still report
      ``'exact'`` — treat those as unavailable in such a deployment.
    """

    special_key_chars: bool = False
    trailing_garbage: bool = False
    needs_raw_slices: bool = False
    mixed_types_at_paths: bool = False
    integral_float_arm: bool = False
    exponent_floats: bool = False
    paths_on_length_keys: bool = False
    no_python_workers: bool = False

    @classmethod
    def strict(cls) -> "JsonProfile":
        """Full reference fidelity: every envelope flag on — recommends
        the exact tier everywhere. Use when you cannot characterize the
        data."""
        return cls(
            special_key_chars=True,
            trailing_garbage=True,
            needs_raw_slices=True,
            mixed_types_at_paths=True,
            integral_float_arm=True,
            exponent_floats=True,
            paths_on_length_keys=True,
        )


# fastest-first JVM candidates per public function (measured at sf0.1,
# BASELINE.md: the variant tier parses once per row into Spark's binary
# encoding and is the fastest JVM path wherever it exists; the
# get_json_object tier re-parses per call but needs no Spark 4)
_JVM_CANDIDATES = {
    "json_get": ("variant",),
    "json_get_str": ("variant",),
    "json_get_int": ("variant", "native"),
    "json_get_float": ("variant", "native"),
    "json_get_bool": ("variant",),
    "json_get_json": ("variant",),
    "json_get_array": ("variant",),
    "json_as_text": ("variant", "native"),
    "json_contains": ("variant",),
    "json_length": ("variant", "native"),
    "json_object_keys": ("variant", "native"),
    "json_from_scalar": (),  # already pure Column exprs — nothing to beat
    "json_union_to_text": ("native",),
}

# functions whose EXACT tier measured faster than the JVM twin (the
# union-struct builders: one fused Arrow hop beats the schema_of_variant
# dispatch tree ~2x, BASELINE.md round-5 note) — the JVM twin is a
# deployment-reach option, recommended only under no_python_workers
_EXACT_IS_FASTER = frozenset({"json_get", "json_union_to_text"})

_TYPED_GETTERS = frozenset(
    {"json_get_int", "json_get_float", "json_get_str", "json_get_bool"}
)
_RAW_SLICE_FNS = frozenset({"json_get_json", "json_get_array", "json_as_text"})


def parse_spark_version(spark_version: str) -> tuple:
    """``'4.1.2'`` → ``(4, 1)`` — the shared version gate for
    :func:`recommend_tier` and ``json_extract_multi(tier='auto')``."""
    try:
        parts = spark_version.split(".")
        return (int(parts[0]), int(parts[1]) if len(parts) > 1 else 0)
    except (ValueError, IndexError):
        raise ValueError(f"unparseable spark_version: {spark_version!r}")


def _jvm_tier_ok(name: str, tier: str, p: JsonProfile) -> bool:
    if p.special_key_chars or p.trailing_garbage:
        return False  # every JVM tier: JSONPath syntax + strict parse
    if name in _TYPED_GETTERS and p.mixed_types_at_paths:
        return False
    if name in _RAW_SLICE_FNS and p.needs_raw_slices:
        return False
    if name == "json_get" and (p.needs_raw_slices or p.integral_float_arm):
        return False
    if name == "json_union_to_text" and p.exponent_floats:
        return False
    if (
        tier == "native"
        and name in ("json_length", "json_object_keys")
        and p.paths_on_length_keys
    ):
        return False  # the native twins are path-less
    return True


def recommend_tier(
    spark_version: str | None = None, json_profile: JsonProfile | None = None
) -> dict:
    """The fastest provably-equivalent tier per public function, given
    the Spark version and a :class:`JsonProfile` of the data: a dict
    mapping each of the 13 function names to ``'exact'`` / ``'native'``
    / ``'variant'``. Resolve a name+tier to the callable with
    :func:`tier_callable`.

    ``spark_version`` defaults to the installed pyspark's version; the
    variant tier needs >= 4.0 (VariantType). ``json_profile`` defaults
    to the permissive profile — pass :meth:`JsonProfile.strict` when the
    data is uncharacterized and fidelity is paramount.
    """
    if spark_version is None:
        import pyspark

        spark_version = pyspark.__version__
    ver = parse_spark_version(spark_version)
    p = json_profile or JsonProfile()
    out = {}
    for name, jvm in _JVM_CANDIDATES.items():
        ok = [
            t
            for t in jvm
            if (t != "variant" or ver >= (4, 0)) and _jvm_tier_ok(name, t, p)
        ]
        if not ok or (name in _EXACT_IS_FASTER and not p.no_python_workers):
            out[name] = "exact"
        else:
            out[name] = ok[0]
    return out


def tier_callable(name: str, tier: str):
    """Resolve a :func:`recommend_tier` entry to the actual function:
    ``('json_as_text', 'variant')`` → :func:`json_as_text_variant`;
    ``tier='exact'`` → the default exact-tier function from the package
    API. Signature caveat: the 'native' twins of json_length /
    json_object_keys are PATH-LESS (set
    ``JsonProfile(paths_on_length_keys=True)`` if your call sites pass
    paths — the recommendation then avoids them)."""
    if name not in _JVM_CANDIDATES:
        raise KeyError(f"unknown function name: {name!r}")
    if tier == "exact":
        from . import api

        return getattr(api, name)
    if tier not in ("native", "variant"):
        raise ValueError(f"unknown tier: {tier!r}")
    fn = globals().get(f"{name}_{tier}")
    if fn is None:
        raise ValueError(f"{name} has no {tier}-tier twin")
    return fn
