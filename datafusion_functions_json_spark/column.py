"""JsonColumn — the Python operator surface standing in for the reference's
``->`` / ``->>`` / ``?`` SQL operators.

Spark SQL's parser has no postgres JSON operators and PySpark exposes no
planner hooks (the reference wires its operators through DataFusion's
``ExprPlanner``, reference: src/rewrite.rs:112-198), so the operator sugar
lives on a Column subclass instead (SURVEY.md §2.2):

    jcol = jsonf.col(df.json_data)      # or the result of json_get(...)
    jcol['foo']          # json_data -> 'foo'      (json_get)
    jcol['foo'][0]       # chained, flattens to json_get(j, 'foo', 0)
    jcol.as_text('foo')  # json_data ->> 'foo'     (json_as_text)
    jcol.contains('foo') # json_data ?  'foo'      (json_contains)
    jcol['foo'].cast('bigint')   # cast elision → json_get_int(j, 'foo')

The two optimizer passes of the reference run EAGERLY here, at expression
construction time:

* **call un-nesting** (reference: src/rewrite.rs:57-91): ``jcol['a']['b']``
  builds ``json_get(j, 'a', 'b')`` — ONE parse per row instead of two.
  Guards replicated exactly: only when the inner call is ``json_get``
  (type-preserving, reference: src/rewrite.rs:74-78) and only when every
  path element is a literal (reference: src/rewrite.rs:83).
* **cast elision** (reference: src/rewrite.rs:36-54): ``.cast`` to an
  int/float/bool/string type rewrites to the typed getter so the union
  struct is never materialized.

JsonColumn subclasses ``pyspark.sql.Column`` so it drops into ``select`` /
``filter`` / ``groupBy`` unchanged; results are auto-aliased in the
reference's operator rendering (``json_data -> 'foo'``, reference:
src/rewrite.rs:146-171).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

try:  # Spark 4 classic: the concrete Column holding the py4j handle
    from pyspark.sql.classic.column import Column
except ImportError:  # pragma: no cover - older/connect layouts
    from pyspark.sql import Column

__all__ = ["JsonColumn", "col"]

_COLNAME_RE = re.compile(r"^Column<'(.*)'>$")


def _render_path_elem(p) -> str:
    # reference renders keys as 'key' and indexes bare (src/rewrite.rs:146-171)
    if isinstance(p, str):
        return f"'{p}'"
    return str(p)


def _col_display_name(c: Column) -> str:
    m = _COLNAME_RE.match(str(c))
    return m.group(1) if m else "json"


class JsonColumn(Column):
    """A ``Column`` carrying JSON provenance for eager rewrites.

    Two flavors:

    * wrapping a **raw JSON text column** (``jsonf.col(df.j)``): path=()
      and lookups produce union structs via json_get;
    * wrapping a **json_get result** (union struct): provenance
      ``(root, path)`` drives flattening; ``None`` provenance (column
      keys / scalar-lifted values) disables it, matching the reference's
      guards.
    """

    def __init__(
        self,
        underlying: Column,
        *,
        root=None,
        path=None,
        is_text=False,
        cast_root=None,
        cast_path=None,
    ):
        # Classic-mode Column wraps a py4j java column handle.
        super().__init__(underlying._jc)
        self._root = root
        self._path = path  # tuple of literals, or None (= not flattenable)
        self._is_text = is_text  # True when wrapping raw JSON text
        # cast-elision provenance: like (root, path) but may carry a
        # COLUMN key — the reference's cast elision (rewrite.rs:36-54)
        # has no literal-path guard (that guard belongs to call
        # un-nesting only), so json_get(j, col).cast('bigint') must
        # still rewrite to json_get_int(j, col) instead of attempting
        # a real (failing) struct cast
        self._cast_root = cast_root if cast_root is not None else root
        self._cast_path = cast_path if cast_path is not None else path

    # -- provenance ----------------------------------------------------

    def _flatten_provenance(self):
        """(root, literal_path) when call un-nesting may fire, else None
        (guards: reference src/rewrite.rs:74-83)."""
        if self._root is not None and self._path is not None:
            return self._root, self._path
        return None

    def _json_source(self):
        """What to hand the functions layer as the JSON argument."""
        if self._is_text:
            return Column(self._jc)
        return self  # union struct; api layer continues via array/object

    def _arrow_alias(self, op: str, key) -> str:
        base = (
            _col_display_name(self._root)
            if self._root is not None and self._path is not None
            else _col_display_name(self)
        )
        parts = list(self._path or ())
        rendered = base
        for p in parts:
            rendered += f" -> {_render_path_elem(p)}"
        rendered += f" {op} {_render_path_elem(key)}"
        return rendered

    # -- operator surface ----------------------------------------------

    def __getitem__(self, key):
        """``jcol[key]`` == ``json -> key`` (reference: src/rewrite.rs:
        112-133). Chains left-associatively; flattens when allowed."""
        from .functions import api

        out = api.json_get(self._json_source(), key)
        if isinstance(key, (str, int)) and not isinstance(key, bool):
            out = JsonColumn(
                out.alias(self._arrow_alias("->", key)),
                root=out._root,
                path=out._path,
            )
        return out

    def get(self, *path):
        """Explicit json_get with a multi-element path."""
        from .functions import api

        return api.json_get(self._json_source(), *path)

    def as_text(self, *path) -> Column:
        """``json ->> key`` (reference: src/rewrite.rs:118,129)."""
        from .functions import api

        out = api.json_as_text(self._json_source(), *path)
        if len(path) == 1 and isinstance(path[0], (str, int)):
            out = out.alias(self._arrow_alias("->>", path[0]))
        return out

    def contains(self, *path) -> Column:
        """``json ? key`` (reference: src/rewrite.rs:119,130)."""
        from .functions import api

        out = api.json_contains(self._json_source(), *path)
        if len(path) == 1 and isinstance(path[0], (str, int)):
            out = out.alias(self._arrow_alias("?", path[0]))
        return out

    def get_str(self, *path) -> Column:
        from .functions import api

        return api.json_get_str(self._json_source(), *path)

    def get_int(self, *path) -> Column:
        from .functions import api

        return api.json_get_int(self._json_source(), *path)

    def get_float(self, *path) -> Column:
        from .functions import api

        return api.json_get_float(self._json_source(), *path)

    def get_bool(self, *path) -> Column:
        from .functions import api

        return api.json_get_bool(self._json_source(), *path)

    def get_json(self, *path) -> Column:
        from .functions import api

        return api.json_get_json(self._json_source(), *path)

    def get_array(self, *path) -> Column:
        from .functions import api

        return api.json_get_array(self._json_source(), *path)

    def length(self, *path) -> Column:
        from .functions import api

        return api.json_length(self._json_source(), *path)

    def keys(self, *path) -> Column:
        from .functions import api

        return api.json_object_keys(self._json_source(), *path)

    def to_text(self) -> Column:
        """Flatten this union value to canonical JSON text (reference:
        src/json_union_to_text.rs)."""
        from .functions import api

        if self._is_text:
            return Column(self._jc)
        return api.json_union_to_text(self)

    def is_json_null(self) -> Column:
        from .functions import api

        return api.json_is_null(self)

    # -- cast elision ---------------------------------------------------

    _CAST_MAP = {
        "tinyint": "json_get_int",
        "smallint": "json_get_int",
        "int": "json_get_int",
        "integer": "json_get_int",
        "bigint": "json_get_int",
        "long": "json_get_int",
        "boolean": "json_get_bool",
        "bool": "json_get_bool",
        "float": "json_get_float",
        "double": "json_get_float",
        "string": "json_get_str",
        "str": "json_get_str",
    }

    def cast(self, dataType):
        """Cast elision (reference: src/rewrite.rs:36-54): a cast of a
        json_get result to int/float/bool/string becomes the typed getter
        over the SAME args — the union struct is never built. Unknown
        target types fall back to a real Spark cast of the struct (which
        Spark will reject, like DataFusion would)."""
        from .functions import api

        name = None
        if isinstance(dataType, str):
            name = dataType.lower()
        elif isinstance(dataType, T.LongType):
            name = "bigint"
        elif isinstance(dataType, T.IntegerType):
            # each width keeps ITS name so the narrowing re-cast below
            # fires for DataType instances exactly like for strings —
            # mapping them all to "bigint" made cast(T.IntegerType())
            # silently return a BIGINT column while cast('int')
            # returned INT (same expression, two schemas)
            name = "int"
        elif isinstance(dataType, T.ShortType):
            name = "smallint"
        elif isinstance(dataType, T.ByteType):
            name = "tinyint"
        elif isinstance(dataType, T.BooleanType):
            name = "boolean"
        elif isinstance(dataType, T.FloatType):
            name = "float"
        elif isinstance(dataType, T.DoubleType | T.DecimalType):
            name = "double"
        elif isinstance(dataType, T.StringType):
            name = "string"
        fn_key = self._CAST_MAP.get(name) if name else None
        if (
            fn_key is not None
            and self._cast_root is not None
            and self._cast_path is not None
        ):
            fn = getattr(api, fn_key)
            out = fn(self._cast_root, *self._cast_path)
            # Decimal targets re-cast the float result (reference
            # rewrite keeps the cast shell for decimals, rs:46-48)
            if isinstance(dataType, T.DecimalType):
                out = Column(out._jc).cast(dataType)
            elif fn_key == "json_get_int" and name in ("tinyint", "smallint", "int", "integer"):
                out = Column(out._jc).cast(dataType)
            elif fn_key == "json_get_float" and name == "float":
                # the float getter returns DOUBLE; a float target must
                # narrow like a plain Spark cast would
                out = Column(out._jc).cast(dataType)
            return out
        return super().cast(dataType)

    astype = cast


def col(c) -> JsonColumn:
    """Wrap a raw JSON text column for operator-style access:
    ``jsonf.col(df.json_data)['foo'].cast('bigint')``."""
    if isinstance(c, str):
        from pyspark.sql import functions as F

        c = F.col(c)
    return JsonColumn(c, root=c, path=(), is_text=True)
