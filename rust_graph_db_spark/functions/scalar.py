"""Scalar function registry for the Cypher surface.

The reference grammar reserves LENGTH SIZE TYPE ID LABELS PROPERTIES
STARTNODE ENDNODE COALESCE TOSTRING TOINTEGER TOFLOAT TOBOOLEAN but only
executes the five aggregates (SURVEY.md §2.7 — reference
src/parser/cypher.pest:216-223, stubs at src/executor/mod.rs:583-592).
This engine implements them for real, plus a whitelisted passthrough to
``pyspark.sql.functions`` so the Cypher surface inherits Spark's scalar
library (all JVM-side, codegen-friendly — no Python UDFs here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Directly-mapped pyspark functions a Cypher query may call by name.
_PASSTHROUGH = {
    "abs", "acos", "asin", "atan", "atan2", "ceil", "cos", "exp", "floor",
    "log", "log2", "log10", "pow", "round", "sign", "sin", "sqrt", "tan",
    "lower", "upper", "trim", "ltrim", "rtrim", "reverse", "concat",
    "substring", "replace", "split", "left", "right", "initcap",
    "greatest", "least", "sort_array", "array_distinct", "array_contains",
    "array_max", "array_min", "element_at", "slice", "regexp_extract",
    "regexp_replace", "date_trunc", "array_join", "array_position",
}

# Passthrough names whose pyspark wrapper demands Python literals for
# some argument (probed on pyspark 4.1: "Column is not iterable"); these
# go through F.call_function, which accepts foldable Column literals.
# Everything else calls the wrapper directly, so a genuine misuse (bad
# arity, wrong Python type) surfaces as the wrapper's own TypeError.
_LITERAL_ARG_FUNCS = {"array_join", "regexp_extract", "date_trunc",
                      "sort_array"}

_CASTS = {
    "tostring": "string",
    "tointeger": "long",
    "tofloat": "double",
    "toboolean": "boolean",
}

# User-registered functions (engine extension — the reference has no
# UDF mechanism, SURVEY.md §2.11). Maps lowercase name → callable taking
# Column args and returning a Column; register plain expression builders
# for JVM-side execution, or a ``pandas_udf`` result for Python logic
# (Arrow-batched — never row-at-a-time).
_USER_FUNCS: dict = {}


def register_cypher_function(name: str, fn) -> None:
    """Expose ``fn(*cols) -> Column`` to Cypher as ``name(...)``.

    ``fn`` may be a composition of ``pyspark.sql.functions`` (preferred:
    stays in codegen) or a ``pandas_udf`` handle. Built-in names cannot
    be shadowed.
    """
    key = name.lower()
    if key in _CASTS or key in _PASSTHROUGH or key in (
            "coalesce", "length", "size", "keys", "toupper", "tolower",
            "rand", "range", "head", "last", "tail", "exists"):
        raise ValueError(f"cannot shadow built-in function {name!r}")
    _USER_FUNCS[key] = fn


def unregister_cypher_function(name: str) -> None:
    _USER_FUNCS.pop(name.lower(), None)


def compile_scalar_call(name: str, args: list, arg_types: list) -> Column:
    """Compile a non-aggregate function call to a Column.

    ``arg_types`` carries Spark simpleString dtypes for the args when
    resolvable (used for type-directed dispatch like length/size).
    """
    if name in _CASTS:
        return args[0].cast(_CASTS[name])
    if name == "coalesce":
        return F.coalesce(*args)
    if name in ("length", "size"):
        t = arg_types[0] or ""
        if t.startswith("array") or t.startswith("map"):
            return F.size(args[0])
        return F.length(args[0])
    if name == "keys":
        t = arg_types[0] or ""
        if t.startswith("map"):
            return F.map_keys(args[0])
        return F.json_object_keys(args[0])
    if name == "toupper":
        return F.upper(args[0])
    if name == "tolower":
        return F.lower(args[0])
    if name == "range":
        # openCypher range(start, end[, step]) is END-INCLUSIVE like
        # Spark's sequence(), but an empty progression (start past end
        # in the step's direction) is [] — Spark would auto-negate the
        # implicit step (sequence(2,1) == [2,1]) or raise on an
        # explicit one, so guard with the direction test
        step = args[2] if len(args) > 2 else F.lit(1)
        ok = ((step > 0) & (args[0] <= args[1])) | \
             ((step < 0) & (args[0] >= args[1]))
        return F.when(ok, F.sequence(args[0], args[1], step)) \
                .otherwise(F.array().cast("array<long>"))
    if name == "head":
        # try_: head([]) is NULL in openCypher, not an ANSI index
        # error; a typeless NULL arg (missing property) would fail
        # element_at's analysis, so short-circuit it
        if (arg_types[0] or "") == "void":
            return F.lit(None)
        return F.try_element_at(args[0], F.lit(1))
    if name == "last":
        if (arg_types[0] or "") == "void":
            return F.lit(None)
        return F.try_element_at(args[0], F.lit(-1))
    if name == "tail":
        return F.slice(args[0], F.lit(2),
                       F.greatest(F.size(args[0]) - 1, F.lit(0)))
    if name == "exists":
        # openCypher exists(p.prop): a missing property compiled to
        # NULL upstream, so null-ness IS the existence test
        return args[0].isNotNull()
    if name == "rand":
        return F.rand(42)  # deterministic by default; seed fixed
    if name == "timestamp":
        # Neo4j timestamp(): current epoch milliseconds (the reference
        # stores times as plain integers — social_graph.rs:38-40)
        return F.unix_millis(F.current_timestamp())
    if name == "randomuuid":
        return F.expr("uuid()")
    if name in _LITERAL_ARG_FUNCS:
        # pyspark wrappers that demand Python literals for some args
        # (e.g. array_join's delimiter) — call the SQL function directly,
        # which accepts foldable Column literals.
        return F.call_function(name, *args)
    if name in _PASSTHROUGH:
        return getattr(F, name)(*args)
    if name in _USER_FUNCS:
        return _USER_FUNCS[name](*args)
    raise ValueError(f"unknown function: {name}")
