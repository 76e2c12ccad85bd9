"""Cypher AST node definitions (reference analog: src/parser/ast.rs)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


# ----------------------------------------------------------------- expressions

@dataclass(frozen=True)
class Literal:
    value: object  # None | bool | int | float | str


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Param:
    """Query parameter ``$name`` — resolved from the params dict at
    compile time (engine extension; Neo4j-driver-style parameterized
    queries)."""
    name: str


@dataclass(frozen=True)
class Prop:
    """Property access ``base.a.b`` (nested paths supported,
    reference: src/executor/set_executor.rs:157-202)."""
    base: str
    path: tuple  # tuple[str, ...], len >= 1


@dataclass(frozen=True)
class Unary:
    op: str  # '-' | '+' | 'NOT'
    operand: "Expr"


@dataclass(frozen=True)
class Binary:
    op: str  # + - * / % = <> < > <= >= AND OR
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class FuncCall:
    name: str  # lowercased
    args: tuple
    distinct: bool = False
    star: bool = False  # count(*)


@dataclass(frozen=True)
class ListLit:
    items: tuple


@dataclass(frozen=True)
class MapLit:
    pairs: tuple  # tuple[(str, Expr), ...]


@dataclass(frozen=True)
class IsNull:
    operand: "Expr"
    negated: bool = False


@dataclass(frozen=True)
class InList:
    needle: "Expr"
    haystack: "Expr"


@dataclass(frozen=True)
class ListComp:
    """[var IN source WHERE where | proj] — openCypher list
    comprehension (filter and/or map); where/proj may be None."""
    var: str
    source: object
    where: object
    proj: object


@dataclass(frozen=True)
class ReduceExpr:
    """reduce(acc = init, var IN source | body)."""
    acc: str
    init: object
    var: str
    source: object
    body: object


@dataclass(frozen=True)
class ExistsSubquery:
    """EXISTS { [MATCH] pattern [, pattern ...] [WHERE expr] } —
    openCypher existential pattern subquery, correlated through
    variables shared with the enclosing scope."""
    patterns: tuple           # tuple[PathPattern, ...]
    where: object = None


@dataclass(frozen=True)
class CountSubquery:
    """COUNT { [MATCH] pattern [WHERE expr] } — per-row match count,
    correlated through shared variables (openCypher count subquery)."""
    patterns: tuple
    where: object = None


@dataclass(frozen=True)
class MapProj:
    """n {.name, .age, .*, extra: expr} — openCypher map projection
    over an entity (or map-valued) variable."""
    base: str
    items: tuple    # ("prop", name) | ("all",) | ("expr", key, Expr)


@dataclass(frozen=True)
class PatternComp:
    """[ (a)-[:R]->(b) WHERE p | expr ] — openCypher pattern
    comprehension: per outer row, the list of ``proj`` values over
    every match of the (correlated) pattern."""
    pattern: object           # PathPattern (>= 3 items)
    where: object
    proj: object


@dataclass(frozen=True)
class Quantifier:
    """all/any/none/single(var IN source WHERE where) — openCypher
    list-predicate quantifiers (3-valued logic)."""
    kind: str             # "all" | "any" | "none" | "single"
    var: str
    source: object
    where: object


@dataclass(frozen=True)
class Subscript:
    """0-based list / key-based map subscript ``expr[i]`` (openCypher)."""
    base: "Expr"
    index: "Expr"


@dataclass(frozen=True)
class CaseExpr:
    """Searched (operand=None) or simple CASE expression."""
    operand: "Expr"       # None for the searched form
    whens: tuple          # tuple[(Expr cond_or_value, Expr result), ...]
    else_: "Expr" = None


Expr = Union[Literal, Var, Prop, Unary, Binary, FuncCall, ListLit, MapLit,
             IsNull, InList, Subscript, CaseExpr]

AGGREGATE_FUNCS = {"count", "sum", "avg", "min", "max", "collect",
                   "stdev", "stdevp", "percentilecont", "percentiledisc"}


def contains_aggregate(e: Expr) -> bool:
    if isinstance(e, FuncCall):
        if e.name in AGGREGATE_FUNCS:
            return True
        return any(contains_aggregate(a) for a in e.args)
    if isinstance(e, Unary):
        return contains_aggregate(e.operand)
    if isinstance(e, Binary):
        return contains_aggregate(e.left) or contains_aggregate(e.right)
    if isinstance(e, (IsNull,)):
        return contains_aggregate(e.operand)
    if isinstance(e, InList):
        return contains_aggregate(e.needle) or contains_aggregate(e.haystack)
    if isinstance(e, ListLit):
        return any(contains_aggregate(i) for i in e.items)
    if isinstance(e, MapLit):
        return any(contains_aggregate(v) for _, v in e.pairs)
    if isinstance(e, Subscript):
        return contains_aggregate(e.base) or contains_aggregate(e.index)
    if isinstance(e, ListComp):
        return any(contains_aggregate(x) for x in
                   (e.source, e.where, e.proj) if x is not None)
    if isinstance(e, ReduceExpr):
        return any(contains_aggregate(x) for x in
                   (e.init, e.source, e.body))
    if isinstance(e, Quantifier):
        return (contains_aggregate(e.source)
                or contains_aggregate(e.where))
    if isinstance(e, (ExistsSubquery, CountSubquery, PatternComp)):
        return False          # aggregates are not allowed inside; a
        # COUNT {} is a per-row scalar, not an aggregate over rows
    if isinstance(e, MapProj):
        return any(contains_aggregate(item[2]) for item in e.items
                   if item[0] == "expr")
    if isinstance(e, CaseExpr):
        return (
            (e.operand is not None and contains_aggregate(e.operand))
            or any(contains_aggregate(c) or contains_aggregate(v)
                   for c, v in e.whens)
            or (e.else_ is not None and contains_aggregate(e.else_)))
    return False


# -------------------------------------------------------------------- patterns

@dataclass(frozen=True)
class NodePattern:
    var: Optional[str]
    label: Optional[str]
    props: Optional[MapLit]


@dataclass(frozen=True)
class RelPattern:
    var: Optional[str]
    label: Optional[str]
    props: Optional[MapLit]
    direction: str  # 'out' | 'in' | 'both'
    var_length: Optional[tuple] = None  # (min, max) for [*min..max]


@dataclass(frozen=True)
class PathPattern:
    """Alternating NodePattern / RelPattern, odd length >= 1.
    ``var`` is the named-path binding (``MATCH p = (a)-[...]->(b)``);
    ``shortest`` is "one"/"all" for shortestPath()/allShortestPaths()
    wrappers."""
    items: tuple
    var: "Optional[str]" = None
    shortest: "Optional[str]" = None


# --------------------------------------------------------------------- clauses

@dataclass(frozen=True)
class ReturnItem:
    expr: Expr
    alias: Optional[str]


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    desc: bool = False


@dataclass(frozen=True)
class Match:
    patterns: tuple  # tuple[PathPattern, ...]
    where: Optional[Expr] = None
    optional: bool = False


@dataclass(frozen=True)
class With:
    items: tuple  # tuple[ReturnItem, ...]
    distinct: bool = False
    where: Optional[Expr] = None
    order_by: tuple = ()
    skip: Optional[int] = None
    limit: Optional[int] = None
    star: bool = False        # WITH * [, items]


@dataclass(frozen=True)
class Return:
    items: tuple
    distinct: bool = False
    order_by: tuple = ()
    skip: Optional[int] = None
    limit: Optional[int] = None
    star: bool = False        # RETURN * [, items]


@dataclass(frozen=True)
class Foreach:
    """FOREACH (var IN list | write-clauses) — per-element writes;
    pipeline cardinality is unchanged afterwards."""
    var: str
    source: object
    clauses: tuple


@dataclass(frozen=True)
class CallSubquery:
    """CALL { [WITH imports] clauses... RETURN ... } — openCypher
    subquery clause. ``imports`` is the leading importing-WITH variable
    list (None = uncorrelated)."""
    imports: object       # Optional[tuple[str, ...]]
    query: "Query"


@dataclass(frozen=True)
class ProcCall:
    """CALL name.space.proc(args) [YIELD col [AS alias], ...]
    [WHERE expr] — registered-procedure invocation (engine extension;
    the reference exposes algorithms only as library calls,
    src/lib.rs:48-64). Args must be literal expressions."""
    name: str
    args: tuple                 # tuple[Expr, ...]
    yields: object = None       # Optional[tuple[(str, Optional[str]), ...]]
    where: object = None        # Optional[Expr]


@dataclass(frozen=True)
class Unwind:
    expr: Expr
    alias: str


@dataclass(frozen=True)
class Create:
    patterns: tuple


@dataclass(frozen=True)
class Merge:
    """MERGE pattern [ON CREATE SET ...] [ON MATCH SET ...] — engine
    extension (absent from the reference grammar, cypher.pest): bind
    the pattern if it exists, atomically create it otherwise."""
    pattern: "PathPattern"
    on_create: tuple = ()   # SetItem tuple
    on_match: tuple = ()    # SetItem tuple


@dataclass(frozen=True)
class SetItem:
    target: Prop
    value: Expr


@dataclass(frozen=True)
class SetClause:
    items: tuple
    # variables written via the REPLACE form ``SET n = {map}``: every
    # property column NOT named in the map is cleared on matched rows
    # (``SET n += {map}`` desugars to per-key items with no entry here)
    replace_vars: tuple = ()


@dataclass(frozen=True)
class Delete:
    vars: tuple  # variable names
    detach: bool = False


Clause = Union[Match, With, Return, Unwind, Create, Merge, SetClause, Delete]


@dataclass(frozen=True)
class Query:
    clauses: tuple


@dataclass(frozen=True)
class UnionQuery:
    """UNION / INTERSECT / EXCEPT [ALL] chain of complete single queries
    (set operations §2.6 — absent from the reference grammar, exposed as
    an engine extension; Spark provides all six physical variants)."""
    parts: tuple  # tuple[Query, ...]
    all: bool = False
    op: str = "union"  # union | intersect | except
