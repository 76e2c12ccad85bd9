"""Hand-rolled Cypher tokenizer + recursive-descent parser.

Grammar surface per SURVEY.md §3.1 (reference: src/parser/cypher.pest).
Pure Python, no dependencies; produces the AST in ``ast_nodes``.
"""

from __future__ import annotations

import re
from typing import Optional

from rust_graph_db_spark.parser.ast_nodes import (
    CallSubquery, CountSubquery, ExistsSubquery, Foreach, ListComp,
    ProcCall,
    MapProj,
    PatternComp,
    ReduceExpr,
    Quantifier,
    Binary, CaseExpr, Create, Delete, FuncCall, InList, IsNull, ListLit,
    Literal, MapLit, Match, Merge, NodePattern, OrderItem, PathPattern, Prop,
    Param, Query, RelPattern, Return, ReturnItem, SetClause, SetItem,
    Subscript,
    Unary, UnionQuery, Unwind, Var, With,
)


class CypherSyntaxError(ValueError):
    pass


KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "ORDER", "BY", "ASC",
    "ASCENDING", "DESC", "DESCENDING", "LIMIT", "SKIP", "DISTINCT", "AND",
    "OR", "NOT", "XOR", "IN", "IS", "NULL", "TRUE", "FALSE", "CREATE",
    "DELETE", "DETACH", "SET", "AS", "UNWIND", "UNION", "ALL",
    "INTERSECT", "EXCEPT", "STARTS", "ENDS", "CONTAINS",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*|`[^`]+`)
  | (?P<punct>=~|<=|>=|<>|!=|->|<-|\.\.|[()\[\]{},:.+\-*/%=<>|^])
    """,
    re.VERBOSE | re.DOTALL,
)


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind  # 'num' | 'str' | 'name' | 'kw' | 'punct' | 'eof'
        self.text = text
        self.pos = pos

    def __repr__(self):
        return f"Token({self.kind},{self.text!r})"


def tokenize(src: str) -> list:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise CypherSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name":
            if text.startswith("`"):
                out.append(Token("name", text[1:-1], m.start()))
            elif text.upper() in KEYWORDS:
                # keep original case: keywords double as labels/property
                # names in identifier positions (e.g. a :Order label)
                out.append(Token("kw", text, m.start()))
            else:
                out.append(Token("name", text, m.start()))
        else:
            out.append(Token(kind, text, m.start()))
    out.append(Token("eof", "", len(src)))
    return out


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: _ESCAPES.get(m.group(1), m.group(1)), body)


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # ------------------------------------------------------------- token utils

    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.cur
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "kw" and self.cur.text.upper() in kws

    def at_punct(self, *ps: str) -> bool:
        return self.cur.kind == "punct" and self.cur.text in ps

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise CypherSyntaxError(f"expected {kw} at {self.cur.pos}, got {self.cur.text!r}")
        self.advance()

    def eat_punct(self, p: str) -> None:
        if not self.at_punct(p):
            raise CypherSyntaxError(f"expected {p!r} at {self.cur.pos}, got {self.cur.text!r}")
        self.advance()

    def try_kw(self, kw: str) -> bool:
        if self.at_kw(kw):
            self.advance()
            return True
        return False

    def try_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.advance()
            return True
        return False

    # CASE/WHEN/THEN/ELSE/END are matched contextually (not reserved),
    # so `end`, `case` etc. remain valid variable names elsewhere.
    def at_word(self, *ws: str) -> bool:
        return self.cur.kind in ("name", "kw") and self.cur.text.upper() in ws

    def try_word(self, w: str) -> bool:
        if self.at_word(w):
            self.advance()
            return True
        return False

    def eat_word(self, w: str) -> None:
        if not self.try_word(w):
            raise CypherSyntaxError(
                f"expected {w} at {self.cur.pos}, got {self.cur.text!r}")

    _CASE_STOP_KWS = {
        "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "ORDER", "BY",
        "LIMIT", "SKIP", "CREATE", "DELETE", "DETACH", "SET", "AS",
        "UNWIND", "UNION", "INTERSECT", "EXCEPT", "ASC", "ASCENDING",
        "DESC", "DESCENDING",
    }

    def _looks_like_case_body(self) -> bool:
        """Lookahead for a CASE expression after a bare `case` token: scan
        forward for a depth-0 WHEN before anything that ends an expression
        (clause keyword, comma, or a closing bracket of the enclosing
        context). Keeps `case` usable as a plain variable name —
        `RETURN case`, `case.prop`, `f(case)` stay ordinary references."""
        depth = 0
        for j in range(self.i + 1, len(self.toks)):
            t = self.toks[j]
            if t.kind == "punct":
                if t.text in "([{":
                    depth += 1
                elif t.text in ")]}":
                    depth -= 1
                    if depth < 0:
                        return False
                elif t.text == "," and depth == 0:
                    return False
            elif depth == 0:
                if t.kind in ("name", "kw") and t.text.upper() == "WHEN":
                    return True
                if t.kind == "kw" and t.text.upper() in self._CASE_STOP_KWS:
                    return False
            if t.kind == "eof":
                return False
        return False

    def name(self) -> str:
        if self.cur.kind == "name":
            return self.advance().text
        if self.cur.kind == "kw":
            # every name() position follows an unambiguous introducer
            # (AS / ':' / '(' / '.' / ','), so keywords are usable as
            # labels, property names, and aliases (e.g. label `Order`)
            return self.advance().text
        raise CypherSyntaxError(f"expected identifier at {self.cur.pos}, got {self.cur.text!r}")

    # ----------------------------------------------------------------- queries

    _SET_OPS = ("UNION", "INTERSECT", "EXCEPT")

    def parse_query(self):
        """Top level: one Query, or a UNION/INTERSECT/EXCEPT [ALL]
        chain of Queries (one operator kind per chain)."""
        return self._query_chain(stop_at_brace=False)

    def _query_chain(self, stop_at_brace: bool):
        first = self._single_query(stop_at_brace)
        op = next((o for o in self._SET_OPS if self.at_kw(o)), None)
        if op is None:
            return first
        parts, alls = [first], []
        while self.try_kw(op):
            alls.append(self.try_kw("ALL"))
            parts.append(self._single_query(stop_at_brace))
        if any(self.at_kw(o) for o in self._SET_OPS):
            raise CypherSyntaxError(
                "cannot mix different set operators in one query")
        if len(set(alls)) > 1:
            raise CypherSyntaxError(
                f"cannot mix {op} and {op} ALL in one query")
        return UnionQuery(tuple(parts), all=alls[0], op=op.lower())

    def _single_query(self, stop_at_brace: bool = False) -> Query:
        clauses = []
        while not (self.cur.kind == "eof"
                   or any(self.at_kw(o) for o in self._SET_OPS)
                   or (stop_at_brace and self.at_punct("}"))):
            if (self.at_word("CALL") and self.peek().kind == "punct"
                    and self.peek().text == "{"):
                # CALL { [WITH a, b] ... RETURN ... } subquery clause
                self.advance()
                self.eat_punct("{")
                imports = None
                if self.at_kw("WITH"):
                    # importing WITH holds ONLY bare variable names and
                    # is followed by another clause; anything else
                    # (AS, expressions, items continuing) means it was
                    # a projecting WITH of the subquery body — rewind
                    save = self.i
                    self.advance()
                    names, ok = [], True
                    try:
                        names.append(self.name())
                        while self.try_punct(","):
                            names.append(self.name())
                    except CypherSyntaxError:
                        ok = False
                    if ok and (self.at_kw("MATCH", "OPTIONAL", "UNWIND",
                                          "WITH", "RETURN")
                               or self.at_word("CALL")):
                        imports = tuple(names)
                    else:
                        self.i = save
                sub = self._query_chain(stop_at_brace=True)
                self.eat_punct("}")
                clauses.append(CallSubquery(imports, sub))
                continue
            if self.at_word("CALL") and self.peek().kind == "name":
                # CALL name.space.proc(args) [YIELD c [AS a], ...]
                # [WHERE expr] — registered-procedure invocation
                self.advance()
                parts = [self.name()]
                while self.try_punct("."):
                    parts.append(self.name())
                self.eat_punct("(")
                args = []
                if not self.at_punct(")"):
                    args.append(self.expr())
                    while self.try_punct(","):
                        args.append(self.expr())
                self.eat_punct(")")
                yields, where = None, None
                if self.try_word("YIELD"):
                    items = [(self.name(),
                              self.name() if self.try_kw("AS") else None)]
                    while self.try_punct(","):
                        items.append(
                            (self.name(),
                             self.name() if self.try_kw("AS") else None))
                    yields = tuple(items)
                    if self.try_kw("WHERE"):
                        where = self.expr()
                clauses.append(
                    ProcCall(".".join(parts), tuple(args), yields, where))
                continue
            if self.at_kw("OPTIONAL"):
                self.advance()
                self.eat_kw("MATCH")
                clauses.append(self._match(optional=True))
            elif self.try_kw("MATCH"):
                clauses.append(self._match(optional=False))
            elif self.try_kw("UNWIND"):
                expr = self.expr()
                self.eat_kw("AS")
                clauses.append(Unwind(expr, self.name()))
            elif self.try_kw("WITH"):
                clauses.append(self._projection(With))
            elif self.try_kw("RETURN"):
                clauses.append(self._projection(Return))
            elif self.try_kw("CREATE"):
                clauses.append(Create(tuple(self._pattern_list())))
            elif self.try_word("MERGE"):        # contextual, like CASE
                clauses.append(self._merge())
            elif self.try_kw("SET"):
                clauses.append(self._set_clause())
            elif (self.at_word("FOREACH") and self.peek().kind == "punct"
                    and self.peek().text == "("):
                # FOREACH (x IN list | SET/CREATE/DELETE/MERGE ...)
                self.advance()
                self.eat_punct("(")
                fvar = self.name()
                self.eat_kw("IN")
                src = self.expr()
                self.eat_punct("|")
                body = []
                while not self.at_punct(")"):
                    if self.try_kw("CREATE"):
                        body.append(Create(tuple(self._pattern_list())))
                    elif self.try_kw("SET"):
                        body.append(self._set_clause())
                    elif self.try_word("MERGE"):
                        body.append(self._merge())
                    elif self.at_kw("DETACH"):
                        self.advance()
                        self.eat_kw("DELETE")
                        body.append(self._delete(detach=True))
                    elif self.try_kw("DELETE"):
                        body.append(self._delete(detach=False))
                    else:
                        raise CypherSyntaxError(
                            "FOREACH body allows only write clauses "
                            f"(got {self.cur.text!r} at {self.cur.pos})")
                self.eat_punct(")")
                if not body:
                    raise CypherSyntaxError("empty FOREACH body")
                clauses.append(Foreach(fvar, src, tuple(body)))
            elif self.try_word("REMOVE"):       # contextual, like MERGE
                # REMOVE n.prop[, m.prop ...] — in this engine's column
                # model a NULL property IS an absent property (openCypher
                # missing-property semantics), so REMOVE compiles to the
                # SET-to-NULL dataflow
                items = []
                while True:
                    base = self.name()
                    path = []
                    while self.try_punct("."):
                        t = self.advance()
                        path.append(t.text if t.kind == "name"
                                    else t.text.lower())
                    if not path:
                        raise CypherSyntaxError(
                            "REMOVE target must be a property path")
                    items.append(SetItem(Prop(base, tuple(path)),
                                         Literal(None)))
                    if not self.try_punct(","):
                        break
                clauses.append(SetClause(tuple(items)))
            elif self.at_kw("DETACH"):
                self.advance()
                self.eat_kw("DELETE")
                clauses.append(self._delete(detach=True))
            elif self.try_kw("DELETE"):
                clauses.append(self._delete(detach=False))
            else:
                raise CypherSyntaxError(
                    f"unexpected token {self.cur.text!r} at {self.cur.pos}")
        if not clauses:
            raise CypherSyntaxError("empty query")
        return Query(tuple(clauses))

    def _match(self, optional: bool) -> Match:
        patterns = self._pattern_list()
        where = self.expr() if self.try_kw("WHERE") else None
        return Match(tuple(patterns), where, optional)

    def _pattern_list(self) -> list:
        pats = [self._path_pattern()]
        while self.try_punct(","):
            pats.append(self._path_pattern())
        return pats

    def _path_pattern(self) -> PathPattern:
        pvar = None
        if (self.cur.kind == "name" and self.peek().kind == "punct"
                and self.peek().text == "="
                and ((self.peek(2).kind == "punct"
                      and self.peek(2).text == "(")
                     or (self.peek(2).kind == "name"
                         and self.peek(2).text.lower() in
                         ("shortestpath", "allshortestpaths")))):
            # named path: MATCH p = (a)-[...]->(b) or p = shortestPath(
            # ...); the lookahead keeps `x = (expr)` comparisons out
            pvar = self.advance().text
            self.advance()                       # =
        shortest = None
        if (self.cur.kind == "name"
                and self.cur.text.lower() in ("shortestpath",
                                              "allshortestpaths")
                and self.peek().kind == "punct" and self.peek().text == "("
                and self.peek(2).kind == "punct"
                and self.peek(2).text == "("):
            # shortestPath((a)-[:R*]->(b)) — the double-paren lookahead
            # keeps a user function call shortestpath(x) intact
            shortest = ("one" if self.advance().text.lower()
                        == "shortestpath" else "all")
            self.eat_punct("(")
        items = [self._node_pattern()]
        while self.at_punct("-", "<-"):
            rel = self._rel_pattern()
            node = self._node_pattern()
            items.extend([rel, node])
        if shortest is not None:
            self.eat_punct(")")
        return PathPattern(tuple(items), pvar, shortest)

    def _node_pattern(self) -> NodePattern:
        self.eat_punct("(")
        var = label = props = None
        if self.cur.kind == "name" and not self.at_punct(")"):
            var = self.name()
        if self.try_punct(":"):
            label = self.name()
        if self.at_punct("{"):
            props = self._map_literal()
        self.eat_punct(")")
        return NodePattern(var, label, props)

    def _rel_pattern(self) -> RelPattern:
        # '<-' '[' ... ']' '-'   → in
        # '-'  '[' ... ']' '->'  → out
        # '-'  '[' ... ']' '-'   → both
        # bare '-->' / '<--' / '--' (no bracket) also accepted
        if self.try_punct("<-"):
            left_in = True
        else:
            self.eat_punct("-")
            left_in = False
        var = label = props = None
        var_length = None
        if self.try_punct("["):
            if self.cur.kind == "name":
                var = self.name()
            if self.try_punct(":"):
                label = self.name()
            if self.try_punct("*"):
                lo, hi = 1, None
                if self.cur.kind == "num":
                    lo = int(self.advance().text)
                    hi = lo
                if self.try_punct(".."):
                    hi = int(self.advance().text) if self.cur.kind == "num" else None
                var_length = (lo, hi)
            if self.at_punct("{"):
                props = self._map_literal()
            self.eat_punct("]")
        if self.try_punct("->"):
            right_out = True
        else:
            self.eat_punct("-")
            right_out = False
        if left_in and right_out:
            raise CypherSyntaxError("relationship cannot be directed both ways")
        direction = "in" if left_in else ("out" if right_out else "both")
        return RelPattern(var, label, props, direction, var_length)

    def _map_literal(self) -> MapLit:
        self.eat_punct("{")
        pairs = []
        if not self.at_punct("}"):
            while True:
                key = self.name()
                self.eat_punct(":")
                pairs.append((key, self.expr()))
                if not self.try_punct(","):
                    break
        self.eat_punct("}")
        return MapLit(tuple(pairs))

    def _projection(self, cls):
        distinct = self.try_kw("DISTINCT")
        star = False
        items = []
        if self.try_punct("*"):
            # WITH * / RETURN * — project every bound variable, plus
            # any explicitly-listed extra items
            star = True
            while self.try_punct(","):
                items.append(self._return_item())
        else:
            items = [self._return_item()]
            while self.try_punct(","):
                items.append(self._return_item())
        where = None
        if cls is With and self.at_kw("WHERE"):
            # openCypher puts WHERE after ORDER BY/LIMIT is illegal; but the
            # reference grammar allows WITH ... WHERE (cypher.pest:35-37).
            self.advance()
            where = self.expr()
        order_by, skip, limit = self._order_skip_limit()
        if cls is With and where is None and self.try_kw("WHERE"):
            where = self.expr()
        if cls is With:
            return With(tuple(items), distinct, where, tuple(order_by),
                        skip, limit, star=star)
        return Return(tuple(items), distinct, tuple(order_by), skip,
                      limit, star=star)

    def _return_item(self) -> ReturnItem:
        expr = self.expr()
        alias = None
        if self.try_kw("AS"):
            alias = self.name()
        return ReturnItem(expr, alias)

    def _order_skip_limit(self):
        order_by, skip, limit = [], None, None
        if self.try_kw("ORDER"):
            self.eat_kw("BY")
            while True:
                e = self.expr()
                desc = False
                if self.at_kw("ASC", "ASCENDING"):
                    self.advance()
                elif self.at_kw("DESC", "DESCENDING"):
                    self.advance()
                    desc = True
                order_by.append(OrderItem(e, desc))
                if not self.try_punct(","):
                    break
        if self.try_kw("SKIP"):
            skip = int(self.advance().text)
        if self.try_kw("LIMIT"):
            limit = int(self.advance().text)
        return order_by, skip, limit

    def _set_clause(self) -> SetClause:
        items, replace_vars = self._set_items()
        return SetClause(tuple(items), replace_vars)

    def _set_items(self) -> tuple:
        """Returns ``(items, replace_vars)``. Map forms desugar here:
        ``SET n += {k: v, ...}`` becomes one per-key item per entry;
        ``SET n = {map}`` additionally records ``n`` in replace_vars so
        the executor clears the unlisted property columns (openCypher
        property-replacement semantics; absent from the reference,
        whose grammar has no map SET at all — cypher.pest:35-37)."""
        items, replace_vars = [], []
        while True:
            base = self.name()
            path = []
            while self.try_punct("."):
                t = self.advance()
                path.append(t.text if t.kind == "name" else t.text.lower())
            if not path:
                if self.try_punct("+"):
                    self.eat_punct("=")
                    replace = False
                elif self.try_punct("="):
                    replace = True
                else:
                    raise CypherSyntaxError(
                        "SET target must be a property path, n += {map},"
                        " or n = {map}")
                m = self.expr()
                if not isinstance(m, MapLit):
                    raise CypherSyntaxError(
                        "SET n += / n = requires a map literal "
                        "(computed values are fine: {k: expr, ...})")
                for key, vexpr in m.pairs:
                    items.append(SetItem(Prop(base, (key,)), vexpr))
                if replace:
                    replace_vars.append(base)
            else:
                target = Prop(base, tuple(path))
                self.eat_punct("=")
                items.append(SetItem(target, self.expr()))
            if not self.try_punct(","):
                break
        return items, tuple(replace_vars)

    def _merge_set_items(self) -> tuple:
        items, replace_vars = self._set_items()
        if replace_vars:
            raise CypherSyntaxError(
                "SET n = {map} (property replacement) is not supported "
                "in ON CREATE / ON MATCH — use n += {map} or per-key SET")
        return tuple(items)

    def _merge(self) -> Merge:
        pattern = self._path_pattern()
        on_create: tuple = ()
        on_match: tuple = ()
        while self.at_word("ON"):
            self.advance()
            if self.try_kw("CREATE"):
                self.eat_kw("SET")
                on_create = self._merge_set_items()
            elif self.try_kw("MATCH"):
                self.eat_kw("SET")
                on_match = self._merge_set_items()
            else:
                raise CypherSyntaxError(
                    f"expected CREATE or MATCH after ON at {self.cur.pos}")
        return Merge(pattern, on_create, on_match)

    def _delete(self, detach: bool) -> Delete:
        names = [self.name()]
        while self.try_punct(","):
            names.append(self.name())
        return Delete(tuple(names), detach)

    # ------------------------------------------------------------- expressions
    # precedence: OR < AND < NOT < comparison/IS/IN < add < mul < unary < postfix

    def expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.at_kw("OR", "XOR"):
            op = self.advance().text.upper()
            left = Binary(op, left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.try_kw("AND"):
            left = Binary("AND", left, self._not())
        return left

    def _not(self):
        if self.try_kw("NOT"):
            return Unary("NOT", self._not())
        return self._comparison()

    def _comparison(self):
        left = self._additive()
        while True:
            if self.at_punct("=", "<>", "!=", "<", ">", "<=", ">="):
                op = self.advance().text
                if op == "!=":
                    op = "<>"
                left = Binary(op, left, self._additive())
            elif self.at_kw("IS"):
                self.advance()
                negated = self.try_kw("NOT")
                self.eat_kw("NULL")
                left = IsNull(left, negated)
            elif self.at_kw("IN"):
                self.advance()
                left = InList(left, self._additive())
            elif self.at_punct("=~"):
                self.advance()
                left = Binary("=~", left, self._additive())
            elif self.at_kw("STARTS"):
                self.advance()
                self.eat_kw("WITH")
                left = Binary("STARTS WITH", left, self._additive())
            elif self.at_kw("ENDS"):
                self.advance()
                self.eat_kw("WITH")
                left = Binary("ENDS WITH", left, self._additive())
            elif self.at_kw("CONTAINS"):
                self.advance()
                left = Binary("CONTAINS", left, self._additive())
            else:
                return left

    def _additive(self):
        left = self._multiplicative()
        while self.at_punct("+", "-"):
            op = self.advance().text
            left = Binary(op, left, self._multiplicative())
        return left

    def _multiplicative(self):
        left = self._power()
        while self.at_punct("*", "/", "%"):
            op = self.advance().text
            left = Binary(op, left, self._power())
        return left

    def _power(self):
        # openCypher ^: binds tighter than unary minus (-2^2 = -4),
        # right-associative (2^3^2 = 512)
        base = self._unary()
        if self.at_punct("^"):
            self.advance()
            return Binary("^", base, self._power())
        return base

    def _unary(self):
        if self.at_punct("-", "+"):
            op = self.advance().text
            return Unary(op, self._power())
        return self._postfix()

    def _postfix(self):
        e = self._primary()
        if isinstance(e, Var) and self.at_punct("{"):
            # map projection: n {.name, .age, .*, extra: expr}
            self.advance()
            items = []
            if not self.at_punct("}"):
                while True:
                    if self.try_punct("."):
                        if self.try_punct("*"):
                            items.append(("all",))
                        else:
                            items.append(("prop", self.advance().text))
                    else:
                        key = self.name()
                        self.eat_punct(":")
                        items.append(("expr", key, self.expr()))
                    if not self.try_punct(","):
                        break
            self.eat_punct("}")
            e = MapProj(e.name, tuple(items))
            # postfix continues: n {...}.field / n {...}[k] via the
            # generic subscript (getItem works on struct fields too)
            while self.at_punct(".") and self.peek().kind in ("name", "kw"):
                self.advance()
                e = Subscript(e, Literal(self.advance().text))
            while self.at_punct("["):
                self.advance()
                idx = self.expr()
                self.eat_punct("]")
                e = Subscript(e, idx)
            return e
        path = []
        while self.at_punct(".") and self.peek().kind in ("name", "kw"):
            self.advance()
            path.append(self.advance().text)
        if path:
            if isinstance(e, Var):
                e = Prop(e.name, tuple(path))
            elif isinstance(e, Param):
                # $m.k.j — key access on a map parameter via subscripts
                for k in path:
                    e = Subscript(e, Literal(k))
            else:
                raise CypherSyntaxError("property access only supported on variables")
        while self.at_punct("["):
            self.advance()
            idx = self.expr()
            self.eat_punct("]")
            e = Subscript(e, idx)
        return e

    def _primary(self):
        t = self.cur
        if t.kind == "num":
            self.advance()
            text = t.text
            if "." in text or "e" in text or "E" in text:
                return Literal(float(text))
            return Literal(int(text))
        if t.kind == "str":
            self.advance()
            return Literal(_unquote(t.text))
        if t.kind == "param":
            self.advance()
            return Param(t.text[1:])
        if t.kind == "kw":
            up = t.text.upper()
            if up == "NULL":
                self.advance()
                return Literal(None)
            if up == "TRUE":
                self.advance()
                return Literal(True)
            if up == "FALSE":
                self.advance()
                return Literal(False)
            if (up == "ALL" and self.peek().kind == "punct"
                    and self.peek().text == "("):
                # ALL is a keyword only for UNION ALL; followed by "("
                # it is the openCypher quantifier all(x IN xs WHERE p)
                self.advance()
                self.eat_punct("(")
                var = self.advance().text
                self.eat_kw("IN")
                source = self.expr()
                self.eat_kw("WHERE")
                where = self.expr()
                self.eat_punct(")")
                return Quantifier("all", var, source, where)
            raise CypherSyntaxError(f"unexpected keyword {t.text} at {t.pos}")
        if t.kind == "name":
            if t.text.upper() == "CASE" and self._looks_like_case_body():
                return self._case()
            if (t.text.upper() == "COUNT" and self.peek().kind == "punct"
                    and self.peek().text == "{"):
                # COUNT { [MATCH] pattern [WHERE expr] } — per-row
                # match-count subquery; count(expr) with parens stays
                # the aggregate
                self.advance()
                self.eat_punct("{")
                self.try_kw("MATCH")
                patterns = self._pattern_list()
                where = self.expr() if self.try_kw("WHERE") else None
                self.eat_punct("}")
                return CountSubquery(tuple(patterns), where)
            if (t.text.upper() == "EXISTS" and self.peek().kind == "punct"
                    and self.peek().text == "{"):
                # EXISTS { [MATCH] pattern [WHERE expr] } — the
                # existential subquery form; exists(expr) with parens
                # stays the property-existence function
                self.advance()
                self.eat_punct("{")
                self.try_kw("MATCH")
                patterns = self._pattern_list()
                where = self.expr() if self.try_kw("WHERE") else None
                self.eat_punct("}")
                return ExistsSubquery(tuple(patterns), where)
            # function call?
            if self.peek().kind == "punct" and self.peek().text == "(":
                fname = self.advance().text.lower()
                self.eat_punct("(")
                if fname == "reduce":
                    # reduce(acc = init, x IN xs | body)
                    acc = self.advance().text
                    self.eat_punct("=")
                    init = self.expr()
                    self.eat_punct(",")
                    var = self.advance().text
                    self.eat_kw("IN")
                    source = self.expr()
                    self.eat_punct("|")
                    body = self.expr()
                    self.eat_punct(")")
                    return ReduceExpr(acc, init, var, source, body)
                if (fname in ("all", "any", "none", "single")
                        and self.cur.kind == "name"
                        and self.peek().kind == "kw"
                        and self.peek().text.upper() == "IN"):
                    # quantifier: all/any/none/single(x IN xs WHERE p).
                    # Only the `var IN` form is intercepted, so a
                    # user-registered function of the same name keeps
                    # working with ordinary arguments.
                    var = self.advance().text
                    self.advance()                  # IN
                    source = self.expr()
                    self.eat_kw("WHERE")
                    where = self.expr()
                    self.eat_punct(")")
                    return Quantifier(fname, var, source, where)
                distinct = self.try_kw("DISTINCT")
                if self.try_punct("*"):
                    self.eat_punct(")")
                    return FuncCall(fname, (), distinct, star=True)
                args = []
                if not self.at_punct(")"):
                    args.append(self.expr())
                    while self.try_punct(","):
                        args.append(self.expr())
                self.eat_punct(")")
                return FuncCall(fname, tuple(args), distinct)
            self.advance()
            return Var(t.text)
        if self.at_punct("("):
            # pattern expression `(a)-[:R]->(b)` in predicate position
            # (openCypher sugar for EXISTS) — speculative parse with
            # backtracking; a real pattern has >= 3 items, so `(expr)`
            # falls through to the parenthesized-expression branch
            save = self.i
            try:
                pat = self._path_pattern()
                if len(pat.items) < 3:
                    raise CypherSyntaxError("not a pattern")
                return ExistsSubquery((pat,), None)
            except CypherSyntaxError:
                self.i = save
            self.advance()
            e = self.expr()
            self.eat_punct(")")
            return e
        if self.at_punct("["):
            self.advance()
            # pattern comprehension: [ (a)-[:R]->(b) WHERE p | expr ]
            # — speculative parse with backtracking ('[(' could also
            # open a list literal whose first item is parenthesized);
            # a genuine pattern has >= 3 items (node-rel-node) and a
            # mandatory '| proj', so plain '[(x)]' falls through
            if self.at_punct("("):
                save = self.i
                try:
                    pat = self._path_pattern()
                    if len(pat.items) < 3:
                        raise CypherSyntaxError("not a pattern")
                    where = self.expr() if self.try_kw("WHERE") else None
                    self.eat_punct("|")
                    proj = self.expr()
                    self.eat_punct("]")
                    return PatternComp(pat, where, proj)
                except CypherSyntaxError:
                    self.i = save
            # list comprehension: [x IN xs WHERE pred | expr] — the
            # two-token lookahead (name then IN) disambiguates from a
            # list literal whose first item is a variable
            if (self.cur.kind == "name" and self.peek().kind == "kw"
                    and self.peek().text.upper() == "IN"):
                var = self.advance().text
                self.advance()                      # IN
                source = self.expr()
                where = self.expr() if self.try_kw("WHERE") else None
                proj = self.expr() if self.try_punct("|") else None
                self.eat_punct("]")
                return ListComp(var, source, where, proj)
            items = []
            if not self.at_punct("]"):
                items.append(self.expr())
                while self.try_punct(","):
                    items.append(self.expr())
            self.eat_punct("]")
            return ListLit(tuple(items))
        if self.at_punct("{"):
            return self._map_literal()
        raise CypherSyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def _case(self):
        self.advance()  # CASE
        operand = None
        if not self.at_word("WHEN"):
            operand = self.expr()
        whens = []
        while self.try_word("WHEN"):
            cond = self.expr()
            self.eat_word("THEN")
            whens.append((cond, self.expr()))
        if not whens:
            raise CypherSyntaxError("CASE requires at least one WHEN branch")
        else_ = self.expr() if self.try_word("ELSE") else None
        self.eat_word("END")
        return CaseExpr(operand, tuple(whens), else_)


def parse_cypher(src: str) -> Query:
    """Parse a Cypher query string into a ``Query`` AST."""
    return Parser(src).parse_query()
