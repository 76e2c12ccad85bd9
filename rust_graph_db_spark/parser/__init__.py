"""Cypher frontend: query string -> AST.

Covers the reference grammar surface (reference: src/parser/cypher.pest,
src/parser/ast.rs — SURVEY.md §3.1): MATCH / OPTIONAL MATCH / WHERE /
WITH / RETURN / ORDER BY / LIMIT / CREATE / SET / DELETE / DETACH DELETE,
aggregates, arithmetic, boolean and comparison operators, node/edge
patterns with inline property maps — and generalizes where the reference
artificially caps (≥3-hop chains, variable-length relationships, SKIP,
DISTINCT, IS NULL, IN, general expressions in RETURN).
"""

from rust_graph_db_spark.parser.ast_nodes import *  # noqa: F401,F403
from rust_graph_db_spark.parser.parser import parse_cypher  # noqa: F401
