import pytest

from rust_graph_db_spark.parser import parse_cypher
from rust_graph_db_spark.parser.ast_nodes import (
    Binary, Create, Delete, Literal, Match, Prop, Return, SetClause, With,
)
from rust_graph_db_spark.parser.parser import CypherSyntaxError

GOOD = [
    "MATCH (a:Person)-[r:KNOWS]->(b:Person) WHERE r.since = 2020 RETURN a",
    "MATCH (p:Person) WHERE p.age > 25 AND NOT p.active RETURN p.name AS n ORDER BY p.age DESC LIMIT 10",
    "MATCH (a:Person {name: 'Alice', age: 30}) RETURN a.name",
    "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c)-[:KNOWS]->(d) RETURN d",  # >2 hops OK here
    "MATCH (a:Person) OPTIONAL MATCH (a)-[r:KNOWS]->(b) RETURN a.name, b.name",
    "MATCH (p:Person) WITH p.city AS city, count(*) AS cnt WHERE cnt > 2 RETURN city",
    "MATCH (a:Person)-[r:KNOWS*1..3]->(b) RETURN b.name",
    "MATCH (a:Person)<-[r:KNOWS]-(b) RETURN b.name",
    "MATCH (a)-[r]-(b) RETURN count(*)",
    "CREATE (n:Person {name: 'Eve'})-[:KNOWS {since: 2024}]->(m:Person {name: 'F'})",
    "MATCH (n:Person) SET n.address.city = 'Beijing'",
    "MATCH (n:Person) WHERE n.age < 0 DETACH DELETE n",
    "MATCH (p:Person) WHERE p.email IS NOT NULL AND p.city IN ['NYC'] RETURN DISTINCT p.city SKIP 1 LIMIT 5",
    "UNWIND [1,2,3] AS x RETURN x",
    "MATCH (p:Person) RETURN count(DISTINCT p.city) AS c",
    "MERGE (p:Person {name: 'X'})",
    "MERGE (p:Person {name: 'X'}) ON CREATE SET p.age = 1 "
    "ON MATCH SET p.age = p.age + 1 RETURN p.name",
]


@pytest.mark.parametrize("q", GOOD)
def test_parses(q):
    parse_cypher(q)


def test_ast_shape():
    q = parse_cypher("MATCH (a:Person {name: 'A'}) WHERE a.age > 1 RETURN a.name AS n")
    m, r = q.clauses
    assert isinstance(m, Match) and isinstance(r, Return)
    assert m.patterns[0].items[0].label == "Person"
    assert isinstance(m.where, Binary) and m.where.op == ">"
    assert r.items[0].alias == "n"
    assert r.items[0].expr == Prop("a", ("name",))


def test_set_parses_assignment_not_equality():
    q = parse_cypher("MATCH (n:Person) SET n.age = n.age + 1")
    s = q.clauses[1]
    assert isinstance(s, SetClause)
    assert s.items[0].target == Prop("n", ("age",))
    assert isinstance(s.items[0].value, Binary) and s.items[0].value.op == "+"


def test_case_stays_a_valid_name():
    # `case` is only a CASE expression when a WHEN body follows; bare
    # uses remain ordinary variable references (parser.py lookahead).
    from rust_graph_db_spark.parser.ast_nodes import CaseExpr, Var

    q = parse_cypher("MATCH (case:Person) RETURN case")
    assert q.clauses[1].items[0].expr == Var("case")
    q = parse_cypher("MATCH (case:Person) RETURN case.age AS a, size(case.name) AS s")
    assert q.clauses[1].items[0].expr == Prop("case", ("age",))
    q = parse_cypher(
        "MATCH (p:Person) RETURN CASE WHEN p.age > 1 THEN 'a' ELSE 'b' END AS c")
    assert isinstance(q.clauses[1].items[0].expr, CaseExpr)
    q = parse_cypher(
        "MATCH (p:Person) RETURN CASE p.city WHEN 'NYC' THEN 1 ELSE 0 END AS c")
    assert isinstance(q.clauses[1].items[0].expr, CaseExpr)


@pytest.mark.parametrize("q", [
    "MATCH (a:Person RETURN a",
    "RETURN",
    "MATCH (a)-[r->](b) RETURN a",
    "MATCH (a)<-[r]->(b) RETURN a",
    "",
])
def test_rejects(q):
    with pytest.raises(CypherSyntaxError):
        parse_cypher(q)
