"""DML semantics — mirrors the reference integration corpus
(tests/integration_test.rs CRUD workflow, delete guard, DETACH DELETE,
SET read-modify-write incl. expressions)."""

import pytest

from rust_graph_db_spark import PropertyGraph
from rust_graph_db_spark.dml import CypherWriteError


@pytest.fixture()
def g(spark):
    g = PropertyGraph(spark)
    g.cypher("CREATE (a:Person {name: 'Alice', age: 30})-[:KNOWS {since: 2020}]->"
             "(b:Person {name: 'Bob', age: 25})").collect()
    g.cypher("CREATE (c:Person {name: 'Carol', age: 41})").collect()
    return g


def test_create(g):
    assert sorted((r["name"], r["age"]) for r in g.vertex_frame("Person").collect()) == [
        ("Alice", 30), ("Bob", 25), ("Carol", 41)]
    assert g.edge_frame("KNOWS").count() == 1


def test_match_create_edge(g):
    g.cypher("MATCH (a:Person {name:'Bob'}), (c:Person {name:'Carol'}) "
             "CREATE (a)-[:KNOWS {since: 2024}]->(c)").collect()
    assert g.edge_frame("KNOWS").count() == 2
    assert g.cypher("MATCH (:Person {name:'Bob'})-[r:KNOWS]->(c:Person) "
                    "RETURN c.name AS n").collect()[0]["n"] == "Carol"


def test_set_rmw_and_new_prop(g):
    g.cypher("MATCH (n:Person) WHERE n.name = 'Alice' "
             "SET n.age = n.age + 1, n.city = 'NYC'").collect()
    row = g.vertex_frame("Person").where("name='Alice'").first()
    assert row["age"] == 31 and row["city"] == "NYC"
    # others untouched, new column null-padded
    assert g.vertex_frame("Person").where("name='Bob'").first()["city"] is None


def test_set_map_merge(g):
    # SET n += {map}: per-key upsert, unlisted properties untouched
    g.cypher("MATCH (n:Person {name:'Alice'}) "
             "SET n += {age: n.age + 10, city: 'NYC'}").collect()
    row = g.vertex_frame("Person").where("name='Alice'").first()
    assert row["age"] == 40 and row["city"] == "NYC"
    assert g.vertex_frame("Person").where("name='Bob'").first()["age"] == 25


def test_set_map_replace(g):
    # SET n = {map}: unlisted property columns are CLEARED on the
    # matched rows only
    g.cypher("MATCH (n:Person {name:'Alice'}) SET n.city = 'LA'").collect()
    g.cypher("MATCH (n:Person {name:'Alice'}) "
             "SET n = {name: 'Alice', age: 99}").collect()
    row = g.vertex_frame("Person").where("age=99").first()
    assert row["name"] == "Alice" and row["city"] is None
    # unmatched rows keep every property
    bob = g.vertex_frame("Person").where("name='Bob'").first()
    assert bob["age"] == 25


def test_set_map_replace_empty_clears_all(g):
    g.cypher("MATCH (n:Person {name:'Carol'}) SET n = {}").collect()
    # Carol's id survives; name/age cleared
    assert g.vertex_frame("Person").where("name IS NULL").count() == 1
    assert g.vertex_frame("Person").where("name='Alice'").first()["age"] == 30


def test_set_map_forms_rejected_in_merge_arms(g):
    from rust_graph_db_spark.parser.parser import CypherSyntaxError

    with pytest.raises(CypherSyntaxError, match="replacement"):
        g.cypher("MERGE (n:Person {name:'Zed'}) "
                 "ON CREATE SET n = {name: 'Zed'}").collect()
    # += is fine in MERGE arms (desugars to per-key items)
    g.cypher("MERGE (n:Person {name:'Zed'}) "
             "ON CREATE SET n += {age: 1}").collect()
    assert g.vertex_frame("Person").where("name='Zed'").first()["age"] == 1


def test_set_string_concat(g):
    g.cypher("MATCH (n:Person {name:'Bob'}) SET n.name = n.name + '!'").collect()
    assert g.vertex_frame("Person").where("age=25").first()["name"] == "Bob!"


def test_delete_guard(g):
    with pytest.raises(CypherWriteError):
        g.cypher("MATCH (n:Person {name:'Bob'}) DELETE n").collect()


def test_delete_leaf(g):
    g.cypher("MATCH (n:Person {name:'Carol'}) DELETE n").collect()
    assert g.vertex_frame("Person").count() == 2


def test_detach_delete(g):
    g.cypher("MATCH (n:Person {name:'Bob'}) DETACH DELETE n").collect()
    assert g.vertex_frame("Person").count() == 2
    assert g.edge_frame("KNOWS").count() == 0


def test_create_undirected_rejected(g):
    with pytest.raises(CypherWriteError):
        g.cypher("MATCH (a:Person {name:'Alice'}), (b:Person {name:'Bob'}) "
                 "CREATE (a)-[:LINKS]-(b)").collect()


def test_create_requires_label(g):
    with pytest.raises(CypherWriteError):
        g.cypher("CREATE (x {name: 'NoLabel'})").collect()


def test_ids_unique_and_packed(g):
    g.cypher("CREATE (d:Person {name: 'Dave'})").collect()
    ids = [r["id"] for r in g.vertex_frame("Person").collect()]
    assert len(ids) == len(set(ids))
    labid = g.label_id("Person")
    assert all((i >> 48) == labid for i in ids)


def test_create_nested_props_and_nested_set(g):
    """Reference §1.2 nested objects + W5 nested SET
    (tests/test_set_nested_integration.rs)."""
    g.cypher("CREATE (d:Person {name: 'Dana', age: 28, "
             "address: {city: 'NYC', zip: '10001'}, tags: ['a', 'b']})").collect()
    row = g.cypher("MATCH (p:Person {name:'Dana'}) "
                   "RETURN p.address.city AS city, p.tags AS tags").collect()[0]
    assert row["city"] == "NYC" and list(row["tags"]) == ["a", "b"]
    g.cypher("MATCH (p:Person {name:'Dana'}) "
             "SET p.address.city = 'Boston'").collect()
    row = g.cypher("MATCH (p:Person {name:'Dana'}) "
                   "RETURN p.address.city AS c, p.address.zip AS z").collect()[0]
    assert row["c"] == "Boston" and row["z"] == "10001"
    # nested SET with missing parent still errors (parent-must-exist)
    with pytest.raises(CypherWriteError):
        g.cypher("MATCH (p:Person {name:'Dana'}) "
                 "SET p.missing.x = 1").collect()


# ------------------------------------------------------------------ MERGE

def test_merge_creates_when_absent(g):
    out = g.cypher("MERGE (p:Person {name: 'Dave'}) "
                   "ON CREATE SET p.age = 50 ON MATCH SET p.age = 99 "
                   "RETURN p.name AS n").collect()
    assert [r["n"] for r in out] == ["Dave"]
    rows = {r["name"]: r["age"] for r in g.vertex_frame("Person").collect()}
    assert rows["Dave"] == 50                 # ON CREATE applied, not ON MATCH
    assert len(rows) == 4


def test_merge_binds_when_present(g):
    g.cypher("MERGE (p:Person {name: 'Alice'}) "
             "ON CREATE SET p.age = 1 ON MATCH SET p.age = p.age + 100") \
        .collect()
    rows = {r["name"]: r["age"] for r in g.vertex_frame("Person").collect()}
    assert rows["Alice"] == 130               # ON MATCH read-modify-write
    assert len(rows) == 3                     # nothing created


def test_merge_idempotent(g):
    for _ in range(3):
        g.cypher("MERGE (p:Person {name: 'Eve', age: 20})").collect()
    assert g.vertex_frame("Person").where("name = 'Eve'").count() == 1


def test_merge_matches_on_full_property_map(g):
    # same name, different age -> no match -> second node created
    g.cypher("MERGE (p:Person {name: 'Alice', age: 31})").collect()
    assert g.vertex_frame("Person").where("name = 'Alice'").count() == 2


def test_merge_new_label(spark):
    g2 = PropertyGraph(spark)
    g2.cypher("MERGE (c:City {name: 'Oslo'})").collect()
    assert g2.vertex_frame("City").count() == 1


def test_merge_node_after_match_creates_once(g):
    # literal-pattern MERGE mid-query: one node created even though the
    # pipeline carries 3 rows; bound onto every row
    out = g.cypher("MATCH (p:Person) MERGE (q:City {name: 'Oslo'}) "
                   "RETURN p.name AS pn, q.name AS qn ORDER BY pn").collect()
    assert [r["qn"] for r in out] == ["Oslo"] * 3
    assert g.vertex_frame("City").count() == 1


def test_merge_node_after_zero_row_match_creates_nothing(g):
    # Cypher runs MERGE once per pipeline row: zero rows = zero
    # executions — no side-effect node, and the query returns no rows
    out = g.cypher("MATCH (p:Person {name: 'Nobody'}) "
                   "MERGE (q:City {name: 'Oslo'}) "
                   "RETURN p.name AS pn, q.name AS qn").collect()
    assert out == []
    assert "City" not in g._vertices or g.vertex_frame("City").count() == 0


def test_merge_node_after_match_binds_existing(g):
    g.cypher("CREATE (c:City {name: 'Rome', pop: 3})").collect()
    out = g.cypher("MATCH (p:Person {name:'Alice'}) "
                   "MERGE (q:City {name: 'Rome'}) "
                   "RETURN p.name AS pn, q.pop AS pop").collect()
    assert [(r["pn"], r["pop"]) for r in out] == [("Alice", 3)]
    assert g.vertex_frame("City").count() == 1


def test_merge_rejects_rebound_variable(g):
    with pytest.raises(CypherWriteError):
        g.cypher("MATCH (p:Person) MERGE (p:Person {name: 'X'})").collect()


def test_merge_return_after_match(g):
    out = g.cypher("MERGE (p:Person {name: 'Bob'}) "
                   "RETURN p.name AS n, p.age AS a").collect()
    assert [(r["n"], r["a"]) for r in out] == [("Bob", 25)]


def test_merge_edge_dedup_checked(g):
    q = ("MATCH (a:Person {name:'Alice'}), (c:Person {name:'Carol'}) "
         "MERGE (a)-[:KNOWS {since: 2025}]->(c)")
    for _ in range(3):
        g.cypher(q).collect()
    assert g.edge_frame("KNOWS").where("since = 2025").count() == 1
    assert g.edge_frame("KNOWS").count() == 2   # original Alice->Bob intact


def test_merge_edge_props_distinguish(g):
    g.cypher("MATCH (a:Person {name:'Alice'}), (b:Person {name:'Bob'}) "
             "MERGE (a)-[:KNOWS {since: 2020}]->(b)").collect()   # exists
    assert g.edge_frame("KNOWS").count() == 1
    g.cypher("MATCH (a:Person {name:'Alice'}), (b:Person {name:'Bob'}) "
             "MERGE (a)-[:KNOWS {since: 2021}]->(b)").collect()   # differs
    assert g.edge_frame("KNOWS").count() == 2


def test_merge_edge_new_label_and_multirow(g):
    # every (Alice|Bob) x Carol pair gets exactly one LIKES edge
    q = ("MATCH (p:Person), (c:Person {name:'Carol'}) "
         "WHERE p.name IN ['Alice', 'Bob'] MERGE (p)-[:LIKES]->(c)")
    g.cypher(q).collect()
    g.cypher(q).collect()
    assert g.edge_frame("LIKES").count() == 2


def test_merge_edge_requires_bound_endpoints(g):
    with pytest.raises(CypherWriteError):
        g.cypher("MERGE (a)-[:KNOWS]->(b)").collect()


def test_merge_edge_on_create_set(g):
    q = ("MATCH (a:Person {name:'Alice'}), (c:Person {name:'Carol'}) "
         "MERGE (a)-[r:LIKES]->(c) "
         "ON CREATE SET r.weight = 1 ON MATCH SET r.weight = r.weight + 1")
    g.cypher(q).collect()
    assert g.edge_frame("LIKES").first()["weight"] == 1   # created arm
    g.cypher(q).collect()
    g.cypher(q).collect()
    assert g.edge_frame("LIKES").count() == 1
    assert g.edge_frame("LIKES").first()["weight"] == 3   # matched arm RMW


def test_merge_edge_on_match_only_targets_matched_pairs(g):
    # Alice->Bob exists (since 2020); Alice->Carol does not. One MERGE
    # over both pairs: the existing edge gets ON MATCH, the new one
    # gets ON CREATE — and only edges in the merged pair set change.
    g.cypher("MATCH (a:Person {name:'Bob'}), (c:Person {name:'Carol'}) "
             "CREATE (a)-[:KNOWS {since: 2020}]->(c)").collect()
    g.cypher("MATCH (a:Person {name:'Alice'}), (b:Person) "
             "WHERE b.name IN ['Bob', 'Carol'] "
             "MERGE (a)-[r:KNOWS {since: 2020}]->(b) "
             "ON CREATE SET r.flag = 'new' ON MATCH SET r.flag = 'old'") \
        .collect()
    rows = {(r["since"], r["flag"]) for r in g.edge_frame("KNOWS").collect()}
    # Alice->Bob matched, Alice->Carol created, Bob->Carol untouched
    assert (2020, "old") in rows and (2020, "new") in rows
    assert (2020, None) in rows


def test_merge_whole_path_creates_all(g):
    # no City exists: the full path (both nodes + edge) is created once
    q = ("MERGE (p:Person {name: 'Zed'})-[r:LIVES_IN]->(c:City {name: 'Oslo'}) "
         "ON CREATE SET r.since = 2024")
    g.cypher(q).collect()
    g.cypher(q).collect()                  # idempotent: full match now exists
    assert g.vertex_frame("Person").where("name = 'Zed'").count() == 1
    assert g.vertex_frame("City").count() == 1
    assert g.edge_frame("LIVES_IN").count() == 1
    assert g.edge_frame("LIVES_IN").first()["since"] == 2024


def test_merge_whole_path_partial_does_not_prevent_create(g):
    # Cypher: an existing endpoint WITHOUT the full pattern still means
    # the whole path is created fresh (second Alice node appears)
    g.cypher("MERGE (p:Person {name: 'Alice'})-[:LIKES]->"
             "(c:City {name: 'Rome'})").collect()
    # Alice exists but Alice-[:LIKES]->Rome does not -> new Alice + Rome
    assert g.vertex_frame("Person").where("name = 'Alice'").count() == 2
    assert g.edge_frame("LIKES").count() == 1


def test_merge_whole_path_on_match(g):
    g.cypher("MERGE (p:Person {name: 'Y'})-[r:KNOWS {since: 1999}]->"
             "(q:Person {name: 'Z'})").collect()
    g.cypher("MERGE (p:Person {name: 'Y'})-[r:KNOWS {since: 1999}]->"
             "(q:Person {name: 'Z'}) "
             "ON MATCH SET p.flag = 1, q.flag = 2").collect()
    rows = {r["name"]: r["flag"] for r in g.vertex_frame("Person")
            .where("name IN ('Y', 'Z')").collect()}
    assert rows == {"Y": 1, "Z": 2}


def test_merge_edge_on_set_requires_rel_var(g):
    with pytest.raises(CypherWriteError):
        g.cypher("MATCH (a:Person {name:'Alice'}), (c:Person {name:'Carol'}) "
                 "MERGE (a)-[:LIKES]->(c) ON CREATE SET a.x = 1").collect()


def test_remove_property(g):
    """REMOVE n.prop — compiles to the SET-to-NULL dataflow; in the
    column model a NULL property IS an absent property (exists() goes
    false, keys() drops it)."""
    g.cypher("MATCH (p:Person {name: 'Alice'}) REMOVE p.age").collect()
    r = g.cypher("MATCH (p:Person {name: 'Alice'}) "
                 "RETURN p.age AS age, exists(p.age) AS has, "
                 "keys(p) AS ks").first()
    assert r.age is None and r.has is False and "age" not in r.ks
    # other rows untouched
    assert g.cypher("MATCH (p:Person) WHERE p.age IS NOT NULL "
                    "RETURN count(*) AS c").first().c >= 1


def test_foreach(g):
    """FOREACH (x IN list | writes) — the write side explodes the list
    (empty/NULL lists run zero iterations for that row), the pipeline
    afterwards keeps its original cardinality, and CREATE property
    maps may reference the loop variable and outer bindings (the
    expression-props extension)."""
    out = g.cypher(
        "MATCH (a:Person {name: 'Alice'}) "
        "FOREACH (i IN range(1, 3) | "
        "CREATE (t:Tag {idx: i, owner: a.name})) "
        "RETURN a.name AS name").collect()
    assert [r["name"] for r in out] == ["Alice"]        # cardinality kept
    tags = sorted((r["idx"], r["owner"])
                  for r in g.vertex_frame("Tag").collect())
    assert tags == [(1, "Alice"), (2, "Alice"), (3, "Alice")]
    # empty list: zero executions
    g.cypher("MATCH (a:Person) "
             "FOREACH (i IN [] | CREATE (x:Nope {z: i}))").collect()
    assert "Nope" not in g._vertices or g.vertex_frame("Nope").count() == 0
    # SET through the loop variable
    g.cypher("MATCH (t:Tag {idx: 2}) "
             "FOREACH (v IN [20] | SET t.idx = v)").collect()
    assert sorted(r["idx"] for r in g.vertex_frame("Tag").collect()) \
        == [1, 3, 20]
    # non-write clauses are rejected in the body
    from rust_graph_db_spark.parser.parser import CypherSyntaxError
    with pytest.raises(CypherSyntaxError, match="FOREACH body"):
        g.cypher("MATCH (a:Person) "
                 "FOREACH (i IN [1] | RETURN i)").collect()


def test_foreach_ordered_set_and_edge_multiplicity(g):
    """Review fixes: FOREACH iterations are ORDERED (last SET wins,
    via the posexplode index), FOREACH CREATE makes one edge per
    iteration, and CREATE edge property maps accept expressions over
    the pipeline (same one-select rule as vertices)."""
    g.cypher("MATCH (t:Person {name:'Alice'}) "
             "FOREACH (v IN [1, 2, 3] | SET t.age = v)").collect()
    assert g.vertex_frame("Person").where("name='Alice'").first()["age"] == 3
    g.cypher("MATCH (a:Person {name:'Alice'}), (b:Person {name:'Bob'}) "
             "FOREACH (i IN [1, 2] | CREATE (a)-[:TAGGED {idx: i}]->(b))") \
        .collect()
    assert sorted(r["idx"] for r in g.edge_frame("TAGGED").collect()) == [1, 2]
    g.cypher("MATCH (a:Person {name:'Alice'}) "
             "CREATE (a)-[:SELF {w: a.age * 10}]->(a)").collect()
    assert g.edge_frame("SELF").first()["w"] == 30


def test_dml_params(spark):
    from rust_graph_db_spark.graphs import knows_graph

    g = knows_graph(spark, "/root/testdata/sf0.001")
    g.cypher("CREATE (n:PTag {name: $nm, weight: $w})",
             params={"nm": "x", "w": 3}).collect()
    r = g.cypher("MATCH (t:PTag) RETURN t.name AS n, t.weight AS w").first()
    assert (r.n, r.w) == ("x", 3)
    g.cypher("MERGE (n:PTag {name: $nm}) ON MATCH SET n.weight = $w2",
             params={"nm": "x", "w2": 7}).collect()
    r = g.cypher("MATCH (t:PTag) RETURN count(*) AS c, "
                 "max(t.weight) AS w").first()
    assert (r.c, r.w) == (1, 7)
    g.cypher("MATCH (t:PTag {name: $nm}) DETACH DELETE t",
             params={"nm": "x"}).collect()
    assert g.cypher("MATCH (t:PTag) RETURN count(*) AS c").first().c == 0
