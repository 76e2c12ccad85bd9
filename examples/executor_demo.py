"""Query surface tour — mirrors the reference's examples/executor_demo.rs
(MATCH / WHERE / aggregation / ORDER BY / OPTIONAL MATCH / UNION / VLE),
each compiling to a lazy DataFrame plan that Catalyst optimizes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark=None):
    import rust_graph_db_spark as rg
    from rust_graph_db_spark.graphs import knows_graph

    spark = spark or rg.get_spark("executor_demo")
    g = knows_graph(spark, "/root/testdata/sf0.001")

    demos = [
        ("filtered scan",
         "MATCH (p:Person) WHERE p.age > 60 RETURN p.name AS name LIMIT 5"),
        ("expand + edge predicate",
         "MATCH (a:Person)-[r:KNOWS]->(b) WHERE r.since >= 2021 "
         "RETURN a.name AS a, b.name AS b LIMIT 5"),
        ("implicit grouping",
         "MATCH (p:Person) RETURN p.city AS city, count(*) AS n, "
         "avg(p.age) AS avg_age ORDER BY city"),
        ("OPTIONAL MATCH",
         "MATCH (a:Person) OPTIONAL MATCH (a)-[:KNOWS]->(b:Person) "
         "WHERE b.age > 75 RETURN a.name AS a, b.name AS b LIMIT 5"),
        ("UNION",
         "MATCH (p:Person) WHERE p.age > 75 RETURN p.name AS name "
         "UNION MATCH (p:Person {city:'NYC'}) RETURN p.name AS name"),
        ("variable-length expansion",
         "MATCH (a:Person {name:'Person0'})-[r:KNOWS*1..3]->(b) "
         "RETURN b.name AS b, toInteger(length(r)) AS hops LIMIT 5"),
        ("EXISTS subquery (semi-join)",
         "MATCH (a:Person) WHERE a.age > 70 AND "
         "EXISTS { (a)-[:KNOWS]->(b:Person) WHERE b.age > a.age } "
         "RETURN a.name AS name LIMIT 5"),
        ("COUNT subquery + pattern comprehension",
         "MATCH (a:Person) WHERE a.age % 25 = 0 "
         "RETURN a.name AS name, COUNT { (a)-[:KNOWS]->() } AS deg, "
         "[(a)-[:KNOWS]->(b) | b.name] AS friends LIMIT 5"),
        ("quantifiers over per-row lists",
         "MATCH (p:Person) WHERE p.age = 30 "
         "RETURN p.name AS name, "
         "all(x IN range(1, 3) WHERE x > 0) AS all_pos, "
         "single(x IN [p.age] WHERE x = 30) AS is30 LIMIT 3"),
        ("named path + shortestPath",
         "MATCH p = shortestPath((a:Person {name:'Person0'})"
         "-[:KNOWS*1..4]->(b:Person)) "
         "RETURN b.name AS b, length(p) AS d, nodes(p) AS ns "
         "ORDER BY d, b LIMIT 4"),
        ("CALL subquery with per-row aggregation",
         "MATCH (a:Person) WHERE a.age > 75 "
         "CALL { WITH a MATCH (a)-[:KNOWS]->(f:Person) "
         "RETURN count(*) AS friends } "
         "RETURN a.name AS name, friends ORDER BY name LIMIT 5"),
        ("map projection",
         "MATCH (n:Person) WHERE n.age = 40 "
         "RETURN n {.name, .city, retired: n.age >= 65} AS card LIMIT 3"),
        ("lateral top-1 per outer row (CALL ... ORDER BY/LIMIT)",
         "MATCH (a:Person) WHERE a.age > 75 "
         "CALL { WITH a MATCH (a)-[:KNOWS]->(b:Person) "
         "RETURN b.name AS best ORDER BY b.age DESC, b.name LIMIT 1 } "
         "RETURN a.name AS name, best ORDER BY name LIMIT 5"),
    ]
    out = None
    for title, q in demos:
        print(f"-- {title}")
        out = g.cypher(q)
        out.show(truncate=False)
    return out


if __name__ == "__main__":
    main()
