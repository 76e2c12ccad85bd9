"""Basic usage — mirrors the reference's examples/basic_usage.rs:
create vertices/edges with packed graph ids and properties, walk a
path, read properties back. Spark-first: entities are DataFrame rows,
ids pack (label, local) into one long exactly like the reference's
Graphid (model.py:34, ref src/types/mod.rs Graphid)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark=None):
    from pyspark.sql import functions as F

    import rust_graph_db_spark as rg
    from rust_graph_db_spark.model import (pack_graphid, unpack_labid,
                                           unpack_locid)

    spark = spark or rg.get_spark("basic_usage")
    g = rg.PropertyGraph(spark)

    # 1. vertices: a Person label keyed by a natural numeric id
    # (locid_col packs deterministic graph ids labid<<48 | loc)
    people = spark.createDataFrame(
        [(100, "Alice", 30, "Beijing"), (101, "Bob", 25, "Shanghai"),
         (102, "Carol", 35, "Shenzhen")],
        "loc LONG, name STRING, age LONG, city STRING")
    g.put_vertices("Person", people, locid_col="loc")
    labid = g.label_id("Person")

    # 2. edges: KNOWS with a property; src/dst reference the SAME
    # packed ids, edge ids are auto-assigned
    knows = spark.createDataFrame(
        [(100, 101, 2020), (101, 102, 2021)], "s LONG, d LONG, since LONG")
    g.put_edges("KNOWS", knows.select(
        pack_graphid(labid, F.col("s")).alias("src"),
        pack_graphid(labid, F.col("d")).alias("dst"), "since"))

    # 3. a 2-hop path, Cypher in / DataFrame out
    path = g.cypher(
        "MATCH (a:Person {name:'Alice'})-[:KNOWS]->(b)-[:KNOWS]->(c) "
        "RETURN a.name AS a, b.name AS b, c.name AS c")
    path.show()

    # 4. id round-trip (display form labid.locid, ref graphid.rs:77-81)
    from pyspark.sql import functions as _F
    g.vertex_frame("Person").select(
        "id", unpack_labid(_F.col("id")).alias("labid"),
        unpack_locid(_F.col("id")).alias("locid"), "name").show()
    return path


if __name__ == "__main__":
    main()
