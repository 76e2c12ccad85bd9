"""Durable storage — mirrors the reference's examples/storage_demo.rs
(RocksDB-backed store) on the versioned parquet store: atomic
manifest-swap commits, snapshot isolation, time travel, bucketed
co-located layout, and the snapshot diff (change-data feed)."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark=None):
    import rust_graph_db_spark as rg
    from rust_graph_db_spark.graphs import knows_graph
    from rust_graph_db_spark.storage import snapshot_diff

    spark = spark or rg.get_spark("storage_demo")
    root = tempfile.mkdtemp(prefix="rgds_store_demo_") + "/store"

    g = knows_graph(spark, "/root/testdata/sf0.001")
    v1 = g.save(root, buckets=8)              # bucketed, co-located layout
    print("committed version", v1)

    # mutate in-session, commit again -> version 2
    g.cypher("MATCH (p:Person) WHERE p.age >= 70 "
             "SET p.age = p.age + 1").collect()
    v2 = g.save(root)
    print("committed version", v2)

    # time travel: both versions remain readable
    old = rg.PropertyGraph.load(spark, root, version=v1)
    new = rg.PropertyGraph.load(spark, root)
    a = old.cypher("MATCH (p:Person) RETURN sum(p.age) AS s").first().s
    b = new.cypher("MATCH (p:Person) RETURN sum(p.age) AS s").first().s
    print(f"age sum v{v1} = {a}, v{v2} = {b}")

    # change-data feed between the two commits
    diff = snapshot_diff(spark, root, v1, v2)
    diff.groupBy("change").count().show()
    return diff


if __name__ == "__main__":
    main()
