"""Graph algorithms — mirrors the reference's examples/algorithms_demo.rs
(Dijkstra / BFS) and extends it with the whole-graph analytics the
reference lacks: PageRank (plus personalized), connected components,
k-core, label propagation, and DeepWalk-style random walks."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark=None):
    from pyspark.sql import functions as F

    import rust_graph_db_spark as rg
    from rust_graph_db_spark.io import generate_graph
    from rust_graph_db_spark.operators.graph_algos import (
        connected_components, degrees, k_core, label_propagation, pagerank,
        personalized_pagerank, random_walks, triangle_count,
        walk_skipgram_pairs)
    from rust_graph_db_spark.operators.traversal import (
        bfs_distances, weighted_shortest_distances)

    spark = spark or rg.get_spark("algorithms_demo")
    g = generate_graph(spark, "power_law", n=500, edges_per_vertex=4, seed=7)
    edges = g.edge_frame(g.edge_labels[0]).select("src", "dst")
    start = edges.select("src").first().src

    print("-- BFS distances from", start)
    bfs_distances(edges, [start], max_hops=4).show(5)
    print("-- weighted shortest distances (Dijkstra/Bellman-Ford)")
    weighted_shortest_distances(
        edges.withColumn("w", (F.pmod(F.col("src"), F.lit(5)) + 1)
                              .cast("double")),
        start, weight_col="w").show(5)
    print("-- PageRank top 5")
    pr = pagerank(edges, iterations=8)
    pr.orderBy(pr.rank.desc()).show(5)
    print("-- personalized PageRank around", start)
    personalized_pagerank(edges, [start], iterations=8) \
        .orderBy("rank", ascending=False).show(5)
    print("-- components / degrees / triangles")
    connected_components(edges).groupBy("component").count().show(5)
    degrees(edges).show(5)
    triangle_count(edges).show()
    print("-- k-core / label propagation")
    k_core(edges, k=3).show(5)
    label_propagation(edges, iterations=4).groupBy("label").count().show(5)
    print("-- strongly connected components (directed)")
    from rust_graph_db_spark.operators.graph_algos import (
        betweenness_centrality, strongly_connected_components,
    )
    strongly_connected_components(edges).groupBy("component").count() \
        .orderBy(F.desc("count")).show(5)
    print("-- betweenness centrality (8 hashed pivots)")
    betweenness_centrality(edges, sample=8, seed=1) \
        .orderBy(F.desc("betweenness")).show(5)
    print("-- the same algorithms from Cypher via CALL ... YIELD")
    g.cypher(
        "CALL algo.scc('" + g.edge_labels[0] + "') YIELD id, component "
        "RETURN component, count(*) AS n ORDER BY n DESC LIMIT 5").show()
    print("-- random walks -> skip-gram pairs")
    walks = random_walks(edges, walk_length=5, seed=1)
    pairs = walk_skipgram_pairs(walks, window=2)
    pairs.show(5)
    print("-- k-truss (r5): cohesive subgraph by triangle support")
    from rust_graph_db_spark.operators.graph_algos import (
        k_truss, link_prediction,
    )
    print("4-truss edges of the (triangle-free) ring:",
          k_truss(edges, k=4).count())
    print("-- link prediction (r5): who should know whom")
    link_prediction(edges).orderBy(F.desc("cn"), "u", "v").show(5)
    print("-- local clustering coefficient (r5): how cliquish is each"
          " neighborhood")
    from rust_graph_db_spark.operators.graph_algos import local_clustering
    local_clustering(edges).orderBy(F.desc("lcc"), "id").show(5)
    return pairs


if __name__ == "__main__":
    main()
