"""Traversal operators on the F2 dag5 fixture — golden answers from the
reference unit tests (vle.rs:253-441, shortest_path.rs:256-393)."""

import pytest
from pyspark.sql import functions as F

from rust_graph_db_spark.operators import traversal as T

# A=1 B=2 C=3 D=4 E=5;  A→B, A→C, B→D, B→E, C→E
EDGES = [(1, 2), (1, 3), (2, 4), (2, 5), (3, 5)]


@pytest.fixture(scope="module")
def dag(spark):
    return spark.createDataFrame(EDGES, "src LONG, dst LONG")


def test_vle_paths(dag):
    got = sorted(tuple(r.vpath) for r in T.expand_paths(dag, [1], 1, 2).collect())
    assert got == [(1, 2), (1, 2, 4), (1, 2, 5), (1, 3), (1, 3, 5)]


def test_paths_between(dag):
    assert T.paths_between(dag, 1, 5, 1, 2).count() == 2


def test_k_hop(dag):
    assert sorted(r.b for r in T.k_hop_neighbors(dag, [1], 1).collect()) == [2, 3]
    assert sorted(r.b for r in T.k_hop_neighbors(dag, [1], 0).collect()) == [1]


def test_within_k(dag):
    got = sorted(r.b for r in T.neighbors_within_k_hops(dag, [1], 2).collect())
    assert got == [2, 3, 4, 5]


def test_shortest_path(dag):
    sp = T.shortest_path(dag, 1, 4)
    assert sp == {"path": [1, 2, 4], "cost": 2, "hops": 2}


def test_unreachable(dag):
    assert T.shortest_path(dag, 4, 1, max_hops=6) is None


def test_weighted(dag):
    w = dag.withColumn("weight", F.lit(2.0))
    got = sorted((r.id, r.dist) for r in T.weighted_shortest_distances(w, [1]).collect())
    assert got == [(1, 0.0), (2, 2.0), (3, 2.0), (4, 4.0), (5, 4.0)]


def test_grid_shortest_path(spark):
    """F3: 4-connected directed grid, corner→corner cost 2*(s-1)."""
    s = 10
    cells = [(r * s + c, r, c) for r in range(s) for c in range(s)]
    edges = []
    for i, r, c in cells:
        if c + 1 < s:
            edges.append((i, r * s + c + 1))
        if r + 1 < s:
            edges.append((i, (r + 1) * s + c))
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    sp = T.shortest_path(e, 0, s * s - 1, max_hops=2 * s)
    assert sp["cost"] == 2 * (s - 1)


def test_max_paths_cap(dag):
    capped = T.expand_paths(dag, [1], 1, 2, max_paths=2)
    assert capped.count() <= 4  # cap applies per level inside the loop


def test_bfs_driver_vs_distributed_parity(dag):
    # the size-adaptive driver BFS and the frontier-join rounds must
    # return the identical (start_id, id, dist) set; threshold=0 forces
    # the distributed path on the same input
    drv = {(r.start_id, r.id, r.dist)
           for r in T.bfs_distances(dag, [1, 2]).collect()}
    dist = {(r.start_id, r.id, r.dist)
            for r in T.bfs_distances(dag, [1, 2],
                                     driver_threshold=0).collect()}
    assert drv == dist
    assert (1, 5, 2) in drv and (2, 4, 1) in drv and (1, 1, 0) in drv


def test_bfs_driver_respects_max_hops(dag):
    got = {(r.id, r.dist)
           for r in T.bfs_distances(dag, [1], max_hops=1).collect()}
    assert got == {(1, 0), (2, 1), (3, 1)}


def test_weighted_sssp_driver_vs_distributed_parity(spark):
    # same random weighted digraph through both paths: the driver
    # Dijkstra (default threshold) and the distributed Bellman-Ford
    # rounds (threshold 0)
    import random

    rng = random.Random(7)
    n = 60
    rows = [(rng.randrange(n), rng.randrange(n), rng.choice([1.0, 2.5, 4.0]))
            for _ in range(240)]
    e = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    fast = sorted((r.id, r.dist) for r in
                  T.weighted_shortest_distances(e, [0]).collect())
    slow = sorted((r.id, r.dist) for r in
                  T.weighted_shortest_distances(
                      e, [0], driver_threshold=0).collect())
    assert fast == slow


def test_weighted_sssp_negative_weights_take_distributed_path(spark):
    # a negative edge must bypass Dijkstra (which would be wrong) and
    # still converge via Bellman-Ford on this DAG
    e = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 2.0), (2, 1, -1.0), (1, 3, 1.0)],
        "src LONG, dst LONG, weight DOUBLE")
    got = {r.id: r.dist for r in
           T.weighted_shortest_distances(e, [0]).collect()}
    assert got[1] == 1.0 and got[3] == 2.0
