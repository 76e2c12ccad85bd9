"""Procedure registry for ``CALL name(args) [YIELD ...]`` in Cypher.

The reference exposes its graph algorithms only as Rust library calls
(re-exported at src/lib.rs:48-64 — shortest_path, variable_length_expand,
k_hop_neighbors); this engine additionally surfaces the whole algorithm
library *inside the query language*, Neo4j-GDS-style, so a reference
user can move an analytics call into a Cypher pipeline:

    CALL algo.pagerank('KNOWS', 5) YIELD id, rank
    RETURN id, rank ORDER BY rank DESC LIMIT 10

Procedures are driver-side Python callables ``fn(graph, *args) ->
DataFrame``; their output columns become scalar bindings for the rest
of the pipeline. Arguments must be literals (they parameterize a plan,
they are not per-row expressions). Register your own with
:func:`register` — the same extension stance as the scalar-UDF registry
(SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable) -> None:
    """Register ``fn(graph, *literal_args) -> DataFrame`` under a
    case-insensitive dotted procedure name."""
    REGISTRY[name.lower()] = fn


def _edges(graph, rel: str | None):
    """Edge list for one relationship type (or all), as (src, dst)."""
    e = graph.edges(rel) if rel else graph.edges()
    return e.select("src", "dst")


# ------------------------------------------------------------- catalog

def _db_labels(graph) -> DataFrame:
    return graph.spark.createDataFrame(
        [(l,) for l in graph.vertex_labels], "label STRING")


def _db_rel_types(graph) -> DataFrame:
    return graph.spark.createDataFrame(
        [(l,) for l in graph.edge_labels], "relationshipType STRING")


# ----------------------------------------------------------- algorithms

def _pagerank(graph, rel=None, iterations=10, damping=0.85) -> DataFrame:
    from ..operators.graph_algos import pagerank
    return pagerank(_edges(graph, rel), iterations=int(iterations),
                    damping=float(damping))


def _wcc(graph, rel=None) -> DataFrame:
    from ..operators.graph_algos import connected_components
    return connected_components(_edges(graph, rel))


def _scc(graph, rel=None) -> DataFrame:
    from ..operators.graph_algos import strongly_connected_components
    return strongly_connected_components(_edges(graph, rel))


def _degrees(graph, rel=None) -> DataFrame:
    from ..operators.graph_algos import degrees
    return degrees(_edges(graph, rel))


def _label_propagation(graph, rel=None, iterations=5) -> DataFrame:
    from ..operators.graph_algos import label_propagation
    return label_propagation(_edges(graph, rel), iterations=int(iterations))


def _triangle_count(graph, rel=None) -> DataFrame:
    from ..operators.graph_algos import triangle_count
    return triangle_count(_edges(graph, rel))


def _betweenness(graph, rel=None, sample=None, seed=0,
                 exact=False) -> DataFrame:
    """CALL algo.betweenness([rel], [sample], [seed], [exact]).

    By default graphs above 4096 vertices auto-degrade to the
    Brandes–Pich SAMPLED estimator (k = clamp(√n, 64, 1024) pivots) —
    the library's ``auto_sample_threshold`` size gate. Pass
    ``exact: true`` to force the exact O(V·E) computation regardless
    of graph size (estimates and exact values can differ on any graph
    past the gate), or ``sample: k`` to pin the pivot count."""
    from ..operators.graph_algos import betweenness_centrality

    truthy = (True, "true", "TRUE", "True", 1)
    return betweenness_centrality(
        _edges(graph, rel),
        sample=int(sample) if sample is not None else None,
        seed=int(seed),
        auto_sample_threshold=None if exact in truthy else 4096)


def _kcore(graph, rel=None, k=3) -> DataFrame:
    from ..operators.graph_algos import k_core
    return k_core(_edges(graph, rel), k=int(k))


def _ktruss(graph, rel=None, k=4) -> DataFrame:
    """k-truss edges with within-truss support: (u, v, support)."""
    from ..operators.graph_algos import k_truss
    return k_truss(_edges(graph, rel), k=int(k))


def _link_predict(graph, rel=None, min_cn=1) -> DataFrame:
    """Link-prediction scores for non-adjacent pairs:
    (u, v, cn, jac, pa)."""
    from ..operators.graph_algos import link_prediction
    return link_prediction(_edges(graph, rel), min_cn=int(min_cn))


def _bfs(graph, start, rel=None, max_hops=30) -> DataFrame:
    """Hop distances from a packed-graphid start vertex: (id, dist)."""
    from ..operators.traversal import bfs_distances
    return bfs_distances(_edges(graph, rel), [int(start)],
                         max_hops=int(max_hops)) \
        .select(F.col("id"), F.col("dist"))


def _sssp(graph, start, rel=None, weight="weight") -> DataFrame:
    """Weighted single-source shortest distances (Bellman-Ford
    relaxation) from a packed-graphid start: (id, dist). ``weight``
    names an edge property of the relationship type."""
    from ..operators.traversal import weighted_shortest_distances
    e = graph.edges(rel) if rel else graph.edges()
    if weight not in e.columns:
        raise ValueError(
            f"algo.sssp: relationship has no {weight!r} property "
            f"(columns: {[c for c in e.columns]})")
    return weighted_shortest_distances(
        e.select("src", "dst", weight), int(start), weight_col=weight)


def _modularity(graph, rel=None, iterations=5) -> DataFrame:
    """Modularity of the label-propagation communities over one
    relationship type — community DETECTION + EVALUATION in one call."""
    from ..operators.graph_algos import label_propagation, modularity
    e = _edges(graph, rel)
    asg = label_propagation(e, iterations=int(iterations)) \
        .withColumnRenamed("label", "community")
    return modularity(e, asg)


def _harmonic(graph, rel=None, max_hops=8) -> DataFrame:
    from ..operators.graph_algos import harmonic_centrality
    return harmonic_centrality(_edges(graph, rel), max_hops=int(max_hops))


def _closeness(graph, rel=None, max_hops=8) -> DataFrame:
    from ..operators.graph_algos import closeness_centrality
    return closeness_centrality(_edges(graph, rel), max_hops=int(max_hops))


def _mis(graph, rel=None, seed=0) -> DataFrame:
    """Deterministic Luby maximal independent set: (id, in_mis)."""
    from ..operators.graph_algos import maximal_independent_set
    return maximal_independent_set(_edges(graph, rel), seed=int(seed))


def _graph_profile(graph, rel=None) -> DataFrame:
    """One-row graph summary (density/reciprocity/transitivity/
    assortativity...) — algo.graphProfile."""
    from ..operators.graph_algos import graph_profile
    return graph_profile(_edges(graph, rel))


def _db_property_keys(graph) -> DataFrame:
    """All property keys across vertex and edge labels (Neo4j
    db.propertyKeys parity)."""
    keys = set()
    for lbl in graph.vertex_labels:
        keys.update(c for c in graph.vertex_frame(lbl).columns
                    if c != "id")
    for lbl in graph.edge_labels:
        keys.update(c for c in graph.edge_frame(lbl).columns
                    if c not in ("id", "src", "dst"))
    return graph.spark.createDataFrame(
        [(k,) for k in sorted(keys)], "propertyKey STRING")


register("db.labels", _db_labels)
register("db.relationshipTypes", _db_rel_types)
register("algo.pagerank", _pagerank)
register("algo.wcc", _wcc)
register("algo.scc", _scc)
register("algo.degrees", _degrees)
register("algo.labelPropagation", _label_propagation)
register("algo.triangleCount", _triangle_count)
register("algo.betweenness", _betweenness)
register("algo.kcore", _kcore)
register("algo.ktruss", _ktruss)
register("algo.linkPredict", _link_predict)
register("algo.bfs", _bfs)
register("algo.sssp", _sssp)
register("algo.modularity", _modularity)
register("algo.harmonic", _harmonic)
register("algo.closeness", _closeness)
register("algo.mis", _mis)
register("algo.graphProfile", _graph_profile)
register("db.propertyKeys", _db_property_keys)
