"""rust_graph_db_spark — a PySpark-native property-graph + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (an openGauss-graph-compatible Cypher prototype; see
SURVEY.md), re-expressed Spark-first:

- property graph = per-label columnar DataFrames (Parquet-backed at scale),
  not row-oriented KV;
- Cypher subset compiled to lazy DataFrame plans (Catalyst optimizes);
- traversals (shortest path, variable-length expansion, k-hop) as
  Pregel-style iterative DataFrame loops with lineage control;
- plus the large-scale training-data-pipeline operators a 100 TB corpus
  needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding), ANN similarity search, text analysis, multimodal plumbing.

Entry points mirror the reference's three surfaces (SURVEY.md §3):
  1. ``PropertyGraph.cypher("MATCH ...")``  — query-string surface
  2. ``PropertyGraph`` verbs + ``operators.*``  — programmatic surface
  3. ``api.serve(spark)``  — the reference's 17-route social REST API
"""

from rust_graph_db_spark.functions.scalar import (
    register_cypher_function, unregister_cypher_function,
)
from rust_graph_db_spark.model import PropertyGraph, pack_graphid, unpack_labid, unpack_locid
from rust_graph_db_spark.session import get_spark
from rust_graph_db_spark.storage import CommitConflict, load_graph, save_graph

__all__ = [
    "CommitConflict",
    "PropertyGraph",
    "get_spark",
    "load_graph",
    "save_graph",
    "pack_graphid",
    "register_cypher_function",
    "unpack_labid",
    "unpack_locid",
    "unregister_cypher_function",
]

__version__ = "0.1.0"
