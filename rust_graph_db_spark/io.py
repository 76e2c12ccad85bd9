"""Graph import/export + synthetic generators (reference S7-S14).

Reference formats (src/tools/import.rs:85-107, export.rs:184-244):
  JSON:  {"vertices": [{"id"?, "label", "properties"}, ...],
          "edges":    [{"label", "start", "end", "properties"}, ...]}
  CSV:   header-driven; vertex `id` column optional (auto-assigned);
         edge rows resolve `start`/`end` through an id mapping.

Spark-first: imports are `spark.read` + joins (the old-id → Graphid
remap of import.rs:323-427 becomes an equi-join against the vertex id
map, not a driver-side HashMap); exports are `df.write`. Generators are
transformations of `spark.range(n)` with hash-derived pseudo-randomness
— deterministic per seed, no driver-side data, cluster-parallel
(reference tools/data_generator.rs uses a seeded RNG loop).
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_graph_db_spark.model import PropertyGraph, pack_graphid

# ------------------------------------------------------------------ JSON


def import_json(spark: SparkSession, path: str,
                graph: Optional[PropertyGraph] = None) -> PropertyGraph:
    """Load a reference-format JSON graph file (S7).

    Old ids are remapped per label to dense local ids via row_number,
    and edges resolve endpoints by joining the remap table — the
    distributed analog of import.rs's id_mapping HashMap.
    """
    from rust_graph_db_spark.operators.ids import dense_index

    g = graph or PropertyGraph(spark)
    raw = spark.read.option("multiLine", True).json(path)

    vtx = raw.select(F.explode("vertices").alias("v")).select(
        F.col("v.id").alias("_old_id"),
        F.col("v.label").alias("_label"),
        F.col("v.properties").alias("_props"))
    labels = [r[0] for r in vtx.select("_label").distinct().collect()]
    remaps = []
    for label in sorted(labels):
        labid = g.label_id(label)
        sub = vtx.where(F.col("_label") == label)
        sub, _ = dense_index(sub, ["_old_id"], "_loc")
        sub = sub.withColumn("id", pack_graphid(labid, F.col("_loc")))
        props = sub.select("id", "_old_id", "_props")
        prop_fields = [f.name for f in props.schema["_props"].dataType.fields] \
            if props.schema["_props"].dataType.typeName() == "struct" else []
        flat = props.select(
            "id", "_old_id",
            *[F.col(f"_props.{p}").alias(p) for p in prop_fields])
        g._vertices[label] = flat.drop("_old_id").localCheckpoint(eager=True)
        remaps.append(flat.select(F.col("_old_id"), F.col("id")))
    remap = remaps[0]
    for r in remaps[1:]:
        remap = remap.unionByName(r)

    if "edges" in raw.columns:
        edg = raw.select(F.explode("edges").alias("e")).select(
            F.col("e.label").alias("_label"),
            F.col("e.start").alias("_start"),
            F.col("e.end").alias("_end"),
            F.col("e.properties").alias("_props"))
        elabels = [r[0] for r in edg.select("_label").distinct().collect()]
        for label in sorted(elabels):
            labid = g.label_id(label)
            sub = edg.where(F.col("_label") == label)
            sub = (sub
                   .join(remap.select(F.col("_old_id").alias("_start"),
                                      F.col("id").alias("src")), "_start")
                   .join(remap.select(F.col("_old_id").alias("_end"),
                                      F.col("id").alias("dst")), "_end"))
            sub, _ = dense_index(sub, ["src", "dst"], "_eloc")
            sub = sub.withColumn(
                "id", pack_graphid(labid, F.col("_eloc"))).drop("_eloc")
            pf = [f.name for f in sub.schema["_props"].dataType.fields] \
                if sub.schema["_props"].dataType.typeName() == "struct" else []
            flat = sub.select(
                "id", "src", "dst",
                *[F.col(f"_props.{p}").alias(p) for p in pf])
            g.set_edges(label, flat.localCheckpoint(eager=True))
    return g


def export_jsonl(g: PropertyGraph, base_path: str,
                 vertex_labels: Optional[list] = None,
                 edge_labels: Optional[list] = None) -> None:
    """Scalable export (S10): one JSONL dataset per label under
    ``{base}/vertices/{label}`` and ``{base}/edges/{label}``."""
    for label in (vertex_labels or g.vertex_labels):
        g.vertex_frame(label).write.mode("overwrite").json(
            f"{base_path}/vertices/{label}")
    for label in (edge_labels or g.edge_labels):
        g.edge_frame(label).write.mode("overwrite").json(
            f"{base_path}/edges/{label}")


def export_json_file(g: PropertyGraph, path: str,
                     vertex_labels: Optional[list] = None,
                     edge_labels: Optional[list] = None) -> tuple:
    """Reference-compatible single-file export (driver-side collect —
    for small graphs / interchange only; use export_jsonl at scale)."""
    vertices, edges = [], []
    for label in (vertex_labels or g.vertex_labels):
        for row in g.vertex_frame(label).collect():
            d = row.asDict(recursive=True)
            vid = d.pop("id")
            vertices.append({"id": vid, "label": label,
                             "properties": {k: v for k, v in d.items()
                                            if v is not None}})
    for label in (edge_labels or g.edge_labels):
        for row in g.edge_frame(label).collect():
            d = row.asDict(recursive=True)
            eid, src, dst = d.pop("id"), d.pop("src"), d.pop("dst")
            edges.append({"id": eid, "label": label, "start": src, "end": dst,
                          "properties": {k: v for k, v in d.items()
                                         if v is not None}})
    with open(path, "w") as f:
        json.dump({"vertices": vertices, "edges": edges}, f)
    return len(vertices), len(edges)


# ------------------------------------------------------------------- CSV


def import_vertices_csv(spark: SparkSession, g: PropertyGraph, label: str,
                        path: str, id_col: Optional[str] = None) -> int:
    """S8: header-driven CSV → vertices (id column optional)."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    g.put_vertices(label, df, locid_col=id_col)
    return g.vertex_frame(label).count()


def import_edges_csv(spark: SparkSession, g: PropertyGraph, label: str,
                     path: str, start_col: str = "start",
                     end_col: str = "end",
                     resolve_label: Optional[str] = None,
                     resolve_key: Optional[str] = None) -> int:
    """S9: CSV edges; ``start``/``end`` resolve through the vertex id
    map (join on a natural key) when resolve_label/key are given,
    otherwise they are taken as already-packed ids."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    if resolve_label is not None and resolve_key is not None:
        vmap = g.vertex_frame(resolve_label).select(
            F.col(resolve_key).alias("_k"), F.col("id").alias("_vid"))
        df = (df.join(vmap.withColumnRenamed("_k", start_col)
                          .withColumnRenamed("_vid", "_src"), start_col)
                .join(vmap.withColumnRenamed("_k", end_col)
                          .withColumnRenamed("_vid", "_dst"), end_col)
                .drop(start_col, end_col)
                .withColumnRenamed("_src", "src")
                .withColumnRenamed("_dst", "dst"))
    else:
        df = (df.withColumnRenamed(start_col, "src")
                .withColumnRenamed(end_col, "dst"))
    g.put_edges(label, df)
    return g.edge_frame(label).count()


def export_csv(g: PropertyGraph, base_path: str,
               vertex_labels: Optional[list] = None,
               edge_labels: Optional[list] = None) -> None:
    """S11: CSV per label; property columns stay typed, plus a
    reference-style ``properties`` JSON column for compat."""
    for label in (vertex_labels or g.vertex_labels):
        df = g.vertex_frame(label)
        props = [c for c in df.columns if c != "id"]
        out = df.withColumn("properties", F.to_json(F.struct(*props))) \
            if props else df.withColumn("properties", F.lit("{}"))
        out.write.mode("overwrite").option("header", True).csv(
            f"{base_path}/vertices/{label}")
    for label in (edge_labels or g.edge_labels):
        df = g.edge_frame(label)
        props = [c for c in df.columns if c not in ("id", "src", "dst")]
        out = df.withColumn("properties", F.to_json(F.struct(*props))) \
            if props else df.withColumn("properties", F.lit("{}"))
        out.write.mode("overwrite").option("header", True).csv(
            f"{base_path}/edges/{label}")


# ------------------------------------------------------------- generators

def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from xxhash64 of the inputs."""
    h = F.xxhash64(*cols)
    return (F.abs(h) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def generate_graph(spark: SparkSession, graph_type: str, n: int,
                   edges_per_vertex: int = 2, seed: int = 42,
                   vertex_label: str = "Node",
                   edge_label: str = "LINK") -> PropertyGraph:
    """S14: seeded synthetic graphs — uniform | power_law | grid | tree.

    Pure ``spark.range`` transformations; randomness is xxhash64(seed, i)
    so the same seed yields the same graph on any cluster size.
    """
    g = PropertyGraph(spark, name=f"{graph_type}_{n}")
    ids = spark.range(n).select(F.col("id").alias("k"))
    vertices = ids.select(
        "k",
        F.concat(F.lit("v"), F.col("k")).alias("name"),
        (F.xxhash64(F.lit(seed), F.col("k")) % 100).alias("score"))
    g.put_vertices(vertex_label, vertices, locid_col="k")
    vlab = g.label_id(vertex_label)

    if graph_type == "uniform":
        m = n * edges_per_vertex
        e = spark.range(m).select(
            (F.floor(_u01(F.lit(seed), F.col("id"), F.lit(0)) * n)).alias("sk"),
            (F.floor(_u01(F.lit(seed), F.col("id"), F.lit(1)) * n)).alias("dk"),
            F.col("id").alias("eid"))
    elif graph_type == "power_law":
        # dst ∝ u^3 → zipf-ish in-degree skew (hub vertices at low ids)
        m = n * edges_per_vertex
        e = spark.range(m).select(
            (F.floor(_u01(F.lit(seed), F.col("id"), F.lit(0)) * n)).alias("sk"),
            (F.floor(F.pow(_u01(F.lit(seed), F.col("id"), F.lit(1)), 3.0) * n))
              .cast("long").alias("dk"),
            F.col("id").alias("eid"))
    elif graph_type == "grid":
        side = int(n ** 0.5)
        right = ids.where((F.col("k") % side != side - 1) & (F.col("k") < side * side)) \
                   .select(F.col("k").alias("sk"), (F.col("k") + 1).alias("dk"))
        down = ids.where(F.col("k") < side * (side - 1)) \
                  .select(F.col("k").alias("sk"), (F.col("k") + side).alias("dk"))
        e = right.unionByName(down).withColumn(
            "eid", F.monotonically_increasing_id())
    elif graph_type == "tree":
        b = max(edges_per_vertex, 2)
        e = ids.where(F.col("k") > 0).select(
            ((F.col("k") - 1) / b).cast("long").alias("sk"),
            F.col("k").alias("dk"),
            F.col("k").alias("eid"))
    else:
        raise ValueError(f"unknown graph_type {graph_type!r}")

    edges = e.select(
        pack_graphid(vlab, F.col("sk")).alias("src"),
        pack_graphid(vlab, F.col("dk")).alias("dst"),
        F.col("eid"),
        (F.xxhash64(F.lit(seed + 1), F.col("eid")) % 10 + 1)
          .cast("double").alias("weight"))
    g.put_edges(edge_label, edges, locid_col="eid")
    return g
