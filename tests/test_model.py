from pyspark.sql import functions as F

from rust_graph_db_spark.model import (
    PropertyGraph, format_graphid, pack_graphid, unpack_labid, unpack_locid,
)


def test_graphid_roundtrip(spark):
    df = spark.createDataFrame([(1, 1), (7, 123456), (65535, (1 << 48) - 1)],
                               "labid INT, locid LONG")
    out = df.select(
        unpack_labid(pack_graphid(F.col("labid"), F.col("locid"))).alias("l"),
        unpack_locid(pack_graphid(F.col("labid"), F.col("locid"))).alias("o"),
    ).collect()
    assert [(r.l, r.o) for r in out] == [(1, 1), (7, 123456), (65535, (1 << 48) - 1)]


def test_format_graphid(spark):
    row = spark.range(1).select(
        format_graphid(pack_graphid(3, F.lit(42))).alias("s")).first()
    assert row.s == "3.42"


def test_union_view_and_adjacency(spark):
    g = PropertyGraph(spark)
    v = spark.createDataFrame([(1, "Alice"), (2, "Bob")], "key LONG, name STRING")
    g.put_vertices("Person", v, locid_col="key")
    pid = g.label_id("Person")
    e = spark.createDataFrame([(1, 2)], "a LONG, b LONG").select(
        pack_graphid(pid, F.col("a")).alias("src"),
        pack_graphid(pid, F.col("b")).alias("dst"),
        F.col("a").alias("k"))
    g.put_edges("KNOWS", e, locid_col="k")

    assert g.vertices().count() == 2
    alice = g.vertex_frame("Person").where("name='Alice'").first()["id"]
    assert g.out_edges([alice]).count() == 1
    assert g.in_edges([alice]).count() == 0
    assert g.degrees("out").collect()[0]["degree"] == 1


def test_parquet_roundtrip(spark, tmp_path):
    g = PropertyGraph(spark)
    v = spark.createDataFrame([(1, "x")], "key LONG, name STRING")
    g.put_vertices("P", v, locid_col="key")
    g.write_parquet(str(tmp_path / "g"))
    g2 = PropertyGraph.read_parquet(spark, str(tmp_path / "g"))
    assert g2.vertex_frame("P").count() == 1
