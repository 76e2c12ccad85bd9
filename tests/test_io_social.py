"""Import/export round-trips (S7-S14) and social workloads (X1-X6)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from rust_graph_db_spark import io as gio
from rust_graph_db_spark import social
from rust_graph_db_spark.model import PropertyGraph, unpack_locid


@pytest.fixture(scope="module")
def json_graph_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("io") / "graph.json"
    data = {
        "vertices": [
            {"id": 100, "label": "Person", "properties": {"name": "alice", "age": 30}},
            {"id": 101, "label": "Person", "properties": {"name": "bob", "age": 25}},
            {"id": 200, "label": "City", "properties": {"name": "NYC"}},
        ],
        "edges": [
            {"label": "KNOWS", "start": 100, "end": 101, "properties": {"since": 2020}},
            {"label": "LIVES_IN", "start": 100, "end": 200, "properties": {}},
        ],
    }
    p.write_text(json.dumps(data))
    return str(p)


def test_json_import(spark, json_graph_path):
    g = gio.import_json(spark, json_graph_path)
    assert set(g.vertex_labels) == {"Person", "City"}
    assert set(g.edge_labels) == {"KNOWS", "LIVES_IN"}
    assert g.vertex_frame("Person").count() == 2
    knows = g.edge_frame("KNOWS").collect()
    assert len(knows) == 1 and knows[0]["since"] == 2020
    # endpoints resolved through the remap: alice -> bob
    names = {r["name"]: r["id"] for r in g.vertex_frame("Person").collect()}
    assert knows[0]["src"] == names["alice"] and knows[0]["dst"] == names["bob"]


def test_json_roundtrip(spark, json_graph_path, tmp_path):
    g = gio.import_json(spark, json_graph_path)
    out = str(tmp_path / "export.json")
    nv, ne = gio.export_json_file(g, out)
    assert (nv, ne) == (3, 2)
    g2 = gio.import_json(spark, out)
    assert g2.vertex_frame("Person").count() == 2
    assert g2.edge_frame("KNOWS").count() == 1


def test_csv_import_export(spark, tmp_path):
    vcsv = tmp_path / "v.csv"
    vcsv.write_text("key,name,age\n0,alice,30\n1,bob,25\n2,carol,35\n")
    ecsv = tmp_path / "e.csv"
    ecsv.write_text("start,end,weight\nalice,bob,1.5\nbob,carol,2.5\n")
    g = PropertyGraph(spark)
    n = gio.import_vertices_csv(spark, g, "Person", str(vcsv), id_col="key")
    assert n == 3
    ne = gio.import_edges_csv(spark, g, "KNOWS", str(ecsv),
                              resolve_label="Person", resolve_key="name")
    assert ne == 2
    e = g.edge_frame("KNOWS").orderBy("id").collect()
    assert {r["weight"] for r in e} == {1.5, 2.5}

    gio.export_csv(g, str(tmp_path / "out"))
    back = spark.read.option("header", True).csv(
        str(tmp_path / "out/vertices/Person"))
    assert back.count() == 3 and "properties" in back.columns


@pytest.mark.parametrize("gtype,n", [
    ("uniform", 100), ("power_law", 100), ("grid", 100), ("tree", 100)])
def test_generators(spark, gtype, n):
    g = gio.generate_graph(spark, gtype, n, seed=42)
    assert g.vertex_frame("Node").count() == n
    e = g.edge_frame("LINK")
    assert e.count() > 0
    # all endpoints are valid packed ids of existing vertices
    v = g.vertex_frame("Node").select("id")
    dangling = (e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))).join(v, "id", "left_anti"))
    assert dangling.isEmpty()
    # deterministic per seed
    g2 = gio.generate_graph(spark, gtype, n, seed=42)
    assert sorted(map(tuple, e.select("src", "dst").collect())) == \
        sorted(map(tuple, g2.edge_frame("LINK").select("src", "dst").collect()))
    if gtype == "grid":
        # interior vertex has right+down edges
        side = 10
        out0 = e.where(F.col("src") == g2.vertex_frame("Node")
                       .where(unpack_locid(F.col("id")) == 0).first()["id"])
        assert out0.count() == 2
    if gtype == "tree":
        # every non-root has exactly one parent
        indeg = e.groupBy("dst").count()
        assert indeg.where(F.col("count") > 1).isEmpty()


@pytest.fixture(scope="module")
def follows(spark):
    # 0→{1,2,3}, 1→{2,4}, 2→{4,5}, 3→{4}, 5→{0}
    rows = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 4), (2, 4), (2, 5), (3, 4), (5, 0)]
    return spark.createDataFrame(rows, "src LONG, dst LONG")


@pytest.fixture(scope="module")
def users(spark):
    return spark.createDataFrame(
        [(i, f"user{i}") for i in range(6)], "id LONG, name STRING")


def test_follow_unfollow(follows):
    f2 = social.follow(follows, 4, 0)
    assert f2.count() == follows.count() + 1
    # duplicate is a no-op
    f3 = social.follow(f2, 4, 0)
    assert f3.count() == f2.count()
    f4 = social.unfollow(f2, 4, 0)
    assert f4.count() == follows.count()


def test_followers_following(follows, users):
    assert {r["name"] for r in social.followers(follows, users, 4).collect()} == \
        {"user1", "user2", "user3"}
    assert {r["name"] for r in social.following(follows, users, 0).collect()} == \
        {"user1", "user2", "user3"}


def test_timeline(spark, follows):
    posts = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 300), (2, 12, 200), (4, 13, 400), (5, 14, 50)],
        "author LONG, post_id LONG, ts LONG")
    tl = social.timeline(follows, posts, user=0, k=2)
    assert [r["post_id"] for r in tl.collect()] == [11, 12]  # authors 1,2,3 only


def test_mutual_friends(follows):
    # following(1)={2,4}, following(2)={4,5} → mutual {4}
    assert [r["id"] for r in social.mutual_friends(follows, 1, 2).collect()] == [4]


def test_friend_suggestions(follows, duck):
    got = [(r["cand"], r["mutual_count"])
           for r in social.friend_suggestions(follows, 0, k=10).collect()]
    exp = duck.execute("""
        WITH f AS (SELECT * FROM (VALUES (0,1),(0,2),(0,3),(1,2),(1,4),
                   (2,4),(2,5),(3,4),(5,0)) t(src,dst)),
        mine AS (SELECT dst FROM f WHERE src=0),
        fof AS (SELECT m.dst AS mid, f.dst AS cand FROM mine m
                JOIN f ON f.src=m.dst WHERE f.dst<>0),
        nf AS (SELECT * FROM fof WHERE cand NOT IN (SELECT dst FROM mine))
        SELECT cand, count(DISTINCT mid) FROM nf GROUP BY cand
        ORDER BY 2 DESC, 1 ASC""").fetchall()
    assert got == [(int(a), int(b)) for a, b in exp]
    assert got[0] == (4, 3)  # 4 is suggested via 1, 2 and 3


def test_network_analysis(follows):
    res = social.network_analysis(follows, 1, 5)
    assert res["degrees_of_separation"] == 2      # 1→2→5
    assert res["path"] == [1, 2, 5]
    assert res["mutual_friends"] == 0             # {2,4} ∩ {0} = ∅
    res2 = social.network_analysis(follows, 1, 2)
    assert res2["degrees_of_separation"] == 1
    assert res2["mutual_friends"] == 1            # {4}


def test_likes(spark, users):
    likes = spark.createDataFrame([(0, 100), (1, 100)], "src LONG, dst LONG")
    l2 = social.like(likes, 2, 100)
    assert l2.count() == 3
    assert social.like(l2, 2, 100).count() == 3   # dup-checked
    assert {r["name"] for r in social.likers(l2, users, 100).collect()} == \
        {"user0", "user1", "user2"}


def test_export_jsonl_per_label(kg, tmp_path):
    """S10 at scale: one JSONL dataset per label; reading a label's
    directory back yields exactly that label's rows (ids and a sample
    property survive the round trip)."""
    from rust_graph_db_spark.io import export_jsonl

    base = str(tmp_path / "jsonl")
    export_jsonl(kg, base)
    spark = kg.spark
    for label in kg.vertex_labels:
        back = spark.read.json(f"{base}/vertices/{label}")
        src = kg.vertex_frame(label)
        assert back.count() == src.count()
        assert ({r.id for r in back.select("id").collect()}
                == {r.id for r in src.select("id").collect()})
    for label in kg.edge_labels:
        back = spark.read.json(f"{base}/edges/{label}")
        assert back.count() == kg.edge_frame(label).count()


def test_media_from_binary_files(spark, tmp_path):
    """binaryFile source → MEDIA_SCHEMA rows: stable hashed ids, raw
    bytes intact, caller-tagged media_type, null metadata struct."""
    from rust_graph_db_spark.operators.multimodal import \
        media_from_binary_files

    payloads = {f"f{i}.bin": bytes([i]) * (10 + i) for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = media_from_binary_files(spark, str(tmp_path / "*.bin"), "image")
    rows = df.collect()
    assert len(rows) == 4
    assert len({r.media_id for r in rows}) == 4
    assert sorted(bytes(r.content) for r in rows) \
        == sorted(payloads.values())
    assert all(r.media_type == "image" and r.meta.width is None
               for r in rows)


def test_load_tables_loads_all(spark):
    from rust_graph_db_spark.session import TPCH_TABLES, load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == set(TPCH_TABLES)
    for name, df in tables.items():
        assert df.count() > 0, name
    # the events special case: nano timestamps truncated to micros
    assert dict(tables["events"].dtypes)["ts"].startswith("timestamp")
