"""Durable versioned storage (storage.py): atomic commit, snapshot
isolation / time travel, incremental commits, conflict detection,
catalog + counter round-trip. Reference analog:
src/storage/transaction.rs:25-53 (WriteBatch commit), 399-438
(rollback / read-own-snapshot)."""

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from rust_graph_db_spark.model import PropertyGraph, unpack_locid
from rust_graph_db_spark.storage import (
    CommitConflict, current_version, history, load_graph, save_graph,
)


def _small_graph(spark) -> PropertyGraph:
    g = PropertyGraph(spark, "t")
    g.put_vertices("Person", spark.createDataFrame(
        [(0, "A", 30), (1, "B", 40), (2, "C", 50)], "k LONG, name STRING, age LONG"),
        locid_col="k")
    g.put_edges("KNOWS", spark.createDataFrame(
        [(0, 1 << 48 | 0, 1 << 48 | 1, 2020),
         (1, 1 << 48 | 1, 1 << 48 | 2, 2021)],
        "k LONG, src LONG, dst LONG, since LONG"), locid_col="k")
    return g


def test_save_load_roundtrip(spark, tmp_path):
    root = str(tmp_path / "store")
    g = _small_graph(spark)
    v = save_graph(g, root)
    assert v == 1 and current_version(root) == 1

    g2 = load_graph(spark, root)
    assert g2._labels == g._labels
    assert {r.name for r in g2.vertex_frame("Person").collect()} == {"A", "B", "C"}
    got = g2.cypher("MATCH (a:Person)-[r:KNOWS]->(b:Person) "
                    "RETURN a.name AS an, b.name AS bn").collect()
    assert {(r.an, r.bn) for r in got} == {("A", "B"), ("B", "C")}


def test_dml_survives_save_load(spark, tmp_path):
    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)

    g2 = load_graph(spark, root)
    g2.cypher("MATCH (p:Person) WHERE p.age >= 40 SET p.age = p.age + 1").collect()
    g2.cypher("CREATE (x:Person {name: 'D', age: 60})").collect()
    v2 = save_graph(g2, root)
    assert v2 == 2

    g3 = load_graph(spark, root)
    ages = {r.name: r.age for r in g3.vertex_frame("Person").collect()}
    assert ages == {"A": 30, "B": 41, "C": 51, "D": 60}


def test_snapshot_isolation_time_travel(spark, tmp_path):
    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)
    g2 = load_graph(spark, root)
    g2.cypher("MATCH (p:Person {name: 'A'}) SET p.age = 99").collect()
    save_graph(g2, root)

    old = load_graph(spark, root, version=1)
    new = load_graph(spark, root)
    assert old.vertex_frame("Person").where("name='A'").first().age == 30
    assert new.vertex_frame("Person").where("name='A'").first().age == 99
    assert [m["version"] for m in history(root)] == [1, 2]


def test_incremental_commit_reuses_clean_labels(spark, tmp_path):
    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)
    g2 = load_graph(spark, root)
    # mutate only the vertex label; KNOWS stays object-identical
    g2.cypher("MATCH (p:Person {name: 'A'}) SET p.age = 31").collect()
    save_graph(g2, root)

    m1, m2 = history(root)
    assert m2["edges"]["KNOWS"] == m1["edges"]["KNOWS"]          # reused path
    assert m2["vertices"]["Person"] != m1["vertices"]["Person"]  # rewritten
    # no v2 edges dir exists anywhere (the data dir name carries a
    # per-attempt commit-id suffix)
    import glob
    assert not glob.glob(os.path.join(root, "data", "v000002-*", "edges"))


def test_commit_conflict_detected(spark, tmp_path):
    root = str(tmp_path / "store")
    save_graph(_small_graph(spark), root)
    a = load_graph(spark, root)
    b = load_graph(spark, root)
    a.cypher("MATCH (p:Person {name: 'A'}) SET p.age = 1").collect()
    b.cypher("MATCH (p:Person {name: 'B'}) SET p.age = 2").collect()
    save_graph(a, root)
    with pytest.raises(CommitConflict):
        save_graph(b, root)
    # the losing writer can reload and retry
    b2 = load_graph(spark, root)
    b2.cypher("MATCH (p:Person {name: 'B'}) SET p.age = 2").collect()
    assert save_graph(b2, root) == 3


def test_failed_stage_leaves_store_untouched(spark, tmp_path):
    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)
    g2 = load_graph(spark, root)
    # a frame whose evaluation fails at write time (ANSI divide by zero)
    bad = g2.vertex_frame("Person").withColumn(
        "boom", F.col("age") / (F.col("age") - F.col("age")))
    g2._vertices["Person"] = bad
    with pytest.raises(Exception):
        save_graph(g2, root)
    assert current_version(root) == 1        # no torn commit
    assert load_graph(spark, root).vertex_frame("Person").count() == 3


def test_vacuum_respects_references(spark, tmp_path):
    from rust_graph_db_spark.storage import vacuum

    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)                                    # v1
    g2 = load_graph(spark, root)
    g2.cypher("MATCH (p:Person {name:'A'}) SET p.age = 1").collect()
    save_graph(g2, root)                                   # v2: KNOWS reused from v1
    g3 = load_graph(spark, root)
    g3.cypher("MATCH (p:Person {name:'B'}) SET p.age = 2").collect()
    save_graph(g3, root)                                   # v3: KNOWS still v1's

    deleted = vacuum(root, keep_last=1)
    # v1's Person data + old manifests dropped; v1's KNOWS dir SURVIVES
    # because v3's manifest still references it (data dirs carry a
    # per-attempt commit-id suffix, so match on the structure)
    assert any("v000001-" in d and "vertices/Person" in d for d in deleted)
    assert not any("KNOWS" in d for d in deleted)
    assert [m["version"] for m in history(root)] == [3]
    g4 = load_graph(spark, root)
    assert {(r.name, r.age) for r in g4.vertex_frame("Person").collect()} \
        == {("A", 1), ("B", 2), ("C", 50)}
    assert g4.edge_frame("KNOWS").count() == 2
    with pytest.raises(FileNotFoundError):
        load_graph(spark, root, version=1)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_random_dml_survives_commits(spark, tmp_path_factory, data):
    """Random SET/CREATE sequences with interleaved commit+reload
    checkpoints stay in lockstep with a Python model — the WriteBatch/
    commit semantics hold under arbitrary interleaving."""
    root = str(tmp_path_factory.mktemp("prop") / "store")
    g = _small_graph(spark)
    model = {"A": 30, "B": 40, "C": 50}
    next_new = [0]

    n_ops = data.draw(st.integers(min_value=1, max_value=4), label="n_ops")
    for _ in range(n_ops):
        kind = data.draw(st.sampled_from(["set", "create", "commit"]),
                         label="op")
        if kind == "set":
            name = data.draw(st.sampled_from(sorted(model)), label="who")
            delta = data.draw(st.integers(min_value=-5, max_value=5),
                              label="delta")
            g.cypher(f"MATCH (p:Person {{name: '{name}'}}) "
                     f"SET p.age = p.age + {delta}").collect()
            model[name] += delta
        elif kind == "create":
            name = f"N{next_new[0]}"
            next_new[0] += 1
            age = data.draw(st.integers(min_value=0, max_value=99),
                            label="age")
            g.cypher(f"CREATE (p:Person {{name: '{name}', age: {age}}})") \
                .collect()
            model[name] = age
        else:
            save_graph(g, root)
            g = load_graph(spark, root)

    save_graph(g, root)
    final = load_graph(spark, root)
    got = {r.name: r.age for r in final.vertex_frame("Person").collect()}
    assert got == model
    assert final.edge_frame("KNOWS").count() == 2


def test_counters_and_labids_roundtrip(spark, tmp_path):
    root = str(tmp_path / "store")
    g = PropertyGraph(spark, "t")
    # force a non-alphabetical label registration order, so a sorted
    # re-assignment on load would corrupt packed ids
    g.put_vertices("Zebra", spark.createDataFrame([(0, "z")], "k LONG, s STRING"),
                   locid_col="k")
    g.put_vertices("Apple", spark.createDataFrame([(0, "a")], "k LONG, s STRING"),
                   locid_col="k")
    base = g.next_locids("Apple", 5)
    save_graph(g, root)

    g2 = load_graph(spark, root)
    assert g2._labels == {"Zebra": 1, "Apple": 2}
    assert g2.next_locids("Apple", 1) == base + 5   # counter survived
    zid = g2.vertex_frame("Zebra").select(
        unpack_locid(F.col("id")).alias("l")).first().l
    assert zid == 0


# ------------------------------------------------- bucketed co-location


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_store_expand_join_is_shuffle_free(spark, tmp_path):
    """save_graph(buckets=N) + load_graph => the expand join
    (E.src == V.id) is a zero-Exchange SortMergeJoin off the stored
    snapshot, and results match the unbucketed store exactly."""
    root_b = str(tmp_path / "store_b")
    root_p = str(tmp_path / "store_p")
    n = 64
    g = PropertyGraph(spark, "big")
    g.put_vertices("Person", spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id")).alias("name")), locid_col="k")
    g.put_edges("KNOWS", spark.range(4 * n).select(
        F.col("id").alias("k"),
        (F.lit(1 << 48) + F.pmod(F.xxhash64("id"), F.lit(n))).alias("src"),
        (F.lit(1 << 48) + F.pmod(F.xxhash64(F.lit(7), "id"), F.lit(n))).alias("dst")),
        locid_col="k")
    save_graph(g, root_b, buckets=4)
    save_graph(g, root_p)

    gb = load_graph(spark, root_b)
    gp = load_graph(spark, root_p)
    man = history(root_b)[-1]
    assert all(spec["buckets"] == 4 for spec in man["layout"].values())

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def expand(graph):
            v = graph.vertex_frame("Person")
            e = graph.edge_frame("KNOWS")
            return e.join(v, e["src"] == v["id"]).select("src", "dst", "name")

        plan = _plan_str(expand(gb))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # unbucketed baseline shuffles - the assertion has teeth
        assert "Exchange" in _plan_str(expand(gp))
        rows_b = sorted(map(tuple, expand(gb).collect()))
        rows_p = sorted(map(tuple, expand(gp).collect()))
        assert rows_b == rows_p and len(rows_b) == 4 * n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_store_incremental_commit_keeps_layout(spark, tmp_path):
    """A dirty-label rewrite in a bucketed store: clean labels keep
    their bucketed paths (manifest-only), the dirty label is re-staged
    bucketed, and the layout table follows the reused paths."""
    root = str(tmp_path / "store_inc")
    g = _small_graph(spark)
    save_graph(g, root, buckets=2)

    g1 = load_graph(spark, root)
    g1.put_vertices("City", spark.createDataFrame(
        [(0, "NYC")], "k LONG, name STRING"), locid_col="k")
    save_graph(g1, root, buckets=2)

    m1, m2 = history(root)
    # clean labels reuse v1 paths; layout entries carried over
    assert m2["vertices"]["Person"] == m1["vertices"]["Person"]
    assert m2["edges"]["KNOWS"] == m1["edges"]["KNOWS"]
    assert m2["edges_by_dst"]["KNOWS"] == m1["edges_by_dst"]["KNOWS"]
    assert set(m2["layout"]) >= set(m1["layout"])
    city = m2["layout"][m2["vertices"]["City"]]
    assert (city["buckets"], city["key"]) == (2, "id")
    # the carried KNOWS layout keeps the commit id of the WRITING commit
    assert m2["layout"][m2["edges"]["KNOWS"]]["cid"] == m1["commit_id"]

    g2 = load_graph(spark, root)
    assert {r.name for r in g2.vertex_frame("City").collect()} == {"NYC"}
    assert {r.name for r in g2.vertex_frame("Person").collect()} == {"A", "B", "C"}
    got = g2.cypher("MATCH (a:Person)-[r:KNOWS]->(b:Person) "
                    "RETURN a.name AS an, b.name AS bn").collect()
    assert {(r.an, r.bn) for r in got} == {("A", "B"), ("B", "C")}


def _tree(df) -> str:
    """Physical-plan tree section only (explain('formatted') repeats
    every node in a details section, which would double counts)."""
    return _plan_str(df).split("\n\n")[0]


def _n_sorts(tree: str) -> int:
    import re

    return len(re.findall(r"- Sort ", tree))  # excludes SortMergeJoin


def test_bucketed_store_dual_direction_expand(spark, tmp_path):
    """The dst-bucketed edge copy (reference `i:` index analog,
    rocksdb_store.rs:683-712): BOTH expand directions are zero-Exchange
    zero-Sort SMJs off the snapshot, the compiler picks the matching
    copy per direction, and the copies are row-identical."""
    root = str(tmp_path / "dual")
    n = 64
    g = PropertyGraph(spark, "dual")
    g.put_vertices("Person", spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id")).alias("name")), locid_col="k")
    g.put_edges("KNOWS", spark.range(4 * n).select(
        F.col("id").alias("k"),
        (F.lit(1 << 48) + F.pmod(F.xxhash64("id"), F.lit(n))).alias("src"),
        (F.lit(1 << 48) + F.pmod(F.xxhash64(F.lit(7), "id"), F.lit(n))).alias("dst")),
        locid_col="k")
    save_graph(g, root, buckets=4)
    gb = load_graph(spark, root)
    assert "KNOWS" in gb._edges_by_dst

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        v = gb.vertex_frame("Person")
        e = gb.edge_frame("KNOWS")
        ed = gb.edge_frame_for("KNOWS", "dst")
        t_out = _tree(e.join(v, e["src"] == v["id"]).select("src", "dst", "name"))
        t_in = _tree(ed.join(v, ed["dst"] == v["id"]).select("src", "dst", "name"))
        for t in (t_out, t_in):
            assert "SortMergeJoin" in t
            assert "Exchange" not in t, t
            assert _n_sorts(t) == 0, t
        # compiler picks the copy per direction: the full V⋈E⋈V triple
        # keeps only the structurally-unavoidable second-endpoint
        # Exchange in EITHER direction (unbucketed: 4)
        for q in ("MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.name AS an, b.name AS bn",
                  "MATCH (a:Person)<-[r:KNOWS]-(b:Person) RETURN a.name AS an, b.name AS bn"):
            t = _tree(gb.cypher(q))
            assert t.count("Exchange") == 1, t
        # the two at-rest copies hold identical rows
        cols = ["id", "src", "dst"]
        assert sorted(map(tuple, e.select(cols).collect())) == \
            sorted(map(tuple, ed.select(cols).collect()))
        # incoming results match the primary-copy answer
        got = gb.cypher("MATCH (a:Person)<-[r:KNOWS]-(b:Person) "
                        "RETURN count(*) AS c").first().c
        assert got == 4 * n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_edge_mutation_invalidates_dst_copy(spark, tmp_path):
    """DML on an edge label drops its dst-bucketed duplicate (the copies
    must stay row-identical); the next bucketed commit rewrites it."""
    root = str(tmp_path / "inval")
    g = _small_graph(spark)
    save_graph(g, root, buckets=2)
    g2 = load_graph(spark, root)
    assert "KNOWS" in g2._edges_by_dst
    g2.cypher("MATCH (a:Person {name:'A'}), (b:Person {name:'C'}) "
              "CREATE (a)-[:KNOWS {since: 2024}]->(b)").collect()
    assert "KNOWS" not in g2._edges_by_dst
    # incoming expand still correct off the primary frame
    got = g2.cypher("MATCH (a:Person {name:'C'})<-[r:KNOWS]-(b:Person) "
                    "RETURN b.name AS bn").collect()
    assert {r.bn for r in got} == {"A", "B"}
    save_graph(g2, root, buckets=2)
    g3 = load_graph(spark, root)
    assert g3.edge_frame_for("KNOWS", "dst").count() == 3


def test_rebuilt_store_gets_fresh_catalog_entries(spark, tmp_path):
    """A store deleted and rebuilt at the same root (same absolute data
    paths) must NOT be served the old schema from the session's cached
    bucketed-table registrations (ADVICE r2: commit-id in the name)."""
    import shutil

    root = str(tmp_path / "rebuild")
    g = _small_graph(spark)
    save_graph(g, root, buckets=2)
    load_graph(spark, root).vertex_frame("Person").collect()  # registers

    shutil.rmtree(root)
    g2 = PropertyGraph(spark, "t2")
    g2.put_vertices("Person", spark.createDataFrame(
        [(0, "X", 9, "extra")], "k LONG, name STRING, age LONG, note STRING"),
        locid_col="k")
    g2.put_edges("KNOWS", spark.createDataFrame(
        [(0, 1 << 48 | 0, 1 << 48 | 0, 2024)],
        "k LONG, src LONG, dst LONG, since LONG"), locid_col="k")
    save_graph(g2, root, buckets=2)

    g3 = load_graph(spark, root)
    assert "note" in g3.vertex_frame("Person").columns
    assert {r.name for r in g3.vertex_frame("Person").collect()} == {"X"}


def test_vacuum_drops_bucketed_registrations(spark, tmp_path):
    from rust_graph_db_spark.storage import _bucket_table_name, vacuum

    root = str(tmp_path / "vac")
    g = _small_graph(spark)
    save_graph(g, root, buckets=2)                         # v1
    g2 = load_graph(spark, root)                           # registers v1 tables
    m1 = history(root)[-1]
    rel = m1["vertices"]["Person"]
    name = _bucket_table_name(os.path.join(root, rel), m1["layout"][rel])
    assert spark.catalog.tableExists(name)
    g2.cypher("MATCH (p:Person {name:'A'}) SET p.age = 1").collect()
    g2.cypher("MATCH (a:Person)-[r:KNOWS]->(b) DELETE r").collect()
    save_graph(g2, root, buckets=2)                        # v2 rewrites all
    deleted = vacuum(root, keep_last=1, spark=spark)
    assert any("vertices/Person" in d for d in deleted)
    assert not spark.catalog.tableExists(name)             # registration gone
    assert load_graph(spark, root).vertex_frame("Person").count() == 3


def test_label_validation_rejects_injection(spark):
    g = PropertyGraph(spark, "t")
    for bad in ("a'b", "a`b", "a/b", "a\\b", "", "a\nb"):
        with pytest.raises(ValueError):
            g.label_id(bad)
    assert g.label_id("A-B 1") != g.label_id("A_B_1")   # distinct labels


def test_snapshot_diff_cdc(spark, tmp_path):
    from rust_graph_db_spark.storage import snapshot_diff

    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)

    g2 = load_graph(spark, root)
    # update B, delete C (edges-first discipline), create D + one edge
    g2.cypher("MATCH (p:Person) WHERE p.name = 'B' SET p.age = 99").collect()
    g2.cypher("MATCH (a:Person)-[r:KNOWS]->(b:Person) "
              "WHERE b.name = 'C' DELETE r").collect()
    g2.cypher("MATCH (p:Person) WHERE p.name = 'C' DELETE p").collect()
    g2.cypher("CREATE (x:Person {name: 'D', age: 60})").collect()
    save_graph(g2, root)

    diff = snapshot_diff(spark, root, 1, 2)
    got = {(r.kind, r.label, r.change): r.id for r in diff.collect()}
    keys = set(got)
    assert ("vertices", "Person", "updated") in keys
    assert ("vertices", "Person", "removed") in keys
    assert ("vertices", "Person", "added") in keys
    assert ("edges", "KNOWS", "removed") in keys
    # no spurious changes: exactly the 4 touched entities
    assert len(diff.collect()) == 4


def test_snapshot_diff_skips_clean_labels(spark, tmp_path):
    from rust_graph_db_spark.storage import snapshot_diff

    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root)

    g2 = load_graph(spark, root)
    # touch ONLY vertices; the KNOWS edge label is a clean manifest
    # reuse and must not appear in (or be read by) the diff plan
    g2.cypher("MATCH (p:Person) WHERE p.name = 'A' SET p.age = 31").collect()
    save_graph(g2, root)

    diff = snapshot_diff(spark, root, 1, 2)
    rows = diff.collect()
    assert {(r.kind, r.label, r.change) for r in rows} == {
        ("vertices", "Person", "updated")}
    # the clean edge label's path never enters the plan
    assert "edges/KNOWS" not in diff._jdf.queryExecution().toString()


def test_orphan_claim_skipped_and_vacuumed(spark, tmp_path):
    """A died commit leaves an empty claimed manifest; the next commit
    must skip that version number (never overwrite the claim) and
    vacuum must sweep claims below the published version."""
    import glob

    from rust_graph_db_spark.storage import _manifest_path, vacuum

    root = str(tmp_path / "store")
    save_graph(_small_graph(spark), root)                   # v1
    # simulate a commit that claimed v2 and died before publishing
    open(_manifest_path(root, 2), "w").close()
    g2 = load_graph(spark, root)
    g2.cypher("MATCH (p:Person {name:'A'}) SET p.age = 9").collect()
    assert save_graph(g2, root) == 3                        # v2 skipped
    assert current_version(root) == 3
    assert [m["version"] for m in history(root)] == [1, 3]  # claim invisible
    assert load_graph(spark, root).cypher(
        "MATCH (p:Person {name:'A'}) RETURN p.age AS a").first().a == 9
    # the orphan claim (now below _LATEST) is swept by vacuum
    vacuum(root, keep_last=5)
    assert not os.path.exists(_manifest_path(root, 2))
    # and real manifests survived
    assert [m["version"] for m in history(root)] == [1, 3]


def test_path_traversal_labels_rejected(spark):
    g = PropertyGraph(spark)
    df = spark.createDataFrame([(1,)], "k long")
    for bad in ("..", ".", "a/b", "a'b"):
        with pytest.raises(ValueError):
            g.put_vertices(bad, df, locid_col="k")


def _file_count(root, rel):
    n = 0
    for dirpath, _dirs, names in os.walk(os.path.join(root, rel)):
        n += sum(1 for x in names if x.startswith("part-"))
    return n


def test_compact_rewrites_small_files_content_identical(spark, tmp_path):
    import json

    from rust_graph_db_spark.storage import compact

    root = str(tmp_path / "store")
    g = PropertyGraph(spark, "t")
    # a deliberately shattered vertex dataset: 40 files for ~40 KB
    g.put_vertices("Person", spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
        .repartition(40), locid_col="k")
    g.put_edges("KNOWS", spark.createDataFrame(
        [(0, 1 << 48 | 0, 1 << 48 | 1, 2020)],
        "k LONG, src LONG, dst LONG, since LONG").coalesce(1),
        locid_col="k")
    save_graph(g, root)

    before = load_graph(spark, root)
    rel_before = before._storage_frames[("vertices", "Person")][0]
    assert _file_count(root, rel_before) == 40
    rows_before = sorted(
        (r.k, r.grp) for r in
        (before.vertex_frame("Person").select(F.col("id") % (1 << 48),
                                              "grp")
         .toDF("k", "grp").collect()))

    out = compact(spark, root, target_bytes=64 * 1024 * 1024)
    assert out["version"] == 2
    assert rel_before in out["datasets"]
    assert out["datasets"][rel_before] == (40, 1)

    after = load_graph(spark, root)
    rel_after = after._storage_frames[("vertices", "Person")][0]
    assert _file_count(root, rel_after) == 1
    rows_after = sorted(
        (r.k, r.grp) for r in
        (after.vertex_frame("Person").select(F.col("id") % (1 << 48),
                                             "grp")
         .toDF("k", "grp").collect()))
    assert rows_after == rows_before
    # the small edge dataset was right-sized already: path reused
    # manifest-only (no rewrite)
    erel_before = before._storage_frames[("edges", "KNOWS")][0]
    erel_after = after._storage_frames[("edges", "KNOWS")][0]
    assert erel_before == erel_after and erel_before not in out["datasets"]
    # time travel: the uncompacted version is still loadable
    assert load_graph(spark, root, version=1) \
        .vertex_frame("Person").count() == 2000


def test_compact_noop_and_bucketed_skip(spark, tmp_path):
    from rust_graph_db_spark.storage import compact

    root = str(tmp_path / "store")
    g = _small_graph(spark)
    save_graph(g, root, buckets=4)
    out = compact(spark, root)
    # bucketed datasets are layout-law; nothing qualifies -> NO commit
    assert out == {"version": 1, "datasets": {}}
    assert current_version(root) == 1
