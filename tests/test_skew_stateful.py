"""Skew helpers and the custom stateful streaming operator."""

import os
import shutil

from pyspark.sql import functions as F

from rust_graph_db_spark.operators.skew import (salted_distinct_count,
                                                salted_join)
from rust_graph_db_spark.session import load_events
from rust_graph_db_spark.streaming.ingest import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    # 10k rows, 90% on key 0 — the hot-key shape
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97)
         .alias("k"),
        (F.col("id") % 1000).alias("v"))


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.range(97).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("w"))
    plain = left.join(right, "k").groupBy("k").agg(
        F.count("*").alias("c"), F.sum("w").alias("s"))
    salted = salted_join(left, right, "k", salts=8).groupBy("k").agg(
        F.count("*").alias("c"), F.sum("w").alias("s"))
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = _skewed(spark)
    right = spark.range(3).select(F.col("id").alias("k"),
                                  F.lit(1).alias("w"))
    plain = left.join(right, "k", "left").count()
    salted = salted_join(left, right, "k", salts=4, how="left").count()
    assert plain == salted == 10000


def test_salted_join_hot_threshold_matches_plain(spark):
    """The hot-key-aware form (r7 s3): only keys with >= threshold
    left rows are salted/replicated; result identical to plain join."""
    left = _skewed(spark)
    right = spark.range(97).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("w"))
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    hot = sorted(map(tuple, salted_join(
        left, right, "k", salts=8, hot_threshold=100).collect()))
    assert plain == hot
    # left join keeps unmatched cold keys too
    right3 = spark.range(3).select(F.col("id").alias("k"),
                                   F.lit(1).alias("w"))
    assert salted_join(left, right3, "k", salts=4, how="left",
                       hot_threshold=100).count() == 10000


def test_salted_join_hot_threshold_replicates_only_hot(spark):
    """Cold keys keep ONE right copy — replication volume is
    |hot right rows| x salts, not |right| x salts."""
    left = _skewed(spark)  # only key 0 has >= 100 rows
    right = spark.range(97).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("w"))
    hot = (left.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") >= 100).select("k")
           .withColumn("_hot", F.lit(True)))
    r = (right.join(F.broadcast(hot), ["k"], "left")
         .withColumn("_salt", F.explode(
             F.when(F.col("_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(7)))
             .otherwise(F.array(F.lit(0))))))
    per_key = {row["k"]: row["n"] for row in
               r.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key[0] == 8
    assert all(n == 1 for k, n in per_key.items() if k != 0)


def test_salted_distinct_count_exact(spark):
    df = _skewed(spark)
    exact = {r["k"]: r["nd"] for r in
             df.groupBy("k").agg(F.countDistinct("v").alias("nd")).collect()}
    salted = {r["k"]: r["nd"] for r in
              salted_distinct_count(df, "k", "v", salts=16).collect()}
    assert exact == salted


def test_running_totals_stream_matches_batch(spark, tmp_path):
    ev_dir = str(tmp_path / "ev")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", ev_dir)
    batch = spark.read.parquet(ev_dir)
    expected = {r["user_id"]: (r["cnt"], r["total"], r["crossings"])
                for r in running_user_totals(batch).collect()}

    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("rut")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: (r["cnt"], round(r["total"], 6), r["crossings"])
           for r in spark.sql("SELECT * FROM rut").collect()}
    assert got == expected


def test_oracle_running_totals(spark, duck):
    got = sorted(map(tuple,
                     running_user_totals(load_events(spark, SF_DIR)).collect()))
    exp = sorted(map(tuple, duck.execute(
        "SELECT user_id, count(*) AS cnt, round(sum(value), 6) AS total, "
        "CAST(floor(sum(value) / 100.0) AS BIGINT) AS crossings "
        "FROM events GROUP BY user_id").fetchall()))
    assert got == exp


def test_key_skew_profile_matches_duckdb(spark, duck):
    from rust_graph_db_spark.operators.skew import key_skew_profile

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = tuple(key_skew_profile(li, "l_orderkey").first())
    exp = tuple(duck.execute("""
        WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
                   FROM lineitem GROUP BY l_orderkey),
        s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_keys, max(cnt) AS max_cnt
              FROM c),
        q AS (SELECT quantile_disc(CAST(cnt AS DOUBLE), 0.5) p50,
                     quantile_disc(CAST(cnt AS DOUBLE), 0.9) p90,
                     quantile_disc(CAST(cnt AS DOUBLE), 0.99) p99
              FROM c)
        SELECT n_rows, n_keys, max_cnt, p50, p90, p99,
               round(max_cnt / (n_rows / CAST(n_keys AS DOUBLE)), 4)
        FROM s CROSS JOIN q""").fetchone())
    assert got == exp


def test_key_skew_profile_flags_the_hot_key(spark):
    from rust_graph_db_spark.operators.skew import key_skew_profile

    df = _skewed(spark)  # 90% of 10k rows on key 0
    r = key_skew_profile(df, "k").first()
    assert r.n_rows == 10000
    # the hot key (9000 + the id%10==9, id%97==0 overlap) dwarfs the
    # average share; with 97 keys p99 IS the max rank, p90 is cold
    assert r.max_cnt == 9010 and r.skew_ratio > 50
    assert r.p90_cnt < 20
