"""Composite social-graph workloads (reference X1-X6,
social-network-api/src — SURVEY.md §2.10).

Library functions over plain DataFrames so they compose with any edge
set: ``follows`` is (src, dst [, props...]), ``posts`` is
(author, post_id, ts [, props...]). Every dataflow is the idiomatic
Spark shape for its access pattern:

  X1 follow/unfollow   anti-join dup check + append / anti-join delete
  X2 followers         equi-join expand + limit
  X3 timeline          2-hop join, orderBy desc, top-k
  X4 suggestions       FoF self-join + anti-joins + count + top-k
  X5 network analysis  BFS shortest path + mutual set
  X6 likes             same shapes as X1/X2

At scale: follows self-joins shuffle on dst — pre-bucket follows by
both src and dst to make X4 shuffle-free; the per-user variants filter
to a tiny frontier first so every join broadcasts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def follow(follows: DataFrame, src: int, dst: int) -> DataFrame:
    """X1: add src→dst unless it already exists (dup-check =
    anti-join of the one-row candidate against existing edges)."""
    spark = follows.sparkSession
    cand = spark.createDataFrame([(int(src), int(dst))], "src LONG, dst LONG")
    new = cand.join(follows.select("src", "dst"), ["src", "dst"], "left_anti")
    return follows.select("src", "dst").unionByName(new)


def unfollow(follows: DataFrame, src: int, dst: int) -> DataFrame:
    return follows.where(~((F.col("src") == int(src)) & (F.col("dst") == int(dst))))


def followers(follows: DataFrame, users: DataFrame, user: int,
              limit: Optional[int] = 50) -> DataFrame:
    """X2: who follows ``user`` — incoming expand + vertex fetch."""
    ids = follows.where(F.col("dst") == int(user)).select(F.col("src").alias("id"))
    out = users.join(ids, "id", "left_semi")
    return out.limit(limit) if limit else out


def following(follows: DataFrame, users: DataFrame, user: int,
              limit: Optional[int] = 50) -> DataFrame:
    ids = follows.where(F.col("src") == int(user)).select(F.col("dst").alias("id"))
    out = users.join(ids, "id", "left_semi")
    return out.limit(limit) if limit else out


def timeline(follows: DataFrame, posts: DataFrame, user: int, k: int = 10,
             author_col: str = "author", ts_col: str = "ts") -> DataFrame:
    """X3: posts of everyone ``user`` follows, newest first, top-k.

    The frontier (followee set) is filtered before the join, so Catalyst
    broadcasts it; orderBy+limit plans as TakeOrderedAndProject."""
    followees = follows.where(F.col("src") == int(user)) \
                       .select(F.col("dst").alias(author_col))
    return (posts.join(F.broadcast(followees), author_col, "left_semi")
                 .orderBy(F.col(ts_col).desc())
                 .limit(k))


def mutual_friends(follows: DataFrame, a: int, b: int) -> DataFrame:
    """J5/X5: intersection of two users' followee sets."""
    fa = follows.where(F.col("src") == int(a)).select(F.col("dst").alias("id"))
    fb = follows.where(F.col("src") == int(b)).select(F.col("dst").alias("id"))
    return fa.intersect(fb)


def friend_suggestions(follows: DataFrame, user: int, k: int = 10) -> DataFrame:
    """X4: friends-of-friends ranked by mutual count
    (services/social_graph.rs:81-122): 2-hop expand, exclude self and
    already-followed, score = number of distinct intermediaries."""
    mine = follows.where(F.col("src") == int(user)) \
                  .select(F.col("dst").alias("mid"))
    fof = (follows.join(F.broadcast(mine),
                        follows["src"] == F.col("mid"))
                  .select(F.col("mid"), F.col("dst").alias("cand"))
                  .where(F.col("cand") != int(user)))
    not_followed = fof.join(
        F.broadcast(mine.select(F.col("mid").alias("cand"))),
        "cand", "left_anti")
    return (not_followed
            .groupBy("cand")
            .agg(F.count_distinct("mid").alias("mutual_count"))
            .orderBy(F.col("mutual_count").desc(), F.col("cand").asc())
            .limit(k))


def degrees_of_separation(follows: DataFrame, a: int, b: int,
                          max_hops: int = 6) -> Optional[int]:
    """X5: BFS hop count a→b (None if unreachable within max_hops)."""
    from rust_graph_db_spark.operators.traversal import shortest_path

    edges = follows.select("src", "dst")
    res = shortest_path(edges, a, b, max_hops=max_hops)
    return None if res is None else res["hops"]


def network_analysis(follows: DataFrame, a: int, b: int,
                     max_hops: int = 6) -> dict:
    """X5 composite: path, separation, mutual-friend count."""
    from rust_graph_db_spark.operators.traversal import shortest_path

    res = shortest_path(follows.select("src", "dst"), a, b, max_hops=max_hops)
    mutual = mutual_friends(follows, a, b).count()
    return {
        "path": None if res is None else res["path"],
        "degrees_of_separation": None if res is None else res["hops"],
        "mutual_friends": mutual,
    }


def like(likes: DataFrame, user: int, post: int) -> DataFrame:
    """X6: dup-checked LIKES create — same shape as follow()."""
    return follow(likes, user, post)


def unlike(likes: DataFrame, user: int, post: int) -> DataFrame:
    return unfollow(likes, user, post)


def likers(likes: DataFrame, users: DataFrame, post: int,
           limit: Optional[int] = 50) -> DataFrame:
    ids = likes.where(F.col("dst") == int(post)).select(F.col("src").alias("id"))
    out = users.join(ids, "id", "left_semi")
    return out.limit(limit) if limit else out
