"""Skew-mitigation helpers: salted joins and two-phase distinct counts.

AQE's skew-join splitting (on in session.py) handles sort-merge-join
skew at runtime, but two shapes still need explicit salting at 100 TB:

- **salted_join**: a shuffle-hash/broadcast-ineligible join where one
  key holds a disproportionate share of the LEFT side. The left side is
  salted by a row hash; the right side is replicated once per salt, so
  the hot key's rows spread over ``salts`` tasks. Replication factor is
  the whole right side × salts — use when right ≪ left (dimension-ish
  but too big to broadcast).
- **salted_distinct_count**: COUNT(DISTINCT x) per hot key. The naive
  plan funnels every (key, x) pair of a hot key through one task; phase
  one groups by (key, hash(x) % salts) — identical values co-locate, so
  per-bucket distinct counts are disjoint — phase two sums buckets.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keys(on: Union[str, Sequence[str]]) -> list:
    return [on] if isinstance(on, str) else list(on)


def salted_join(left: DataFrame, right: DataFrame,
                on: Union[str, Sequence[str]], salts: int = 8,
                how: str = "inner",
                hot_threshold: int | None = None) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated
    ``salts`` times. Result is identical to ``left.join(right, on, how)``
    for inner/left joins; the hot-key rows are spread across ``salts``
    partitions instead of one.

    ``hot_threshold`` switches on the hot-key-aware form — the one to
    use at 100 TB: a map-side-combinable per-key count finds the keys
    with at least that many left rows, the (assumed bounded) hot-key
    set is broadcast to both sides, and ONLY hot keys are salted /
    replicated. Cold keys join exactly as before (salt 0, one right
    copy), so the replication cost is ``|hot right rows| × salts``
    instead of ``|right| × salts`` — salting stops being a tax on the
    99% of keys that were never skewed. The output is still identical
    to the plain join (oracle-verified)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = _keys(on)
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)
    ).cast("int")
    if hot_threshold is None:
        l = left.withColumn("_salt", lsalt)
        r = right.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        return l.join(r, keys + ["_salt"], how).drop("_salt")
    hot = (left.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("_c"))
           .where(F.col("_c") >= int(hot_threshold))
           .select(*keys).withColumn("_hot", F.lit(True)))
    l = (left.join(F.broadcast(hot), keys, "left")
         .withColumn("_salt",
                     F.when(F.col("_hot").isNotNull(), lsalt)
                     .otherwise(F.lit(0)))
         .drop("_hot"))
    r = (right.join(F.broadcast(hot), keys, "left")
         .withColumn("_salt", F.explode(
             F.when(F.col("_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(salts - 1)))
             .otherwise(F.array(F.lit(0)))))
         .drop("_hot"))
    return l.join(r, keys + ["_salt"], how).drop("_salt")


def salted_distinct_count(df: DataFrame, on: Union[str, Sequence[str]],
                          col: str, salts: int = 32) -> DataFrame:
    """Two-phase per-group COUNT(DISTINCT col): (keys..., nd). Exact —
    phase-one buckets partition the value space, so bucket-local
    distinct counts sum to the global distinct count."""
    keys = _keys(on)
    bucketed = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(col)), F.lit(salts)).cast("int"))
    partial = bucketed.groupBy(*keys, "_salt").agg(
        F.countDistinct(col).alias("_nd"))
    return partial.groupBy(*keys).agg(F.sum("_nd").alias("nd"))


def key_skew_profile(df: DataFrame,
                     on: Union[str, Sequence[str]]) -> DataFrame:
    """One row ``(n_rows, n_keys, max_cnt, p50_cnt, p90_cnt, p99_cnt,
    skew_ratio)`` profiling the join/groupBy key distribution of
    ``on`` — the preflight for every skew decision this module (and
    AQE) exists for: ``skew_ratio = max_cnt / (n_rows / n_keys)`` is
    how many times hotter the hottest key runs than the average task's
    share, and the count quantiles say whether that heat is one rogue
    key (salt it — :func:`salted_join` ``hot_threshold`` ≈ p99_cnt) or
    a fat head (repartition wider / pre-aggregate). Measure, then
    salt: salting cold corpora taxes every key for nothing.

    100 TB shape: ONE map-side-combinable count shuffle builds the
    per-key count table; everything after runs on that (#keys-sized,
    already reduced) frame — the quantiles via the a9 range-partition
    rank substrate (:func:`~rust_graph_db_spark.operators.sketches.
    exact_quantiles`, nothing buffered in one task even at billions of
    keys), the scalars via one combinable aggregate, joined as
    bounded 1-row broadcast frames. NULL keys count as a key, like
    GROUP BY.
    """
    from rust_graph_db_spark.operators.sketches import exact_quantiles

    keys = _keys(on)
    # pin: TWO consumers (the quantile substrate and the scalar agg)
    # would otherwise each recompute the corpus scan + count shuffle —
    # the §17 multi-consumer checkpoint rule
    cnts = (df.groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .localCheckpoint(eager=True))
    stats = cnts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"))
    qs = (exact_quantiles(cnts, "cnt", [0.5, 0.9, 0.99])
          .agg(F.min(F.when(F.col("q") == 0.5, F.col("v")))
               .alias("p50_cnt"),
               F.min(F.when(F.col("q") == 0.9, F.col("v")))
               .alias("p90_cnt"),
               F.min(F.when(F.col("q") == 0.99, F.col("v")))
               .alias("p99_cnt")))
    return (stats.crossJoin(F.broadcast(qs))
            .select("n_rows", "n_keys", "max_cnt",
                    "p50_cnt", "p90_cnt", "p99_cnt",
                    F.round(F.col("max_cnt")
                            / (F.col("n_rows") / F.col("n_keys")), 4)
                    .alias("skew_ratio")))
