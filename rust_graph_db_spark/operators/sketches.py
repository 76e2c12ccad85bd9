"""Sketch aggregates: approximate distinct counts and quantiles.

Extensions beyond the reference (which has only COUNT/SUM/AVG/MIN/MAX —
SURVEY.md §2.4); at 100 TB the approximate forms are the only viable
ones for interactive work, so both are first-class:

- ``approx_distinct`` — HyperLogLog++ (Spark's built-in
  ``approx_count_distinct``): constant memory per group vs the
  full-width hash set an exact distinct needs; rsd=0.01 costs ~24 KB
  per group.
- ``approx_quantiles`` — Greenwald-Khanna via ``percentile_approx``:
  single pass, mergeable partials, no sort. An exact percentile at
  scale is a full shuffle-sort per group.

Both are mergeable sketches, so partial aggregation (map-side combine)
applies — the shuffle carries sketch bytes, never raw values.
``exact_stats`` is the exact counterpart used by the correctness oracle
(and is the right choice below ~10⁹ rows per group).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keys(on: Union[str, Sequence[str]]) -> list:
    return [on] if isinstance(on, str) else list(on)


def approx_distinct(df: DataFrame, on: Union[str, Sequence[str]],
                    col: str, rsd: float = 0.02) -> DataFrame:
    """Per-group HyperLogLog distinct estimate: (keys..., approx_nd)."""
    return df.groupBy(*_keys(on)).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_nd"))


def approx_quantiles(df: DataFrame, on: Union[str, Sequence[str]],
                     col: str, probs: Sequence[float] = (0.5, 0.95),
                     accuracy: int = 10000) -> DataFrame:
    """Per-group Greenwald-Khanna quantiles: (keys..., q_<pct> ...)."""
    aggs = [F.percentile_approx(col, p, accuracy)
             .alias(f"q_{int(round(p * 100))}") for p in probs]
    return df.groupBy(*_keys(on)).agg(*aggs)


def exact_stats(df: DataFrame, on: Union[str, Sequence[str]],
                value_col: str, distinct_col: str) -> DataFrame:
    """Exact per-group battery: count, distinct, sum, median, p95,
    sample stddev — the oracle-checkable counterpart of the sketches."""
    return df.groupBy(*_keys(on)).agg(
        F.count("*").alias("cnt"),
        F.countDistinct(distinct_col).alias("nd"),
        F.round(F.sum(value_col), 4).alias("total"),
        F.percentile(value_col, F.lit(0.5)).alias("median"),
        F.percentile(value_col, F.lit(0.95)).alias("p95"),
        F.round(F.stddev_samp(value_col), 6).alias("sd"))


# ------------------------------------------------------------- count-min

def cms_table(df: DataFrame, col: str,
              depth: int = 4, width: int = 1 << 21) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) in relational
    form: ``(d, bucket, cnt, width)`` rows, one per non-empty cell of
    the depth × width counter matrix. Cell (d, b) counts items whose
    d-seeded hash lands in bucket b; an item's frequency estimate is
    the MIN over its depth cells (``cms_estimate``) — always ≥ the
    true count, within εn with probability 1-δ for width = e/ε,
    depth = ln(1/δ). ``width`` rides every row as a constant column so
    downstream consumers can NEVER probe with mismatched geometry —
    ``cms_estimate`` reads (depth, width) from the sketch instead of
    trusting caller-supplied parameters (a silent-undercount hazard).

    100 TB shape: the sketch is a sum-mergeable aggregate — partial
    maps combine map-side, the shuffle carries at most depth × width
    cells regardless of input rows, and sketches from different
    batches/streams merge cell-for-cell via ``cms_merge``. That
    bounded state is the point: exact per-item counts over an
    unbounded stream need unbounded state, the CMS needs
    ``depth·width·8`` bytes. Hashing is seeded xxhash64 —
    deterministic, so estimates are reproducible across runs and
    engines that share the hash.
    """
    ex = (df.select(F.col(col).alias("x"))
          .select(F.explode(F.array(*[
              F.struct(F.lit(d).alias("d"),
                       F.pmod(F.xxhash64(F.lit(d), F.col("x")),
                              F.lit(width)).alias("bucket"))
              for d in range(depth)])).alias("e"))
          .select("e.d", "e.bucket"))
    return (ex.groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .withColumn("width", F.lit(int(width)).cast("long")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with IDENTICAL geometry by
    summing cells — the multi-batch/stream combine step. Geometry
    mismatch (different widths) raises rather than producing garbage
    counts."""
    # Validate geometry PER INPUT before the union: width must match,
    # and so must depth (max row index + 1) — a depth-4 sketch merged
    # into a depth-8 one would leave rows d=4..7 holding only one
    # side's counts, and the min-over-depth estimate would silently
    # UNDERCOUNT the other side's items. Each probe is one tiny agg
    # over a cell table of at most depth×width rows.
    geos = [s.agg(F.max("width").alias("w"),
                  F.max("d").alias("md")).first() for s in sketches]
    geos = [g for g in geos if g["md"] is not None]   # empty: no cells
    if not geos:
        return sketches[0]
    if len({(g["w"], g["md"]) for g in geos}) != 1:
        raise ValueError(
            "cannot merge sketches of different geometry: "
            f"{sorted({(int(g['w']), int(g['md']) + 1) for g in geos})} "
            "(width, depth)")
    widths = [geos[0]["w"]]
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return (merged.groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("width", F.lit(int(widths[0])).cast("long")))


def cms_estimate(sketch: DataFrame, items: DataFrame, col: str) -> DataFrame:
    """Point-query the sketch for each distinct value of ``items.col``:
    returns (col, est) with est = min over depth of the item's cell
    counts (0 if every cell is absent). Depth and width are read FROM
    the sketch (one tiny agg over the cell table), so probes always use
    the geometry the sketch was built with. The probe side joins on
    (d, bucket) — the sketch is the small side and broadcasts.
    """
    geo = sketch.agg(F.max("d").alias("md"),
                     F.max("width").alias("w")).first()
    if geo["md"] is None:
        raise ValueError("cannot estimate from an empty sketch")
    depth, width = int(geo["md"]) + 1, int(geo["w"])
    probes = (items.select(F.col(col).alias("x")).distinct()
              .select("x", F.explode(F.array(*[
                  F.struct(F.lit(d).alias("d"),
                           F.pmod(F.xxhash64(F.lit(d), F.col("x")),
                                  F.lit(width)).alias("bucket"))
                  for d in range(depth)])).alias("e"))
              .select("x", "e.d", "e.bucket"))
    return (probes.join(sketch.select("d", "bucket", "cnt"),
                        ["d", "bucket"], "left")
            .groupBy("x")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est"))
            .select(F.col("x").alias(col), "est"))
