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

The module also carries the engine-portable KMV distinct sketch
(``kmv_table``/``kmv_merge``/``kmv_estimate``) and the OLAP block:
``rollup_stats``/``cube_stats`` grouping lattices, ``exact_quantiles``
(the scale-safe exact path — range-partitioned rank, nothing buffered),
and ``topk_per_group`` (the WindowGroupLimit form).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
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


# ------------------------------------------------------------------ KMV

# 60-bit hash domain: 15 hex chars of md5. Chosen because BOTH engines
# convert it losslessly to BIGINT (Spark: conv(_,16,10); DuckDB:
# CAST('0x…' AS BIGINT)), so the sketch — not just its estimate — is
# bit-identical across engines and the oracle can hash-compare it.
_KMV_BITS = 60
_KMV_DOMAIN = float(1 << _KMV_BITS)


def _kmv_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_table(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002): the
    ``k`` smallest DISTINCT 60-bit md5 hashes of ``col``, as rows
    ``(rnk, h)`` with rnk = 1..k. Distinct-count estimate =
    ``(k-1) · 2^60 / h_k`` (:func:`kmv_estimate`); two sketches merge
    by union + re-take-k (:func:`kmv_merge`), so partial sketches from
    batches/streams/partitions combine losslessly.

    vs HyperLogLog (``approx_distinct``): KMV is bigger per sketch
    (k·8 bytes vs ~1.5 KB) but its state is engine-portable plain rows
    — deterministic, mergeable by ANY system that can sort longs, and
    exactly reproducible in SQL (the correctness oracle replays it).

    100 TB shape: the hash is computed in codegen during the scan; the
    distinct-of-hashes aggregate is map-side combinable, and the
    k-smallest is ``TakeOrderedAndProject`` — every partition ships at
    most k candidate rows to one final k-row merge, so the coordination
    volume is O(partitions · k), never corpus-sized.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (estimate needs h_k)")
    from pyspark.sql import Window

    small = (df.select(_kmv_hash(F.col(col)).alias("h"))
             .where(F.col("h").isNotNull())
             .distinct()
             .orderBy("h").limit(int(k)))
    # rank AFTER the limit: the window runs over <= k rows
    w = Window.orderBy("h")
    return small.select(
        F.row_number().over(w).cast("long").alias("rnk"), "h")


def kmv_merge(*sketches: DataFrame) -> DataFrame:
    """Merge KMV sketches: union, re-distinct, re-take the smallest k
    (k = the LARGEST input rank, so merging never invents precision a
    side didn't have — with equal-k inputs this is the standard KMV
    union)."""
    merged = sketches[0].select("h")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select("h"))
    k = max(int(s.agg(F.max("rnk")).first()[0] or 0) for s in sketches)
    if k < 2:
        raise ValueError("cannot merge empty sketches")
    from pyspark.sql import Window

    small = merged.distinct().orderBy("h").limit(k)
    return small.select(
        F.row_number().over(Window.orderBy("h")).cast("long")
        .alias("rnk"), "h")


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """One row ``(k, n_est)`` from a KMV sketch: the unbiased estimator
    ``(k-1) / (h_k / 2^60)``; a sketch smaller than its k (the input
    had fewer than k distinct values) is EXACT and returns its row
    count. Rounded to 4 places so the float is oracle-stable."""
    return (sketch.agg(F.max("rnk").alias("k"), F.max("h").alias("hk"))
            .select(
                F.col("k"),
                F.round(
                    (F.col("k") - 1) / (F.col("hk") / F.lit(_KMV_DOMAIN)),
                    4).alias("n_est")))


# ------------------------------------------------------ rollup / cube

def rollup_stats(df: DataFrame, keys: list, value_col: str) -> DataFrame:
    """OLAP ROLLUP over ``keys``: one row per prefix level
    (all keys, …, grand total) with ``(keys…, lvl, cnt, total, mean)``;
    ``lvl`` is Spark's ``grouping_id()`` (bit i set = key i rolled
    up), which matches DuckDB's ``GROUPING(keys…)`` bit-for-bit so the
    whole lattice is oracle-hashable. Subtotal rows carry NULL in the
    rolled-up key columns (both engines' convention).

    100 TB shape: ONE shuffle — Spark expands each input row to its
    rollup groupings map-side and partially aggregates before the
    exchange, so the shuffle carries per-(group, level) partials, not
    row multiples; no self-union of per-level aggregates."""
    return (df.rollup(*keys).agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        # cast BEFORE round: an integer value_col would otherwise
        # yield long here but DOUBLE in DuckDB (the c6 pandas-dtype
        # split the gate rejects)
        F.round(F.sum(value_col).cast("double"), 4).alias("total"),
        F.round(F.avg(value_col), 6).alias("mean"))
        .select(*keys, "lvl", "cnt", "total", "mean"))


def rollup_stats_sql(table: str, keys: list, value_col: str) -> str:
    """DuckDB twin of :func:`rollup_stats`."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks},
       CAST(GROUPING({ks}) AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS cnt,
       round(CAST(sum({value_col}) AS DOUBLE), 4) AS total,
       round(avg({value_col}), 6) AS mean
FROM {table}
GROUP BY ROLLUP ({ks})
"""

def cube_stats(df: DataFrame, keys: list, value_col: str) -> DataFrame:
    """OLAP CUBE over ``keys``: the FULL 2^|keys| grouping lattice
    (every key subset, down to the grand total) with the same
    ``(keys…, lvl, cnt, total, mean)`` shape as :func:`rollup_stats`
    — ``lvl`` is ``grouping_id()``, bit i set = key i aggregated away,
    identical to DuckDB's ``GROUPING()`` bits so every lattice cell is
    oracle-hashable.

    100 TB shape: same as ROLLUP — ONE shuffle; Spark's Expand node
    multiplies each row into its 2^|keys| groupings map-side and
    partial-aggregates BEFORE the exchange, so the shuffle carries
    per-(group, level) partials. The 2^|keys| input blow-up is the
    real cost knob: keep |keys| <= ~4 at corpus scale (16x expansion),
    or enumerate explicit grouping sets instead.
    """
    return (df.cube(*keys).agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
        # cast BEFORE round — the c6 pandas-dtype class (see rollup)
        F.round(F.sum(value_col).cast("double"), 4).alias("total"),
        F.round(F.avg(value_col), 6).alias("mean"))
        .select(*keys, "lvl", "cnt", "total", "mean"))


def cube_stats_sql(table: str, keys: list, value_col: str) -> str:
    """DuckDB twin of :func:`cube_stats`."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks},
       CAST(GROUPING({ks}) AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS cnt,
       round(CAST(sum({value_col}) AS DOUBLE), 4) AS total,
       round(avg({value_col}), 6) AS mean
FROM {table}
GROUP BY CUBE ({ks})
"""


# ------------------------------------------------- exact quantiles

def _check_probs(probs: Sequence[float]) -> None:
    """Reject out-of-range probs up front — DuckDB's quantile_disc
    errors on them, and silently clamping (q=95 meaning p95?) would
    hand back the column max as a plausible-looking threshold."""
    bad = [q for q in probs if not 0.0 <= float(q) <= 1.0]
    if bad or not probs:
        raise ValueError(f"probs must be in [0, 1], got {list(probs)}")


def exact_quantiles(df: DataFrame, col: str,
                    probs: Sequence[float]) -> DataFrame:
    """EXACT discrete quantiles of ``col``: rows ``(q, v)`` where
    ``v`` is the value at 1-based rank ``max(1, ceil(q*n))`` of the
    ascending sort over the n non-NULL values — DuckDB
    ``quantile_disc`` / ANSI ``percentile_disc`` semantics, verified
    point-for-point against DuckDB (including q=0 -> min, q=1 -> max,
    and mid-run ties, which collapse to the same ``v`` whatever the
    tie order).

    100 TB shape: Spark's builtin exact ``percentile`` aggregate
    buffers EVERY value of the group in one aggregation buffer —
    corpus-sized memory on a single task for a global quantile. This
    instead materializes the rank stream: ONE range exchange on the
    value, a per-range-partition running count offset by the
    O(partitions)-row driver prefix sum (the global_cumsum substrate,
    packing.py), then a broadcast join of the O(|probs|) target-rank
    table against it. The corpus is scanned and shuffled ONCE, never
    buffered; no single-partition window anywhere. Use Spark's
    ``percentile_approx`` (Greenwald-Khanna) when an approximate
    answer is acceptable — this operator is the exact path that stays
    alive when the column no longer fits one task.
    """
    import math

    from rust_graph_db_spark.operators.packing import global_cumsum

    _check_probs(probs)
    spark = df.sparkSession
    vals = (df.select(F.col(col).cast("double").alias("v"))
            .where(F.col("v").isNotNull())
            .withColumn("_one", F.lit(1)))
    # the rank stream IS a global cumsum of 1s over the value order
    # (ties are fine — see global_cumsum's tie contract: any tie order
    # yields the same value at every rank). The frame is checkpointed
    # inside global_cumsum, so the n-probe below reuses it.
    ranked = global_cumsum(vals, "v", "_one", out_col="_rnk")
    n = int(ranked.agg(F.max("_rnk")).first()[0] or 0)
    if n == 0:
        raise ValueError(f"exact_quantiles: no non-NULL values in {col!r}")
    # 1-based rank = ceil(q*n) clamped to [1, n]; computed driver-side
    # in IEEE doubles, the same arithmetic DuckDB's C++ uses
    tgt = spark.createDataFrame(
        [(float(q), max(1, min(n, math.ceil(float(q) * n))))
         for q in probs], "q DOUBLE, _rnk BIGINT")
    return (ranked.join(F.broadcast(tgt), "_rnk")
            .select("q", "v").orderBy("q"))


def exact_quantiles_sql(table: str, col: str,
                        probs: Sequence[float]) -> str:
    """DuckDB twin of :func:`exact_quantiles` via the builtin
    ``quantile_disc`` (same discrete-rank semantics). One SELECT per
    prob: DuckDB requires the quantile parameter to be constant."""
    arms = "\nUNION ALL ".join(
        f"SELECT CAST({float(q)!r} AS DOUBLE) AS q, "
        f"quantile_disc(CAST({col} AS DOUBLE), {float(q)!r}) AS v "
        f"FROM {table} WHERE {col} IS NOT NULL"
        for q in probs)
    return f"SELECT q, v FROM ({arms}) ORDER BY q"


# ------------------------------------------------- top-k per group

def topk_per_group(df: DataFrame, keys: list, order_col: str, k: int,
                   descending: bool = True,
                   tiebreak: str | None = None) -> DataFrame:
    """The k best rows of every group: input columns plus ``rn``
    (1..k within the group, ordered by ``order_col`` descending by
    default, ties broken by ``tiebreak`` ascending so the selection is
    deterministic). The OLAP staple Spark has no direct operator for
    — SQL spells it ``row_number() OVER (...) <= k``.

    100 TB shape: the rank-filter form is NOT just sugar — Spark >= 3.5
    rewrites it into ``WindowGroupLimit``, which runs a partial
    per-group top-k on every map task BEFORE the exchange (plan-
    audited in tests/test_temporal_sketches.py): the shuffle carries at most
    ``groups_per_partition * k`` rows per map task instead of the
    whole corpus, the same partial/final split a combinable aggregate
    gets. A mega-group therefore costs its top-k per partition, never
    a full single-task sort.
    """
    from pyspark.sql import Window

    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("rn", F.row_number().over(w).cast("long"))
            .where(F.col("rn") <= int(k)))


def grouped_quantiles(df: DataFrame, keys, col: str,
                      probs: Sequence[float]) -> DataFrame:
    """``(keys…, q, v)``: EXACT per-group discrete quantiles — the same
    ``quantile_disc`` semantics as :func:`exact_quantiles` (value at
    1-based rank ``max(1, ceil(q·n_g))`` of the group's ascending
    sort), for every group at once. Groups whose values are all NULL
    are absent, matching ``GROUP BY … WHERE col IS NOT NULL``.

    100 TB shape: the c15/CCNet substrate, NOT a per-group window — a
    window ``PARTITION BY group`` serializes a 100 TB group through
    one task. Instead: ONE range exchange over ``(keys…, value)``
    (the ``global_cumsum`` rank stream), per-group ``(base_rank,
    count)`` from a broadcast O(#groups) aggregate (``eqNullSafe`` so
    NULL groups survive), and the target ranks computed JVM-side by
    crossing that bounded stats frame with the O(|probs|) prob list —
    the join back is on the GLOBAL rank, a broadcast hash join
    against O(#groups × |probs|) rows. Assumes #groups is bounded
    (per-language / per-domain shapes); for one huge group use
    :func:`exact_quantiles`.
    """
    from rust_graph_db_spark.operators.packing import global_cumsum

    _check_probs(probs)
    ks = [keys] if isinstance(keys, str) else list(keys)
    spark = df.sparkSession
    vals = (df.select(*ks, F.col(col).cast("double").alias("_v"))
            .where(F.col("_v").isNotNull()))
    ordered = (vals.withColumn("_one", F.lit(1))
               .withColumn("_ord", F.struct(
                   *[F.col(k) for k in ks], F.col("_v"))))
    ranked = global_cumsum(ordered, "_ord", "_one", out_col="_rn")
    st = ranked.groupBy(*ks).agg(F.min("_rn").alias("_base"),
                                 F.count(F.lit(1)).alias("_cnt"))
    probs_df = spark.createDataFrame(
        [(float(q),) for q in probs], "q DOUBLE")
    # absolute global rank of the group-local target: base + local - 1;
    # ceil(q*cnt) in IEEE doubles, same arithmetic DuckDB's C++ uses
    tgt = (st.crossJoin(probs_df)
           .withColumn("_rnk", F.col("_base") - 1 + F.greatest(
               F.lit(1), F.least(
                   F.col("_cnt"),
                   F.ceil(F.col("q") * F.col("_cnt")).cast("long")))))
    return (ranked.select("_rn", "_v")
            .join(F.broadcast(tgt.select(*ks, "q", "_rnk")),
                  F.col("_rn") == F.col("_rnk"))
            .select(*ks, "q", F.col("_v").alias("v"))
            .orderBy(*ks, "q"))


def grouped_quantiles_sql(table: str, keys, col: str,
                          probs: Sequence[float]) -> str:
    """DuckDB twin of :func:`grouped_quantiles` — one constant-
    parameter GROUP BY arm per prob."""
    ks = ", ".join([keys] if isinstance(keys, str) else list(keys))
    arms = "\nUNION ALL ".join(
        f"SELECT {ks}, CAST({float(q)!r} AS DOUBLE) AS q, "
        f"quantile_disc(CAST({col} AS DOUBLE), {float(q)!r}) AS v "
        f"FROM {table} WHERE {col} IS NOT NULL GROUP BY {ks}"
        for q in probs)
    return f"SELECT {ks}, q, v FROM ({arms}) ORDER BY {ks}, q"
