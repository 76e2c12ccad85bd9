"""Temporal join operators: as-of join and banded range join.

The reference has no temporal joins at all (SURVEY.md §2.3 — "absent
join kinds ... theta/range/as-of/interval"); these are declared engine
capabilities of the new engine, designed for the event-stream shape of
training-data pipelines (`events` table: device logs, web events,
feature snapshots).

Scale design:

- **as-of join** is ONE shuffle + one in-partition sort: both sides are
  union-tagged and a `last(..., ignorenulls=True)` running window over
  (key, time) picks the latest right row at-or-before each left row.
  No per-row probe, no Python. This is the sort-merge formulation of
  pandas' ``merge_asof`` generalized to a cluster: cost is identical to
  a sort-merge join on the key. Hot keys sort within one partition —
  salt the key upstream if a single key exceeds one executor's sort
  budget.
- **range join** avoids the quadratic time-cross-product with band
  bucketing: timestamps are binned at the window width, the equi-join
  runs on (key, bin) with the left side exploded to the two bins its
  window can touch, and the exact BETWEEN predicate filters after. A
  |window|-wide band scans O(matches + bin collisions) instead of the
  O(n·m) theta join Catalyst would otherwise run (BroadcastNestedLoop).
  This is the same plan shape the Databricks range-join hint produces.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(c: Column) -> Column:
    """Timestamp-or-numeric column → seconds as double (timestamps cast
    to their epoch seconds; numerics pass through)."""
    return c.cast("timestamp").cast("double")


def _orderable(dt) -> bool:
    """True when a data type may appear in a sort key (everything except
    MapType, recursively through structs and arrays)."""
    from pyspark.sql import types as T
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with
    the largest ``right_ts`` ≤ ``left_ts`` (direction="backward") or
    smallest ``right_ts`` ≥ ``left_ts`` ("forward"), per key. When
    several right rows share the winning timestamp, the one whose
    payload struct is largest wins — deterministic as long as the right
    payload columns are orderable (no map-typed columns; with maps the
    tie winner is unspecified, as in DuckDB's ASOF join).

    Unmatched left rows keep NULL right columns (left-join semantics).
    ``tolerance`` (seconds) drops matches farther than that from the
    left timestamp. Right columns keep their names, except those that
    collide with a left column, which get ``suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction {direction!r}")

    rpayload = [c for c in right.columns if c not in keys]
    rnames = {c: (c + suffix if c in left.columns else c) for c in rpayload}

    lrows = left.select(
        *[F.col(k) for k in keys],
        _epoch_seconds(F.col(left_ts)).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
        F.lit(None).cast(
            right.select(F.struct(*rpayload).alias("s")).schema["s"].dataType
        ).alias("_rp"),
    )
    rrows = right.select(
        *[F.col(k) for k in keys],
        _epoch_seconds(F.col(right_ts)).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lp"),
        F.struct(*rpayload).alias("_rp"),
    )
    both = lrows.unionByName(rrows)

    # Right rows order before left rows at equal time, so "at or before"
    # is inclusive of equal timestamps in both directions. Within a group
    # of right rows at the same timestamp, _rp ascending makes last()
    # pick the largest payload — but struct ordering is only legal when
    # no field is map-typed, so the tie key is dropped for such payloads.
    order = [F.col("_t").asc() if direction == "backward" else F.col("_t").desc(),
             F.col("_is_left").asc()]
    rp_type = right.select(F.struct(*rpayload).alias("s")).schema["s"].dataType
    if _orderable(rp_type):
        order.append(F.col("_rp").asc_nulls_first())
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = both.withColumn("_m", F.last("_rp", ignorenulls=True).over(run)) \
                  .where(F.col("_is_left") == 1)

    if tolerance is not None:
        gap = F.abs(F.col("_t") - _epoch_seconds(F.col(f"_m.{right_ts}")))
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance)), F.col("_m")))

    return matched.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(rnames[c]) for c in rpayload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    on: Optional[Union[str, Sequence[str]]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Banded interval join: pairs where
    ``left_ts + lower <= right_ts <= left_ts + upper`` (seconds), plus
    optional equi-keys ``on``. Inner-join semantics.

    The band predicate is turned into an equi-join on time bins of
    width (upper - lower); each left row probes the two bins its window
    spans, then the exact BETWEEN filter runs on the joined pairs.
    """
    if upper <= lower:
        raise ValueError("range_join needs upper > lower")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    width = float(upper - lower)

    lt = _epoch_seconds(F.col(left_ts))
    rt = _epoch_seconds(F.col(right_ts))

    rnames = {c: (c + suffix if c in left.columns else c)
              for c in right.columns if c not in keys}
    r = right.select(*[F.col(k) for k in keys],
                     *[F.col(c).alias(rnames[c])
                       for c in right.columns if c not in keys])
    rt_named = F.col(rnames[right_ts]) if right_ts in rnames else F.col(right_ts)
    rtn = _epoch_seconds(rt_named)

    lb = left.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor((lt + F.lit(float(lower))) / F.lit(width)).cast("long"),
            F.floor((lt + F.lit(float(upper))) / F.lit(width)).cast("long"))))
    rb = r.withColumn("_bin", F.floor(rtn / F.lit(width)).cast("long"))

    lt2 = _epoch_seconds(F.col(left_ts))
    joined = lb.join(rb, keys + ["_bin"]).where(
        (rtn >= lt2 + F.lit(float(lower))) & (rtn <= lt2 + F.lit(float(upper))))
    return joined.drop("_bin")


# ----------------------------------------------------------- event analytics

def funnel(events: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within: Optional[float] = None) -> DataFrame:
    """Ordered-sequence funnel: per user, the furthest step reached by
    events matching ``steps`` in order — ``(user, stage, first_ts,
    last_ts)`` with stage in 1..len(steps) (users with no step-1 event
    are absent).

    Greedy-from-earliest semantics (the convention of product-analytics
    funnels): the window anchors at the user's FIRST step-1 event; each
    later step takes its earliest qualifying event strictly after the
    previous one, and ``within`` (seconds) bounds last_ts − first_ts.
    Greedy is exact for existence at every stage because taking the
    earliest qualifying event never excludes a later completion with the
    same anchor.

    Shape: len(steps)−1 per-user min-aggregation joins, all keyed on the
    user column — one hash partitioning reused across every stage (no
    per-stage wide shuffle of raw events; each stage scans only its own
    step's events). SQL-oracle-able as a chain of min() CTEs.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ev = events.select(F.col(user_col).alias("u"),
                       _epoch_seconds(F.col(ts_col)).alias("t"),
                       F.col(type_col).alias("et"))
    cur = (ev.where(F.col("et") == steps[0])
           .groupBy("u").agg(F.min("t").alias("t1"))
           .withColumn("stage", F.lit(1))
           .withColumn("tk", F.col("t1")))
    for k, step in enumerate(steps[1:], start=2):
        # only users at EXACTLY the previous stage may advance —
        # joining all of cur would let a stage-1 user skip stage 2
        prev = cur.where(F.col("stage") == k - 1)
        nxt = (ev.where(F.col("et") == step)
               .join(prev.select("u", "t1", "tk"), "u")
               .where(F.col("t") > F.col("tk")))
        if within is not None:
            nxt = nxt.where(F.col("t") - F.col("t1") <= float(within))
        nxt = (nxt.groupBy("u", "t1").agg(F.min("t").alias("t_next"))
               .select("u", "t1", F.col("t_next").alias("tk"),
                       F.lit(k).alias("stage")))
        # users who stall keep their previous stage row
        cur = (cur.join(nxt.select("u"), "u", "left_anti")
               .unionByName(nxt.select("u", "t1", "tk", "stage")))
    return cur.select(F.col("u").alias(user_col), "stage",
                      F.col("t1").alias("first_ts"),
                      F.col("tk").alias("last_ts"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", period: float = 86400.0 * 7,
                     max_periods: int = 8) -> DataFrame:
    """Cohort retention matrix: users cohorted by the period of their
    first event; for each (cohort, k) the count and fraction of cohort
    members active k periods later — ``(cohort, k, active, cohort_size,
    retention)``.

    Two user-keyed aggregations: first-seen per user, then distinct
    (user, period) activity joined back — period arithmetic stays on
    epoch-second doubles, so the same expressions run in the DuckDB
    oracle. Shuffles are user-keyed then cohort-keyed; the matrix
    itself is tiny (cohorts × periods).
    """
    ev = events.select(F.col(user_col).alias("u"),
                       _epoch_seconds(F.col(ts_col)).alias("t"))
    first = ev.groupBy("u").agg(F.min("t").alias("t0"))
    first = first.withColumn(
        "cohort", F.floor(F.col("t0") / F.lit(float(period))).cast("long"))
    act = (ev.join(first, "u")
           .select("u", "cohort",
                   (F.floor(F.col("t") / F.lit(float(period))).cast("long")
                    - F.col("cohort")).alias("k"))
           .where(F.col("k") <= int(max_periods))
           .distinct())
    sizes = first.groupBy("cohort").agg(
        F.count("*").alias("cohort_size"))
    out = (act.groupBy("cohort", "k").agg(F.count("*").alias("active"))
           .join(sizes, "cohort")
           .withColumn("retention",
                       F.round(F.col("active")
                               / F.col("cohort_size"), 6)))
    return out.select("cohort", "k", "active", "cohort_size", "retention")


def rolling_active_users(events: DataFrame, window_periods: int = 7,
                         user_col: str = "user_id", ts_col: str = "ts",
                         period: float = 86400.0) -> DataFrame:
    """Rolling distinct-user counts (DAU/WAU/MAU family): for each
    period, the number of distinct users active in the trailing
    ``window_periods`` periods (inclusive) — ``(period_id, active_users,
    window_users)``.

    Distinct-over-a-sliding-window doesn't decompose into a window
    aggregate (COUNT DISTINCT isn't subtractable), so the standard
    exact shape is: dedup to (period, user), then band-join each
    period to the window of periods ending at it and count distinct
    users per anchor. Volume is (periods × window) × per-period users
    — fine at daily granularity for years; for approximate at extreme
    scale, keep per-period HLL sketches and merge
    (``sketches.hll_table`` composes the same way).
    """
    ev = events.select(F.col(user_col).alias("u"),
                       F.floor(_epoch_seconds(F.col(ts_col))
                               / F.lit(float(period)))
                       .cast("long").alias("pid"))
    pu = ev.distinct()
    daily = pu.groupBy("pid").agg(F.count("*").alias("active_users"))
    anchors = daily.select(F.col("pid").alias("anchor"))
    win = (pu.join(anchors,
                   (pu["pid"] <= F.col("anchor"))
                   & (pu["pid"] > F.col("anchor")
                      - F.lit(int(window_periods))))
           .groupBy("anchor").agg(F.count_distinct("u")
                                  .alias("window_users")))
    return (daily.join(win, daily["pid"] == win["anchor"])
            .select(F.col("pid").alias("period_id"), "active_users",
                    "window_users"))
