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
