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
