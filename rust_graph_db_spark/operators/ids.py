"""Scalable dense-id assignment.

The reference allocates per-label local ids from a RocksDB counter
(src/storage/rocksdb_store.rs:263-289) and remaps import ids through a
driver-side HashMap (src/tools/import.rs:323-427). The naive Spark
translation — ``row_number()`` over an un-partitioned Window — funnels
every row through ONE task, which caps the engine at a single core no
matter the cluster size. These helpers implement the standard two-phase
distributed pattern instead:

1. pin a partitioning (``localCheckpoint``) and count rows per
   partition — a tiny P-row aggregate;
2. compute each partition's starting offset on the driver (P numbers)
   and add it to a partition-local ``row_number``.

``dense_index`` additionally range-partitions first so the index
follows a total order on ``order_cols`` (needed when the index must be
reproducible, e.g. dictionary encoding); ``dense_ids`` skips the
shuffle entirely and numbers rows in whatever partitioning they already
have (sufficient for unique id allocation).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_offsets(part: DataFrame, order_cols: Sequence, out_col: str,
                  base: int) -> Tuple[DataFrame, int]:
    """Partition-local row_number + driver-computed partition offsets.

    ``part`` must have a pinned ``_pid`` column (one value per physical
    partition). Returns (df with out_col, total row count).
    """
    spark = part.sparkSession
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = [], base
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    total = acc - base
    if not offsets:
        return part.withColumn(out_col, F.lit(None).cast("long")), 0
    off = F.broadcast(
        spark.createDataFrame(offsets, "_pid INT, _off LONG"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (part.join(off, "_pid")
           .withColumn(out_col,
                       (F.row_number().over(w) - 1 + F.col("_off"))
                       .cast("long"))
           .drop("_pid", "_off"))
    return out, total


def dense_index(df: DataFrame, order_cols: Sequence[str], out_col: str,
                base: int = 0) -> Tuple[DataFrame, int]:
    """0-based dense index following the total order of ``order_cols``.

    Range-partitions on the order columns (so partition id order ==
    global key order), then numbers within each partition. Every stage
    is cluster-parallel; the only driver-side state is one offset per
    partition. Returns (df, total_rows).
    """
    if df.isEmpty():
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    p = max(2, df.sparkSession.sparkContext.defaultParallelism)
    part = (df.repartitionByRange(p, *order_cols)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    return _with_offsets(part, list(order_cols), out_col, base)


def dense_ids(df: DataFrame, out_col: str, base: int = 0,
              order_cols: Optional[Sequence[str]] = None
              ) -> Tuple[DataFrame, int]:
    """Unique dense ids in [base, base+n) with NO shuffle.

    Rows are numbered within their existing partitions (ordered by
    ``order_cols`` when given, else arbitrary-but-pinned). Use when ids
    only need uniqueness + density, not a specific global order — the
    common case for entity-id allocation. Returns (df, total_rows).
    """
    part = (df.withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    order = list(order_cols) if order_cols else [F.monotonically_increasing_id()]
    return _with_offsets(part, order, out_col, base)
