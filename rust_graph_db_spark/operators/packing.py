"""Sequence packing: assign documents to fixed-token-budget bins.

The last batch-assembly step of a pretraining pipeline: documents are
laid out in a deterministic total order (by id) and chopped into
contiguous token-budget bins — doc d goes to bin
``floor(tokens_before_d / budget)`` with in-bin byte offset
``tokens_before_d % budget`` (the streaming "concatenate then chop"
packing of GPT-style training; a doc straddling a boundary belongs to
the bin where it starts).

The primitive underneath is a DISTRIBUTED PREFIX SUM
(:func:`global_cumsum`): a naive window over a global ORDER BY would
collapse to one partition (Spark plans an un-partitioned window as a
single task — the classic scale trap). Instead:

 1. range-repartition by the order key (range boundaries sampled, but
    the RESULT is boundary-independent);
 2. one tiny agg of per-partition sums (≤ #partitions rows) collected
    and prefix-summed on the driver — O(partitions), not O(rows);
 3. broadcast-join the per-partition base offsets back and window
    WITHIN each partition (`partitionBy(pid)` keeps all 32/1000 tasks
    busy).

At 100 TB the only data-sized movements are the range shuffle and the
per-partition window sort; the cross-partition coordination is bytes.
The reference has no corpus tooling (extension, same stance as
operators/curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_graph_db_spark.functions.text import tokens


def global_cumsum(
    df: DataFrame, order_col: str, val_col: str,
    out_col: str = "cumsum", num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running total of ``val_col`` over the TOTAL
    order of ``order_col`` (inclusive of the current row), computed in
    parallel (see module docstring; never a single-partition window).
    ``order_col`` must be unique — it is the tie-free total order."""
    from pyspark.sql import Window

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(int(parts), F.col(order_col))
                .withColumn("_pid", F.spark_partition_id())
                .localCheckpoint(eager=False))
    # per-partition totals -> driver prefix sum (O(partitions) rows)
    sums = {int(r["_pid"]): int(r["_s"])
            for r in (ranged.groupBy("_pid")
                      .agg(F.sum(val_col).alias("_s")).collect())}
    base, acc = {}, 0
    for pid in sorted(sums):
        base[pid] = acc
        acc += sums[pid]
    base_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in base.items()], "_pid INT, _base BIGINT")
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged.join(F.broadcast(base_df), "_pid")
            .withColumn(out_col,
                        (F.col("_base") + F.sum(val_col).over(w))
                        .cast("long"))
            .drop("_pid", "_base"))


def pack_sequences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    budget: int = 2048,
) -> DataFrame:
    """(id, tok_cnt, bin_id, bin_offset): streaming concat-and-chop
    packing of whitespace token counts into ``budget``-token bins over
    the id order. ``bin_id = floor(tokens_before / budget)``,
    ``bin_offset = tokens_before % budget``.

    Deterministic (total function of the corpus content + order), so
    the SQL oracle reproduces it with a plain window cumsum, and
    re-packing after an append only changes bins at and after the
    append point.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col)))
        .cast("long").alias("tok_cnt"))
    c = global_cumsum(toks, id_col, "tok_cnt", out_col="_cum")
    before = F.col("_cum") - F.col("tok_cnt")
    return c.select(
        id_col, "tok_cnt",
        F.floor(before / budget).cast("long").alias("bin_id"),
        (before % budget).cast("long").alias("bin_offset"))
