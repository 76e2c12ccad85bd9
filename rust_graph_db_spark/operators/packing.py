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

    Tie CONTRACT (load-bearing — a9/a10/k4 rank on a non-unique
    order): the running total is ROW-based (``rowsBetween``, never a
    RANGE frame), so tied order keys receive distinct consecutive
    cumsum values in arbitrary tie order, and tied keys never straddle
    a range-partition boundary (equal keys compare equal, so the range
    partitioner sends them to one partition). Consumers that need a
    deterministic PER-ROW assignment must make ``order_col`` unique
    (c16/c18 encode (score, id) structs); consumers that only read
    the VALUE at a rank (the quantile substrates) may pass tied keys —
    any tie order yields the same value at every rank."""
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


def chunk_overlap(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    size: int = 128, stride: int = 64,
) -> DataFrame:
    """(id, chunk_id, chunk, n_tokens): sliding-window token chunking
    with overlap — the context-window prep step of RAG indexing and
    long-document pretraining (each document is cut into ``size``-token
    chunks whose starts advance by ``stride`` tokens, so consecutive
    chunks share ``size - stride`` tokens of context).

    Chunk starts are 0, stride, 2·stride, …; the final chunk may be
    short, and a start whose PREVIOUS chunk already reached the end of
    the document is suppressed (it would be a pure suffix of text the
    previous chunk fully covers). Empty documents produce no chunks.

    100 TB shape: one corpus scan, tokenize + ``sequence``/``explode``
    + ``slice`` entirely in whole-stage codegen — ZERO shuffles and
    zero Python; output volume is input volume × (size/stride) overlap
    factor, and chunks inherit the scan's partitioning so a downstream
    embed/index stage starts co-located. Deterministic (total function
    of the text), hence exactly reproducible by the SQL oracle.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError("stride must be <= size (gaps would drop text)")
    base = (docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)),
                 lambda x: x != F.lit("")).alias("_toks"))
        .where(F.size("_toks") > 0))
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    n = F.size("_toks")
    return (base.select(F.col(id_col), "_toks", n.alias("_n"),
                        F.explode(starts).alias("_st"))
            .where((F.col("_st") == 0)
                   | (F.col("_st") - stride + size < F.col("_n")))
            .select(
                F.col(id_col),
                (F.col("_st") / stride).cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice("_toks", F.col("_st") + 1, F.lit(size)),
                    " ").alias("chunk"),
                F.least(F.lit(size), F.col("_n") - F.col("_st"))
                .cast("long").alias("n_tokens")))


def chunk_overlap_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", size: int = 128,
                      stride: int = 64) -> str:
    """DuckDB twin of :func:`chunk_overlap` (same start/suppression
    contract; list slices are 1-based inclusive in DuckDB)."""
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     x -> x <> '') AS toks
  FROM {table}
), nz AS (
  SELECT {id_col}, toks, len(toks) AS n FROM t WHERE len(toks) > 0
), s AS (
  SELECT {id_col}, toks, n,
         unnest(generate_series(0, n - 1, {stride})) AS st
  FROM nz
)
SELECT {id_col},
       CAST(st / {stride} AS BIGINT) AS chunk_id,
       array_to_string(toks[st + 1 : least(st + {size}, n)], ' ')
         AS chunk,
       CAST(least({size}, n - st) AS BIGINT) AS n_tokens
FROM s
WHERE st = 0 OR st - {stride} + {size} < n
"""


def budget_select(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    score_col: str | None = None, budget: int = 100_000,
) -> DataFrame:
    """(id, score, tok_cnt, cum_tokens): greedy quality-under-budget
    selection — rank documents by ``score_col`` descending (ties broken
    by id ascending) and keep the prefix whose running token total
    stays within ``budget`` (a document is kept iff the budget was not
    already exhausted before it; the boundary document that straddles
    the budget is kept, matching pack-style "chop after" semantics).

    This is the "assemble the best N-token training mix" step (quality
    classifier / perplexity scores in, token-budgeted corpus out).
    ``score_col=None`` scores by document length (token count).

    100 TB shape: the global order is a RANGE partition on
    (-score, id), the running total is :func:`global_cumsum` — the
    driver coordinates O(partitions) bytes, never a single-task global
    window. One corpus scan + one range shuffle.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    # tokenize ONCE: score (when defaulted) and tok_cnt both read the
    # same _n column rather than re-splitting the text per expression
    counted = docs.select(
        F.col(id_col),
        *([F.col(score_col)] if score_col else []),
        F.size(tokens(F.col(text_col))).cast("long").alias("_n"))
    sc = (F.col(score_col).cast("double") if score_col
          else F.col("_n").cast("double"))
    scored = counted.select(
        F.col(id_col),
        F.coalesce(sc, F.lit(float("-inf"))).alias("score"),
        F.col("_n").alias("tok_cnt"))
    # tie-free total order: score DESC then id ASC, encoded as one
    # ascending struct key so global_cumsum range-partitions on it
    ordered = scored.withColumn(
        "_ord", F.struct((-F.col("score")).alias("s"),
                         F.col(id_col).alias("i")))
    c = global_cumsum(ordered, "_ord", "tok_cnt", out_col="cum_tokens")
    return (c.where(F.col("cum_tokens") - F.col("tok_cnt") < budget)
            .select(id_col, "score", "tok_cnt", "cum_tokens"))


def budget_select_by_group(
    docs: DataFrame, group_col: str, id_col: str = "doc_id",
    text_col: str = "text", score_col: str | None = None,
    budget: int = 100_000, budgets: dict | None = None,
) -> DataFrame:
    """(group, id, score, tok_cnt, cum_tokens): per-group greedy
    quality-under-budget selection — :func:`budget_select` run inside
    every group at once, each group getting ``budget`` tokens (or its
    own entry in ``budgets``, a ``{group_value: tokens}`` mapping with
    ``budget`` as the default). THE mixture-assembly step: "the best
    2B tokens of English, 300M of each other language", with kept =
    the per-group prefix whose running total stays in budget
    (boundary document kept, same pack-style contract as c16).

    100 TB shape: NOT a per-group window (a 100 TB group would
    serialize through one task) — the c15 substrate instead: ONE
    range exchange on ``(group, -score, id)`` with the global running
    token total from :func:`global_cumsum`; each group's base offset
    is ``min(cumsum - tok_cnt)`` over the group (the prefix total
    before its first row), a broadcast O(#groups) aggregate joined
    back ``eqNullSafe`` (NULL groups select too). Per-group budgets
    ride the same broadcast frame. Assumes #groups bounded; one
    corpus scan + one range shuffle, same as the global form.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if budgets and any(b <= 0 for b in budgets.values()):
        raise ValueError("all budgets must be positive")
    counted = docs.select(
        F.col(group_col), F.col(id_col),
        *([F.col(score_col)] if score_col else []),
        F.size(tokens(F.col(text_col))).cast("long").alias("_n"))
    sc = (F.col(score_col).cast("double") if score_col
          else F.col("_n").cast("double"))
    scored = counted.select(
        F.col(group_col), F.col(id_col),
        F.coalesce(sc, F.lit(float("-inf"))).alias("score"),
        F.col("_n").alias("tok_cnt"))
    ordered = scored.withColumn(
        "_ord", F.struct(F.col(group_col).alias("g"),
                         (-F.col("score")).alias("s"),
                         F.col(id_col).alias("i")))
    c = global_cumsum(ordered, "_ord", "tok_cnt", out_col="_cum")
    base = (c.groupBy(group_col)
            .agg(F.min(F.col("_cum") - F.col("tok_cnt")).alias("_base"))
            .withColumnRenamed(group_col, "_g"))
    spark = docs.sparkSession
    if budgets:
        bdf = spark.createDataFrame(
            [(g, int(b)) for g, b in budgets.items()],
            f"_bg {docs.schema[group_col].dataType.simpleString()}, "
            "_budget BIGINT")
        base = (base.join(F.broadcast(bdf),
                          F.col("_g").eqNullSafe(F.col("_bg")), "left")
                .select("_g", "_base",
                        F.coalesce("_budget", F.lit(int(budget)))
                        .alias("_budget")))
    else:
        base = base.withColumn("_budget", F.lit(int(budget)))
    j = c.join(F.broadcast(base),
               F.col(group_col).eqNullSafe(F.col("_g")))
    cum_in_g = F.col("_cum") - F.col("_base")
    return (j.where(cum_in_g - F.col("tok_cnt") < F.col("_budget"))
            .select(group_col, id_col, "score", "tok_cnt",
                    cum_in_g.alias("cum_tokens")))
