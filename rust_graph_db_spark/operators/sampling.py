"""Deterministic corpus sampling: stratified rates, exact-size
pseudo-random samples, and source-mixture balancing.

Extension operators (the reference has no sampling support; its only
"subset" tool is LIMIT — src/executor/mod.rs top-k): the three
sampling shapes a training-data pipeline runs when assembling a
mixture from heterogeneous sources. All are DETERMINISTIC — the
keep/drop decision is a total function of the row id via the same
md5 bucket as curation.hash_split, so every engine (the DuckDB oracle
included) reproduces the exact sample, reruns are idempotent, and a
row's fate never depends on partitioning, executor count, or RNG
seeds. None of them uses ``df.sample`` (seeded per-partition RNG —
repartitioning silently changes the sample).

- **stratified_sample**: per-stratum keep rates (e.g. per language) —
  a pure projection + filter, ZERO shuffle, pushed into the scan.
- **sample_exact**: exactly-n pseudo-random rows — order by the id's
  md5 (a content-independent uniform key) and take n via
  ``TakeOrderedAndProject``: no global sort materialization, one
  reduce of n-row heaps per partition.
- **mixture_sample**: downsample sources to target mixture weights —
  the "most constrained source" rule: the source with the lowest
  count/weight ratio is kept whole and every other source is
  hash-thinned to match, maximizing retained rows subject to the
  target proportions (the standard mixture-balancing pass before
  tokenization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _bucket(id_col: str):
    """[0, 10000) bucket from the first EIGHT md5 hex chars (2³² span,
    so the mod-10000 fold is uniform to ~2·10⁻⁶ relative bias;
    curation.split_bucket's 4-char/16-bit span would skew a
    10000-bucket fold by ~15%)."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long") % _BUCKETS)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    id_col: str = "doc_id", default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its id's md5 bucket (of
    10 000) falls below ``fractions[s] * 10000`` — per-stratum
    downsampling with no shuffle, no RNG, no extra scan: the predicate
    is a codegen'd md5 + compare pushed into the file scan. Strata
    absent from ``fractions`` use ``default_fraction``.

    Deterministic ⇒ re-running on a grown corpus keeps every
    previously-kept row (sample stability under append — the property
    that makes incremental re-curation cheap).
    """
    expr = None
    for name, frac in sorted(fractions.items()):
        thr = int(round(float(frac) * _BUCKETS))
        cond = F.col(strata_col) == name
        expr = (F.when(cond, thr) if expr is None
                else expr.when(cond, thr))
    thr_col = (F.lit(int(round(default_fraction * _BUCKETS)))
               if expr is None
               else expr.otherwise(int(round(default_fraction * _BUCKETS))))
    return df.where(_bucket(id_col) < thr_col)


def sample_exact(df: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """Exactly ``min(n, count)`` pseudo-random rows: rank by
    ``md5(id)`` (uniform, content-independent) and keep the first n.
    Runs as ``TakeOrderedAndProject`` — each partition reduces to an
    n-row heap, the driver merges heaps; no global sort, no full
    shuffle, O(n) driver memory. The md5 ordering makes the "random"
    choice reproducible everywhere (same rows in the SQL oracle)."""
    return (df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
              .limit(int(n)))


def mixture_sample(
    df: DataFrame, source_col: str, weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample so source proportions match ``weights``, retaining
    as many rows as possible: with T = min_s(count_s / w_s), source s
    keeps ~``w_s·T`` rows via an md5-bucket threshold
    ``floor(w_s·T/count_s · 10000)`` (the binding source keeps 100%).
    Sources not in ``weights`` are dropped.

    Dataflow: one tiny groupBy (|sources| rows) for the counts, a
    scalar min over count/weight, then a broadcast join of per-source
    thresholds and the same pushed-down bucket filter as
    :func:`stratified_sample` — the corpus itself is scanned once and
    never shuffled. Proportions are exact to bucket resolution
    (1/10000); the decision stays a total function of (source, id) so
    the oracle and reruns agree row-for-row.
    """
    if not weights:
        raise ValueError("empty weights")
    warr = F.create_map(*[x for k in sorted(weights)
                          for x in (F.lit(k), F.lit(float(weights[k])))])
    counts = (df.where(F.col(source_col).isin(*weights))
                .groupBy(source_col)
                .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
                .withColumn("_w", warr[F.col(source_col)]))
    t = counts.agg(F.min(F.col("_cnt") / F.col("_w")).alias("_t"))
    thr = (counts.crossJoin(F.broadcast(t))
           .select(source_col,
                   F.floor(F.col("_w") * F.col("_t") / F.col("_cnt")
                           * _BUCKETS).cast("int").alias("_thr")))
    return (df.join(F.broadcast(thr), source_col)
              .where(_bucket(id_col) < F.col("_thr"))
              .drop("_thr"))


def mixture_sample_sql(
    table: str, source_col: str, weights: dict[str, float],
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle CTE mirroring :func:`mixture_sample` — same md5
    bucket, same floor-threshold arithmetic (both engines evaluate the
    ratio in IEEE double, so the floor agrees)."""
    wvals = " UNION ALL ".join(
        f"SELECT '{k}' AS src, CAST({float(w)} AS DOUBLE) AS w"
        for k, w in sorted(weights.items()))
    return f"""
WITH w AS ({wvals}),
c AS (SELECT {source_col} AS src, CAST(count(*) AS DOUBLE) AS cnt
      FROM {table} WHERE {source_col} IN (SELECT src FROM w)
      GROUP BY {source_col}),
t AS (SELECT min(c.cnt / w.w) AS t FROM c JOIN w USING (src)),
thr AS (SELECT c.src,
               CAST(floor(w.w * t.t / c.cnt * {_BUCKETS}) AS INT) AS thr
        FROM c JOIN w USING (src) CROSS JOIN t)
SELECT d.* FROM {table} d JOIN thr ON d.{source_col} = thr.src
WHERE CAST(('0x' || substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 8)) AS BIGINT)
      % {_BUCKETS} < thr.thr
"""


def stratified_exact(df: DataFrame, strata_col: str, n_per: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Exactly ``min(n_per, stratum size)`` pseudo-random rows PER
    STRATUM — the deterministic replacement for per-key reservoir
    sampling: rank within each stratum by ``md5(id)`` (uniform,
    content-independent, tie-broken by id) and keep the first
    ``n_per``. One shuffle keyed on the stratum; each stratum sorts
    independently (no global order), and the md5 ranking reproduces the
    same rows in the SQL oracle, under repartitioning, and when the
    corpus grows only by appends that hash later.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= int(n_per))
            .drop("_rk"))


def mixture_plan(df: DataFrame, weights: dict[str, float],
                 token_budget: int, source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens, weight, target_tokens, sample_rate,
    epochs): the data-mixture PLANNING table a pretraining run
    publishes before sampling — per-source corpus inventory against
    target mixture shares (the table in The Pile, Gao et al. 2021,
    and LLaMA, Touvron et al. 2023, where sources are listed with
    sampling proportion and epochs; both public).

    Per source: ``target_tokens = budget · weight/Σweights``,
    ``sample_rate = target_tokens / n_tokens`` (>1 means the source
    repeats; its ceiling is ``epochs``), sources absent from
    ``weights`` get weight 0. The inventory (n_docs, n_tokens) is
    exact integers; the three derived values are the same
    double-operation sequence in the SQL oracle, so the whole table is
    bitwise-deterministic. ``mixture_sample`` EXECUTES a plan like
    this; the plan itself is the auditable artifact.

    100 TB shape: one groupBy(source) over the scan — the token count
    folds into the same codegen'd aggregate — then scalar arithmetic
    on a #sources-row frame. Nothing shuffles but (source, partials).
    """
    from rust_graph_db_spark.functions.text import token_count

    if token_budget < 0:
        raise ValueError("mixture_plan: token_budget must be >= 0")
    sw = float(sum(weights.values()))
    if sw <= 0:
        raise ValueError("mixture_plan: weights must sum > 0")
    wcol = F.lit(0.0)
    for s, w in weights.items():
        wcol = F.when(F.col(source_col) == s, F.lit(float(w))) \
                .otherwise(wcol)
    stats = (df.groupBy(source_col)
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum(token_count(F.col(text_col))).cast("long")
                  .alias("n_tokens")))
    share = wcol.cast("double") / F.lit(sw)
    tgt = F.lit(float(token_budget)) * share
    rate = tgt / F.col("n_tokens").cast("double")
    return stats.select(
        source_col, "n_docs", "n_tokens",
        wcol.alias("weight"), tgt.alias("target_tokens"),
        rate.alias("sample_rate"),
        F.ceil(rate).cast("long").alias("epochs"))
