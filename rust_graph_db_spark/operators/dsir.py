"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): pick pretraining documents from a raw pool so the
selected set's hashed-n-gram distribution matches a small high-quality
TARGET corpus.

The public recipe, re-expressed as DataFrames:

1. hash every word unigram+bigram of both corpora into ``buckets``
   buckets (hashing trick — fixed-size distributions regardless of
   vocabulary);
2. per-bucket Laplace-smoothed probabilities for target and raw give a
   per-bucket log-ratio table ``log(p_target(b) / p_raw(b))``
   (``buckets`` rows — broadcastable);
3. a document's importance log-weight is the sum of log-ratios over
   its token features (bag-of-hashed-ngrams likelihood ratio);
4. resampling = Gumbel top-k: key = logw + Gumbel(u), u derived from a
   hash of the document id, so the draw is a pure function of
   (corpora, seed) — reruns reproduce the same selected set.

Everything is mirrorable in SQL: the bucket hash uses the same
``int(md5(...)[:15 hex], 16)`` construction as the md5 walk mode
(``graph_algos._walk_choice_hash``), computable bit-identically in
Spark and DuckDB; log-weights round away last-ulp libm differences.

100 TB shape: two feature-count shuffles bounded by ``buckets`` (not
vocabulary), one broadcast join of the ratio table against the
exploded token stream, one per-document sum, and a global top-k via
``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps, no
full sort). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_graph_db_spark.functions.text import tokens


def _md5_bucket(col, buckets: int, salt: str) -> F.Column:
    """Deterministic bucket id in [0, buckets): md5_long(salt:value)
    % buckets — the cross-engine-stable hash (see
    functions/hashing.py for the DuckDB twin)."""
    from rust_graph_db_spark.functions.hashing import md5_key, md5_long

    return F.pmod(md5_long(md5_key(F.lit(salt), col)),
                  F.lit(int(buckets)))


def _doc_features(docs: DataFrame, text_col: str, id_expr,
                  buckets: int) -> DataFrame:
    """One (id, bucket) row per unigram AND bigram occurrence
    (``id_expr`` is any Column — a literal for corpus-level counts).
    The n-gram stream is built JVM-side (same transform-over-
    materialized-array shape as curation.ngram_stream); only the
    bucket hash runs per occurrence."""
    # '' tokens (empty text, padded whitespace) are FILTERED — the
    # oracle does the same; an unfiltered side would shift n_feats and
    # the corpus totals on any padded document
    base = docs.select(id_expr.alias("_id"),
                       F.filter(tokens(F.col(text_col)),
                                lambda x: x != F.lit("")).alias("_toks"))
    uni = base.select("_id", F.explode("_toks").alias("g"))
    big = (base.where(F.size("_toks") >= 2)
           .select("_id", F.explode(F.expr(
               "transform(sequence(2, size(_toks)),"
               " i -> concat(element_at(_toks, i - 1), ' ',"
               " element_at(_toks, i)))")).alias("g")))
    return (uni.unionByName(big)
            .select("_id", _md5_bucket(F.col("g"), buckets, "dsir")
                    .alias("bucket")))


def hashed_ngram_dist(docs: DataFrame, text_col: str = "text",
                      buckets: int = 10_000) -> DataFrame:
    """(bucket, cnt): hashed uni+bigram occurrence counts — the
    fixed-size corpus signature DSIR compares distributions on."""
    return (_doc_features(docs, text_col, F.lit(0), buckets)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    buckets: int = 10_000,
                    ndigits: int | None = 4) -> DataFrame:
    """(id_col, n_feats, logw): per-raw-document importance log-weight
    Σ_features log(p_target(bucket) / p_raw(bucket)), Laplace-smoothed
    (add-1 over ``buckets``). ``logw`` rounds to ``ndigits`` — the ln
    calls differ in the last ulp across engines.

    Documents whose text yields zero features get logw 0 (no
    evidence). The ratio table is ``buckets`` rows — broadcast."""
    # One tokenize+hash pass per corpus: the raw feature stream is
    # checkpointed and reused for BOTH its bucket histogram and the
    # per-doc scoring join; the count frames are checkpointed before
    # the driver-sum actions (un-pinned, the raw corpus would be
    # re-scanned three times per call).
    feats = (_doc_features(raw, text_col, F.col(id_col), buckets)
             .localCheckpoint(eager=True))
    t_cnt = (hashed_ngram_dist(target, text_col, buckets)
             .select("bucket", F.col("cnt").alias("tc"))
             .localCheckpoint(eager=True))
    r_cnt = (feats.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("rc"))
             .localCheckpoint(eager=True))
    tn = int(t_cnt.agg(F.coalesce(F.sum("tc"), F.lit(0))
                       .alias("s")).first()["s"])
    rn = int(r_cnt.agg(F.coalesce(F.sum("rc"), F.lit(0))
                       .alias("s")).first()["s"])
    b = float(buckets)
    ratio = (t_cnt.join(r_cnt, "bucket", "full")
             .select("bucket",
                     (F.log((F.coalesce("tc", F.lit(0)).cast("double")
                             + F.lit(1.0)) / F.lit(float(tn) + b))
                      - F.log((F.coalesce("rc", F.lit(0)).cast("double")
                               + F.lit(1.0)) / F.lit(float(rn) + b)))
                     .alias("lr")))
    scored = (feats.join(F.broadcast(ratio), "bucket", "left")
              .groupBy("_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_feats"),
                   F.sum(F.coalesce("lr", F.lit(0.0))).alias("_s")))
    logw = F.coalesce("_s", F.lit(0.0))
    if ndigits is not None:
        logw = F.round(logw, ndigits)
    return (raw.select(F.col(id_col)).distinct()
            .join(scored, F.col(id_col) == F.col("_id"), "left")
            .select(id_col,
                    F.coalesce("n_feats", F.lit(0)).cast("long")
                    .alias("n_feats"),
                    logw.alias("logw")))


def dsir_resample(raw: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  buckets: int = 10_000, seed: int = 0,
                  ndigits: int = 4) -> DataFrame:
    """(id_col, logw, key): the ``k`` documents selected by Gumbel
    top-k over the importance log-weights — sampling WITHOUT
    replacement proportional to exp(logw) (Vieira 2014's Gumbel-max
    trick), derandomized: u = (H(seed:id) % 2^20 + 0.5) / 2^20 with H
    the cross-engine md5 hash, key = logw - ln(-ln(u)). A pure
    function of (corpora, k, seed); ties impossible up to hash
    collisions, broken by id. Global top-k runs as
    TakeOrderedAndProject (per-partition heaps), not a full sort."""
    m = float(1 << 20)
    lw = dsir_logweights(raw, target, text_col, id_col, buckets,
                         ndigits=None)
    from rust_graph_db_spark.functions.hashing import md5_key, md5_long

    u = ((F.pmod(md5_long(md5_key(F.lit(seed), F.col(id_col))),
                 F.lit(1 << 20))
          .cast("double") + F.lit(0.5)) / F.lit(m))
    keyed = lw.select(id_col,
                      F.round("logw", ndigits).alias("logw"),
                      F.round(F.col("logw") - F.log(-F.log(u)),
                              ndigits).alias("key"))
    return (keyed.orderBy(F.desc("key"), F.asc(id_col))
            .limit(int(k)))
