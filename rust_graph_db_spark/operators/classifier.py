"""Trainable quality classifier: hashed n-gram features + distributed
logistic regression.

The fastText/CCNet-style model used to score web documents against a
high-quality corpus (GPT-3 appendix A; CCNet, Wenzek et al. 2020) —
extension operators, the reference has no ML surface. Architecture is
the classic driver-coordinated Spark LR:

- features: word uni+bigrams hashed into a fixed ``dim`` (hashing
  trick), tf-normalized — built as pure Catalyst expressions
  (``xxhash64`` JVM-side, no Python), so feature extraction runs at
  scan throughput and the shuffle-free feature frame can be cached.
- training: full-batch gradient descent; the dense weight vector
  (2^18 floats ≈ 2 MB) broadcasts each iteration, the gradient comes
  back as a SPARSE (index, Σ residual·value) aggregation — the only
  shuffle per iteration, reducer cardinality = live feature vocabulary.
  Deterministic up to float-summation order: no sampling, and the
  driver applies updates in sorted index order, but the per-index
  partial sums come from ``F.sum`` whose accumulation order across
  partitions is not fixed — weights can differ in the last ulps
  between runs/partitionings (bit-exactness would need sorted-array
  aggregation per index, not worth the shuffle).
- scoring: one Arrow-batched UDF (sigmoid of sparse dot), map-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_ngram_features(df: DataFrame, text_col: str = "text",
                        dim: int = 1 << 18, bigrams: bool = True,
                        idx_col: str = "f_idx",
                        val_col: str = "f_val") -> DataFrame:
    """Add sparse hashed-feature columns: ``idx_col ARRAY<INT>`` (may
    repeat — dots accumulate) and ``val_col ARRAY<DOUBLE>`` (uniform
    1/n tf weights, fastText's mean pooling)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    grams = toks
    if bigrams:
        bi = F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda t, i: F.concat(
                t, F.lit(" "), F.get(toks, i + F.lit(1))))
        grams = F.concat(toks, bi)
    idx = F.transform(grams,
                      lambda g: F.pmod(F.xxhash64(g), F.lit(dim))
                      .cast("int"))
    n = F.size(idx)
    # empty text keeps its row with empty arrays (margin = bias) — the
    # transform lambda never evaluates over [], so no division by zero
    val = F.transform(idx, lambda _: F.lit(1.0) / n)
    return df.withColumn(idx_col, idx).withColumn(val_col, val)


def _dot_udf(spark, weights: np.ndarray, bias: float):
    # a REAL broadcast, not closure capture: the 2 MB weight vector
    # ships to each executor once per stage instead of riding every
    # serialized task
    bw = spark.sparkContext.broadcast(weights)

    @F.pandas_udf("double")
    def margin(idx: pd.Series, val: pd.Series) -> pd.Series:
        w = bw.value
        out = np.empty(len(idx))
        for i, (ii, vv) in enumerate(zip(idx, val)):
            ia = np.asarray(ii)
            out[i] = float(np.dot(w[ia], np.asarray(vv))) if ia.size else 0.0
        return pd.Series(out + bias)

    return margin


def train_logistic(df: DataFrame, label_col: str,
                   idx_col: str = "f_idx", val_col: str = "f_val",
                   dim: int = 1 << 18, iterations: int = 20,
                   lr: float = 20.0, l2: float = 1e-6):
    """Full-batch GD logistic regression on sparse hashed features.
    Returns ``(weights ndarray[dim], bias float, history list[logloss])``.

    Per iteration: one map-only scoring pass + one sparse-gradient
    aggregation (the explode shuffles (index, residual·value) pairs
    with map-side combine). The input frame is pinned once; at cluster
    scale ``persist()`` it across iterations the same way.
    """
    data = (df.select(F.col(label_col).cast("double").alias("_y"),
                      F.col(idx_col).alias("_i"), F.col(val_col).alias("_v"))
            .localCheckpoint(eager=True))
    n = data.count()
    if n == 0:
        raise ValueError("train_logistic: empty input")
    w = np.zeros(dim)
    b = 0.0
    history = []
    for _ in range(int(iterations)):
        m = _dot_udf(df.sparkSession, w, b)
        scored = data.withColumn("_r",
                                 F.lit(1.0) / (F.lit(1.0)
                                               + F.exp(-m("_i", "_v")))
                                 - F.col("_y"))
        # logloss from the residual: p = r + y, so -log(p) for
        # positives, -log(1-p) for negatives — no second UDF pass
        p = F.col("_r") + F.col("_y")
        agg = scored.agg(
            F.sum("_r").alias("gb"),
            (-F.sum(F.log(F.greatest(
                F.when(F.col("_y") > 0.5, p).otherwise(F.lit(1.0) - p),
                F.lit(1e-12))))).alias("ll")).first()
        grad = (scored.select(
                    F.explode(F.arrays_zip("_i", "_v")).alias("z"), "_r")
                .groupBy(F.col("z._i").alias("i"))
                .agg(F.sum(F.col("z._v") * F.col("_r")).alias("g"))
                .orderBy("i").collect())
        # deterministic update: sorted sparse gradient, then uniform l2
        w *= (1.0 - lr * l2)
        if grad:
            ii = np.array([r["i"] for r in grad])
            gg = np.array([r["g"] for r in grad])
            w[ii] -= lr * gg / n
        b -= lr * float(agg["gb"]) / n
        history.append(float(agg["ll"]) / n)
    return w, b, history


def score_pinned(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", dim: int = 4096,
                 salt: str = "c5") -> DataFrame:
    """(id_col, n_feats, score): linear quality score with a PINNED
    weight vector — the oracle-replayable scoring twin of
    :func:`score_documents`. Same feature definition (whitespace
    uni+bigrams, hashing trick into ``dim``), but

    - the feature hash is the cross-engine md5 construction
      (``functions/hashing.md5_long`` — DuckDB twin exists; xxhash64
      does not), and
    - the weight for index ``i`` is the pinned integer
      ``w(i) = ((i * 2654435761 + 101) % 2001) - 1000`` (Knuth's
      multiplicative constant), so the model is a pure function of the
      text and the score ``Σ_grams w(h(gram))`` is an exact BIGINT sum
      — order-independent, bit-identical in any engine.

    Trained-weight scoring stays on :func:`score_documents` (xxhash64 +
    Arrow dot — the fast path); GD training determinism is covered by
    the pytest numpy-parity tests. This entry point exists so the
    scoring semantics have a full value-hash oracle.

    100 TB shape: one tokenize+explode pass, all-JVM expressions, one
    map-side-combinable groupBy(id) — no Python, no broadcast needed
    (the weight vector is a formula, not data).
    """
    from rust_graph_db_spark.functions.hashing import md5_key, md5_long
    from rust_graph_db_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("_id"),
        F.filter(tokens(F.col(text_col)),
                 lambda x: x != F.lit("")).alias("_toks"))
    uni = base.select("_id", F.explode("_toks").alias("g"))
    big = (base.where(F.size("_toks") >= 2)
           .select("_id", F.explode(F.expr(
               "transform(sequence(2, size(_toks)),"
               " i -> concat(element_at(_toks, i - 1), ' ',"
               " element_at(_toks, i)))")).alias("g")))
    idx = F.pmod(md5_long(md5_key(F.lit(salt), F.col("g"))),
                 F.lit(int(dim)))
    w = (F.pmod(idx * F.lit(2654435761) + F.lit(101), F.lit(2001))
         - F.lit(1000))
    scored = (uni.unionByName(big)
              .select("_id", w.alias("_w"))
              .groupBy("_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_feats"),
                   F.sum("_w").cast("long").alias("score")))
    return (df.select(F.col(id_col)).distinct()
            .join(scored, F.col(id_col) == F.col("_id"), "left")
            .select(id_col,
                    F.coalesce("n_feats", F.lit(0)).cast("long")
                    .alias("n_feats"),
                    F.coalesce("score", F.lit(0)).cast("long")
                    .alias("score")))


def score_documents(df: DataFrame, weights: np.ndarray, bias: float,
                    text_col: str = "text", out_col: str = "quality_prob",
                    dim: int = None, bigrams: bool = True) -> DataFrame:
    """Score raw text with a trained model: adds ``out_col`` =
    P(label=1). ``dim`` defaults to ``len(weights)``."""
    d = dim or len(weights)
    feats = hash_ngram_features(df, text_col, dim=d, bigrams=bigrams,
                                idx_col="_si", val_col="_sv")
    m = _dot_udf(df.sparkSession, weights, bias)
    return (feats.withColumn(
                out_col,
                F.lit(1.0) / (F.lit(1.0) + F.exp(-m("_si", "_sv"))))
            .drop("_si", "_sv"))
