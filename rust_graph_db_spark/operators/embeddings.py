"""Static embedding training: PPMI co-occurrence + truncated SVD.

Levy & Goldberg, "Neural Word Embedding as Implicit Matrix
Factorization" (NeurIPS 2014): skip-gram-with-negative-sampling
factorizes the shifted PMI matrix, so PPMI + SVD is the closed-form
(and deterministic) route to comparable static embeddings — for words
(co-occurrence windows over text) or graph vertices (pairs from
``graph_algos.walk_skipgram_pairs``, i.e. spectral DeepWalk).

Scale split: the CORPUS-sized work — pair extraction and co-occurrence
counting — is distributed (map-side-combinable counts, one shuffle
keyed on the pair); the factorization runs on the driver over the
vocab-capped V×V matrix, which is the standard design at any corpus
size because V is a modeling choice (default 2048 → 32 MB dense; the
corpus never touches the driver).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_cooccurrence_pairs(df: DataFrame, text_col: str = "text",
                             window: int = 2) -> DataFrame:
    """(center, context) token pairs within ``window`` positions, both
    directions — the skip-gram extraction over text. One posexplode +
    a banded self-join keyed on (row, position band), the same shape as
    ``walk_skipgram_pairs``."""
    # rid is assigned BEFORE the explode (after it, each token would
    # get its own id and the self-join would only pair tokens with
    # themselves) and pinned (an unpinned monotonically_increasing_id
    # re-evaluates per join branch)
    toks = (df.select(F.monotonically_increasing_id().alias("rid"),
                      F.col(text_col).alias("_t"))
            .select("rid",
                    F.posexplode(
                        F.filter(F.split(F.lower(F.col("_t")), r"\s+"),
                                 lambda x: x != F.lit("")))
                    .alias("pos", "tok"))
            .localCheckpoint(eager=True))
    # Band key = floor(pos/window): positions within `window` of each
    # other differ by at most one band, so joining on (rid, band) with
    # the context side replicated into its 3 adjacent bands bounds the
    # join fan-out at 3·window rows per token — O(tokens·window), not
    # O(tokens-per-doc²) (r3 ADVICE: the rid-only join blew up
    # quadratically on long documents). Each qualifying pair matches
    # exactly once: the center's single band hits exactly one of the
    # context's three distinct band replicas.
    w = int(window)
    a = toks.select("rid", F.floor(F.col("pos") / w).alias("band"),
                    F.col("pos").alias("pa"),
                    F.col("tok").alias("center"))
    band_b = F.floor(F.col("pos") / w)
    b = toks.select(
        "rid",
        F.explode(F.array(band_b - 1, band_b, band_b + 1)).alias("band"),
        F.col("pos").alias("pb"),
        F.col("tok").alias("context"))
    return (a.join(b, ["rid", "band"])
            .where((F.col("pa") != F.col("pb"))
                   & (F.abs(F.col("pa") - F.col("pb")) <= w))
            .select("center", "context"))


def ppmi_table(pairs: DataFrame, center_col: str = "center",
               context_col: str = "context",
               shift: float = 0.0, ndigits: int = 6) -> DataFrame:
    """Distributed PPMI matrix as a (a, b, ppmi) table — the
    corpus-sized 90% of :func:`ppmi_svd_embeddings` (everything except
    the vocab-capped driver SVD), kept fully distributed so a SQL
    oracle can value-check it:

        ppmi(a, b) = max(0, ln(n(a,b)·N / (n(a)·n(b))) − shift)

    with N the total pair count and n(·) the marginal sums. Only
    positive entries are returned (the PPMI matrix is sparse by
    construction). Shape: one (a, b) count shuffle (map-side
    combinable), two marginal aggregations joined back on their keys,
    one scalar broadcast — no driver matrix. ``ppmi`` rounds to
    ``ndigits`` (ln differs in the last ulp across engines).
    """
    p = pairs.select(F.col(center_col).cast("string").alias("a"),
                     F.col(context_col).cast("string").alias("b"))
    counts = (p.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nab"))
              .localCheckpoint(eager=True))
    na = counts.groupBy("a").agg(F.sum("nab").alias("na"))
    nb = counts.groupBy("b").agg(F.sum("nab").alias("nb"))
    n = int(counts.agg(F.coalesce(F.sum("nab"), F.lit(0))).first()[0])
    if n == 0:
        return pairs.sparkSession.createDataFrame(
            [], "a STRING, b STRING, ppmi DOUBLE")
    val = (F.log(F.col("nab").cast("double") * F.lit(float(n))
                 / (F.col("na").cast("double")
                    * F.col("nb").cast("double")))
           - F.lit(float(shift)))
    return (counts.join(na, "a").join(nb, "b")
            .select("a", "b", F.round(val, ndigits).alias("ppmi"))
            .where(F.col("ppmi") > 0))


def ppmi_svd_embeddings(pairs: DataFrame, dim: int = 32,
                        vocab_size: int = 2048,
                        center_col: str = "center",
                        context_col: str = "context",
                        shift: float = 0.0) -> DataFrame:
    """Train embeddings from (center, context) pairs: distributed
    co-occurrence counts → PPMI (optionally shifted by log k) →
    truncated SVD, embedding = U_d·√Σ_d. Returns ``(token STRING,
    embedding ARRAY<DOUBLE>)`` for the top-``vocab_size`` tokens.

    Deterministic: vocabulary ties break lexicographically, and each
    singular vector's sign is normalized (largest-|component| entry
    positive), so the output is a pure function of the pair multiset.
    """
    p = pairs.select(F.col(center_col).cast("string").alias("a"),
                     F.col(context_col).cast("string").alias("b"))
    counts = p.groupBy("a", "b").agg(F.count("*").alias("n")) \
              .localCheckpoint(eager=True)
    vocab_rows = (counts.groupBy("a").agg(F.sum("n").alias("cnt"))
                  .orderBy(F.desc("cnt"), F.asc("a"))
                  .limit(int(vocab_size)).collect())
    vocab = [r["a"] for r in vocab_rows]
    if not vocab:
        return pairs.sparkSession.createDataFrame(
            [], "token STRING, embedding ARRAY<DOUBLE>")
    idx = {t: i for i, t in enumerate(vocab)}
    v = len(vocab)
    spark = pairs.sparkSession
    vmap = spark.createDataFrame([(t,) for t in vocab], "tok STRING")
    kept = (counts
            .join(vmap.withColumnRenamed("tok", "a"), "a", "left_semi")
            .join(vmap.withColumnRenamed("tok", "b"), "b", "left_semi")
            .collect())
    m = np.zeros((v, v))
    for r in kept:
        m[idx[r["a"]], idx[r["b"]]] = r["n"]
    total = m.sum()
    pa = m.sum(axis=1, keepdims=True) / total
    pb = m.sum(axis=0, keepdims=True) / total
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((m / total) / (pa @ pb)) - float(shift)
    ppmi = np.where(np.isfinite(pmi), np.maximum(pmi, 0.0), 0.0)
    u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
    d = min(int(dim), v)
    emb = u[:, :d] * np.sqrt(s[:d])
    # sign convention: the largest-|component| entry of each singular
    # vector is positive (SVD signs are otherwise arbitrary)
    for j in range(d):
        col = emb[:, j]
        if col[np.argmax(np.abs(col))] < 0:
            emb[:, j] = -col
    return spark.createDataFrame(
        [(t, [float(x) for x in emb[i]]) for i, t in enumerate(vocab)],
        "token STRING, embedding ARRAY<DOUBLE>")
