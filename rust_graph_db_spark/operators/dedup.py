"""Deduplication operators for training-data pipelines.

Four families, each designed for the 100 TB shape of the problem:

- **exact**: hash-groupBy on a content digest — one shuffle of 16-byte
  digests instead of full documents.
- **n-gram Jaccard (exact)**: inverted-index similarity join — explode
  shingles, equi-join on shingle, count common per pair. The standard
  exact algorithm; the shuffle carries (shingle, id) pairs, never text.
- **MinHash + LSH**: signature = per-seed min of xxhash64 over shingles,
  banded into buckets; only same-bucket pairs are candidates, then
  candidates are verified with the exact Jaccard. Recall for
  threshold t: 1-(1-t^r)^b (defaults r=4, b=16 → 0.9998 @ t=0.8).
- **SimHash**: 64-bit token-hash sign-aggregate; near-dups = Hamming
  distance ≤ d, found via 4×16-bit band exact-match (any pair within
  Hamming 3 shares at least one of 4 bands — pigeonhole).

Everything is Catalyst expressions (higher-order array functions +
joins); no Python UDFs, no driver-side loops. Candidate generation is
deterministic (fixed hash seeds) so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_graph_db_spark.functions.text import shingles, tokens


# ------------------------------------------------------------------ exact

def exact_dedup_keep_ids(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Ids that survive exact dedup (min id per identical text).

    Shuffles md5 digests (16 B) rather than document bodies; collision
    probability at 100 TB doc counts (~1e11) is ~1e-17.
    """
    return (df.groupBy(F.md5(F.col(text_col)).alias("_digest"))
              .agg(F.min(id_col).alias(id_col))
              .select(id_col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated rows themselves (left-semi against kept ids)."""
    return df.join(exact_dedup_keep_ids(df, id_col, text_col),
                   id_col, "left_semi")


# ------------------------------------------------- exact n-gram Jaccard join

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 5, threshold: float = 0.5,
) -> DataFrame:
    """All pairs (i < j) with k-shingle Jaccard ≥ threshold — exact.

    Inverted-index join: |common shingles| per pair via groupBy, then
    ``jac = c / (|A| + |B| - c)``. Returns (i, j, jac).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    inv = sh.select("id", "sz", F.explode("sh").alias("g"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("i"), F.col("b.id").alias("j"),
                 F.col("a.sz").alias("sa"), F.col("b.sz").alias("sb"))
        .agg(F.count("*").alias("c"))
    )
    return (common
            .withColumn("jac", F.col("c") / (F.col("sa") + F.col("sb") - F.col("c")))
            .where(F.col("jac") >= threshold)
            .select("i", "j", "jac"))


# --------------------------------------------------------------- MinHash/LSH

def minhash_signature(text: Column, num_hashes: int = 64, k: int = 5) -> Column:
    """ARRAY<LONG> of per-seed minima of xxhash64 over the k-shingles."""
    sh = shingles(text, k)
    return F.array(*[
        F.array_min(F.transform(sh, lambda x, s=s: F.xxhash64(F.lit(s), x)))
        for s in range(num_hashes)
    ])


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 64, bands: int = 16, k: int = 5,
    threshold: float = 0.5, verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded MinHash, optionally verified exactly.

    rows-per-band r = num_hashes // bands; candidate pairs share at
    least one band bucket. With verify=True the output equals the exact
    Jaccard join restricted to LSH candidates (recall 1-(1-t^r)^b).
    Returns (i, j, jac) — jac is the exact value when verified.
    """
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("sig"),
        shingles(F.col(text_col), k).alias("sh"),
    )
    band_cols = F.array(*[
        F.struct(F.lit(b_).alias("band"),
                 F.xxhash64(*[F.element_at("sig", b_ * r + i + 1)
                              for i in range(r)]).alias("bucket"))
        for b_ in range(bands)
    ])
    buckets = base.select("id", "sh", F.explode(band_cols).alias("bb")) \
                  .select("id", "sh", F.col("bb.band").alias("band"),
                          F.col("bb.bucket").alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"),
                F.col("a.sh").alias("sha"), F.col("b.sh").alias("shb"))
        .dropDuplicates(["i", "j"])
    )
    if not verify:
        return cand.select("i", "j")
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (cand.withColumn("jac", inter / union)
                .where(F.col("jac") >= threshold)
                .select("i", "j", "jac"))


# ------------------------------------------------------------------ SimHash

def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens (token multiplicity counts).

    bit i of the result = sign of Σ_tokens (±1 by bit i of xxhash64(token)).
    Single pass, pure expressions: aggregate + zip_with, no explode.
    """
    toks = tokens(text)
    bitsums = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.when(F.getbit(F.xxhash64(t), i) == 1,
                                 F.lit(1).cast("long"))
                           .otherwise(F.lit(-1).cast("long"))),
            lambda x, y: x + y),
    )
    # fold bits 62..0 MSB-first (acc*2+bit stays within long under ANSI
    # mode), then two's-complement the sign bit with +Long.MIN_VALUE
    low63 = F.aggregate(
        F.transform(
            F.sequence(F.lit(62), F.lit(0), F.lit(-1)),
            lambda i: F.when(F.element_at(bitsums, i + 1) > 0,
                             F.lit(1).cast("long"))
                       .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + x,
    )
    sign = F.when(F.element_at(bitsums, 64) > 0,
                  F.lit(-9223372036854775808)).otherwise(F.lit(0).cast("long"))
    return low63 + sign


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
) -> DataFrame:
    """Pairs (i < j) with SimHash Hamming distance ≤ max_hamming.

    Band trick: any pair within Hamming 3 agrees exactly on ≥1 of the
    4 disjoint 16-bit bands, so candidates come from 4 equi-joins on
    (band, 16-bit slice) — never an all-pairs scan. Returns
    (i, j, hamming).
    """
    sim = df.select(F.col(id_col).alias("id"),
                    simhash64(F.col(text_col)).alias("sim"))
    band_arr = F.array(*[
        F.struct(
            F.lit(b_).alias("band"),
            F.shiftrightunsigned("sim", 16 * b_).bitwiseAND(F.lit(0xFFFF))
             .alias("slice"))
        for b_ in range(4)
    ])
    bb = sim.select("id", "sim", F.explode(band_arr).alias("bb")) \
            .select("id", "sim", "bb.band", "bb.slice")
    a, b = bb.alias("a"), bb.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.slice") == F.col("b.slice"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"),
                F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
                 .alias("hamming"))
        .dropDuplicates(["i", "j"])
        .where(F.col("hamming") <= max_hamming)
    )
