"""Distributed n-gram language modeling: stupid-backoff LM training,
per-document perplexity scoring, and n-gram-profile language ID.

The CCNet corpus-filtering recipe (Wenzek et al., LREC 2020) scores
every web document with a language model trained on a trusted corpus
and drops the high-perplexity tail — the standard public
quality-filtering signal next to the classifier (`classifier.py`) and
the heuristic rules (`curation.py`). CCNet uses a 5-gram Kneser-Ney
model; at corpus scale the usual substitute is STUPID BACKOFF (Brants
et al., "Large Language Models in Machine Translation", EMNLP 2007),
which needs no discount fitting — score(w | prev) falls back from the
bigram relative frequency to α·unigram with a fixed α = 0.4 — and is
exactly the model whose counts and scores a SQL oracle can mirror.

Language ID is the Cavnar–Trenkle n-gram-profile method ("N-Gram-Based
Text Categorization", SDAIR 1994): build a character-trigram profile
per language from labeled seed text, score a document by how many of
its distinct trigrams appear in each profile, predict the argmax.
Integer overlap counts (not tf-idf floats) keep every comparison
bitwise-deterministic across engines. fastText-style hashed-ngram
logistic language ID is available by composing
``classifier.hash_ngram_features`` + ``train_quality_classifier`` on
(text, lang) pairs; this module is the closed-form profile variant.

Extension operators — the reference (a graph store, src/lib.rs) has no
text-model surface.

100 TB shape:
- training is two groupBy counts (unigrams, bigrams), both map-side
  combinable; the shuffle carries (gram, partial count) bounded by
  vocabulary, not corpus size. The LM "model" stays a pair of
  DataFrames — it is never collected to the driver.
- scoring joins each token occurrence against the unigram/bigram
  tables, hash-keyed on the token strings (intern to int64 ids
  upstream if vocabulary strings dominate the shuffle), then one
  per-document aggregation. No Python in the path.
- profiles are top-K trigrams per language (K small); the profile
  table broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_graph_db_spark.functions.text import tokens

BACKOFF_ALPHA = 0.4          # Brants et al. 2007's fixed backoff weight


@dataclass(frozen=True)
class BackoffLM:
    """A trained stupid-backoff bigram LM: two count frames + the
    total token count. ``unigrams`` is (w, c); ``bigrams`` is
    (w1, w2, c). Both stay distributed."""
    unigrams: DataFrame
    bigrams: DataFrame
    total: int
    alpha: float = BACKOFF_ALPHA


def train_backoff_lm(docs: DataFrame, text_col: str = "text",
                     alpha: float = BACKOFF_ALPHA) -> BackoffLM:
    """Count unigrams and bigrams over the corpus — the whole training
    step of a stupid-backoff model (no discounts to fit). Two
    map-side-combinable groupBy counts; ``total`` is the one driver
    scalar (Σ unigram counts)."""
    t = docs.select(tokens(F.col(text_col)).alias("_toks"))
    uni = (t.select(F.explode("_toks").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    # positions i=1..n-1 pair toks[i-1], toks[i]; same transform-over-
    # materialized-array shape as curation.ngram_stream (O(n) per doc)
    big = (t.where(F.size("_toks") >= 2)
           .select(F.explode(F.expr(
               "transform(sequence(2, size(_toks)),"
               " i -> struct(element_at(_toks, i - 1) AS w1,"
               " element_at(_toks, i) AS w2))")).alias("p"))
           .select("p.w1", "p.w2")
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    total = int(uni.agg(F.coalesce(F.sum("c"), F.lit(0))).first()[0])
    return BackoffLM(unigrams=uni, bigrams=big, total=total,
                     alpha=float(alpha))


def perplexity(docs: DataFrame, lm: BackoffLM, text_col: str = "text",
               id_col: str = "doc_id", ndigits: int = 3) -> DataFrame:
    """(id_col, n_tokens, ppl): per-document stupid-backoff perplexity
    exp(-mean log S), with

        S(w | prev) = c(prev w)/c(prev)      if the bigram was seen
                    = α · S_uni(w)           otherwise
        S_uni(w)    = c(w)/N  if seen else α/N   (OOV floor)

    and the first token of each document scored with S_uni alone.
    ``ppl`` is rounded to ``ndigits`` — the log/exp transcendentals
    differ in the last ulp across engines, so the oracle comparison
    needs a rounding margin (counts and ratios themselves are exact).

    Shape: one explode to (doc, prev, w) occurrence rows, three hash
    joins against the count tables, one per-document aggregation.
    """
    if lm.total <= 0:
        raise ValueError("perplexity: empty language model")
    occ = (docs.select(F.col(id_col), tokens(F.col(text_col))
                       .alias("_toks"))
           # NULL text: size(NULL) = -1 and sequence(1, -1) is the
           # DESCENDING [1, 0, -1] — three phantom NULL-token rows
           # per NULL doc. Such docs produce ZERO token rows in the
           # SQL oracle (unnest of NULL), so they are absent here too.
           .where(F.col("_toks").isNotNull() & (F.size("_toks") >= 1))
           .select(id_col, F.explode(F.expr(
               # get() is 0-based and returns NULL out of bounds, so
               # the first token's prev is NULL without a branch
               "transform(sequence(1, size(_toks)),"
               " i -> struct(get(_toks, i - 2) AS prev,"
               " element_at(_toks, i) AS w))")).alias("p"))
           .select(id_col, "p.prev", "p.w"))
    uni_w = lm.unigrams.select(F.col("w"), F.col("c").alias("cw"))
    uni_p = lm.unigrams.select(F.col("w").alias("prev"),
                               F.col("c").alias("cp"))
    big = lm.bigrams.select(F.col("w1").alias("prev"),
                            F.col("w2").alias("w"),
                            F.col("c").alias("cb"))
    n = float(lm.total)
    a = float(lm.alpha)
    s_uni = F.coalesce(F.col("cw").cast("double") / F.lit(n),
                       F.lit(a) / F.lit(n))
    s = (F.when(F.col("prev").isNull(), s_uni)
         .when(F.col("cb").isNotNull(),
               F.col("cb").cast("double") / F.col("cp").cast("double"))
         .otherwise(F.lit(a) * s_uni))
    scored = (occ.join(uni_w, "w", "left")
              .join(uni_p, "prev", "left")
              .join(big, ["prev", "w"], "left")
              .select(id_col, F.log(s).alias("lp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("lp").alias("_slp"))
            .select(id_col, "n_tokens",
                    F.round(F.exp(-F.col("_slp") / F.col("n_tokens")),
                            ndigits).alias("ppl")))


def perplexity_filter(docs: DataFrame, lm: BackoffLM,
                      max_ppl: float, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """CCNet's keep-the-head filter: documents whose LM perplexity is
    ≤ ``max_ppl``. Returns the input rows (all columns) that pass."""
    keep = (perplexity(docs, lm, text_col=text_col, id_col=id_col)
            .where(F.col("ppl") <= F.lit(float(max_ppl)))
            .select(id_col))
    return docs.join(keep, id_col, "left_semi")


# ------------------------------------------- Kneser-Ney (interpolated)

#: OOV numerator of the continuation floor: an unseen continuation
#: word scores KN_FLOOR / |bigram types| (same convention as the
#: stupid-backoff α/N unigram floor above).
KN_FLOOR = 0.4


@dataclass(frozen=True)
class KneserNeyLM:
    """A trained interpolated Kneser-Ney bigram LM (Kneser & Ney,
    ICASSP 1995; Chen & Goodman, TR-10-98 — both public). Three count
    frames, all distributed, plus two driver scalars:

    - ``bigrams``:       (w1, w2, c)      raw bigram counts
    - ``contexts``:      (w1, cp, nf)     cp = Σ_w2 c(w1,w2),
                                          nf = N1+(w1,·) distinct
                                          continuations of w1
    - ``continuations``: (w2, nb)         nb = N1+(·,w2) distinct
                                          contexts w2 follows
    - ``types``:         |distinct bigram types| (the P_cont base)
    - ``discount``:      D = n1/(n1+2·n2), the Chen-Goodman estimate
                         from the bigram count-of-counts (0.5 if no
                         count-1/count-2 bigrams exist)
    """
    bigrams: DataFrame
    contexts: DataFrame
    continuations: DataFrame
    types: int
    discount: float
    floor: float = KN_FLOOR


def train_kn_lm(docs: DataFrame, text_col: str = "text",
                floor: float = KN_FLOOR) -> KneserNeyLM:
    """Train an interpolated KN bigram model: one bigram groupBy count
    (map-side combinable, shuffle bounded by vocabulary²-seen), two
    derived aggregations over it, and ONE driver-side stats row
    (types / n1 / n2 → the discount). CCNet's quality LM is exactly
    this model at order 5 (Wenzek et al. 2020); order 2 keeps every
    count SQL-mirrorable while exercising the full discount +
    continuation machinery."""
    t = docs.select(tokens(F.col(text_col)).alias("_toks"))
    big = (t.where(F.size("_toks") >= 2)
           .select(F.explode(F.expr(
               "transform(sequence(2, size(_toks)),"
               " i -> struct(element_at(_toks, i - 1) AS w1,"
               " element_at(_toks, i) AS w2))")).alias("p"))
           .select("p.w1", "p.w2")
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    ctx = big.groupBy("w1").agg(F.sum("c").alias("cp"),
                                F.count(F.lit(1)).alias("nf"))
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("nb"))
    st = big.agg(
        F.count(F.lit(1)).alias("t"),
        F.count_if(F.col("c") == 1).alias("n1"),
        F.count_if(F.col("c") == 2).alias("n2")).first()
    types, n1, n2 = int(st["t"]), int(st["n1"]), int(st["n2"])
    # types == 0 (no bigrams anywhere) trains a degenerate model;
    # kn_perplexity raises on it — same convention as BackoffLM.
    # correctly-rounded double division of exact ints — bit-identical
    # to the oracle's CAST(n1 AS DOUBLE)/CAST(n1+2*n2 AS DOUBLE)
    disc = 0.5 if n1 + 2 * n2 == 0 else float(n1) / float(n1 + 2 * n2)
    return KneserNeyLM(bigrams=big, contexts=ctx, continuations=cont,
                       types=types, discount=disc, floor=float(floor))


def kn_perplexity(docs: DataFrame, lm: KneserNeyLM,
                  text_col: str = "text", id_col: str = "doc_id",
                  ndigits: int = 3,
                  broadcast_max_types: int = 250_000_000) -> DataFrame:
    """(id_col, n_tokens, ppl): per-document interpolated Kneser-Ney
    perplexity exp(-mean ln P), with

        P(w | prev) = max(c(prev,w) - D, 0)/cp(prev)
                      + (D · N1+(prev,·) / cp(prev)) · P_cont(w)
        P_cont(w)   = N1+(·,w)/T  if w was ever a continuation,
                      else floor/T                       (OOV)

    and P_cont(w) alone when prev is NULL (first token) or prev was
    never a bigram context. Every input to the formula is an exact
    integer count; D and the divisions are correctly-rounded double
    ops written in the SAME association order as the SQL oracle, so
    each per-token P is bit-identical across engines — only the
    ln/Σ/exp tail needs the usual round-to-``ndigits`` margin (the
    t12 contract).

    Shape: one explode to (doc, prev, w) occurrence rows, three hash
    joins against the count frames, one per-document aggregation. No
    Python in the path. Two measured scale decisions (10M-doc
    rehearsal, SCALE.md §17):

    - the joins carry 8-byte xxhash64 INTERNED keys on both sides,
      never the token strings (the c8/t17 interning; collision bound
      P ≈ types²/2^65, ~2e-5 at 29M types; the oracle joins on
      strings, so the sf-scale gate would catch a collision that
      actually fired there);
    - when ``lm.types <= broadcast_max_types`` the three count frames
      are BROADCAST (~16-24 B/type interned; the 250M default ≈ 6 GB,
      inside Spark's 8 GB broadcast cap): the LM is a MODEL, and
      shuffling the corpus-token-cardinality occurrence table three
      times BY the model's keys is backwards at corpus >> model scale
      — the string form of exactly that exhausted the rehearsal box's
      shuffle tier twice. With the broadcast the corpus NEVER
      shuffles; the only exchange is the final per-document partial
      aggregation. Above the gate the shuffle-join form remains — but
      note the measured inversion (SCALE.md §19): the r6 gate of 50M
      flipped the 20M-doc/59M-type rehearsal onto the shuffle path,
      whose corpus-sized spill exhausted a 70 GB disk and KILLED the
      stage, while the broadcast form (~1.4 GB) completed; forcing
      shuffle at a 5.9M-type toy scale had looked "gracefully slower"
      (§18). The fallback trades executor memory for shuffle disk
      that grows with the CORPUS — keep the gate at the broadcast
      cap, not at a comfort number."""
    if lm.types <= 0:
        raise ValueError("kn_perplexity: empty language model")
    occ = (docs.select(F.col(id_col), tokens(F.col(text_col))
                       .alias("_toks"))
           # same NULL-text guard as perplexity(): phantom
           # sequence(1, -1) tokens must not score a NULL doc
           .where(F.col("_toks").isNotNull() & (F.size("_toks") >= 1))
           .select(id_col, F.explode(F.expr(
               "transform(sequence(1, size(_toks)),"
               " i -> struct(get(_toks, i - 2) AS prev,"
               " element_at(_toks, i) AS w))")).alias("p"))
           .select(id_col,
                   # NULL prev (first token) must stay NULL, not
                   # hash-of-null: a join key of xxhash64(NULL) = the
                   # seed constant could collide with a real word
                   F.when(F.col("p.prev").isNull(),
                          F.lit(None).cast("long"))
                    .otherwise(F.xxhash64("p.prev")).alias("_hprev"),
                   F.xxhash64("p.w").alias("_hw")))
    ctx = lm.contexts.select(F.xxhash64("w1").alias("_hprev"),
                             "cp", "nf")
    cont = lm.continuations.select(F.xxhash64("w2").alias("_hw"), "nb")
    big = lm.bigrams.select(F.xxhash64("w1").alias("_hprev"),
                            F.xxhash64("w2").alias("_hw"),
                            F.col("c").alias("cb"))
    t = float(lm.types)
    d = float(lm.discount)
    s_cont = F.coalesce(F.col("nb").cast("double") / F.lit(t),
                        F.lit(lm.floor) / F.lit(t))
    cp = F.col("cp").cast("double")
    p_kn = (F.greatest(F.coalesce(F.col("cb"), F.lit(0))
                       .cast("double") - F.lit(d), F.lit(0.0)) / cp
            + ((F.lit(d) * F.col("nf").cast("double")) / cp) * s_cont)
    p = (F.when(F.col("_hprev").isNull() | F.col("cp").isNull(),
                s_cont)
         .otherwise(p_kn))
    use_broadcast = lm.types <= int(broadcast_max_types)
    if use_broadcast:
        # the broadcast BUILD collects through the driver and is
        # charged against spark.driver.maxResultSize — on a session
        # not built by get_spark() (which pins 8g) the 1g default
        # kills a model-sized broadcast with an opaque task error
        # (the §19 attempt-2 FATAL). Fail fast with the fix instead.
        mrs = str(docs.sparkSession.conf.get(
            "spark.driver.maxResultSize", "1g")).strip().lower()
        units = {"k": 10, "m": 20, "g": 30, "t": 40}
        digits = mrs.rstrip("kmgtb")
        cap = (int(digits or 0)
               << units.get(mrs.rstrip("b")[-1:], 0)) if digits else 0
        est = lm.types * 24
        if cap and est > cap:
            raise ValueError(
                f"kn_perplexity: broadcasting a {lm.types:,}-type "
                f"model collects ~{est >> 20} MiB through the driver, "
                f"above spark.driver.maxResultSize={mrs}. Raise it "
                "(rust_graph_db_spark.get_spark() sets 8g), or force "
                "the shuffle path with broadcast_max_types=0 — whose "
                "DISK cost grows with the corpus (SCALE.md §19).")
    hint = F.broadcast if use_broadcast else (lambda frame: frame)
    scored = (occ.join(hint(cont), "_hw", "left")
              .join(hint(ctx), "_hprev", "left")
              .join(hint(big), ["_hprev", "_hw"], "left")
              .select(id_col, F.log(p).alias("lp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("lp").alias("_slp"))
            .select(id_col, "n_tokens",
                    F.round(F.exp(-F.col("_slp") / F.col("n_tokens")),
                            ndigits).alias("ppl")))


def kn_perplexity_filter(docs: DataFrame, lm: KneserNeyLM,
                         max_ppl: float, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Keep-the-head filter under the KN model: rows whose KN
    perplexity is ≤ ``max_ppl`` (all input columns preserved)."""
    keep = (kn_perplexity(docs, lm, text_col=text_col, id_col=id_col)
            .where(F.col("ppl") <= F.lit(float(max_ppl)))
            .select(id_col))
    return docs.join(keep, id_col, "left_semi")


# ----------------------------------------------------- language ID

def _char_trigrams() -> F.Column:
    """Distinct character trigrams (positions 1..len-2) of the column
    ``_lc`` — callers MUST alias their lowercased text to ``_lc``
    first (the expr strings below hardcode the name; a parameter here
    would be a trap since it could not reach them). The length guard
    matters: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty,
    so texts under 3 chars must short-circuit to []. DuckDB twin:
    list_distinct(list_transform(generate_series(1,
    greatest(len(lower(t)) - 2, 0)), i -> substr(lower(t), i, 3))) —
    generate_series IS empty there."""
    return F.array_distinct(
        F.when(F.length("_lc") >= 3, F.expr(
            "transform(sequence(1, length(_lc) - 2),"
            " i -> substring(_lc, i, 3))"))
        .otherwise(F.array().cast("array<string>")))


def language_profiles(docs: DataFrame, lang_col: str = "lang",
                      text_col: str = "text", top: int = 200) -> DataFrame:
    """(lang, gram): the ``top`` most frequent character trigrams per
    language over the labeled seed corpus — a Cavnar–Trenkle profile
    per language. Document-frequency counts (each doc contributes a
    trigram once) with (count DESC, gram ASC) rank ties, so the
    profile is a pure function of the corpus. The result is tiny
    (langs × top) — broadcast it at scoring time."""
    grams = (docs.select(F.col(lang_col).alias("lang"),
                         F.lower(F.col(text_col)).alias("_lc"))
             .select("lang", F.explode(_char_trigrams())
                     .alias("gram"))
             .groupBy("lang", "gram")
             .agg(F.count(F.lit(1)).alias("c")))
    rk = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    return (grams.withColumn("_r", F.row_number().over(rk))
            .where(F.col("_r") <= int(top))
            .select("lang", "gram"))


def language_id(docs: DataFrame, profiles: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id_col, lang, overlap): predicted language per document =
    argmax over languages of |doc's distinct trigrams ∩ profile|,
    ties broken by language name — integer scoring, so the prediction
    is bitwise-deterministic and exactly SQL-mirrorable.

    Shape: explode distinct doc trigrams, broadcast-join the (langs ×
    top) profile table, one (doc, lang) count aggregation, one
    row_number window keyed on the document. Documents matching NO
    profile trigram are returned with lang NULL and overlap 0 (no
    evidence — callers route them to a fallback).

    The join key is INTERNED to int64 (``xxhash64``) on both sides —
    the same fix SCALE.md §11 prescribes for the LM joins — and the
    hash runs INSIDE the trigram transform, so ``array_distinct``
    dedups 8-byte longs and no trigram string outlives its substring
    call: the exploded stream (the dominant row count of this
    operator, ~450 rows/doc) carries longs end to end, and the
    broadcast-hash probe compares longs. Semantics differ from the
    string join only if a document trigram 64-bit-collides with
    another doc trigram or one of the (langs × top) profile grams —
    P ≈ distinct_grams × (langs·top) / 2^64, vanishing at any corpus
    size (the c8 oracle joins strings and stays green)."""
    tri_h = F.array_distinct(
        F.when(F.length("_lc") >= 3, F.expr(
            "transform(sequence(1, length(_lc) - 2),"
            " i -> xxhash64(substring(_lc, i, 3)))"))
        .otherwise(F.array().cast("array<bigint>")))
    grams = (docs.select(F.col(id_col),
                         F.lower(F.col(text_col)).alias("_lc"))
             .select(id_col, F.explode(tri_h).alias("_gh")))
    prof = profiles.select(F.xxhash64("gram").alias("_gh"), "lang")
    scores = (grams.join(F.broadcast(prof), "_gh")
              .groupBy(id_col, "lang")
              .agg(F.count(F.lit(1)).cast("long").alias("overlap")))
    # argmax as a map-side-combinable min_by on (-overlap, lang)
    # (unique per row within a document, so min_by has no ties to
    # break): the former row_number window shipped every (doc, lang)
    # score row through the exchange; the partial aggregate collapses
    # to one row per document per map task first, and picks the same
    # winner ((overlap DESC, lang ASC) == (-overlap, lang) ASC)
    # (r7, guide §2.3/§2.4)
    best = (scores.groupBy(id_col)
            .agg(F.min_by(
                    F.struct(F.col("lang"), F.col("overlap")),
                    F.struct((-F.col("overlap")).alias("_no"),
                             F.col("lang"))).alias("_b"))
            .select(id_col, F.col("_b.lang").alias("lang"),
                    F.col("_b.overlap").alias("overlap")))
    return (docs.select(id_col).distinct()
            .join(best, id_col, "left")
            .select(id_col, "lang",
                    F.coalesce("overlap", F.lit(0)).cast("long")
                    .alias("overlap")))
