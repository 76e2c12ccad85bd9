"""Byte-pair-encoding tokenizer training and encoding over a corpus.

Extension operators (the reference has no text tooling at all): the
standard subword-vocabulary learner for an LLM data pipeline — Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016). Training works on the distinct-WORD frequency table,
not raw documents, so its working set is corpus vocabulary (millions of
rows at 100 TB, trivially distributed), and each merge round is one
pair-count aggregation (map-side combinable) + one JVM-side array fold
— no Python in the training loop.

``bpe_encode`` applies a learned merge list with an Arrow-batched
pandas UDF (per-word memoized); encoding is the embarrassingly-parallel
half, so Python-per-batch is the right trade there.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich §3.2)


def _chars_with_end(word: Column) -> Column:
    """'low' → ['l', 'o', 'w', '</w>']."""
    return F.concat(
        F.filter(F.split(word, ""), lambda x: x != F.lit("")),
        F.array(F.lit(END)))


def _merge_pair(syms: Column, left: str, right: str,
                joined: str | None = None) -> Column:
    """Greedy left-to-right merge of the adjacent pair (left, right)
    into one symbol — a single JVM-side array fold. Correct for
    overlapping runs ('aaa' + merge(a,a) → ['aa','a']) because a
    just-merged tail symbol no longer equals ``left``. ``joined``
    overrides the merged symbol's spelling (WordPiece drops the
    continuation marker: 'a' + '##b' → 'ab')."""
    if joined is None:
        joined = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # F.get is 0-based and NULL-safe on the empty accumulator
            # (element_at(-1) would throw under ANSI mode)
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(joined)))
        ).otherwise(F.concat(acc, F.array(x))))


# Distinct-word tables at or below this row count train driver-side
# (exact same merges/usage counts, ~30 Spark jobs fewer per call — the
# same size-gate discipline as graph_algos' driver-Tarjan SCC and lm's
# broadcast-the-model). Above it the distributed loops below run
# unchanged: a 100 TB natural-language corpus has tens of millions of
# distinct words and must never collect. 65 536 words ≈ 3 MB collected.
DRIVER_VOCAB_GATE = 65536


def _merge_fold(syms: list, left: str, right: str, joined: str) -> list:
    """Python twin of :func:`_merge_pair`'s JVM array fold — the exact
    tail-check semantics matter: a just-merged tail CAN re-merge when
    ``joined == left`` (WordPiece's 'x'+'##' → 'x'), which a
    scan-and-skip rewrite would miss."""
    acc: list = []
    for x in syms:
        if acc and acc[-1] == left and x == right:
            acc[-1] = joined
        else:
            acc.append(x)
    return acc


def _merges_local(rows: list, num_merges: int, min_pair_freq: int,
                  wordpiece: bool) -> list:
    """Exact driver-side replay of the train_bpe / train_wordpiece
    round loop over a collected ``[(freq, syms), ...]`` word table.

    Incremental bookkeeping (pair counts + a pair→rows index, updated
    only for rewritten rows) keeps each round O(rows containing the
    merged pair), not O(corpus vocabulary). Determinism is identical
    to the distributed loop: Python's per-code-point string order
    equals Spark's UTF8String byte order (UTF-8 preserves code-point
    order), and the WordPiece score is the same one IEEE-double divide
    of exact integer counts.
    """
    from collections import Counter, defaultdict

    pc: Counter = Counter()
    occ: dict = defaultdict(set)
    symf: Counter = Counter()
    for idx, (f, syms) in enumerate(rows):
        for p in zip(syms, syms[1:]):
            pc[p] += f
            occ[p].add(idx)
        if wordpiece:
            for s in syms:
                symf[s] += f
    merges = []
    for rank in range(int(num_merges)):
        best, bc = None, 0
        if wordpiece:
            bs = None
            for p, c in pc.items():
                if c < min_pair_freq:
                    continue
                sc = float(c) / (float(symf[p[0]]) * float(symf[p[1]]))
                if best is None or (-sc, p) < (-bs, best):
                    best, bs, bc = p, sc, c
            if best is None:
                break
        else:
            for p, c in pc.items():
                if c <= 0:
                    continue
                if best is None or (-c, p) < (-bc, best):
                    best, bc = p, c
            if best is None or bc < min_pair_freq:
                break
        left, right = best
        joined = left + right[len(WP_CONT):] if wordpiece else left + right
        if wordpiece:
            merges.append((rank, left, right, joined, int(bc)))
        else:
            merges.append((rank, left, right, int(bc)))
        touched = sorted(occ.pop(best))
        for idx in touched:
            f, syms = rows[idx]
            new = _merge_fold(syms, left, right, joined)
            for p in zip(syms, syms[1:]):
                pc[p] -= f
            for p in zip(new, new[1:]):
                pc[p] += f
                occ[p].add(idx)
            if wordpiece:
                for s in syms:
                    symf[s] -= f
                for s in new:
                    symf[s] += f
            rows[idx] = (f, new)
    return merges


def word_frequencies(df: DataFrame, text_col: str = "text",
                     min_freq: int = 1) -> DataFrame:
    """(word, freq) over whitespace tokens of the corpus."""
    return (df.select(F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda x: x != F.lit(""))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq"))
            .where(F.col("freq") >= int(min_freq)))


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 50, min_freq: int = 2,
              min_pair_freq: int = 2,
              driver_gate: int | None = None) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right,
    freq) ordered by rank. Deterministic: ties break on (left, right)
    lexicographically, so the merge list is a pure function of the
    corpus. Each round shuffles only (pair, partial-count) — map-side
    combine keeps the exchange at reducer-cardinality = live pair
    vocabulary. Stops early when no pair reaches ``min_pair_freq``.

    The corpus-volume work (word counting) is always distributed; the
    merge loop itself runs on the vocabulary-bound word table, so at
    or below ``driver_gate`` distinct words (default
    ``DRIVER_VOCAB_GATE``) it replays exactly on the driver — 2 Spark
    jobs per merge round become 0 (r7 optimization; pytest asserts
    both paths emit identical merge lists).
    """
    words = (word_frequencies(df, text_col, min_freq)
             .withColumn("syms", _chars_with_end(F.col("word")))
             .select("freq", "syms")
             .localCheckpoint(eager=True))
    gate = DRIVER_VOCAB_GATE if driver_gate is None else int(driver_gate)
    if words.count() <= gate:
        rows = [(int(r["freq"]), list(r["syms"])) for r in words.collect()]
        merges = _merges_local(rows, int(num_merges), int(min_pair_freq),
                               wordpiece=False)
        return df.sparkSession.createDataFrame(
            merges or [], "rank INT, left STRING, right STRING, freq BIGINT")
    merges = []
    for rank in range(int(num_merges)):
        pairs = words.select(
            "freq",
            F.explode(F.transform(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                lambda s, i: F.struct(
                    s.alias("left"),
                    F.element_at(F.col("syms"), i + F.lit(2)).alias("right"))
            )).alias("p"))
        best = (pairs.groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("pfreq"))
                .orderBy(F.desc("pfreq"), F.asc("left"), F.asc("right"))
                .first())
        if best is None or best["pfreq"] < int(min_pair_freq):
            break
        merges.append((rank, best["left"], best["right"],
                       int(best["pfreq"])))
        words = words.withColumn(
            "syms", _merge_pair(F.col("syms"), best["left"], best["right"])
        ).localCheckpoint(eager=True)
    return df.sparkSession.createDataFrame(
        merges or [], "rank INT, left STRING, right STRING, freq BIGINT")


def bpe_vocab(df: DataFrame, merges: DataFrame,
              text_col: str = "text", min_freq: int = 1) -> DataFrame:
    """Final (symbol, freq) table after applying a learned merge list
    to the corpus word frequencies."""
    ms = [(r["left"], r["right"])
          for r in merges.orderBy("rank").collect()]
    words = (word_frequencies(df, text_col, min_freq)
             .withColumn("syms", _chars_with_end(F.col("word"))))
    for left, right in ms:
        words = words.withColumn(
            "syms", _merge_pair(F.col("syms"), left, right))
    return (words.select("freq", F.explode("syms").alias("symbol"))
            .groupBy("symbol").agg(F.sum("freq").alias("freq")))


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (DataFrame from
    :func:`train_bpe` or a [(left, right), ...] sequence). Adds
    ``out_col ARRAY<STRING>``. Arrow-batched pandas UDF with per-word
    memoization — the merge table broadcasts with the closure."""
    if isinstance(merges, DataFrame):
        ms = [(r["left"], r["right"])
              for r in merges.orderBy("rank").collect()]
    else:
        ms = [tuple(m) for m in merges]
    ranks = {pair: i for i, pair in enumerate(ms)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def encode_word(w: str) -> list:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w) + [END]
            while len(syms) > 1:
                # lowest-rank adjacent pair, standard BPE apply order
                cand = [(ranks.get((syms[i], syms[i + 1])), i)
                        for i in range(len(syms) - 1)]
                cand = [(rk, i) for rk, i in cand if rk is not None]
                if not cand:
                    break
                rk, _ = min(cand)
                a, b = ms[rk]
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        return texts.map(lambda t: [s for w in (t or "").split()
                                    for s in encode_word(w)])

    return df.withColumn(out_col, enc(F.col(text_col)))


def _unigram_local(words: list, lp: int, min_piece_freq: int,
                   rounds: int) -> list:
    """Exact driver-side replay of unigram_vocab's seed + hard-EM loop
    over a collected ``[(w, freq), ...]`` distinct-word table. The
    integer (fewest-pieces, max-score-sum, lexicographically-smallest
    path) objective and the ' '-joined path tie-break are identical to
    the distributed DP, so usage counts match bit-for-bit."""
    from collections import Counter

    pieces: Counter = Counter()
    for w, f in words:
        l = len(w)
        for i in range(l):
            for n in range(1, min(lp, l - i) + 1):
                pieces[w[i:i + n]] += f
    scores = {p: s for p, s in pieces.items()
              if s >= min_piece_freq or len(p) == 1}
    usage: Counter = Counter()
    for _ in range(max(1, int(rounds))):
        usage = Counter()
        for w, f in words:
            l = len(w)
            dp: list = [None] * (l + 1)
            dp[0] = (0, 0, "")
            for j in range(1, l + 1):
                best = None
                for i in range(max(0, j - lp), j):
                    if dp[i] is None:
                        continue
                    s = scores.get(w[i:j])
                    if s is None:
                        continue
                    c = (dp[i][0] + 1, dp[i][1] + s,
                         dp[i][2] + " " + w[i:j])
                    if best is None or (c[0], -c[1], c[2]) < (
                            best[0], -best[1], best[2]):
                        best = c
                dp[j] = best
            for p in dp[l][2][1:].split(" "):
                usage[p] += f
        # M-step over the FULL seed-piece domain (unused pieces
        # re-enter at 0, same as the distributed left join)
        scores = {p: usage.get(p, 0) for p in scores}
    return [(p, int(u)) for p, u in usage.items() if u > 0]


def unigram_vocab(df: DataFrame, text_col: str = "text",
                  max_piece_len: int = 4, max_word_len: int = 12,
                  min_freq: int = 2, min_piece_freq: int = 2,
                  rounds: int = 1,
                  driver_gate: int | None = None) -> DataFrame:
    """Unigram-LM tokenizer vocabulary (Kudo, "Subword Regularization",
    ACL 2018 — the SentencePiece unigram trainer) in its DETERMINISTIC
    hard-EM form: seed pieces are all substrings up to
    ``max_piece_len`` of the (truncated-to-``max_word_len``) distinct
    words, scored by corpus frequency; each round Viterbi-segments
    every distinct word under the integer objective

        (fewest pieces, then highest total piece score, then
         lexicographically smallest piece sequence)

    and the expected-count E-step collapses to exact integer usage
    counts ``usage(p) = Σ_w freq(w)·occurrences(p in seg(w))``; the
    M-step re-scores pieces by usage. Only the RETURNED vocabulary is
    pruned to usage > 0: during multi-round EM every seed piece stays
    live (zero-usage pieces re-enter the next round at score 0, where
    the fewest-pieces leg of the objective can still pick them up) —
    pruning mid-EM would change segmentations and break the exact
    oracle replay. Returns ``(piece, usage)``, usage > 0. The integer objective is
    the whole trick: true unigram EM multiplies float probabilities,
    which no SQL engine replays bit-identically, while (count-sum,
    path) tuples are exact in both engines — so the FULL training
    loop is hash-oracled, the same property t11's BPE trainer has.

    100 TB shape (same as t11): training touches the corpus once
    (word frequencies — one map-side-combinable shuffle on the word);
    everything after runs on the DISTINCT-word table (vocabulary-
    cardinality, millions of rows at corpus scale), with the piece
    table broadcast into the per-position DP joins. The DP is
    ``max_word_len`` rounds of (up to ``max_piece_len`` predecessor
    joins + one per-word argmin window); single-char pieces are kept
    unconditionally so every word segments. Words truncate to
    ``max_word_len`` BEFORE counting (the truncation is part of the
    model, applied identically in the oracle).

    The Viterbi path string uses ' ' (space) as its piece separator:
    words are whitespace-split, so no piece can ever contain the
    separator — the path both splits losslessly into its pieces and
    tie-breaks identically in Spark, DuckDB, and the Python encoder.

    Like :func:`train_bpe`, the seed + EM loop replays exactly on the
    driver at or below ``driver_gate`` distinct words (default
    ``DRIVER_VOCAB_GATE``) — the 12-position DP costs ~`lw`
    checkpoint jobs distributed, 0 driver-side; corpora above the
    gate take the distributed DP unchanged.
    """
    lp, lw = int(max_piece_len), int(max_word_len)
    from pyspark.sql import Window

    words = (df.select(F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"),
                         lambda x: x != F.lit(""))).alias("tok"))
             .select(F.substring("tok", 1, lw).alias("w"))
             .groupBy("w").agg(F.count("*").alias("freq"))
             .where(F.col("freq") >= int(min_freq))
             .withColumn("l", F.length("w"))
             .localCheckpoint(eager=True))
    gate = DRIVER_VOCAB_GATE if driver_gate is None else int(driver_gate)
    if words.count() <= gate:
        wl = [(r["w"], int(r["freq"])) for r in words.collect()]
        out = _unigram_local(wl, lp, int(min_piece_freq), rounds)
        return (df.sparkSession.createDataFrame(
                    out or [], "p STRING, usage BIGINT")
                .orderBy(F.desc("usage"), F.asc("p")))
    subs = words.select("freq", F.explode(F.expr(
        f"flatten(transform(sequence(1, l), i -> "
        f"transform(sequence(1, least({lp}, l - i + 1)), "
        f"n -> substr(w, i, n))))")).alias("p"))
    pieces = (subs.groupBy("p").agg(F.sum("freq").alias("score"))
              .where((F.col("score") >= int(min_piece_freq))
                     | (F.length("p") == 1)))

    def _viterbi(piece_scores: DataFrame) -> DataFrame:
        """One hard-EM round: (piece, usage) under ``piece_scores``."""
        ps = F.broadcast(piece_scores.localCheckpoint(eager=True))
        dp = {0: words.select("w", "l", "freq",
                              F.lit(0).alias("np"),
                              F.lit(0).cast("long").alias("sf"),
                              F.lit("").alias("path"))}
        finals = []
        for j in range(1, lw + 1):
            cands = None
            for i in range(max(0, j - lp), j):
                c = (dp[i].where(F.col("l") >= j)
                     .join(ps, F.expr(f"substr(w, {i + 1}, {j - i})")
                           == F.col("p"))
                     .select("w", "l", "freq",
                             (F.col("np") + 1).alias("np"),
                             (F.col("sf") + F.col("score")).alias("sf"),
                             F.concat("path", F.lit(" "), "p")
                             .alias("path")))
                cands = c if cands is None else cands.unionAll(c)
            win = Window.partitionBy("w").orderBy(
                F.asc("np"), F.desc("sf"), F.asc("path"))
            dp[j] = (cands.withColumn("rn", F.row_number().over(win))
                     .where(F.col("rn") == 1)
                     .drop("rn").localCheckpoint(eager=True))
            finals.append(dp[j].where(F.col("l") == j))
        seg = finals[0]
        for f in finals[1:]:
            seg = seg.unionAll(f)
        return (seg.select("freq", F.explode(
                    F.split(F.expr("substr(path, 2)"), " ")).alias("p"))
                .groupBy("p").agg(F.sum("freq").alias("usage")))

    scores = pieces
    usage = None
    for _ in range(max(1, int(rounds))):
        usage = _viterbi(scores)
        # M-step: next round's scores are this round's usage counts
        # (single-char coverage pieces re-enter at score 0 if unused)
        scores = (pieces.select("p").join(usage, "p", "left")
                  .select("p", F.coalesce("usage", F.lit(0))
                          .alias("score")))
    return (usage.where(F.col("usage") > 0)
            .select("p", F.col("usage").cast("long").alias("usage"))
            .orderBy(F.desc("usage"), F.asc("p")))


def unigram_encode(df: DataFrame, vocab, text_col: str = "text",
                   out_col: str = "unigram_tokens",
                   max_piece_len: int = 4,
                   max_word_len: int = 12) -> DataFrame:
    """Tokenize ``text_col`` with a trained unigram vocabulary
    (DataFrame from :func:`unigram_vocab` or a ``{piece: score}``
    mapping). Adds ``out_col ARRAY<STRING>``. Arrow-batched pandas
    UDF with per-word memoization — the vocabulary broadcasts with
    the closure, the encode half is embarrassingly parallel (the same
    split as :func:`bpe_encode`).

    Per word (truncated to ``max_word_len`` like training): the SAME
    integer Viterbi objective the trainer used — fewest pieces, then
    highest score sum, then lexicographically smallest sequence —
    scored by the TRAINED usage counts. When those counts are a
    hard-EM fixed point (segmenting under them reproduces them —
    i.e. one more training round changes nothing), encoding the
    training corpus reproduces the trainer's usage counts exactly
    (pytest asserts the fixed point first, then the reproduction).
    Mid-EM vocabularies carry no such guarantee: the trainer's
    round-r segmentation used round-(r-1) scores, so score ties can
    resolve differently under the final counts. Out-of-vocabulary
    characters fall back to themselves as single-char pieces at score
    0 (coverage: every string encodes).
    """
    if isinstance(vocab, DataFrame):
        scores = {r["p"]: int(r["usage"]) for r in vocab.collect()}
    else:
        scores = {p: int(s) for p, s in dict(vocab).items()}
    lp, lw = int(max_piece_len), int(max_word_len)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def encode_word(word: str) -> list:
            w = word[:lw]
            hit = cache.get(w)
            if hit is not None:
                return hit
            best = {0: (0, 0, [])}
            for j in range(1, len(w) + 1):
                cands = []
                for i in range(max(0, j - lp), j):
                    if i not in best:
                        continue
                    p = w[i:j]
                    sc = scores.get(p)
                    if sc is None and len(p) == 1:
                        sc = 0          # single-char OOV coverage
                    if sc is None:
                        continue
                    np_, sf, path = best[i]
                    cands.append((np_ + 1, -(sf + sc), path + [p]))
                if cands:
                    # tie-break on the space-joined path STRING,
                    # exactly the trainer's (and oracle's) comparison
                    # (pieces are whitespace-free, so the join is
                    # lossless)
                    np_, nsf, path = min(
                        cands,
                        key=lambda c: (c[0], c[1], " ".join(c[2])))
                    best[j] = (np_, -nsf, path)
            out = best[len(w)][2]
            cache[w] = out
            return out

        return texts.map(lambda t: [p for w in (t or "").split()
                                    for p in encode_word(w)])

    return df.withColumn(out_col, enc(F.col(text_col)))


# --------------------------------------------------------- WordPiece

WP_CONT = "##"  # continuation-piece marker (Schuster & Nakajima 2012)


def _chars_wordpiece(word: Column) -> Column:
    """'low' → ['l', '##o', '##w'] — first char bare, continuations
    marked, no end-of-word symbol (WordPiece convention)."""
    return F.transform(
        F.filter(F.split(word, ""), lambda x: x != F.lit("")),
        lambda c, i: F.when(i == F.lit(0), c)
                      .otherwise(F.concat(F.lit(WP_CONT), c)))


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    num_merges: int = 50, min_freq: int = 2,
                    min_pair_freq: int = 2,
                    driver_gate: int | None = None) -> DataFrame:
    """WordPiece tokenizer training (Schuster & Nakajima, "Japanese
    and Korean Voice Search", ICASSP 2012 — the BERT trainer): like
    BPE, but each round merges the adjacent pair maximizing the
    LIKELIHOOD score ``freq(ab) / (freq(a)·freq(b))`` instead of the
    raw pair count, among pairs with ``freq(ab) >= min_pair_freq``
    (the frequency floor keeps hapax-pair scores of 1/1 from winning,
    as in the HuggingFace trainer). Returns ``(rank, left, right,
    merged, freq)`` ordered by rank — ``merged`` is the new symbol's
    spelling (the continuation marker of ``right`` is dropped:
    'a' + '##b' → 'ab').

    Determinism across engines: the score is ONE IEEE-double divide
    of exact integer counts (``pfreq / (lf·rf)`` with both factors
    cast to double first), which Spark and DuckDB compute
    bit-identically, and ties break on (left, right) — so the merge
    list is a pure function of the corpus and the full training loop
    hash-oracles like t11's BPE. Doubles, not BIGINT cross-products:
    at 100 TB a char symbol's count can reach ~1e13, so the
    three-way integer product would overflow int64, while the double
    product is deterministic (exact below 2^53, identically rounded
    above in both engines).

    100 TB shape (same as t11): training runs on the distinct-WORD
    frequency table; each round shuffles (symbol, partial-count) and
    (pair, partial-count) — both map-side combinable, reducer
    cardinality = live vocabulary — then one argmax `.first()` of a
    broadcast-size scored table. No Python in the loop.

    Known limitation (shared with the HuggingFace trainer): corpus
    words containing literal '#' can forge symbols in the '##'
    continuation namespace — a word starting "##" yields the bare
    merge '#'+'#' = '##', and a later merge can build '###', which
    conflates with the continuation piece of '#' in the symbol-count
    table. Spark, the DuckDB oracle, and the Python pytest reference
    all share the behavior (no oracle split), and BERT-style
    pipelines avoid it by vocabulary-level '#' handling upstream;
    pre-escape '#' in inputs if your corpus hits this.

    Like :func:`train_bpe`, the merge loop replays exactly on the
    driver at or below ``driver_gate`` distinct words (default
    ``DRIVER_VOCAB_GATE``); corpora above the gate take the
    distributed loop unchanged.
    """
    words = (word_frequencies(df, text_col, min_freq)
             .withColumn("syms", _chars_wordpiece(F.col("word")))
             .select("freq", "syms")
             .localCheckpoint(eager=True))
    gate = DRIVER_VOCAB_GATE if driver_gate is None else int(driver_gate)
    if words.count() <= gate:
        rows = [(int(r["freq"]), list(r["syms"])) for r in words.collect()]
        merges = _merges_local(rows, int(num_merges), int(min_pair_freq),
                               wordpiece=True)
        return df.sparkSession.createDataFrame(
            merges or [],
            "rank INT, left STRING, right STRING, merged STRING, "
            "freq BIGINT")
    merges = []
    for rank in range(int(num_merges)):
        symf = (words.select("freq", F.explode("syms").alias("s"))
                .groupBy("s").agg(F.sum("freq").alias("sfreq")))
        pairs = words.select(
            "freq",
            F.explode(F.transform(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                lambda s, i: F.struct(
                    s.alias("left"),
                    F.element_at(F.col("syms"),
                                 i + F.lit(2)).alias("right"))
            )).alias("p"))
        pf = (pairs.groupBy("p.left", "p.right")
              .agg(F.sum("freq").alias("pfreq"))
              .where(F.col("pfreq") >= int(min_pair_freq)))
        scored = (pf.join(symf.select(F.col("s").alias("left"),
                                      F.col("sfreq").alias("lf")),
                          "left")
                  .join(symf.select(F.col("s").alias("right"),
                                    F.col("sfreq").alias("rf")),
                        "right")
                  .withColumn("score",
                              F.col("pfreq").cast("double")
                              / (F.col("lf").cast("double")
                                 * F.col("rf").cast("double"))))
        best = (scored.orderBy(F.desc("score"), F.asc("left"),
                               F.asc("right")).first())
        if best is None:
            break
        merged = best["left"] + best["right"][len(WP_CONT):]
        merges.append((rank, best["left"], best["right"], merged,
                       int(best["pfreq"])))
        words = words.withColumn(
            "syms", _merge_pair(F.col("syms"), best["left"],
                                best["right"], merged)
        ).localCheckpoint(eager=True)
    return df.sparkSession.createDataFrame(
        merges or [],
        "rank INT, left STRING, right STRING, merged STRING, "
        "freq BIGINT")


def wordpiece_vocab(df: DataFrame, merges: DataFrame,
                    text_col: str = "text",
                    min_freq: int = 1) -> DataFrame:
    """``(symbol)``: the encode vocabulary = corpus alphabet (bare
    first chars + '##' continuations) ∪ every merge's ``merged``
    spelling — the HuggingFace WordPieceTrainer vocabulary shape
    (greedy longest-match encoding never replays merges, so
    intermediate spellings ARE the vocab)."""
    base = (word_frequencies(df, text_col, min_freq)
            .select(F.explode(
                _chars_wordpiece(F.col("word"))).alias("symbol"))
            .distinct())
    return (base.unionByName(
                merges.select(F.col("merged").alias("symbol")))
            .distinct())


def wordpiece_encode(df: DataFrame, vocab, text_col: str = "text",
                     out_col: str = "wp_tokens", unk: str = "[UNK]",
                     max_input_chars: int = 100) -> DataFrame:
    """Tokenize ``text_col`` with a WordPiece vocabulary (DataFrame
    from :func:`wordpiece_vocab` — first column read as the piece —
    or an iterable of piece strings). Adds ``out_col ARRAY<STRING>``.
    BERT's greedy longest-match-first per word: take the longest
    vocab prefix of the remaining word ('##'-prefixed after the first
    piece), advance; a word with no match at any position (or longer
    than ``max_input_chars``) encodes as ``[unk]``. Arrow-batched
    pandas UDF, per-word memoized, vocab broadcast in the closure."""
    if isinstance(vocab, DataFrame):
        first = vocab.columns[0]
        pieces = {r[first] for r in vocab.select(first).collect()}
    else:
        pieces = set(vocab)
    mic = int(max_input_chars)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def encode_word(w: str) -> list:
            hit = cache.get(w)
            if hit is not None:
                return hit
            if len(w) > mic:
                out = [unk]
            else:
                out, start = [], 0
                while start < len(w):
                    end, cur = len(w), None
                    while start < end:
                        sub = w[start:end]
                        if start > 0:
                            sub = WP_CONT + sub
                        if sub in pieces:
                            cur = sub
                            break
                        end -= 1
                    if cur is None:
                        out = [unk]
                        break
                    out.append(cur)
                    start = end
            cache[w] = out
            return out

        return texts.map(lambda t: [p for w in (t or "").split()
                                    for p in encode_word(w)])

    return df.withColumn(out_col, enc(F.col(text_col)))


def vocab_coverage(docs: DataFrame, vocab: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   piece_col: str = "p") -> DataFrame:
    """``(doc_id, n_tokens, n_oov, oov_rate)``: per-document
    vocabulary-coverage audit — the evaluation step run after training
    any of the t11/t18/t19 tokenizers (or against any word list):
    what fraction of the corpus's whitespace-token OCCURRENCES falls
    outside ``vocab``? High OOV on a slice is the standard signal
    that the vocabulary was trained on the wrong distribution before
    an expensive encode pass bakes it in.

    ``vocab`` is any DataFrame with a ``piece_col`` string column
    (t18's pieces, a frequency cut, a language lexicon). Tokens are
    the package-standard lowercased whitespace tokens, and the vocab
    side is LOWERCASED to match — an uncased lexicon ('The', 'Paris')
    must not read as 100% OOV. Output is unordered (sort at the
    consumer); rows for NULL-text documents are absent.

    100 TB shape: the vocabulary is a MODEL — deduplicated and
    BROADCAST (never shuffle the exploded corpus by token: the §17
    broadcast-the-model rule); the corpus pays ONE explode scan and
    one map-side-combinable per-document aggregation. ``oov_rate``
    rounds to 6 so the double is oracle-stable.
    """
    from rust_graph_db_spark.functions.text import tokens

    v = (vocab.select(F.lower(F.col(piece_col).cast("string"))
                      .alias("_piece"))
         .where(F.col("_piece").isNotNull()).distinct())
    occ = (docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("_w"))
           .where(F.col("_w") != ""))
    hit = occ.join(F.broadcast(v), occ["_w"] == v["_piece"], "left")
    return (hit.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum(F.col("_piece").isNull().cast("long"))
                 .cast("long").alias("n_oov"))
            .select(id_col, "n_tokens", "n_oov",
                    F.round(F.col("n_oov")
                            / F.col("n_tokens").cast("double"), 6)
                    .alias("oov_rate")))
