"""operators/lm.py: stupid-backoff LM, perplexity, n-gram language ID.

Strategy mirrors the other pipeline-op suites: every distributed
result is checked against a pure-Python reference implementation on a
small hand-made corpus, plus behavioural checks (filter keeps the low
tail, language ID discriminates genuinely distinct languages, curate()
stages compose).
"""

import math

import pytest
from pyspark.sql import functions as F

from rust_graph_db_spark.operators.lm import (
    BACKOFF_ALPHA,
    BackoffLM,
    language_id,
    language_profiles,
    perplexity,
    perplexity_filter,
    train_backoff_lm,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
]


def _py_counts(texts):
    uni, big = {}, {}
    for t in texts:
        toks = t.lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, sum(uni.values())


def _py_ppl(text, uni, big, n, a=BACKOFF_ALPHA):
    toks = text.lower().split()
    lp = 0.0
    for i, w in enumerate(toks):
        s_uni = uni.get(w, None)
        s_uni = s_uni / n if s_uni is not None else a / n
        if i == 0:
            s = s_uni
        elif (toks[i - 1], w) in big:
            s = big[(toks[i - 1], w)] / uni[toks[i - 1]]
        else:
            s = a * s_uni
        lp += math.log(s)
    return math.exp(-lp / len(toks))


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")


def test_train_backoff_lm_counts(spark, corpus_df):
    lm = train_backoff_lm(corpus_df)
    uni, big, n = _py_counts([t for _, t in CORPUS])
    assert lm.total == n
    got_uni = {r.w: r.c for r in lm.unigrams.collect()}
    assert got_uni == uni
    got_big = {(r.w1, r.w2): r.c for r in lm.bigrams.collect()}
    assert got_big == big


def test_perplexity_matches_reference(spark, corpus_df):
    lm = train_backoff_lm(corpus_df)
    uni, big, n = _py_counts([t for _, t in CORPUS])
    # score the training docs plus one with OOV words and unseen bigrams
    score_rows = CORPUS + [(9, "the cat sat on a zebra")]
    docs = spark.createDataFrame(score_rows, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_tokens, r.ppl)
           for r in perplexity(docs, lm).collect()}
    for did, text in score_rows:
        want = _py_ppl(text, uni, big, n)
        assert got[did][0] == len(text.split())
        assert abs(got[did][1] - round(want, 3)) <= 1e-3, \
            (did, got[did], want)
    # in-distribution text scores lower than the OOV one
    assert got[0][1] < got[9][1]


def test_perplexity_filter_keeps_low_tail(spark, corpus_df):
    lm = train_backoff_lm(corpus_df)
    docs = spark.createDataFrame(
        CORPUS + [(9, "zebra quux flarp glorp blitz")],
        "doc_id LONG, text STRING")
    pp = {r.doc_id: r.ppl for r in perplexity(docs, lm).collect()}
    cut = (max(pp[i] for i, _ in CORPUS) + pp[9]) / 2
    kept = sorted(r.doc_id
                  for r in perplexity_filter(docs, lm, cut).collect())
    assert kept == [0, 1, 2]
    # filter preserves the input schema
    assert perplexity_filter(docs, lm, cut).columns == docs.columns


def test_empty_lm_raises(spark):
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    lm = train_backoff_lm(empty)
    assert lm.total == 0
    with pytest.raises(ValueError, match="empty language model"):
        perplexity(empty, lm)


MULTI = [
    # "english": th/he/in-heavy; "xx": completely disjoint alphabet use
    (0, "en", "the thin hen went in then the thing"),
    (1, "en", "when the hen went in the shed then"),
    (2, "xx", "zzq zzq vvk vvk zzq wwp vvk zzq wwp"),
    (3, "xx", "vvk zzq wwp wwp zzq vvk zzq zzq"),
]


def test_language_id_discriminates(spark):
    docs = spark.createDataFrame(MULTI, "doc_id LONG, lang STRING, "
                                        "text STRING")
    prof = language_profiles(docs, top=50)
    langs = {r.lang for r in prof.collect()}
    assert langs == {"en", "xx"}
    test_docs = spark.createDataFrame(
        [(10, "then the hen went in"), (11, "zzq vvk wwp zzq"),
         (12, "")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: (r.lang, r.overlap)
           for r in language_id(test_docs, prof).collect()}
    assert got[10][0] == "en" and got[10][1] > 0
    assert got[11][0] == "xx" and got[11][1] > 0
    # no-evidence doc: NULL lang, overlap 0
    assert got[12] == (None, 0)


def test_language_profiles_deterministic_ties(spark):
    docs = spark.createDataFrame(MULTI, "doc_id LONG, lang STRING, "
                                        "text STRING")
    a = sorted(map(tuple, language_profiles(docs, top=10).collect()))
    b = sorted(map(tuple, language_profiles(docs, top=10).collect()))
    assert a == b and len(a) == 20      # 10 per language


def test_curate_with_lm_and_language_stages(spark):
    from rust_graph_db_spark.operators.curation import curate

    rows = [
        (0, "the thin hen went in then the thing going fine today ok"),
        (1, "when the hen went in the shed then the thing was fine"),
        (2, "zzq zzq vvk vvk zzq wwp vvk zzq wwp zzq vvk wwp zzq"),
        (3, "glorp blitz quux flarp zebra nine ten eleven twelve go"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    seed = spark.createDataFrame(MULTI, "doc_id LONG, lang STRING, "
                                        "text STRING")
    lm = train_backoff_lm(seed.where(F.col("lang") == "en"))
    prof = language_profiles(seed, top=50)
    pp = {r.doc_id: r.ppl for r in perplexity(docs, lm).collect()}
    cut = (pp[1] + min(pp[2], pp[3])) / 2     # en docs below, rest above
    # no thresholds pressure from the rule chain (permissive), so the
    # survivors are exactly the LM ∩ language keeps
    out = curate(docs, thresholds={"min_chars": 1, "max_chars": 10_000,
                                   "min_tokens": 1},
                 lm=lm, max_ppl=cut,
                 languages=["en"], language_profiles_df=prof)
    assert sorted(r.doc_id for r in out.collect()) == [0, 1]
    # languages without profiles frame is a usage error
    with pytest.raises(ValueError, match="language_profiles_df"):
        curate(docs, languages=["en"])
    # half-specified LM stage is a usage error, not a silent no-op
    with pytest.raises(ValueError, match="lm and max_ppl"):
        curate(docs, lm=lm)
    with pytest.raises(ValueError, match="lm and max_ppl"):
        curate(docs, max_ppl=100.0)
    # a bare-string language must mean the code, not its characters —
    # list("en") would match the langs 'e'/'n' (none) and keep nothing
    out2 = curate(docs, thresholds={"min_chars": 1, "max_chars": 10_000,
                                    "min_tokens": 1},
                  languages="en", language_profiles_df=prof)
    assert sorted(r.doc_id for r in out2.collect()) == [0, 1]


def test_stream_curate_with_lm_stage(spark, tmp_path):
    """r4: stream_curate(lm=, max_ppl=) drops high-perplexity docs at
    the head of each micro-batch (stream-static joins against the
    offline-trained count tables), before filter/redact/dedup."""
    import glob
    import os
    import shutil

    from rust_graph_db_spark.streaming import stream_curate

    base = ("the quick brown fox jumped over a lazy dog while it was "
            "raining and the farmer watched from his porch in quiet "
            "wonder as evening settled softly across that wide valley "
            "of golden wheat beneath slowly darkening autumn skies")
    gibberish = ("zzq vvk wwp flarp glorp blitz quux snerd plonk wibble "
                 "frobnicate zork grue xyzzy plugh thud quux zzq vvk "
                 "wwp flarp glorp blitz snerd plonk wibble frobnicate "
                 "zork grue xyzzy plugh noise chatter static fuzz hum")
    lm = train_backoff_lm(
        spark.createDataFrame([(0, base)], "doc_id LONG, text STRING"))
    pp = {r.doc_id: r.ppl for r in perplexity(
        spark.createDataFrame([(1, base), (2, gibberish)],
                              "doc_id LONG, text STRING"), lm).collect()}
    cut = (pp[1] + pp[2]) / 2
    assert pp[1] < cut < pp[2]

    watch = tmp_path / "in"
    watch.mkdir()
    rows = [(1, base), (2, gibberish)]
    part = str(tmp_path / "b0")
    spark.createDataFrame(rows, "doc_id LONG, text STRING") \
         .coalesce(1).write.parquet(part)
    dst = str(watch / "batch0.parquet")
    shutil.copy(glob.glob(f"{part}/part-*.parquet")[0], dst)
    os.utime(dst, (1_600_000_000,) * 2)

    stream = (spark.readStream
              .schema("doc_id LONG, text STRING")
              .parquet(str(watch)))
    stream_curate(
        stream, str(tmp_path / "out"), str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        lm=lm, max_ppl=cut).awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r.doc_id for r in out] == [1]


# ------------------------------------------- Kneser-Ney (interpolated)

def _py_kn_model(texts):
    big = {}
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    ctx, cont = {}, {}
    for (a, b), c in big.items():
        cp, nf = ctx.get(a, (0, 0))
        ctx[a] = (cp + c, nf + 1)
        cont[b] = cont.get(b, 0) + 1
    types = len(big)
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    disc = 0.5 if n1 + 2 * n2 == 0 else n1 / (n1 + 2 * n2)
    return big, ctx, cont, types, disc


def _py_kn_ppl(text, big, ctx, cont, types, disc, floor=0.4):
    toks = text.lower().split()
    lp = 0.0
    for i, w in enumerate(toks):
        nb = cont.get(w)
        s_cont = nb / types if nb is not None else floor / types
        prev = toks[i - 1] if i > 0 else None
        if prev is None or prev not in ctx:
            p = s_cont
        else:
            cp, nf = ctx[prev]
            cb = big.get((prev, w), 0)
            p = max(cb - disc, 0.0) / cp + ((disc * nf) / cp) * s_cont
        lp += math.log(p)
    return math.exp(-lp / len(toks))


def test_train_kn_lm_counts(spark, corpus_df):
    from rust_graph_db_spark.operators.lm import train_kn_lm

    big, ctx, cont, types, disc = _py_kn_model([t for _, t in CORPUS])
    lm = train_kn_lm(corpus_df)
    assert lm.types == types
    assert abs(lm.discount - disc) == 0.0  # same exact int division
    got_ctx = {r.w1: (r.cp, r.nf) for r in lm.contexts.collect()}
    assert got_ctx == ctx
    got_cont = {r.w2: r.nb for r in lm.continuations.collect()}
    assert got_cont == cont


def test_kn_perplexity_matches_reference(spark, corpus_df):
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  train_kn_lm)

    lm = train_kn_lm(corpus_df)
    big, ctx, cont, types, disc = _py_kn_model([t for _, t in CORPUS])
    # training docs + OOV words, unseen bigrams, unseen context
    score_rows = CORPUS + [(9, "the cat sat on a zebra"),
                           (10, "zebra fish mat")]
    docs = spark.createDataFrame(score_rows, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_tokens, r.ppl)
           for r in kn_perplexity(docs, lm).collect()}
    for did, text in score_rows:
        want = _py_kn_ppl(text, big, ctx, cont, types, disc)
        assert got[did][0] == len(text.split())
        assert abs(got[did][1] - round(want, 3)) <= 1e-3, \
            (did, got[did], want)
    assert got[0][1] < got[9][1]


def test_kn_probabilities_sum_to_one(spark, corpus_df):
    """Interpolated KN is a proper distribution: for a SEEN context,
    sum of P(w | prev) over the seen-continuation vocabulary plus the
    mass the model gives every other word's s_cont must be ~1. We
    check the discount mass bookkeeping: sum over seen continuations
    of max(c-D,0)/cp equals 1 - D*nf/cp."""
    from rust_graph_db_spark.operators.lm import train_kn_lm

    lm = train_kn_lm(corpus_df)
    big, ctx, cont, types, disc = _py_kn_model([t for _, t in CORPUS])
    for prev, (cp, nf) in ctx.items():
        seen = sum(max(c - disc, 0.0) / cp
                   for (a, _), c in big.items() if a == prev)
        assert abs(seen + (disc * nf) / cp * 1.0 - 1.0) < 1e-12
        # 1.0 stands in for sum of P_cont over the full vocab, which
        # is exactly 1 when every word was seen as a continuation
    assert lm.discount == disc


def test_kn_filter_and_empty(spark, corpus_df):
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  kn_perplexity_filter,
                                                  train_kn_lm)

    lm = train_kn_lm(corpus_df)
    docs = spark.createDataFrame(
        CORPUS + [(9, "zebra quux flarp glorp blitz")],
        "doc_id LONG, text STRING")
    pp = {r.doc_id: r.ppl for r in kn_perplexity(docs, lm).collect()}
    cut = (max(pp[i] for i, _ in CORPUS) + pp[9]) / 2
    kept = sorted(r.doc_id
                  for r in kn_perplexity_filter(docs, lm, cut).collect())
    assert kept == [0, 1, 2]
    assert kn_perplexity_filter(docs, lm, cut).columns == docs.columns

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    klm = train_kn_lm(empty)
    assert klm.types == 0
    with pytest.raises(ValueError, match="empty language model"):
        kn_perplexity(empty, klm)


def test_curate_accepts_kn_lm(spark, corpus_df):
    """curate(lm=...) dispatches on the model family: a KneserNeyLM
    drives kn_perplexity_filter, dropping the same high-ppl tail."""
    from rust_graph_db_spark.operators.curation import curate
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  train_kn_lm)

    lm = train_kn_lm(corpus_df)
    noise = "zzzq wwrx qqvy zzzq wwrx qqvy zzzq wwrx qqvy pplk"
    docs = spark.createDataFrame(
        [(i, t * 3) for i, t in CORPUS] + [(9, noise * 3)],
        "doc_id LONG, text STRING")
    pp = {r.doc_id: r.ppl for r in kn_perplexity(docs, lm).collect()}
    cut = (max(pp[i] for i, _ in CORPUS) + pp[9]) / 2
    # neutralize the quality rule-chain: this test isolates the LM stage
    out = curate(docs, lm=lm, max_ppl=cut,
                 thresholds={"min_tokens": 1, "max_tokens": 10**6,
                             "min_stopword": 0.0, "max_punct": 1.0,
                             "max_dup2": 1.0, "min_word_len": 0.0,
                             "max_word_len": 100.0})
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]


def _py_ntile(cnt, n):
    """NTILE(n) bucket per 1-based rank: first cnt%n buckets hold
    cnt//n + 1 rows, the rest cnt//n."""
    q, r = divmod(cnt, n)
    out = []
    for b in range(1, n + 1):
        out.extend([b] * (q + 1 if b <= r else q))
    return out  # out[rank-1] = bucket


def test_ccnet_ppl_buckets(spark, corpus_df):
    from rust_graph_db_spark.operators.curation import ccnet_ppl_buckets
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  train_kn_lm)

    lm = train_kn_lm(corpus_df)
    # 7 'en' docs (q=2, r=1: exercises both the q+1 and q branches)
    # and 2 'xx' docs (cnt < n_buckets: the q=0 branch -> buckets 1,2)
    texts = [t for _, t in CORPUS] + ["the cat sat on a zebra",
                                      "zebra fish mat", "cat hat mat",
                                      "the dog sat", "fish ate the log",
                                      "dog on a mat"]
    assert len(texts) == 9
    rows = [(i, t, "en" if i < 7 else "xx")
            for i, t in enumerate(texts)]
    # a NULL-lang doc is its own partition (NTILE PARTITION BY keeps
    # the NULL group) — it must never be silently dropped
    rows.append((9, "the cat ate the mat", None))
    docs = spark.createDataFrame(rows,
                                 "doc_id LONG, text STRING, lang STRING")
    got = {r.doc_id: (r.lang, r.ppl, r.bucket, r.kept)
           for r in ccnet_ppl_buckets(docs, lm).collect()}
    ppl = {r.doc_id: r.ppl for r in kn_perplexity(docs, lm).collect()}
    assert set(got) == set(ppl)
    for lang in ("en", "xx"):
        ids = sorted((d for d, (lg, *_) in got.items() if lg == lang),
                     key=lambda d: (ppl[d], d))
        want = _py_ntile(len(ids), 3)
        for rank, d in enumerate(ids, start=1):
            assert got[d][2] == want[rank - 1], (lang, d, got[d])
            assert got[d][3] == (want[rank - 1] <= 2)
    # the 2-doc language never reaches bucket 3
    assert {got[d][2] for d in (7, 8)} == {1, 2}
    # the NULL-lang singleton survives as bucket 1 of its own group
    assert got[9][0] is None and got[9][2] == 1 and got[9][3]


def test_perplexity_null_text_docs_absent(spark):
    """NULL text must yield ZERO token rows (the oracle's unnest-of-
    NULL behavior), never the three phantom sequence(1, -1) tokens."""
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  perplexity,
                                                  train_backoff_lm,
                                                  train_kn_lm)

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(4)],
        "doc_id LONG, text STRING")
    score = spark.createDataFrame(
        [(1, "the cat sat"), (2, None), (3, "the mat")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r.n_tokens for r in perplexity(
        score, train_backoff_lm(train)).collect()}
    assert got == {1: 3, 3: 2}
    got_kn = {r.doc_id: r.n_tokens for r in kn_perplexity(
        score, train_kn_lm(train)).collect()}
    assert got_kn == {1: 3, 3: 2}


def test_kn_perplexity_broadcast_needs_result_size(spark):
    """The broadcast path fails FAST with the config fix when the
    model would exceed spark.driver.maxResultSize."""
    import pytest as _pytest

    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  train_kn_lm)

    import dataclasses

    train = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id LONG, text STRING")
    lm = dataclasses.replace(train_kn_lm(train),
                             types=10**9)  # pretend a 24 GB model
    with _pytest.raises(ValueError, match="maxResultSize"):
        kn_perplexity(spark.createDataFrame([(1, "a b")],
                                            "doc_id LONG, text STRING"),
                      lm, broadcast_max_types=10**10)
