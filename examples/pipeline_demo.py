"""Training-data pipeline tour — beyond the reference (which has no
corpus tooling): quality filter -> PII redaction -> exact + near dedup
-> decontamination -> deterministic split -> sequence packing, plus
ANN over embeddings. Every operator here has a DuckDB-oracled driver
query in __spark_entry__.py; this demo just chains them."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main(spark=None):
    import rust_graph_db_spark as rg
    from rust_graph_db_spark.operators.curation import (curate,
                                                        decontaminate,
                                                        ngram_stream,
                                                        top_ngrams)
    from rust_graph_db_spark.operators.dedup import (drop_near_dups,
                                                     minhash_lsh_pairs)
    from rust_graph_db_spark.operators.packing import pack_sequences
    from rust_graph_db_spark.operators.similarity import cosine_topk
    from rust_graph_db_spark.operators.sketches import (cms_estimate,
                                                        cms_table)

    spark = spark or rg.get_spark("pipeline_demo")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # composed curation: filter -> redact -> exact-dedup -> split
    curated = curate(docs, "doc_id", "text")
    curated.groupBy("split").count().show()

    # near-dedup: MinHash-LSH pairs -> keep one representative per cluster
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    kept = drop_near_dups(docs, pairs)
    print("corpus", docs.count(), "-> near-deduped", kept.count())

    # decontamination against a (here: sampled) benchmark set
    bench = docs.where("doc_id % 97 = 0")
    flagged = decontaminate(docs, bench, k=8)
    print("decontamination hits:", flagged.count())

    # vocabulary inspection: exact top grams, and the bounded-state
    # count-min sketch estimating the same heavy hitters
    heavy = top_ngrams(docs, "text", top=5)
    heavy.show()
    sketch = cms_table(ngram_stream(docs, "text", 2), "gram")
    cms_estimate(sketch, heavy.select("gram"), "gram").show()

    # sequence packing for training batches
    packed = pack_sequences(docs, "doc_id", "text", budget=512)
    packed.groupBy("bin_id").count().orderBy("bin_id").show(5)

    # ANN: top-10 cosine neighbors of the first embedding
    q = emb.first().embedding
    cosine_topk(emb, q, k=10).show()

    # semantic dedup (SemDeDup): near-dup pairs found only WITHIN
    # k-means clusters — the published embedding-dedup scale path
    from rust_graph_db_spark.operators.similarity import semdedup
    sem = semdedup(emb, threshold=0.45, k=4, iters=1)
    print("semantic near-dup pairs:", sem.count())

    # BPE tokenizer training + encoding (Sennrich 2016)
    from rust_graph_db_spark.operators.bpe import bpe_encode, train_bpe
    merges = train_bpe(docs, num_merges=8, min_freq=2)
    merges.show(8)
    bpe_encode(docs.limit(3), merges).select("doc_id", "bpe_tokens").show(
        3, truncate=60)

    # trainable quality classifier: corpus vs corrupted copy
    from pyspark.sql import functions as F
    from rust_graph_db_spark.operators.classifier import (
        hash_ngram_features, score_documents, train_logistic,
    )
    bad = docs.select(
        (F.col("doc_id") + 10**6).alias("doc_id"),
        F.concat_ws(" ", F.lit("click free buy now"),
                    F.substring("text", 1, 60)).alias("text"))
    labeled = (docs.select("doc_id", "text").withColumn("y", F.lit(1))
               .unionByName(bad.withColumn("y", F.lit(0))))
    w, b, hist = train_logistic(
        hash_ngram_features(labeled, dim=1 << 14), "y",
        dim=1 << 14, iterations=6, lr=40.0)
    print("classifier logloss:", [round(h, 3) for h in hist])
    score_documents(labeled.limit(3), w, b, dim=1 << 14) \
        .select("doc_id", "y", "quality_prob").show()

    # LM perplexity filtering (CCNet recipe, r4): train stupid-backoff
    # on a trusted slice, score everything, keep the low tail
    from rust_graph_db_spark.operators.lm import (
        language_id, language_profiles, perplexity, train_backoff_lm,
    )
    lm = train_backoff_lm(docs.where(F.col("source") == "src0"))
    perplexity(docs, lm).orderBy("ppl").show(5)

    # n-gram-profile language ID (Cavnar-Trenkle, r4)
    prof = language_profiles(docs.where(F.col("doc_id") % 2 == 0))
    language_id(docs.where(F.col("doc_id") % 2 == 1), prof).show(5)

    # DSIR importance resampling (Xie et al. 2023, r4): select the
    # documents whose hashed-ngram profile matches the target slice
    from rust_graph_db_spark.operators.dsir import dsir_resample
    target = docs.where(F.col("source") == "src0")
    dsir_resample(docs, target, k=10, buckets=4096, seed=7).show(10)

    # Kneser-Ney perplexity (r5): CCNet's actual LM family — same
    # pipeline seat as stupid backoff, drop-in via curate(lm=...)
    from rust_graph_db_spark.operators.lm import (kn_perplexity,
                                                  train_kn_lm)
    klm = train_kn_lm(docs.where(F.col("source") == "src0"))
    kn_perplexity(docs, klm).orderBy("ppl").show(5)

    # winnowing fingerprints (MOSS, r5): position-carrying local
    # sketches; shared fingerprints localize matching passages
    from rust_graph_db_spark.operators.dedup import winnow_candidate_pairs
    winnow_candidate_pairs(docs, k=3, window=4, min_shared=3,
                           max_df=50).show(5)

    # cross-corpus near-dup decontamination (r5): fuzzy eval-set
    # overlap the verbatim decontaminate() above can't see
    from rust_graph_db_spark.operators.curation import \
        decontaminate_neardup
    ev = bench.select("doc_id",
                      F.concat("text", F.lit(" suffix")).alias("text"))
    print("near-dup contamination pairs:",
          decontaminate_neardup(docs, ev, threshold=0.5).count())

    # C4 line-level cleaning (r5) over derived multi-line pages
    from rust_graph_db_spark.operators.curation import c4_line_filter
    pages = docs.select("doc_id", F.regexp_replace(
        F.col("text"), r"((?:\S+ ){7}\S+) ", "$1.\n").alias("text"))
    c4_line_filter(pages, min_sentences=3).show(3)

    # data-mixture planning table (r5): the Pile/LLaMA recipe artifact
    from rust_graph_db_spark.operators.sampling import mixture_plan
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    mixture_plan(docs, {s: 1 + int(s[3:]) % 5 for s in srcs},
                 token_budget=50_000).orderBy("source").show()

    # fuzzy edit-distance join (r5): order-edit near-dups the shingle
    # families are blind to
    from rust_graph_db_spark.operators.dedup import edit_distance_pairs
    print("edit-distance pairs (d<=20):",
          edit_distance_pairs(docs, max_dist=20, q=3).count())

    # Bloom-filter decontamination (r5): d6's broadcastable scale path
    from rust_graph_db_spark.operators.curation import decontaminate_bloom
    decontaminate_bloom(docs, bench).where("flagged").show(3)

    # TextRank corpus keywords (r5): co-occurrence graph + pagerank
    from rust_graph_db_spark.operators.ranking import textrank_keywords
    textrank_keywords(docs).orderBy(F.desc("rank")).show(5)

    # JL random projection (r5): 64->16 dims before the ANN stages
    from rust_graph_db_spark.operators.similarity import random_projection
    print("projected vectors:", random_projection(emb).count())

    # window-hash-blocked fuzzy join (r6): d17's scale-safe form for
    # low-entropy key spaces — same verify, token-window candidates
    from rust_graph_db_spark.operators.dedup import \
        blocked_edit_distance_pairs
    print("blocked edit-distance pairs (d<=8):",
          blocked_edit_distance_pairs(docs, max_dist=8, k=3).count())

    # unigram tokenizer training (r6): SentencePiece-style hard-EM
    from rust_graph_db_spark.operators.bpe import unigram_vocab
    unigram_vocab(docs).show(5)

    # WordPiece training + greedy longest-match encode (r6): the BERT
    # trainer — likelihood-scored merges, not raw pair counts
    from rust_graph_db_spark.operators.bpe import (train_wordpiece,
                                                   wordpiece_encode,
                                                   wordpiece_vocab)
    wp = train_wordpiece(docs, num_merges=8, min_freq=1)
    wp.show(4)
    wordpiece_encode(docs, wordpiece_vocab(docs, wp)).show(2)

    # CCNet perplexity buckets (r6): per-language head/middle/tail
    # over the KN perplexity — the LLaMA corpus-quality stage
    from rust_graph_db_spark.operators.curation import ccnet_ppl_buckets
    from rust_graph_db_spark.operators.lm import train_kn_lm
    klm = train_kn_lm(docs)
    ccnet_ppl_buckets(docs.withColumn("lang", F.lit("en")), klm).show(3)

    # full Gopher repetition battery (r6): one scan, zero shuffles
    from rust_graph_db_spark.operators.curation import gopher_repetition
    gopher_repetition(docs).select(
        "doc_id", "dup_line_frac", "top2_char_frac",
        "dup5_char_frac").show(3)

    # dedup keep-selection (r6): pairs -> clusters -> keep-longest
    from rust_graph_db_spark.operators.dedup import (
        keep_best_per_cluster, minhash_lsh_pairs)
    kb = keep_best_per_cluster(
        docs, minhash_lsh_pairs(docs, "doc_id", "text"))
    print("keep-selection keeps",
          kb.where("kept").count(), "of", kb.count())

    # crawl stage zero (r7): raw HTML in, curated text out — the
    # extraction rule tables drive both engines (t21), and the d19
    # keep policy now runs INSIDE curate()
    from rust_graph_db_spark.operators.curation import curate
    from rust_graph_db_spark.operators.html import html_extract
    pages = docs.select("doc_id", F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> | '
              '<a href="/a">About</a></nav><p>'),
        F.col("text"),
        F.lit('</p><footer>&copy; 2026 All rights reserved.'
              '</footer></body></html>')).alias("html"))
    html_extract(pages, "html").select(
        "doc_id", "n_kept", "n_dropped").show(3)
    curated = curate(pages, html_col="html", neardup_keep="best",
                     thresholds={"min_tokens": 1, "max_tokens": 10**9,
                                 "min_stopword": 0.0, "max_punct": 1.0,
                                 "max_dup2": 1.0, "min_word_len": 0.0,
                                 "max_word_len": 100.0})
    print("curate from HTML with keep-best:", curated.count(), "docs")

    # r7 session 2: chunk for RAG, select under a token budget,
    # sketch the distinct count, roll up the lattice
    from rust_graph_db_spark.operators.packing import (budget_select,
                                                       chunk_overlap)
    from rust_graph_db_spark.operators.sketches import (kmv_estimate,
                                                        kmv_table,
                                                        rollup_stats)
    chunks = chunk_overlap(docs, size=32, stride=16)
    print("chunks (32/16):", chunks.count())
    picked = budget_select(docs, budget=10_000)
    print("budget_select 10k tokens:", picked.count(), "docs")
    kmv_estimate(kmv_table(docs, "text", k=256)).show()
    rollup_stats(docs, ["lang"], "n_chars").show(6)

    # r7 session 3: the full CUBE lattice, corpus-derived outlier
    # band, exact quantiles, and per-group top-k
    from rust_graph_db_spark.operators.curation import outlier_clip
    from rust_graph_db_spark.operators.sketches import (cube_stats,
                                                        exact_quantiles,
                                                        topk_per_group)
    cube_stats(docs, ["lang"], "n_chars").show(6)
    exact_quantiles(docs, "n_chars", [0.05, 0.5, 0.95]).show()
    clipped = outlier_clip(docs, lo=0.05, hi=0.95)
    print("outlier_clip keeps:", clipped.where("kept").count(), "docs")
    topk_per_group(docs.select("lang", "doc_id", "n_chars"),
                   ["lang"], "n_chars", 2, tiebreak="doc_id").show(6)

    # per-language exact quantiles + per-language token budgets (the
    # mixture-assembly pair), then MMR-diversified retrieval
    from rust_graph_db_spark.operators.packing import \
        budget_select_by_group
    from rust_graph_db_spark.operators.similarity import mmr_topk
    from rust_graph_db_spark.operators.sketches import grouped_quantiles
    grouped_quantiles(docs, "lang", "n_chars", [0.1, 0.5, 0.9]).show(6)
    mix = budget_select_by_group(docs, "lang", budget=2000,
                                 budgets={"en": 4000})
    print("per-lang budget mix:", mix.count(), "docs")
    from pyspark.sql import functions as F2
    qv = emb.where(F2.col("vec_id") == 0).first()["embedding"]
    mmr_topk(emb, qv, k=3, lam=0.5, exclude_id=0).show()

    # measure, then salt: the skew preflight
    from rust_graph_db_spark.operators.skew import key_skew_profile
    key_skew_profile(docs, "lang").show()
    return kept


if __name__ == "__main__":
    main()
