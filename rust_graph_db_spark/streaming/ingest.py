"""Structured Streaming extension: streaming graph upserts + windowed
event analytics.

The reference has NO streaming (SURVEY.md §2.11 — exhaustive read of
src/ finds no watermarks/windows/state); this module is the declared
extension: vertex/edge mutation streams become ``readStream →
foreachBatch`` micro-batch merges into the PropertyGraph, and event
streams get watermarked windowed aggregation. At scale the foreachBatch
body is a Delta MERGE; here it reuses the same copy-on-write dataflow as
dml.py, so batch and streaming share one mutation path.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_graph_db_spark.model import PropertyGraph


def stream_vertex_upserts(
    g: PropertyGraph, label: str, stream: DataFrame,
    id_col: str = "id",
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
    commit_root: Optional[str] = None,
    commit_buckets: Optional[int] = None,
):
    """Apply a stream of vertex rows as per-micro-batch upserts.

    Each batch: delete-then-union keyed on ``id`` (the MERGE
    WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT dataflow). Returns the
    StreamingQuery; with trigger_available_now the call drains the
    source and stops (use for tests/backfills).

    ``commit_root`` makes ingestion DURABLE: every micro-batch ends in
    one atomic ``storage.save_graph`` commit, so readers only ever see
    whole batches. Combined with the streaming ``checkpoint`` this is
    the standard exactly-once-effect recipe: on restart the source
    replays from the last checkpointed offset and the id-keyed MERGE
    re-applies idempotently. ``commit_buckets=N`` commits with the
    co-located bucketed layout (storage.save_graph) so analytical
    readers get the shuffle-free expand join off every published
    micro-batch snapshot.
    """
    g.label_id(label)

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.dropDuplicates([id_col]).localCheckpoint(eager=True)
        if label in g._vertices:
            keep = g._vertices[label].join(
                batch.select(F.col(id_col).alias("id")), "id", "left_anti")
            g._vertices[label] = keep.unionByName(
                batch.withColumnRenamed(id_col, "id"),
                allowMissingColumns=True).localCheckpoint(eager=True)
        else:
            g._vertices[label] = batch.withColumnRenamed(id_col, "id") \
                                      .localCheckpoint(eager=True)
        if commit_root is not None:
            from rust_graph_db_spark.storage import save_graph

            save_graph(g, commit_root, buckets=commit_buckets)

    writer = stream.writeStream.foreachBatch(upsert).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_edge_upserts(
    g: PropertyGraph, label: str, stream: DataFrame,
    id_col: str = "id",
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
    commit_root: Optional[str] = None,
    commit_buckets: Optional[int] = None,
):
    """Edge-stream variant of stream_vertex_upserts (same MERGE shape,
    keyed on edge id; src/dst must be packed graph ids; same
    ``commit_root`` per-batch durability)."""
    g.label_id(label)

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.dropDuplicates([id_col]).localCheckpoint(eager=True)
        b = batch.withColumnRenamed(id_col, "id")
        if label in g._edges:
            keep = g._edges[label].join(b.select("id"), "id", "left_anti")
            g.set_edges(label, keep.unionByName(
                b, allowMissingColumns=True).localCheckpoint(eager=True))
        else:
            g.set_edges(label, b.localCheckpoint(eager=True))
        if commit_root is not None:
            from rust_graph_db_spark.storage import save_graph

            save_graph(g, commit_root, buckets=commit_buckets)

    writer = stream.writeStream.foreachBatch(upsert).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _state_hits(state: DataFrame, probe: DataFrame, key: str) -> DataFrame:
    """The one sanctioned way a foreachBatch body probes its durable
    append-only state: return the distinct ``key`` values of ``probe``
    (batch-bounded) that already exist in ``state`` (unbounded).

    The join direction is the whole design (r6 VERDICT #1): the BATCH
    side is broadcast and the state is only ever SCANNED — one
    shuffle-free, embarrassingly-parallel pass, so per-batch cost
    carries no shuffle/sort term that grows with accumulated state.
    Never ``.distinct()`` the state first: a hit-probe needs no
    deduplicated build side, and both dedup states are append-once per
    key anyway (a key is claimed by exactly one surviving doc, after
    which every later holder is dropped before the state write). At
    10B-doc state the remaining linear term is the bare columnar scan
    of one key column; the layout knobs for that decade are on the
    WRITE side (`_write_state`: bloom-filtered, size-bounded files a
    predicate-pushdown reader can skip)."""
    return (state.join(F.broadcast(probe.select(key).distinct()), key)
            .select(key))


def _write_state(df: DataFrame, state_dir: str) -> None:
    """Append a micro-batch's (batch-bounded) state rows: coalesced to
    ONE file per batch so the state's file count grows by 1/batch (a
    10k-batch stream stays scannable), with a parquet bloom filter on
    every column so point-probe readers (literal IN pushdown at
    trickle-batch sizes, external compactors) can skip row groups
    without reading them."""
    w = df.coalesce(1).write.mode("append")
    for c in df.columns:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
    w.parquet(state_dir)


def _neardup_keep_batch(red: DataFrame, bucket_state_dir: str,
                        id_col: str, keep: str) -> DataFrame:
    """stream_curate's near-dup keep stage for ONE micro-batch: drop
    any doc whose MinHash band bucket is already claimed in the
    durable bucket state (first-claim-wins — the only causal
    cross-batch policy), then per bucket shared INSIDE the batch keep
    the policy winner (``"best"`` = longest ``clean_text``,
    ``"min_id"`` = smallest id; ties to the smaller id). Survivors
    claim their buckets. Same state discipline as
    ``stream_neardup_dedup``: probe by scanning the state with the
    batch broadcast (``_state_hits``), append via ``_write_state``."""
    from pyspark.errors import AnalysisException

    from rust_graph_db_spark.operators.dedup import minhash_band_buckets

    sc = (F.length("clean_text").cast("long") if keep == "best"
          else (-F.col(id_col)).cast("long"))
    ids = red.select(F.col(id_col).alias("id"), sc.alias("_sc"))
    bk = (minhash_band_buckets(red, id_col, "clean_text",
                               num_hashes=32, bands=8, k=5)
          .select("id", F.xxhash64("band", "bucket").alias("bkt"))
          .join(ids, "id")
          .localCheckpoint(eager=True))   # consumers: argmax, probe,
    #                                       drop joins, state write
    best = bk.groupBy("bkt").agg(
        F.max(F.struct(F.col("_sc"), (-F.col("id")).alias("nid")))
        .alias("_b"))
    in_drop = (bk.join(best, "bkt")
               .where(F.col("id") != -F.col("_b.nid"))
               .select("id").distinct())
    try:
        seen = red.sparkSession.read.parquet(bucket_state_dir)
        hit_b = _state_hits(seen, bk, "bkt")
        st_drop = (bk.join(F.broadcast(hit_b), "bkt", "left_semi")
                   .select("id").distinct())
        drops = in_drop.unionByName(st_drop).distinct()
    except AnalysisException as e:
        if ("PATH_NOT_FOUND" not in str(e)
                and "Path does not exist" not in str(e)):
            raise
        drops = in_drop
    kept = (red.join(drops.withColumnRenamed("id", id_col),
                     id_col, "left_anti")
            .localCheckpoint(eager=True))   # consumers: out + claims
    _write_state(
        bk.join(kept.select(F.col(id_col).alias("id")), "id",
                "left_semi").select("bkt").distinct(),
        bucket_state_dir)
    return kept


def _dedup_against_state(df: DataFrame, state_dir: str, id_col: str):
    """Shared stateful-dedup core for the foreachBatch bodies: keep the
    min-``id_col`` row per in-batch ``_digest``, then drop digests in
    the durable SEEN set (via ``_state_hits`` — the state is scanned
    with the batch broadcast, never shuffled). Only a MISSING state
    path (batch 0) is tolerated; any other read failure (permissions,
    corrupt files, transient store errors) must fail the batch —
    silently skipping the probe would re-ingest every previously-seen
    document with no error."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window as W

    w = W.partitionBy("_digest").orderBy(F.col(id_col))
    df = (df.withColumn("_rn", F.row_number().over(w))
          .where(F.col("_rn") == 1).drop("_rn")
          .localCheckpoint(eager=True))   # 2 consumers: probe + anti
    try:
        seen = df.sparkSession.read.parquet(state_dir)
        hits = _state_hits(seen, df, "_digest")
        return df.join(F.broadcast(hits), "_digest", "left_anti")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return df                            # no state yet: batch 0
        raise


def stream_exact_dedup(
    stream: DataFrame, out_dir: str, state_dir: str,
    id_col: str = "doc_id", text_col: str = "text",
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Streaming exact dedup: emit only FIRST-SEEN documents across
    the whole stream history.

    The incremental-ingest counterpart of ``dedup.exact_dedup`` — the
    shape every continuously-crawled training corpus needs (new crawl
    batches arrive forever; a doc already in the corpus must not be
    appended again). Per micro-batch:

    1. in-batch dedup — min ``id_col`` per md5 digest (window over the
       micro-batch only, so state is bounded by batch size);
    2. anti-join the batch's digests against the durable SEEN set (a
       parquet dataset of 16-byte digests — at 100 TB of corpus this
       is the only state that persists, ~16 B/doc, and the join
       shuffles digests, never text);
    3. append survivors (tagged with ``_batch_id``) to ``out_dir`` and
       their digests to ``state_dir``.

    With a streaming ``checkpoint`` the source replays unprocessed
    batches on restart; the appends themselves are NOT idempotent
    under a crash between the two writes (the standard fix at scale is
    transactional sinks — e.g. the repo's own ``storage.save_graph``
    manifest commit, or Delta — writing both tables in one commit).
    Returns the StreamingQuery.
    """
    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        b = batch.withColumn("_digest", F.md5(F.col(text_col)))
        b = _dedup_against_state(b, state_dir, id_col)
        b = (b.withColumn("_batch_id", F.lit(batch_id).cast("long"))
              .localCheckpoint(eager=True))      # freeze before writing
        b.drop("_digest").write.mode("append").parquet(out_dir)
        _write_state(b.select("_digest"), state_dir)

    writer = stream.writeStream.foreachBatch(dedup_batch) \
                   .outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def running_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    threshold: float = 100.0,
) -> DataFrame:
    """Custom stateful operator: per-user running event count / value
    total / count of ``threshold`` crossings.

    Streaming: ``applyInPandasWithState`` — one state row (cnt, total)
    per user, updated per micro-batch from Arrow record batches, one
    output row per user per batch (output mode "update"). This is the
    canonical shape for custom stateful logic Structured Streaming's
    built-in aggregates can't express (the threshold-crossing counter
    here stands in for sessionized spend alerts, quota tracking, etc.).

    Batch: the same result is a plain aggregate (cnt, total,
    floor(total/threshold)) — which is what the DuckDB oracle checks;
    the streaming test asserts stream/batch parity.
    """
    if events.isStreaming:
        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout

        vc = value_col

        def update(key, pdfs, state):
            cnt, total = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                cnt += len(pdf)
                total += float(pdf[vc].sum())
            state.update((cnt, total))
            yield pd.DataFrame({
                "user_id": [key[0]], "cnt": [cnt],
                "total": [round(total, 6)],
                "crossings": [int(total // threshold)]})

        return (events.groupBy(user_col).applyInPandasWithState(
            update,
            "user_id LONG, cnt LONG, total DOUBLE, crossings LONG",
            "cnt LONG, total DOUBLE",
            "update", GroupStateTimeout.NoTimeout))
    return (events.groupBy(F.col(user_col).alias("user_id"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum(value_col), 6).alias("total"),
                 F.floor(F.sum(value_col) / F.lit(threshold))
                  .cast("long").alias("crossings")))


def _watermarkable(df: DataFrame, ts_col: str) -> DataFrame:
    # Watermarks require TIMESTAMP; parquet event-time columns often land
    # as TIMESTAMP_NTZ, which Spark rejects for event-time tracking.
    field = df.schema[ts_col]
    if field.dataType.typeName() != "timestamp":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums.

    Works on a streaming OR batch DataFrame (same expression tree —
    Spark's unified model); batch mode is what the DuckDB oracle
    checks (time_bucket equivalent).
    """
    df = events
    if df.isStreaming:
        df = _watermarkable(df, ts_col).withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window_duration, slide) if slide else \
        F.window(F.col(ts_col), window_duration)
    return (df.groupBy(w.alias("w"), F.col(key_col))
              .agg(F.count("*").alias("cnt"),
                   F.sum("value").alias("total_value"))
              .select(F.col("w.start").alias("window_start"),
                      key_col, "cnt", "total_value"))


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming: native session
    window; batch: the classic lag/cumsum reformulation so the same API
    works for backfills (and is oracle-checkable in SQL)."""
    if events.isStreaming:
        return (_watermarkable(events, ts_col).withWatermark(ts_col, gap)
                .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                         F.col(user_col))
                .agg(F.count("*").alias("cnt"))
                .select(F.col("w.start").alias("session_start"),
                        user_col, "cnt"))
    from pyspark.sql import Window as W

    gap_expr = F.expr(f"INTERVAL {gap}")
    w = W.partitionBy(user_col).orderBy(ts_col)
    marked = events.withColumn(
        "_new", F.when(
            F.col(ts_col).cast("timestamp") - F.lag(F.col(ts_col)).over(w)
            > gap_expr, 1).otherwise(0).cast("long"))
    marked = marked.withColumn(
        "_sess", F.sum("_new").over(
            W.partitionBy(user_col).orderBy(ts_col)
             .rowsBetween(W.unboundedPreceding, 0)))
    return (marked.groupBy(user_col, "_sess")
            .agg(F.min(ts_col).alias("session_start"),
                 F.count("*").alias("cnt"))
            .select("session_start", user_col, "cnt"))


def stream_curate(
    stream: DataFrame, out_dir: str, state_dir: str,
    id_col: str = "doc_id", text_col: str = "text",
    checkpoint: Optional[str] = None,
    thresholds: Optional[dict] = None,
    trigger_available_now: bool = True,
    lm=None, max_ppl: Optional[float] = None,
    url_col: Optional[str] = None,
    max_per_domain: Optional[int] = None,
    domain_blocklist=None,
    line_filter: bool = False,
    neardup_keep: Optional[str] = None,
):
    """Streaming END-TO-END curation: the batch ``curation.curate``
    pipeline (quality rule-chain → PII redaction → exact dedup →
    deterministic split) run continuously over arriving crawl batches.

    Filter + redaction + split are stateless Catalyst stages — they
    run inside each micro-batch at scan speed unchanged from the
    batch operator. The ONLY stateful stage is the dedup, which
    follows ``stream_exact_dedup``'s discipline: in-batch min-id per
    digest, then an anti-join against the durable 16-byte digest set
    (the sole persistent state, ~16 B per surviving doc; the
    cross-batch join shuffles digests, never text). Digests are taken
    over the REDACTED text, so re-crawled pages differing only in
    scrubbed PII still collapse across batches. Appends survivors
    ``(id, clean_text, split, _batch_id)`` to ``out_dir``.

    Optional ``lm`` + ``max_ppl`` (r4): run the CCNet perplexity
    filter at the head of each micro-batch — the LM count frames are
    STATIC tables trained offline, so inside foreachBatch the scoring
    is plain stream-static hash joins with no extra streaming state.
    Either LM family works (``BackoffLM`` or ``KneserNeyLM``, same
    dispatch as batch ``curate``). ``line_filter=True`` (r5) runs the
    stateless C4 line-level pass per micro-batch before the LM and
    quality stages.

    Optional ``url_col`` (r5): run URL/domain curation at the very
    head of each micro-batch (``curation.domain_curate``). The
    blocklist join is stateless; ``max_per_domain`` is enforced
    ACROSS batches through a second durable state table — an
    append-only per-domain kept-count log in the sibling directory
    ``state_dir + "_domains"`` (sum-mergeable on read, the same
    append-only discipline as the digest set): each batch ranks its
    own rows deterministically and keeps only ranks that fit under
    ``cap - already_kept``.

    Optional ``neardup_keep`` (r7): ``"best"`` or ``"min_id"`` adds
    NEAR-duplicate keep-selection after the exact dedup — the batch
    ``curate(neardup_keep=...)`` knob's streaming counterpart. Within
    a micro-batch the policy picks the keeper per shared MinHash band
    bucket (longest redacted text for ``"best"``, smallest id for
    ``"min_id"``; the greedy per-bucket form of d19's per-cluster
    argmax); ACROSS batches the only causal policy is first-claim-wins
    (an already-emitted doc cannot be revoked), enforced through a
    second durable bucket state at ``state_dir + "_buckets"`` exactly
    like ``stream_neardup_dedup``. ``"maximal"`` is batch-only: MIS
    over a pair graph needs the whole graph at once.

    Same non-idempotence caveat as ``stream_exact_dedup`` (multiple
    appends per batch; transactional sinks fix it at scale). Returns
    the StreamingQuery.
    """
    if neardup_keep is not None and neardup_keep not in ("best",
                                                         "min_id"):
        raise ValueError("stream_curate(): neardup_keep must be "
                         f"'best' or 'min_id', got {neardup_keep!r}")
    from rust_graph_db_spark.operators.curation import (domain_cap_order,
                                                        filter_redact,
                                                        hash_split,
                                                        with_domain)

    if (lm is None) != (max_ppl is None):
        raise ValueError("stream_curate(): lm and max_ppl must be "
                         "given together")
    if url_col is None and (max_per_domain is not None
                            or domain_blocklist is not None):
        raise ValueError("stream_curate(): max_per_domain/"
                         "domain_blocklist need url_col")
    # a SIBLING of state_dir, not nested: an underscore-prefixed
    # subdirectory would make the digest-state path exist-but-look-
    # empty to the parquet reader and break the batch-0 detection
    dom_counts_dir = f"{state_dir}_domains"

    def curate_batch(batch: DataFrame, batch_id: int) -> None:
        if url_col is not None:
            from pyspark.sql import Window

            batch = with_domain(batch, url_col)
            if domain_blocklist is not None:
                bl = (domain_blocklist
                      if isinstance(domain_blocklist, DataFrame)
                      else batch.sparkSession.createDataFrame(
                          [(d,) for d in domain_blocklist],
                          "domain STRING"))
                batch = batch.join(F.broadcast(bl), "domain",
                                   "left_anti")
            if max_per_domain is not None:
                from pyspark.errors import AnalysisException

                try:
                    prev = (batch.sparkSession.read
                            .parquet(dom_counts_dir)
                            .groupBy("domain")
                            .agg(F.sum("kept").alias("_prev")))
                except AnalysisException as e:
                    # only a MISSING path (batch 0) is tolerated —
                    # same discipline as _dedup_against_state: a
                    # swallowed read failure would silently lift the
                    # cross-batch cap
                    if ("PATH_NOT_FOUND" not in str(e)
                            and "Path does not exist" not in str(e)):
                        raise
                    prev = None
                w = Window.partitionBy("domain").orderBy(
                    domain_cap_order(id_col), F.col(id_col))
                batch = batch.withColumn("_rk", F.row_number().over(w))
                if prev is not None:
                    batch = (batch.join(prev, "domain", "left")
                             .withColumn("_prev", F.coalesce(
                                 "_prev", F.lit(0))))
                else:
                    batch = batch.withColumn("_prev", F.lit(0))
                batch = (batch.where(F.col("_rk") + F.col("_prev")
                                     <= int(max_per_domain))
                         .localCheckpoint(eager=True))
                (batch.groupBy("domain")
                 .agg(F.count(F.lit(1)).alias("kept"))
                 .write.mode("append").parquet(dom_counts_dir))
                batch = batch.drop("_rk", "_prev")
            batch = batch.drop("host", "domain")
        if line_filter:
            # stateless Catalyst stage — per micro-batch, same order
            # as batch curate(): before the LM/quality stages so
            # boilerplate lines never reach their statistics
            from rust_graph_db_spark.operators.curation import \
                c4_line_filter

            lf = c4_line_filter(batch, id_col, text_col)
            batch = batch.drop(text_col).join(
                lf.select(id_col,
                          F.col("text_clean").alias(text_col)),
                id_col)
        if lm is not None:
            from rust_graph_db_spark.operators.lm import (
                KneserNeyLM, kn_perplexity_filter, perplexity_filter)

            flt = (kn_perplexity_filter
                   if isinstance(lm, KneserNeyLM) else perplexity_filter)
            batch = flt(batch, lm, max_ppl,
                        text_col=text_col, id_col=id_col)
        red = (filter_redact(batch, id_col, text_col, thresholds)
               .withColumn("_digest", F.md5(F.col("clean_text"))))
        red = _dedup_against_state(red, state_dir, id_col)
        if neardup_keep is not None:
            red = _neardup_keep_batch(red, state_dir + "_buckets",
                                      id_col, neardup_keep)
        out = (hash_split(red, id_col)
               .withColumn("_batch_id", F.lit(batch_id).cast("long"))
               .localCheckpoint(eager=True))     # freeze before writing
        (out.select(id_col, "clean_text", "split", "_batch_id")
            .write.mode("append").parquet(out_dir))
        _write_state(out.select("_digest"), state_dir)

    writer = stream.writeStream.foreachBatch(curate_batch) \
                   .outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_neardup_dedup(
    stream: DataFrame, out_dir: str, state_dir: str,
    id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 32, bands: int = 8, k: int = 5,
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
    hash_mode: str = "xxhash",
):
    """Streaming incremental NEAR-duplicate dedup: MinHash-LSH bucket
    state across micro-batches — the near-dup analog of
    ``stream_exact_dedup``.

    Per batch: each document's band-bucket keys
    (``dedup.minhash_band_buckets``) are computed, and a document is
    DROPPED iff any of its buckets (a) already exists in the durable
    state (claimed by a surviving doc of an earlier batch), or (b) is
    shared with a lower-``id_col`` document IN the same batch
    (deterministic min-per-bucket greedy — for chained near-dups this
    keeps the same min-id representative as the batch
    connected-component rule). Survivors append their bucket keys to
    the state and their rows to ``out_dir``.

    Semantics trade (documented, standard for streaming near-dup):
    bucket collision IS the near-dup verdict — recall at Jaccard t is
    1-(1-t^r)^b and false positives occur at the banding scheme's
    rate; there is no exact-verify stage because prior documents'
    shingle sets are not retained, only their ``bands``×16-byte
    bucket keys. That bound on state size is the point: the durable
    state is O(bands) longs per SURVIVING document regardless of
    document length, append-only and merge-on-read like the digest
    state.

    Per-batch probe cost: the state is SCANNED (batch bucket keys
    broadcast into it via ``_state_hits``), never shuffled, sorted
    or distinct-ed — the growth term per batch is one shuffle-free
    columnar pass over the state's single long column, and state
    files are written bloom-filtered + one-per-batch
    (``_write_state``) so a pushdown reader can skip row groups a
    trickle batch doesn't touch.

    ``hash_mode="md5"`` makes every bucket key a pure md5 function of
    the text (``dedup._minhash_sig``), so the full cross-batch run
    replays in SQL — the driver oracle for ``w13``.
    """
    from rust_graph_db_spark.operators.dedup import minhash_band_buckets

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from rust_graph_db_spark.functions.hashing import md5_key, md5_long

        # md5 mode folds (band, bucket) into ONE replayable long via
        # the shared cross-engine construction (functions/hashing) —
        # the same md5_long('band:bucket') the w13 oracle computes
        bkt = (F.xxhash64("band", "bucket") if hash_mode == "xxhash"
               else md5_long(md5_key(F.col("band"), F.col("bucket"))))
        bk = (minhash_band_buckets(batch, id_col, text_col,
                                   num_hashes=num_hashes, bands=bands,
                                   k=k, hash_mode=hash_mode)
              .select(F.col("id"), bkt.alias("bkt"))
              .localCheckpoint(eager=True))
        # in-batch rule first (state-independent, so the SQL replay
        # can mirror it without modeling survivor order): drop any id
        # sharing a bucket with a lower id in THIS batch
        first = bk.groupBy("bkt").agg(F.min("id").alias("_first"))
        in_drop = (bk.join(first, "bkt")
                   .where(F.col("id") > F.col("_first"))
                   .select("id").distinct())
        try:
            # r6 VERDICT #1: probe the accumulated state by
            # broadcasting the BATCH's bucket keys into one scan of
            # the state — no `.distinct()` (a hit-probe needs no
            # deduplicated build side, and state buckets are
            # append-once anyway) and no state-side shuffle, so the
            # per-batch probe cost no longer carries a shuffle/sort
            # term that grows with total accumulated state.
            seen = batch.sparkSession.read.parquet(state_dir)
            hit_b = _state_hits(seen, bk, "bkt")
            st_drop = (bk.join(F.broadcast(hit_b), "bkt", "left_semi")
                       .select("id").distinct())
            drops = in_drop.unionByName(st_drop).distinct()
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            drops = in_drop
        kept = (batch.join(drops.withColumnRenamed("id", id_col),
                           id_col, "left_anti")
                .withColumn("_batch_id", F.lit(batch_id).cast("long"))
                .localCheckpoint(eager=True))
        kept.write.mode("append").parquet(out_dir)
        _write_state(
            bk.join(kept.select(F.col(id_col).alias("id")), "id",
                    "left_semi")
            .select("bkt").distinct(),   # batch-bounded, not state
            state_dir)

    writer = stream.writeStream.foreachBatch(dedup_batch) \
                   .outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_gram_cms(
    stream: DataFrame, state_dir: str,
    text_col: str = "text", n: int = 2,
    depth: int = 4, width: int = 1 << 21,
    checkpoint: Optional[str] = None,
    trigger_available_now: bool = True,
):
    """Streaming heavy-hitter tracking: maintain a count-min sketch of
    the corpus n-gram stream across micro-batches.

    Per batch: sketch the batch's gram occurrences
    (``sketches.cms_table`` — at most depth×width cells however large
    the batch) and APPEND the cells to ``state_dir``. The durable
    state is an append-only cell log; ``stream_cms_state`` merges on
    read (CMS cells are sum-mergeable, so merge-on-read is exact and
    the log needs no read-modify-write transaction — the same
    append-only discipline as ``stream_exact_dedup``'s digest state,
    and the property that makes this restart/replay-safe apart from
    the standard duplicated-append-on-crash caveat documented there).
    Readers needing compaction re-write the merged table; frequency
    queries go through ``sketches.cms_estimate`` on the merged sketch.

    This is what bounded-state streaming vocabulary/boilerplate
    monitoring looks like at 100 TB: exact per-gram streaming counts
    need unbounded state, the CMS log grows by ≤ batch-vocabulary
    cells per batch and estimates never undercount.
    """
    from rust_graph_db_spark.operators.curation import ngram_stream
    from rust_graph_db_spark.operators.sketches import cms_table

    def sketch_batch(batch: DataFrame, batch_id: int) -> None:
        grams = ngram_stream(batch, text_col, n)
        cells = cms_table(grams, "gram", depth=depth, width=width)
        (cells.withColumn("_batch_id", F.lit(batch_id).cast("long"))
              .write.mode("append").parquet(state_dir))

    writer = stream.writeStream.foreachBatch(sketch_batch) \
                   .outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cms_state(spark, state_dir: str) -> DataFrame:
    """Merged CMS sketch from a ``stream_gram_cms`` cell log — exact
    cell-for-cell sum over all appended batch sketches."""
    cells = spark.read.parquet(state_dir)
    # One writer query with fixed depth/width produces a uniform log;
    # a log that mixes widths (e.g. two differently-configured streams
    # pointed at one state_dir) would min-over-depth garbage, so fail
    # loudly instead of letting first("width") pick one arbitrarily.
    # (Depth is fixed by the writer's closure and not re-checkable
    # here — the cell log carries no batch id.)
    nw = cells.agg(F.count_distinct("width").alias("nw")).first()["nw"]
    if nw > 1:
        raise ValueError(
            f"cell log at {state_dir} mixes {nw} sketch widths — "
            "it was written by differently-configured streams")
    return (cells.groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"),
                 F.first("width").alias("width")))
