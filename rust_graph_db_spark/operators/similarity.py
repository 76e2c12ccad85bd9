"""Similarity search over embedding columns (ARRAY<FLOAT>).

Brute-force cosine as the exact baseline; hyperplane-LSH bucketing as
the scale path (restricts the candidate set before exact re-scoring, so
the quadratic pair join becomes per-bucket). Dot products are
``zip_with`` + ``aggregate`` Catalyst expressions — JVM-side, no Python.

At cluster scale the brute-force top-k is a map-side partial top-k
(TakeOrderedAndProject after a broadcast of the query vector); the LSH
variant shuffles once on bucket id. An IVF refinement (k-means coarse
quantizer) would replace the random hyperplanes with learned centroids —
same dataflow, different bucket assignment.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product (float32 inputs are exact in f64, so
    accumulation matches a DuckDB oracle on CAST(... AS DOUBLE[]))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def drop_undefined(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Rows whose cosine is DEFINED: non-null, non-empty, nonzero-norm
    vectors. Every operator in this module excludes the rest up front —
    at corpus scale a failed encoder batch yields null or all-zero
    rows, cosine against them is undefined (0/0), and the alternatives
    are a job-killing DIVIDE_BY_ZERO (Spark ANSI), a NaN that sorts
    ABOVE every real score in a descending top-k, or a Python-worker
    crash in the Arrow kernels. One codegen'd scan predicate; no
    shuffle."""
    return emb.where(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) > 0)
                     & F.exists(vec_col, lambda x: x != 0.0))


def _broadcast_hint(emb: DataFrame, vec_col: str,
                    cap_bytes: int = 64 * 1024 * 1024):
    """Broadcast-or-not for an embedding side, gated on ESTIMATED BYTES
    (4 B per float32 element + ~16 B row overhead), not row count: at
    dim 1024 a 500k-row count gate would happily broadcast ~2 GB. One
    aggregate job (same cost class as the count it replaces); mirrors
    the shingle-side gate in dedup.py."""
    est = (emb.agg((F.sum(F.size(vec_col)) * 4 +
                    F.count(F.lit(1)) * 16).alias("b")).first()["b"]) or 0
    return F.broadcast if est <= cap_bytes else (lambda d: d)


def cosine_topk(
    emb: DataFrame, query_vec: Sequence[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    exclude_id: Optional[int] = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Ties break on id. Catalyst plans orderBy+limit as
    TakeOrderedAndProject: each partition keeps its local top-k, the
    driver merges — no full sort, no shuffle of the corpus. The scan
    scores through the Arrow-batched numpy cosine (one matvec per
    batch), not the interpreted zip_with/aggregate expression — the
    expression form costs ~10 µs/row, which at 10^9 corpus rows turns
    the linear scan into hours; the batch form is ~100× cheaper at the
    same float64 precision (ivf_topk uses the identical scoring path).
    """
    q = _vec_lit(query_vec)
    emb = drop_undefined(emb, vec_col)
    out = emb.select(F.col(id_col).alias("id"),
                     cosine_batch()(F.col(vec_col), q).alias("cos"))
    if exclude_id is not None:
        out = out.where(F.col("id") != int(exclude_id))
    return out.orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k)


def cosine_pairs(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs (i < j) with cosine ≥ threshold (brute force).

    Normalizes once, then the pair join carries unit vectors. Quadratic:
    the baseline/oracle path — use lsh_cosine_pairs at scale.
    """
    emb = drop_undefined(emb, vec_col)
    unit = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: (x / norm(F.col(vec_col))).cast("double"))
         .alias("u"))
    a, b = unit.alias("a"), unit.alias("b")
    return (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"),
                     dot(F.col("a.u"), F.col("b.u")).alias("cos"))
             .where(F.col("cos") >= threshold))


def _hyperplane(dim: int, plane_idx: int) -> list:
    """Deterministic pseudo-random unit-free hyperplane from xxhash64 —
    same on every executor/run, no driver RNG state."""
    import struct as _struct

    def h64(i: int, j: int) -> int:
        # splitmix64-style scramble; public-domain integer mix
        z = (i * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        return z ^ (z >> 31)

    return [((h64(plane_idx, j) % 2001) - 1000) / 1000.0 for j in range(dim)]


def lsh_bucket(vec: Column, dim: int, planes: int = 16) -> Column:
    """Sign-of-projection bucket id: bit p = (vec · plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = dot(vec, _vec_lit(_hyperplane(dim, p)))
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)) \
                           .otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_cosine_pairs(
    emb: DataFrame, threshold: float, dim: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
    planes: Optional[int] = None, tables: Optional[int] = None,
    target_recall: float = 0.8,
) -> DataFrame:
    """Approximate near-neighbor pairs: `tables` independent
    hyperplane-LSH bucketings; same-bucket pairs re-scored exactly.

    Per-table bucket count 2^planes keeps buckets small; candidates =
    union over tables, dedup'd, then exact cosine filter. Output ⊆
    cosine_pairs(threshold) with recall ≥ target_recall at the
    threshold boundary (higher for more-similar pairs).

    When planes/tables are not given they are derived from the
    threshold: a pair at cosine t collides on one hyperplane with
    p = 1 - arccos(t)/π, on a band of k planes with p^k, and in ≥1 of
    L tables with 1-(1-p^k)^L. We pick k so p^k ≈ 0.15 (bands stay
    selective) and the smallest L meeting target_recall. Low
    thresholds therefore cost more tables — that is inherent to
    hyperplane LSH, not a tuning failure.
    """
    import math

    p_collide = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if planes is None:
        planes = max(1, round(math.log(0.15) / math.log(p_collide)))
    if tables is None:
        band_p = p_collide ** planes
        tables = max(1, math.ceil(
            math.log(1.0 - target_recall) / math.log(1.0 - band_p)))
    emb = drop_undefined(emb, vec_col)
    buckets = lsh_buckets_udf(dim, planes, tables)
    tagged = (emb.select(F.col(id_col).alias("id"),
                         F.posexplode(buckets(F.col(vec_col)))
                          .alias("tbl", "bucket")))

    a, b = tagged.alias("a"), tagged.alias("b")
    cand = (a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
            .dropDuplicates(["i", "j"]))
    # exact re-score joins vectors back onto the candidate set — the
    # corpus shuffle carries only (id, tbl, bucket) triples. The vector
    # side broadcasts only when its ESTIMATED BYTES fit (≤64 MB); the
    # per-candidate cosine is an Arrow-batched numpy matvec (the
    # interpreted zip_with/aggregate expression costs ~10 µs/pair,
    # which dominates once candidate counts reach 10^5-10^6).
    hint = _broadcast_hint(emb, vec_col)
    va = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (cand.join(hint(va), "i").join(hint(vb), "j")
                .withColumn("cos", cosine_batch()(F.col("va"), F.col("vb")))
                .where(F.col("cos") >= threshold)
                .select("i", "j", "cos"))


def cosine_batch():
    """Arrow-batched exact cosine: ARRAY<FLOAT>, ARRAY<FLOAT> -> DOUBLE.

    One numpy pass per batch — float64 accumulation, same precision
    class as the expression form but ~100× cheaper per pair.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
        return pd.Series(num / den)

    return _cos


def l2_normalize():
    """Arrow-batched unit-normalization: ARRAY<FLOAT> -> ARRAY<DOUBLE>.
    Pair operators over the output need only a dot product (see
    dot_batch) — the norms are paid once per ROW, not once per pair."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _unit(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        M = np.stack(vs.to_numpy()).astype(np.float64)
        M /= np.sqrt((M * M).sum(axis=1, keepdims=True))
        return pd.Series(list(M))

    return _unit


def dot_batch():
    """Arrow-batched dot product: ARRAY<DOUBLE>, ARRAY<DOUBLE> -> DOUBLE.
    Over l2_normalize() outputs this IS the cosine, at a third of
    cosine_batch's flops (no per-pair norms)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        return pd.Series((A * B).sum(axis=1))

    return _dot


def lsh_buckets_udf(dim: int, planes: int = 12, tables: int = 4):
    """Arrow-batched bucket assignment: one numpy matmul per batch
    against the (tables*planes, dim) hyperplane matrix, bits packed per
    table. Returns a pandas UDF: ARRAY<FLOAT> -> ARRAY<LONG> of length
    ``tables``.

    The hyperplanes are a pure function of (plane index, dim) — every
    executor regenerates the identical matrix, no broadcast state, runs
    are reproducible. This is the vectorized replacement for evaluating
    ``tables*planes`` interpreted dot-product expressions per row (the
    hot path when bucketing 10^9 embeddings).
    """
    from pyspark.sql.functions import pandas_udf

    H = np.array([_hyperplane(dim, i) for i in range(tables * planes)],
                 dtype=np.float64)  # (tables*planes, dim)
    weights = (1 << np.arange(planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy()).astype(np.float64)      # (n, dim)
        signs = (M @ H.T) > 0                               # (n, t*p)
        per_tbl = signs.reshape(len(M), tables, planes)     # (n, t, p)
        ids = per_tbl @ weights                             # (n, t)
        return pd.Series(list(ids))

    return _buckets


def ivf_centroids(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_size: int = 4096, iters: int = 5,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a deterministic
    sample — the IVF counterpart to the hyperplane LSH bucketing.

    The sample is the ``sample_size`` vectors with the smallest
    xxhash64(id) (a uniform, order-free, reproducible draw — at 100 TB
    this is a TakeOrderedAndProject over 8-byte hashes, not a full
    sort), Lloyd iterations run driver-side in numpy (centroid count ×
    dim is tiny), and init is the first ``n_centroids`` sampled vectors
    in hash order. Returns the (n_centroids, dim) unit-row matrix.
    """
    rows = (drop_undefined(emb, vec_col)
            .select(F.col(vec_col).alias("v"),
                       F.xxhash64(F.col(id_col).cast("string")).alias("h"))
            .orderBy("h").limit(int(sample_size)).collect())
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    C = X[: min(n_centroids, len(X))].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12
    return C


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, embedding): nearest-centroid assignment via one
    Arrow-batched matmul per batch. At rest, write the corpus
    partitioned by ``cluster`` so probe-time reads prune partitions —
    the IVF inverted lists ARE the partition layout."""
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack(vs.to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True) + 1e-12
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return emb.select(F.col(id_col).alias("id"),
                      _assign(F.col(vec_col)).alias("cluster"),
                      F.col(vec_col).alias("embedding"))


def ivf_topk(
    emb: DataFrame, query_vec: Sequence[float], k: int = 10,
    n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """Approximate top-k: score only the ``nprobe`` inverted lists whose
    centroids are nearest the query (classic IVF-Flat probe).

    Scanned fraction ≈ nprobe/n_centroids of the corpus; the exact
    re-score within probed lists is the Arrow-batched cosine. With a
    cluster-partitioned corpus (ivf_assign note) the cluster filter
    becomes partition pruning and the scan never touches unprobed data.
    """
    if centroids is None:
        centroids = ivf_centroids(emb, n_centroids, id_col, vec_col)
    q = np.asarray(list(query_vec), dtype=np.float64)
    q /= np.linalg.norm(q) + 1e-12
    order = np.argsort(-(centroids @ q))[: max(1, int(nprobe))]
    probe = [int(c) for c in order]
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    qlit = _vec_lit([float(x) for x in q])
    return (assigned.where(F.col("cluster").isin(probe))
            .select("id", cosine_batch()(F.col("embedding"), qlit).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k))


def ivf_write(
    emb: DataFrame, path: str, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Materialize the IVF index at rest: the corpus written
    ``partitionBy("cluster")`` (each inverted list IS a parquet
    partition directory) plus the centroid matrix as JSON metadata.
    Returns the centroids. At 100 TB this is a one-off re-layout; all
    subsequent probes are partition-pruned scans."""
    import json
    import os

    if centroids is None:
        centroids = ivf_centroids(emb, n_centroids, id_col, vec_col)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump([[float(x) for x in row] for row in centroids], f)
    return centroids


def ivf_topk_stored(
    spark, path: str, query_vec: Sequence[float], k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a stored IVF index (``ivf_write`` layout): the nprobe
    nearest lists become a ``cluster IN (...)`` filter that Spark
    resolves as PARTITION PRUNING — unprobed inverted lists are never
    read from disk (the plan's PartitionFilters carry the IN list).
    Exact cosine re-score within the probed lists, as in ``ivf_topk``.
    """
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = np.asarray(json.load(f), dtype=np.float64)
    q = np.asarray(list(query_vec), dtype=np.float64)
    q /= np.linalg.norm(q) + 1e-12
    probe = [int(c) for c in np.argsort(-(centroids @ q))[: max(1, int(nprobe))]]
    corpus = spark.read.parquet(path).where(F.col("cluster").isin(probe))
    qlit = _vec_lit([float(x) for x in q])
    return (corpus
            .select("id", cosine_batch()(F.col("embedding"), qlit).alias("cos"))
            .orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k))


def knn_join(
    left: DataFrame, right: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """For every left vector, its k nearest right vectors by cosine.

    Window rank over the cross join — exact baseline/oracle; use
    ``knn_join_lsh`` at scale.
    """
    from pyspark.sql import Window

    left = drop_undefined(left, vec_col)
    right = drop_undefined(right, vec_col)
    a = left.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    b = right.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (a.crossJoin(b).where(F.col("qid") != F.col("nid"))
               .withColumn("cos", cosine(F.col("qv"), F.col("nv"))))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("qid", "nid", "cos", "rank"))


def knn_join_lsh(
    left: DataFrame, right: DataFrame, k: int = 5, dim: int = 64,
    planes: int = 8, tables: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN join — the scale path for ``knn_join``:
    hyperplane-LSH bucket BOTH sides, generate candidates per
    (table, bucket), exact-re-score and rank within candidates.

    Shuffle discipline matches ``lsh_cosine_pairs``: the bucket join
    carries only (id, tbl, bucket) triples; embeddings join back by id
    AFTER candidate dedup, so the corpus-wide shuffle never carries
    vectors. Returned scores are exact cosines (precision 1 on what it
    returns); recall is the LSH collision probability — more ``tables``
    buys recall linearly in cost. Candidate skew (a hot bucket) is
    bounded by 2^planes bucket granularity; raise ``planes`` to shrink
    buckets before raising ``tables``.
    """
    left = drop_undefined(left, vec_col)
    right = drop_undefined(right, vec_col)
    buckets = lsh_buckets_udf(dim, planes, tables)
    qtag = (left.select(F.col(id_col).alias("qid"),
                        F.posexplode(buckets(F.col(vec_col)))
                         .alias("tbl", "bucket")))
    ntag = (right.select(F.col(id_col).alias("nid"),
                         F.posexplode(buckets(F.col(vec_col)))
                          .alias("tbl", "bucket")))
    cand = (qtag.join(ntag, ["tbl", "bucket"])
            .where(F.col("qid") != F.col("nid"))
            .select("qid", "nid").dropDuplicates(["qid", "nid"]))
    qhint = _broadcast_hint(left, vec_col)
    nhint = _broadcast_hint(right, vec_col)
    qv = left.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    nv = right.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (cand.join(qhint(qv), "qid").join(nhint(nv), "nid")
              .withColumn("cos", cosine_batch()(F.col("qv"), F.col("nv"))))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("qid", "nid", "cos", "rank"))


def kmeans(
    emb: DataFrame, k: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    init: str = "first",
) -> tuple[DataFrame, np.ndarray]:
    """Distributed Lloyd's k-means (Euclidean) over an embedding
    column — the corpus-clustering primitive behind IVF training,
    domain balancing, and diversity sampling of training data.

    Returns ``(assignments, centroids)``: assignments is
    ``(id, cluster, dist2)`` (squared distance to the final centroid),
    centroids the ``(k, dim)`` float64 matrix.

    Per iteration the plan is: one corpus scan assigning each vector
    via a single Arrow-batched matmul against the broadcast ``(k,
    dim)`` centroid matrix (tiny — k·dim·8 bytes, shipped in the UDF
    closure), then the centroid update as ``posexplode`` →
    ``groupBy(cluster, dim)`` mean. The update shuffle is map-side
    combined, so each partition contributes at most ``k × dim``
    partial rows regardless of row count — at 100 TB the shuffle is
    MB-scale. No driver-side iteration over data, only over the k·dim
    centroid matrix.

    ``init="first"``: centroids seeded from the k rows with the
    smallest id — deterministic AND cheaply reproducible by any SQL
    engine (the correctness oracle unrolls the same iterations in
    CTEs). ``init="hash"``: smallest xxhash64(id) — unbiased under
    sorted/clustered corpora; prefer it in production.
    """
    key = (F.xxhash64(F.col(id_col).cast("string")) if init == "hash"
           else F.col(id_col))
    seed_rows = (emb.select(F.col(vec_col).alias("v"), key.alias("k"))
                 .orderBy("k").limit(int(k)).collect())
    C = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    def _assign_udf(Cm: np.ndarray):
        @pandas_udf("struct<cluster:int, dist2:double>")
        def _assign(vs: pd.Series) -> pd.DataFrame:
            if len(vs) == 0:
                return pd.DataFrame({"cluster": pd.Series(dtype="int32"),
                                     "dist2": pd.Series(dtype="float64")})
            M = np.stack(vs.to_numpy()).astype(np.float64)
            # ||x-c||^2 for all pairs; argmin ties break to the LOWEST
            # cluster index (np.argmin), matching the oracle's
            # ORDER BY dist, cluster.
            d2 = ((M * M).sum(1, keepdims=True)
                  - 2.0 * (M @ Cm.T)
                  + (Cm * Cm).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            return pd.DataFrame({
                "cluster": a.astype("int32"),
                "dist2": d2[np.arange(len(M)), a]})
        return _assign

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for _ in range(int(iters)):
        assigned = base.select(
            "id", "v", _assign_udf(C)(F.col("v")).alias("ad"))
        means = (assigned
                 .select(F.col("ad.cluster").alias("cluster"),
                         F.posexplode("v").alias("d", "x"))
                 .groupBy("cluster", "d")
                 .agg(F.avg(F.col("x").cast("double")).alias("m")))
        C_next = C.copy()           # empty clusters keep their centroid
        for r in means.collect():   # ≤ k × dim rows
            C_next[r["cluster"], r["d"]] = r["m"]
        C = C_next
    final = base.select(
        "id", _assign_udf(C)(F.col("v")).alias("ad")
    ).select("id", F.col("ad.cluster").alias("cluster"),
             F.col("ad.dist2").alias("dist2"))
    return final, C


def kmeans_summary(
    emb: DataFrame, k: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n, inertia): cluster sizes and within-cluster sum of
    squared distances after ``iters`` Lloyd iterations — the
    convergence/balance report a pipeline logs per k-means run."""
    assigned, _ = kmeans(emb, k, iters, id_col, vec_col)
    return (assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.sum("dist2"), 6).alias("inertia")))


def pq_topk(
    codes: DataFrame, codebooks: np.ndarray, query_vec: Sequence[float],
    k: int = 10, id_col: str = "id", codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jégou, Douze &
    Schmid 2011, "Product Quantization for Nearest Neighbor Search").

    The query stays full precision; per-subspace lookup tables
    ``T[s][c] = ||q_s − codebook[s][c]||²`` are built once (m × ksub
    doubles, rides the UDF closure) and each candidate's distance is m
    table lookups summed — the codes are never decoded. Returns
    ``(id, adist)`` ascending, ties on id; Catalyst plans the
    orderBy+limit as TakeOrderedAndProject, so the scan reads ONLY the
    2-byte-per-subspace codes (32× less IO than float32 vectors) and
    no corpus shuffle happens. This is the memory-bound ANN serving
    path PQ exists for; compose with IVF partition pruning for the
    disk-bound path.
    """
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    q = np.asarray(list(query_vec), dtype=np.float64)
    if q.shape != (m * dsub,):
        raise ValueError(f"query dim {q.shape[0]} != m*dsub {m * dsub}")
    T = np.stack([(((q[s * dsub:(s + 1) * dsub][None, :] - B[s]) ** 2)
                   .sum(axis=1)) for s in range(m)])      # (m, ksub)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _adist(cs: pd.Series) -> pd.Series:
        if len(cs) == 0:
            return pd.Series([], dtype="float64")
        C = np.stack(cs.to_numpy()).astype(np.int64)       # (n, m)
        return pd.Series(T[np.arange(m)[None, :], C].sum(axis=1))

    return (codes.select(F.col(id_col).alias("id"),
                         _adist(F.col(codes_col)).alias("adist"))
            .orderBy(F.col("adist").asc(), F.col("id").asc()).limit(k))


def semdedup(
    emb: DataFrame, threshold: float = 0.45, k: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    init: str = "first",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pairs via cluster-then-verify — k-means partitions
    the embedding space, and exact cosine runs ONLY within clusters.

    Returns ``(i, j, cos, cluster)`` pairs with ``i < j`` and
    ``cos >= threshold``, cos rounded to 6 places. Output ⊆
    cosine_pairs(threshold): pairs split across cluster boundaries are
    the (paper-accepted) recall loss, measured per-corpus by
    ``test_semdedup_subset_and_recall``.

    Scale shape: the all-pairs comparison that makes ``cosine_pairs``
    quadratic in the corpus becomes quadratic only in the CLUSTER —
    pick k ≈ n/target_cluster_size so E[|cluster|] is bounded (the
    paper runs k=50k on LAION-440M, ~9k rows/cluster) and the
    within-cluster join is one shuffle on the cluster id followed by
    bounded local pair generation. Feed the pairs to
    ``dedup.drop_near_dups`` to materialize the kept corpus. The
    kmeans stage shuffles only k×dim partial sums per iteration; with
    ``init="first"`` the whole operator is deterministic and
    SQL-oracle-able (driver query ``d11_semdedup`` unrolls it in
    DuckDB CTEs).
    """
    # undefined rows (null/empty/zero-norm) are dropped BEFORE kmeans —
    # they cannot be near-dups and would crash the seed collection /
    # Arrow assign kernels (the module-wide contract in drop_undefined)
    clean = drop_undefined(emb, vec_col)
    assigned, _ = kmeans(clean, k, iters, id_col, vec_col, init)
    # normalize ONCE per row; the quadratic within-cluster step is then
    # a bare dot per pair instead of dot + two norms (cosine_pairs uses
    # the same unit-vector trick; ~3× fewer flops where it matters)
    base = (clean
            .select(F.col(id_col).alias("id"),
                    l2_normalize()(F.col(vec_col)).alias("u"))
            .join(assigned.select("id", "cluster"), "id"))
    a = base.select(F.col("id").alias("i"), F.col("u").alias("ui"),
                    "cluster")
    b = base.select(F.col("id").alias("j"), F.col("u").alias("uj"),
                    "cluster")
    return (a.join(b, ["cluster"]).where(F.col("i") < F.col("j"))
             .withColumn("cos", dot_batch()(F.col("ui"), F.col("uj")))
             .where(F.col("cos") >= threshold)
             .select("i", "j", F.round("cos", 6).alias("cos"), "cluster"))


def int8_quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization (the storage-compression
    path every large vector corpus runs — 4x smaller than float32 at
    rest): code_i = round((x_i - min) / scale), scale = (max - min) /
    255, reconstruction x̂_i = min + code_i · scale.

    Returns ``(id, codes array<smallint>, vmin, scale, mae)`` where
    mae is the mean absolute reconstruction error — the audit metric
    that decides whether int8 is acceptable for a given embedding
    family. One Arrow-batched scan, no shuffle; rounding is
    floor(x + 0.5) (portable half-up — numpy's banker rounding and
    SQL round() disagree at .5 boundaries, so neither is used).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<codes:array<smallint>, vmin:double, scale:double,"
                " mae:double>")
    def _q(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"codes": pd.Series(dtype="object"),
                                 "vmin": pd.Series(dtype="float64"),
                                 "scale": pd.Series(dtype="float64"),
                                 "mae": pd.Series(dtype="float64")})
        M = np.stack(vs.to_numpy()).astype(np.float64)
        mn = M.min(axis=1, keepdims=True)
        mx = M.max(axis=1, keepdims=True)
        scale = (mx - mn) / 255.0
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.floor((M - mn) / safe + 0.5)
        codes = np.where(scale == 0.0, 0.0, codes)
        recon = mn + codes * scale
        mae = np.abs(M - recon).mean(axis=1)
        return pd.DataFrame({
            "codes": [row.astype("int16") for row in codes],
            "vmin": mn[:, 0], "scale": scale[:, 0], "mae": mae})

    return (emb.select(F.col(id_col).alias("id"),
                       _q(F.col(vec_col)).alias("q"))
            .select("id", F.col("q.codes").alias("codes"),
                    F.col("q.vmin").alias("vmin"),
                    F.col("q.scale").alias("scale"),
                    F.col("q.mae").alias("mae")))


def pq_codebooks(
    emb: DataFrame, m: int = 4, ksub: int = 16, train_iters: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_size: int = 4096,
) -> np.ndarray:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces and each gets a ``ksub``-centroid
    k-means codebook (classic PQ, Jégou et al. 2011 — the compression
    layer under most billion-scale ANN systems).

    Returns ``(m, ksub, dim//m)`` float64. Training mirrors
    ``ivf_centroids``: a deterministic hash-ordered sample collects to
    the driver (codebooks are tiny — m·ksub·dsub), Lloyd iterations in
    numpy. ``train_iters=0`` skips Lloyd: codebooks are the first
    ``ksub`` sampled subvectors verbatim — fully reproducible by a SQL
    engine, which is what the correctness oracle runs.
    """
    if train_iters == 0:
        rows = (emb.select(F.col(vec_col).alias("v"))
                .orderBy(F.col(id_col)).limit(int(ksub)).collect())
    else:
        rows = (emb.select(F.col(vec_col).alias("v"),
                           F.xxhash64(F.col(id_col).cast("string"))
                           .alias("h"))
                .orderBy("h").limit(int(sample_size)).collect())
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    if X.shape[0] < int(ksub):
        raise ValueError(
            f"PQ training needs at least ksub={ksub} vectors, "
            f"got {X.shape[0]} — lower ksub or add data")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, int(ksub), dsub), dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = Xs[: int(ksub)].copy()
        for _ in range(int(train_iters)):
            d2 = ((Xs * Xs).sum(1, keepdims=True) - 2 * Xs @ C.T
                  + (C * C).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            for c in range(len(C)):
                if (a == c).any():
                    C[c] = Xs[a == c].mean(axis=0)
        books[s] = C
    return books


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<smallint> length m, mae): PQ-encode every
    vector (per-subspace nearest codeword, ties to the lowest index)
    plus the mean absolute reconstruction error of decoding the codes
    back — the audit that qualifies a codebook for a corpus.

    One Arrow-batched scan; the (m, ksub, dsub) codebook rides the
    UDF closure (a few KB). At 100 TB this is the standard 32×
    at-rest compression pass before ANN index build; no shuffle.
    """
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<codes:array<smallint>, mae:double>")
    def _enc(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:
            return pd.DataFrame({"codes": pd.Series(dtype="object"),
                                 "mae": pd.Series(dtype="float64")})
        M = np.stack(vs.to_numpy()).astype(np.float64)
        n = len(M)
        codes = np.empty((n, m), dtype=np.int16)
        err = np.zeros(n, dtype=np.float64)
        for s in range(m):
            Xs = M[:, s * dsub:(s + 1) * dsub]
            C = B[s]
            d2 = ((Xs * Xs).sum(1, keepdims=True) - 2 * Xs @ C.T
                  + (C * C).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            codes[:, s] = a.astype(np.int16)
            err += np.abs(Xs - C[a]).sum(axis=1)
        return pd.DataFrame({"codes": list(codes),
                             "mae": err / (m * dsub)})

    return (emb.select(F.col(id_col).alias("id"),
                       _enc(F.col(vec_col)).alias("q"))
            .select("id", F.col("q.codes").alias("codes"),
                    F.col("q.mae").alias("mae")))


def _rp_sign(seed: int, j: int, k: int) -> int:
    """Deterministic ±1 for output dim ``j``, input dim ``k`` — the
    lowest hex digit's parity of md5("rp:seed:j:k"). Computed at
    PLAN-BUILD time in Python and embedded as literals in both the
    Spark expression and the SQL oracle, so neither engine hashes
    anything at run time and the two plans are textually twinned."""
    import hashlib

    h = hashlib.md5(f"rp:{seed}:{j}:{k}".encode()).hexdigest()
    return 1 if int(h[-1], 16) % 2 == 0 else -1


def _rp_terms(seed: int, j: int, in_dim: int, elem) -> str:
    """Left-associated ± chain for output dim j; ``elem(k)`` renders
    the engine-specific element access (0-based Spark, 1-based SQL)."""
    parts = []
    for k in range(in_dim):
        op = "+" if _rp_sign(seed, j, k) > 0 else "-"
        parts.append(f"{op} CAST({elem(k)} AS DOUBLE)")
    joined = " ".join(parts)
    return joined[2:] if joined.startswith("+ ") else "0.0 " + joined


def random_projection(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", in_dim: int = 64,
                      out_dim: int = 16, seed: int = 0) -> DataFrame:
    """``(id, p0..p{out_dim-1})``: Johnson-Lindenstrauss reduction
    with a deterministic Achlioptas ±1 sign matrix (Achlioptas 2003,
    "Database-friendly random projections") — proj_j = (1/sqrt(d'))
    * Σ_k sign(j,k)·v_k. The standard pre-stage for the ANN family
    (e1-e9): distances are preserved within (1±ε) w.h.p. while the
    per-vector footprint drops in_dim/out_dim-fold, which at 100 TB
    is the difference between an embedding table that fits the
    shuffle tier and one that doesn't.

    Execution shape: the whole operator is ONE scan-stage projection —
    out_dim codegen'd ±-chains over the array column, zero shuffles,
    zero UDFs, zero runtime hashing (the sign matrix is literal in
    the plan; see :func:`_rp_sign`). The DuckDB oracle renders the
    SAME left-associated chains 1-based (``random_projection_sql``),
    so every double add happens in the same order and the output
    hashes bitwise with no rounding.

    Output shape: ``out_dim`` scalar DOUBLE columns ``p0…p{d'-1}``,
    NOT an ``array<double>`` — the driver's pandas canonicalizer
    cannot hash array cells (the r5 red; same contract that converted
    p11/p15/p16 in r4). Downstream consumers that want the array form
    re-assemble with ``F.array("p0", …)``.
    """
    import math

    scale = repr(1.0 / math.sqrt(out_dim))
    cols = [
        F.expr(f"({_rp_terms(seed, j, in_dim, lambda k: f'{vec_col}[{k}]')}"
               f") * {scale}").alias(f"p{j}")
        for j in range(out_dim)]
    return (emb.where(F.size(vec_col) >= in_dim)
            .select(F.col(id_col).alias("id"), *cols))


def random_projection_sql(table: str = "embeddings",
                          id_col: str = "vec_id",
                          vec_col: str = "embedding", in_dim: int = 64,
                          out_dim: int = 16, seed: int = 0) -> str:
    """DuckDB twin of :func:`random_projection` (1-based list access,
    same literal sign chains and scale; scalar ``p0…`` columns, never
    an array — see the output-shape note on the Spark side)."""
    import math

    scale = repr(1.0 / math.sqrt(out_dim))
    chains = ", ".join(
        f"({_rp_terms(seed, j, in_dim, lambda k: f'{vec_col}[{k + 1}]')}"
        f") * {scale} AS p{j}"
        for j in range(out_dim))
    return (f"SELECT {id_col} AS id, {chains} FROM {table} "
            f"WHERE len({vec_col}) >= {in_dim}")


def mmr_topk(
    emb: DataFrame, query_vec: Sequence[float], k: int = 5,
    lam: float = 0.7, id_col: str = "vec_id",
    vec_col: str = "embedding", exclude_id: Optional[int] = None,
) -> DataFrame:
    """``(step, id, rel, mmr)``: Maximal-Marginal-Relevance
    diversified top-k (Carbonell & Goldstein 1998) — greedily pick
    the candidate maximizing ``lam·cos(q, i) − (1−lam)·max_{s∈S}
    cos(i, s)`` over the already-selected set S (empty-set penalty 0,
    so step 1 is plain relevance argmax); ties break on id. The
    retrieval-diversification step a RAG stack runs after e1/e4:
    top-k by relevance alone returns k near-copies of the same
    passage. Every cosine is quantized to 9 decimals before the
    greedy comparison so the selection is ENGINE-STABLE: scores
    within summation-order noise collapse to equal and the id
    tiebreak decides, identically here and in the SQL oracle.

    100 TB shape: k bounded driver iterations; each is ONE linear
    scan of the scored candidate frame (Arrow-batched numpy cosine,
    the e1 scoring path) with the ≤k selected vectors embedded as
    broadcast literals, and the argmax is orderBy+limit(1) =
    TakeOrderedAndProject (per-partition top-1, O(partitions) rows to
    the driver — no sort, no shuffle). The (id, vec, rel) frame is
    computed once and localCheckpoint-pinned: k+1 consumers, the §17
    multi-consumer rule. Pre-filter with e4's IVF probe to keep the
    per-step scan off the full corpus when k·scans matter.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    cand = drop_undefined(emb, vec_col)
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != int(exclude_id))
    q = _vec_lit(query_vec)
    # every cosine is QUANTIZED to 9 decimals before it enters the
    # greedy comparison: two engines summing in different orders
    # (numpy pairwise vs sequential) disagree in the last ulps, and an
    # unrounded argmax would let that sub-ulp noise flip a pick and
    # diverge every later step. At 9 dp, near-ties collapse to equal
    # scores and the id tiebreak decides identically everywhere.
    base = (cand.select(F.col(id_col).alias("id"),
                        F.col(vec_col).alias("v"),
                        F.round(cosine_batch()(F.col(vec_col), q), 9)
                        .alias("rel"))
            .localCheckpoint(eager=True))
    picked = []    # (step, id, rel, mmr, vec)
    for step in range(1, int(k) + 1):
        rest = base.where(
            ~F.col("id").isin([p[1] for p in picked]) if picked
            else F.lit(True))
        if picked:
            sims = [F.round(cosine_batch()(F.col("v"), _vec_lit(p[4])),
                            9) for p in picked]
            pen = F.greatest(*sims) if len(sims) > 1 else sims[0]
            scored = rest.select(
                "id", "rel", "v",
                (F.lit(float(lam)) * F.col("rel")
                 - F.lit(1.0 - float(lam)) * pen).alias("mmr"))
        else:
            scored = rest.select(
                "id", "rel", "v",
                (F.lit(float(lam)) * F.col("rel")).alias("mmr"))
        best = (scored.orderBy(F.col("mmr").desc(), F.col("id").asc())
                .limit(1).first())
        if best is None:
            break
        picked.append((step, best["id"], float(best["rel"]),
                       float(best["mmr"]), list(best["v"])))
    spark = emb.sparkSession
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)
    schema = StructType([
        StructField("step", LongType()),
        StructField("id", emb.schema[id_col].dataType),
        StructField("rel", DoubleType()),
        StructField("mmr", DoubleType())])
    return spark.createDataFrame(
        [(s, i, r, m) for s, i, r, m, _ in picked], schema)
