"""operators/dsir.py: importance weights + Gumbel top-k resampling,
checked against a pure-Python reference implementation (same md5
bucket hash, Laplace smoothing, and Gumbel key construction)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rust_graph_db_spark.operators.dsir import (
    dsir_logweights,
    dsir_resample,
    hashed_ngram_dist,
)

RAW = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "stream table join filter query"),
    (3, "query filter join table stream stream"),
    (4, "the cat ate the fish"),
]
TARGET = [(100, "the cat sat"), (101, "the cat ate the fish today")]
B = 64


def _bucket(g):
    h = hashlib.md5(f"dsir:{g}".encode()).hexdigest()
    return int(h[:15], 16) % B


def _feats(text):
    toks = text.lower().split()
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(g) for g in grams]


def _py_logweights():
    tc, rc = {}, {}
    for _, t in TARGET:
        for b in _feats(t):
            tc[b] = tc.get(b, 0) + 1
    for _, t in RAW:
        for b in _feats(t):
            rc[b] = rc.get(b, 0) + 1
    tn, rn = sum(tc.values()), sum(rc.values())
    out = {}
    for did, t in RAW:
        s = 0.0
        for b in _feats(t):
            s += (math.log((tc.get(b, 0) + 1.0) / (tn + B))
                  - math.log((rc.get(b, 0) + 1.0) / (rn + B)))
        out[did] = (len(_feats(t)), s)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id LONG, text STRING")
    tgt = spark.createDataFrame(TARGET, "doc_id LONG, text STRING")
    return raw, tgt


def test_hashed_ngram_dist_matches_reference(spark, frames):
    raw, _ = frames
    got = {r.bucket: r.cnt
           for r in hashed_ngram_dist(raw, buckets=B).collect()}
    want = {}
    for _, t in RAW:
        for b in _feats(t):
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_dsir_logweights_match_reference(spark, frames):
    raw, tgt = frames
    got = {r.doc_id: (r.n_feats, r.logw)
           for r in dsir_logweights(raw, tgt, buckets=B).collect()}
    want = _py_logweights()
    assert set(got) == set(want)
    for did, (nf, lw) in want.items():
        assert got[did][0] == nf
        assert abs(got[did][1] - round(lw, 4)) <= 1e-4, (did, got[did], lw)
    # target-like docs outrank the disjoint-vocabulary ones
    target_like = {0, 4}
    others = {2, 3}
    assert min(got[d][1] for d in target_like) > \
        max(got[d][1] for d in others)


def test_dsir_resample_deterministic_topk(spark, frames):
    raw, tgt = frames
    a = dsir_resample(raw, tgt, k=3, buckets=B, seed=9).collect()
    b = dsir_resample(raw, tgt, k=3, buckets=B, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3
    # keys must equal logw - ln(-ln(u)) with the md5-derived uniform
    want_lw = _py_logweights()
    for r in a:
        h = hashlib.md5(f"9:{r.doc_id}".encode()).hexdigest()
        u = ((int(h[:15], 16) % (1 << 20)) + 0.5) / float(1 << 20)
        want_key = want_lw[r.doc_id][1] - math.log(-math.log(u))
        assert abs(r.key - round(want_key, 4)) <= 1e-4
    # a different seed reshuffles the Gumbel noise (keys change)
    c = dsir_resample(raw, tgt, k=3, buckets=B, seed=10).collect()
    assert {r.doc_id: r.key for r in c} != {r.doc_id: r.key for r in a}


def test_dsir_empty_text_scores_zero(spark, frames):
    _, tgt = frames
    raw = spark.createDataFrame(RAW + [(9, ""), (10, "  ")],
                                "doc_id LONG, text STRING")
    got = {r.doc_id: (r.n_feats, r.logw)
           for r in dsir_logweights(raw, tgt, buckets=B).collect()}
    # '' tokens are filtered (mirrors the oracle): empty/whitespace
    # docs contribute NO features and score exactly 0
    assert got[9] == (0, 0.0)
    assert got[10] == (0, 0.0)
