"""Regression tests for the round-1 ADVICE findings:

1. boosted BooleanQuery containing NOT/filter clauses must not crash
   (scorer registration keyed per-clause boost) and must match the
   oracle;
2. ConstantScoreQuery.boost is honored (score = path_boost * q.boost);
3. streaming appends carry EVERY IndexConfig field (doc_base_mode /
   doc_stride survive dataclasses.replace);
4. append_batch publishes exactly ONE commit per generation (no
   truncated intermediate commit a concurrent reader could observe);
5. the vectorized tokenizer falls back to the object path when any
   token exceeds its 256-char hash window.
"""

import json
import os

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.fixtures import make_pages
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import ast
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.parser import parse

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus, num_segments=3, analyzer=ENGLISH)


@pytest.fixture(scope="module")
def engine(corpus):
    return LocalIndex.build(corpus, num_segments=3, analyzer=ENGLISH)


def _match(engine, oracle, q, k=10):
    expected = oracle.top_k(q, k=k)
    got = engine.search(q, k=k, pruned=True)
    assert len(got) == len(expected), (q, got, expected)
    for (gd, gs, gu), (ed, es, eu) in zip(got, expected):
        assert gd == ed and gu == eu, (q, got, expected)
        assert np.float32(gs) == np.float32(es), (q, gs, es)


def test_boosted_boolean_with_not(engine, oracle):
    """(a NOT b)^2 — previously KeyError in the kernel (must_not scorer
    registered under the boosted key, evaluated under boost=1)."""
    q = parse("(w0000 NOT w0001)^2", ENGLISH)
    _match(engine, oracle, q)


def test_boosted_boolean_with_filter(engine, oracle):
    q = ast.BoostQuery(
        ast.BooleanQuery(
            must=(ast.TermQuery("w0000"),),
            filter=(ast.TermQuery("w0002"),),
        ),
        2.0,
    )
    _match(engine, oracle, q)


def test_constant_score_boost_honored(engine, oracle):
    """ConstantScoreQuery(q, 3.0): matching docs score 3.0 (not 1.0)."""
    q = ast.ConstantScoreQuery(ast.TermQuery("w0000"), boost=3.0)
    got = engine.search(q, k=5, pruned=True)
    assert got, "fixture term must match"
    assert all(s == 3.0 for _, s, _ in got)
    _match(engine, oracle, q)
    # path boost composes multiplicatively
    q2 = ast.BoostQuery(ast.ConstantScoreQuery(ast.TermQuery("w0000"), 3.0), 2.0)
    got2 = engine.search(q2, k=5, pruned=True)
    assert all(s == 6.0 for _, s, _ in got2)
    _match(engine, oracle, q2)


def test_vectorized_tokenizer_long_token_fallback():
    """Tokens beyond the 256-char hash window must take the object path
    (identical output), not silently conflate distinct tokens."""
    a = Analyzer(vectorized=True, max_token_length=1000)
    b = Analyzer(vectorized=False, max_token_length=1000)
    # two distinct 300-char tokens sharing their first 256 chars with
    # equal length — the clamped-hash worst case
    t1 = "x" * 256 + "ab" * 22
    t2 = "x" * 256 + "ba" * 22
    texts = [f"{t1} hello", f"{t2} world", "short doc"]
    ra = a.tokenize_batch_coded(texts)
    rb = b.tokenize_batch_coded(texts)
    assert list(ra[2]) == list(rb[2])  # same unique term set (t1 != t2)
    assert t1 in list(ra[2]) and t2 in list(ra[2])
    np.testing.assert_array_equal(ra[1], rb[1])


def test_append_batch_carries_config_fields(spark, tmp_path_factory, corpus):
    """Strided doc_base mode must survive append_batch (previously
    reverted to counted, mixing dense ids into the strided space)."""
    from lucene_spark.index.builder import IndexConfig, read_latest_commit
    from lucene_spark.streaming.nrt import append_batch

    d = str(tmp_path_factory.mktemp("nrt_strided"))
    cfg = IndexConfig(
        num_segments=2, analyzer=ENGLISH, doc_base_mode="strided", doc_stride=1 << 20
    )
    df1 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:60]], ["url", "text"]
    )
    df2 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[60:120]], ["url", "text"]
    )
    append_batch(spark, df1, d, cfg)
    append_batch(spark, df2, d, cfg)
    commit = read_latest_commit(d)
    # every segment's doc_base must be offset + pid * stride (strided),
    # never a dense count
    bases = sorted(s["doc_base"] for s in commit["segments"])
    stride = 1 << 20
    gen2_bases = [s["doc_base"] for s in commit["segments"] if s["segment_id"].startswith("g0002")]
    # appends base past the MAX SEGMENT END of the previous commit (not
    # its doc_count, which a reclaiming merge can shrink below a live
    # segment's end — the round-5 id-overlap fix in streaming/nrt.py)
    max_end_gen1 = max(
        s["doc_base"] + s["num_docs"]
        for s in commit["segments"]
        if s["segment_id"].startswith("g0001")
    )
    for b in gen2_bases:
        assert b >= max_end_gen1  # no overlap with gen-1 id ranges
        assert (b - max_end_gen1) % stride == 0  # still strided
    assert len(set(bases)) == len(bases)  # no doc-id range collisions
    # strided id ranges must be disjoint across ALL segments
    spans = sorted(
        (s["doc_base"], s["doc_base"] + s["num_docs"])
        for s in commit["segments"]
    )
    for (a0, a1), (b0, _) in zip(spans, spans[1:]):
        assert a1 <= b0


def test_append_batch_single_commit_per_generation(spark, tmp_path_factory, corpus):
    """The commit dir must contain one complete commit per generation;
    generation N's commit must include ALL segments of generations <= N
    (no truncated intermediate publish)."""
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.streaming.nrt import append_batch

    d = str(tmp_path_factory.mktemp("nrt_atomic"))
    cfg = IndexConfig(num_segments=2, analyzer=ENGLISH)
    df1 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:60]], ["url", "text"]
    )
    df2 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[60:120]], ["url", "text"]
    )
    append_batch(spark, df1, d, cfg)
    append_batch(spark, df2, d, cfg)
    cdir = os.path.join(d, "commits")
    gens = sorted(f for f in os.listdir(cdir) if f.startswith("gen_"))
    assert gens == ["gen_000001.json", "gen_000002.json"]
    with open(os.path.join(cdir, "gen_000002.json")) as f:
        c2 = json.load(f)
    sids = {s["segment_id"] for s in c2["segments"]}
    assert any(s.startswith("g0001") for s in sids)
    assert any(s.startswith("g0002") for s in sids)
    assert c2["doc_count"] == 120
