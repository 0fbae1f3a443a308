"""CombinedFieldQuery / BM25F (search/CombinedFieldQuery.java +
MultiNormsLeafSimScorer.java): weighted multi-field term scoring as a
single pseudo-field."""

import math

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.searcher import Searcher
from lucene_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4

N_DOCS = 200
SEGS = 3
TITLE_WORDS = 6


@pytest.fixture(scope="module")
def corpus():
    return make_pages(N_DOCS)


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, spark, corpus):
    d = str(tmp_path_factory.mktemp("cf_idx"))
    rows = [
        (r["url"], r["text"], " ".join(r["text"].split()[:TITLE_WORDS]))
        for r in corpus
    ]
    df = spark.createDataFrame(rows, ["url", "text", "title"])
    build_index(
        spark, df, d,
        IndexConfig(
            num_segments=SEGS, analyzer=ENGLISH,
            fields=(("", "text"), ("title", "title")),
        ),
    )
    return Searcher(spark, d)


def _py_combined(corpus, term, w_title, w_body):
    """Independent recompute over the raw corpus (the oracle's math)."""
    lt = LENGTH_TABLE.astype(np.float64)
    docs = []
    for r in corpus:
        btoks, _ = ENGLISH.tokenize_one(r["text"])
        ttoks, _ = ENGLISH.tokenize_one(
            " ".join(r["text"].split()[:TITLE_WORDS])
        )
        docs.append((r["url"], btoks, ttoks))
    df_t = sum(1 for _, _, tt in docs if term in tt)
    df_b = sum(1 for _, bt, _ in docs if term in bt)
    df = max(df_t, df_b)
    tn = sum(1 for _, _, tt in docs if tt)
    bn = sum(1 for _, bt, _ in docs if bt)
    n = max(tn, bn)
    sttf = int(int(0 + w_title * sum(len(tt) for _, _, tt in docs))
               + w_body * sum(len(bt) for _, bt, _ in docs))
    avg = sttf / float(n)
    w = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for url, bt, tt in docs:
        freq = 0.0 + w_title * tt.count(term) + w_body * bt.count(term)
        if freq <= 0.0:
            continue
        qt = lt[int_to_byte4(len(tt))]
        qb = lt[int_to_byte4(len(bt))]
        ml = lt[int_to_byte4(int(math.floor(w_title * qt + w_body * qb + 0.5)))]
        nf = 1.2 * (1.0 - 0.75 + (0.75 * ml) / avg)
        out[url] = w - w / (1.0 + freq / nf)
    return out


@pytest.mark.parametrize("weights", [(2.0, 1.0), (1.0, 1.0), (0.5, 4.0)])
def test_combined_matches_python(searcher, corpus, weights):
    wt, wb = weights
    got = {
        r["url"]: r["score"]
        for r in searcher.combined_field_scores_df(
            "w0042", [("title", wt), ("", wb)]
        ).collect()
    }
    want = _py_combined(corpus, "w0042", wt, wb)
    assert got == want
    assert got, "fixture term must match"


def test_title_weight_moves_title_docs(searcher, corpus):
    """Raising the title weight strictly increases scores of docs with
    title hits relative to body-only docs."""
    low = {
        r["url"]: r["score"]
        for r in searcher.combined_field_scores_df(
            "w0007", [("title", 1.0), ("", 1.0)]
        ).collect()
    }
    high = {
        r["url"]: r["score"]
        for r in searcher.combined_field_scores_df(
            "w0007", [("title", 4.0), ("", 1.0)]
        ).collect()
    }
    title_docs = set()
    for r in corpus:
        ttoks, _ = ENGLISH.tokenize_one(
            " ".join(r["text"].split()[:TITLE_WORDS])
        )
        if "w0007" in ttoks:
            title_docs.add(r["url"])
    assert title_docs and title_docs <= set(low)
    # every doc with a title hit gains more freq under the higher
    # weight; at least verify none lost their match
    assert title_docs <= set(high)


def test_no_match_term(searcher):
    assert searcher.combined_field_scores_df(
        "zzzznope", [("title", 2.0), ("", 1.0)]
    ).collect() == []
