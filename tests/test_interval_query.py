"""IntervalQuery through the engine planes: Spark pruned == Spark
exhaustive == serving plane, scores pinned by an independent
text-derived oracle, boolean composition, deletes, and the f64 mirror
vs the DuckDB-shaped minimal-pair formula (the gate entry's shape)."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher


@pytest.fixture(scope="module")
def iq_idx(spark, tmp_path_factory):
    corpus = make_pages(200)
    d = str(tmp_path_factory.mktemp("iq_idx"))
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    return spark, d, corpus


QUERY_ZOO = [
    ast.IntervalQuery("", iv.ordered(iv.term("w0007"), iv.term("w0042"))),
    ast.IntervalQuery("", iv.unordered(iv.term("w0007"), iv.term("w0042"))),
    ast.IntervalQuery(
        "", iv.maxgaps(3, iv.unordered(iv.term("w0007"), iv.term("w0042")))
    ),
    ast.IntervalQuery(
        "", iv.or_(iv.term("w0007"), iv.phrase("w0042", "w0100"))
    ),
    ast.IntervalQuery(
        "",
        iv.not_containing(
            iv.unordered(iv.term("w0007"), iv.term("w0042")), iv.term("w0100")
        ),
    ),
    ast.IntervalQuery(
        "", iv.ordered(iv.term("w0007"), iv.term("w0042")), pivot=2.5
    ),
    ast.IntervalQuery(
        "", iv.ordered(iv.term("w0007"), iv.term("w0042")), pivot=1.5, exp=2.0
    ),
    ast.BoostQuery(
        ast.IntervalQuery("", iv.unordered(iv.term("w0007"), iv.term("w0042"))),
        3.0,
    ),
    ast.BooleanQuery(
        must=(
            ast.TermQuery("w0012"),
            ast.IntervalQuery(
                "", iv.unordered(iv.term("w0007"), iv.term("w0042"))
            ),
        )
    ),
    ast.BooleanQuery(
        should=(
            ast.TermQuery("w0100"),
            ast.IntervalQuery(
                "", iv.maxgaps(5, iv.ordered(iv.term("w0007"), iv.term("w0042")))
            ),
        ),
        min_should_match=1,
    ),
]


def test_planes_and_pruning_identical(iq_idx):
    spark, d, _ = iq_idx
    s = Searcher(spark, d)
    ls = LocalSearcher(d)
    for q in QUERY_ZOO:
        a = [(r["doc_id"], r["score"]) for r in s.search(q, k=12, pruned=True).collect()]
        b = [(r["doc_id"], r["score"]) for r in s.search(q, k=12, pruned=False).collect()]
        c = [(doc, sc) for doc, sc, _ in ls.search(q, k=12)]
        assert a == b == c, q
        assert len(a) > 0, f"zoo query matched nothing: {q}"


def _expected_scores(corpus, source, pivot=1.0, exp=None, boost=1.0):
    """Independent per-doc oracle straight from the fixture TEXT (not
    the index): tokenize, build term->positions, run the golden-pinned
    enumerator, apply the f32 scoring contract."""
    out = {}
    for r in corpus:
        terms, positions = ENGLISH.tokenize_one(r["text"])
        pos_of: dict = {}
        for t, p in zip(terms, positions):
            pos_of.setdefault(t, []).append(p)
        f = iv.interval_freq(source, pos_of)
        if f > 0:
            out[r["url"]] = (
                iv.saturation_score(f, boost, pivot)
                if exp is None
                else iv.sigmoid_score(f, boost, pivot, exp)
            )
    return out


def test_scores_match_text_oracle(iq_idx):
    spark, d, corpus = iq_idx
    s = Searcher(spark, d)
    src = iv.maxgaps(4, iv.ordered(iv.term("w0007"), iv.term("w0042")))
    q = ast.IntervalQuery("", src, pivot=1.0)
    got = {
        r["url"]: r["score"]
        for r in s.score_docs_df(q, dtype="f32").collect()
    }
    want = _expected_scores(corpus, src)
    assert got == want and len(got) > 0


def test_deletes_respected(spark, tmp_path):
    from lucene_spark.index.deletes import delete_docs

    corpus = make_pages(120)
    d = str(tmp_path / "iq_del")
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=2, analyzer=ENGLISH),
    )
    s0 = Searcher(spark, d)
    q = ast.IntervalQuery("", iv.unordered(iv.term("w0007"), iv.term("w0042")))
    before = {r["url"] for r in s0.match_docs(q).collect()}
    assert before
    dead = sorted(before)[:2]
    delete_docs(spark, d, keys=dead)
    after = {r["url"] for r in Searcher(spark, d).match_docs(q).collect()}
    assert after == before - set(dead)


def test_f64_mirror_matches_minimal_pair_formula(iq_idx):
    """The gate-entry shape: for ordered(t1, t2) the f64 score equals
    the closed-form minimal-pair sum (b = min p2 > a, no p1 inside)."""
    spark, d, corpus = iq_idx
    s = Searcher(spark, d)
    q = ast.IntervalQuery("", iv.ordered(iv.term("w0007"), iv.term("w0042")))
    got = {
        r["url"]: r["score"]
        for r in s.score_docs_df(q, dtype="f64").collect()
    }
    want = {}
    for r in corpus:
        terms, positions = ENGLISH.tokenize_one(r["text"])
        p1 = [p for t, p in zip(terms, positions) if t == "w0007"]
        p2 = [p for t, p in zip(terms, positions) if t == "w0042"]
        f = 0.0
        for a in p1:
            later = [b for b in p2 if b > a]
            if not later:
                continue
            b = min(later)
            if any(a < a2 < b for a2 in p1):
                continue
            f += 1.0 / max(b - a, 1)
        if f > 0:
            want[r["url"]] = 1.0 - 1.0 / (1.0 + f)
    assert got == want and len(got) > 0


def test_empty_and_missing_terms(iq_idx):
    spark, d, _ = iq_idx
    s = Searcher(spark, d)
    q = ast.IntervalQuery("", iv.ordered(iv.term("zzznope"), iv.term("w0042")))
    assert s.search(q, k=5).collect() == []
    q2 = ast.IntervalQuery("", iv.no_intervals("nothing"))
    assert s.search(q2, k=5).collect() == []


def test_multiterm_interval_sources_through_planes(iq_idx):
    """MultiTerm interval leaves expand per segment against the scanned
    dictionary (the scan predicate comes from the multi_term_leaves
    hook) — identical across pruned/exhaustive/serving."""
    spark, d, corpus = iq_idx
    s = Searcher(spark, d)
    ls = LocalSearcher(d)
    zoo = [
        ast.IntervalQuery(
            "", iv.ordered(iv.prefix("w004"), iv.term("w0007"))
        ),
        ast.IntervalQuery(
            "", iv.maxgaps(4, iv.unordered(iv.fuzzy_term("w0042", 1),
                                           iv.term("w0007")))
        ),
        ast.IntervalQuery("", iv.wildcard("w004?")),
    ]
    for q in zoo:
        a = [(r["doc_id"], r["score"]) for r in s.search(q, k=10, pruned=True).collect()]
        b = [(r["doc_id"], r["score"]) for r in s.search(q, k=10, pruned=False).collect()]
        c = [(doc, sc) for doc, sc, _ in ls.search(q, k=10)]
        assert a == b == c, q
        assert a, f"matched nothing: {q}"
    # text-derived oracle for the wildcard disjunction: expand against
    # the corpus vocabulary by the same matcher, then score
    from lucene_spark.search.kernels import expand_interval_source

    vocab: set = set()
    pos_by_url = {}
    for r in corpus:
        terms, positions = ENGLISH.tokenize_one(r["text"])
        po: dict = {}
        for t, p in zip(terms, positions):
            po.setdefault(t, []).append(p)
        pos_by_url[r["url"]] = po
        vocab |= set(po)
    src = expand_interval_source(sorted(vocab), iv.wildcard("w004?"), "")
    want = {
        url: iv.saturation_score(f, 1.0, 1.0)
        for url, po in pos_by_url.items()
        if (f := iv.interval_freq(src, po)) > 0
    }
    got = {
        r["url"]: r["score"]
        for r in s.score_docs_df(
            ast.IntervalQuery("", iv.wildcard("w004?")), dtype="f32"
        ).collect()
    }
    assert got == want and got


def test_interval_highlighting():
    """Interval sources highlight their in-span term occurrences
    (matches-API model): only occurrences inside an enumerated span
    wrap."""
    import re

    from lucene_spark.analysis.analyzer import Analyzer
    from lucene_spark.search.highlight import highlight_text

    a = Analyzer(stopwords=frozenset())
    text = "alpha gap gap gap gap beta alpha beta gamma"
    q = ast.IntervalQuery(
        "", iv.maxgaps(2, iv.ordered(iv.term("alpha"), iv.term("beta")))
    )
    snip = highlight_text(text, q, a, passage_tokens=50)
    # only the adjacent pair is in a surviving span; the leading alpha
    # (gaps 4 to its beta) stays unwrapped
    assert snip.count("<b>alpha</b>") == 1
    assert snip.count("<b>beta</b>") == 1
    assert re.sub("</?b>", "", snip).strip(".") in text
    # no span at all -> no snippet
    q2 = ast.IntervalQuery(
        "", iv.maxgaps(0, iv.ordered(iv.term("beta"), iv.term("gamma")))
    )
    assert highlight_text("beta gap gamma", q2, a) is None
    # multi-term interval source highlights via doc-vocab expansion
    q3 = ast.IntervalQuery(
        "", iv.maxgaps(1, iv.ordered(iv.prefix("alp"), iv.term("gamma")))
    )
    snip3 = highlight_text(text, q3, a, passage_tokens=50)
    assert "<b>alpha</b>" in snip3 and "<b>gamma</b>" in snip3


def test_interval_explain_root_matches_search(iq_idx):
    _, d, _ = iq_idx
    ls = LocalSearcher(d)
    q = ast.IntervalQuery(
        "", iv.maxgaps(4, iv.unordered(iv.term("w0007"), iv.term("w0042")))
    )
    top = ls.search(q, k=5)
    assert top
    for doc, score, _ in top:
        ex = ls.explain(q, doc)
        assert ex["match"] is True or ex["match"] == 1
        assert ex["value"] == score
        descs = [c["description"] for c in ex["details"]]
        assert any(d0.startswith("S, the sloppy frequency") for d0 in descs)
    # non-matching doc explains as no match
    all_docs = {doc for doc, _, _ in ls.search(q, k=1000)}
    probe = 0
    while probe in all_docs:
        probe += 1
    ex = ls.explain(q, probe)
    assert not ex["match"] and ex["value"] == 0.0


def test_interval_direct_executor_identity(iq_idx):
    """The one-stage direct executor (task-side pyarrow reads) returns
    the same hits for interval queries — its term fetch covers both the
    concrete source terms (query_terms) and multi-term leaf expansions
    (multi_term_leaves)."""
    spark, d, _ = iq_idx
    s = Searcher(spark, d)
    for q in [
        ast.IntervalQuery("", iv.ordered(iv.term("w0007"), iv.term("w0042"))),
        ast.IntervalQuery(
            "", iv.maxgaps(3, iv.unordered(iv.prefix("w004"), iv.term("w0007")))
        ),
    ]:
        a = [(r["doc_id"], r["score"]) for r in s.search(q, k=8).collect()]
        b = [
            (r["doc_id"], r["score"])
            for r in s.search(q, k=8, direct=True).collect()
        ]
        assert a == b and a


def test_interval_sharded_batch_parity(iq_idx):
    """Interval ASTs through the sharded serving batch path (pickled to
    pool workers) match the single-process searcher."""
    from lucene_spark.search.serve import ShardedSearcher

    _, d, _ = iq_idx
    queries = {
        "o": ast.IntervalQuery("", iv.ordered(iv.term("w0007"), iv.term("w0042"))),
        "m": ast.IntervalQuery(
            "", iv.maxgaps(3, iv.unordered(iv.prefix("w004"), iv.term("w0007")))
        ),
    }
    ss = ShardedSearcher(d, shards=2)
    try:
        got = ss.search_many(queries, k=8)
    finally:
        ss.close()
    ls = LocalSearcher(d)
    for qid, q in queries.items():
        assert got[qid] == ls.search(q, k=8)
        assert got[qid]


def test_two_term_batch_equals_generic_path(iq_idx, monkeypatch):
    """Force the generic iterator path and compare against the
    across-docs batch path over the whole match set in both dtypes —
    bit identity, not approximation. Runs through LocalSearcher: the
    kernels execute IN-PROCESS there, so the module flag is effective
    (a driver-side flag would not reach Spark's Python workers)."""
    import lucene_spark.search.kernels as K

    _, d, _ = iq_idx
    ls = LocalSearcher(d)
    zoo = [
        ast.IntervalQuery("", iv.ordered(iv.term("w0007"), iv.term("w0042"))),
        ast.IntervalQuery(
            "", iv.maxgaps(2, iv.unordered(iv.term("w0007"), iv.term("w0042"))),
            pivot=1.5,
        ),
        ast.IntervalQuery(
            "", iv.ordered(iv.term("w0012"), iv.term("w0100")), pivot=2.0,
            exp=1.5,
        ),
        ast.IntervalQuery(
            "",
            iv.unordered(iv.term("w0007"), iv.term("w0042"), iv.term("w0012")),
        ),
        ast.IntervalQuery(
            "",
            iv.maxgaps(6, iv.unordered(iv.term("w0007"), iv.term("w0042"),
                                       iv.term("w0100"))),
        ),
        ast.IntervalQuery(
            "",
            iv.ordered(iv.term("w0007"), iv.term("w0042"), iv.term("w0012")),
        ),
        ast.IntervalQuery(
            "",
            iv.maxgaps(40, iv.ordered(iv.term("w0007"), iv.term("w0012"),
                                     iv.term("w0100"))),
        ),
        ast.IntervalQuery("", iv.phrase("w0007", "w0042")),
        ast.IntervalQuery(
            "",
            iv.maxgaps(30, iv.ordered(iv.phrase("w0007", "w0042"),
                                      iv.term("w0100"))),
        ),
        ast.IntervalQuery(
            "",
            iv.ordered(iv.term("w0012"), iv.phrase("w0007", "w0042")),
        ),
        ast.IntervalQuery(
            "",
            iv.maxgaps(25, iv.unordered(iv.phrase("w0007", "w0042"),
                                        iv.term("w0100"))),
        ),
        ast.IntervalQuery(
            "",
            iv.maxgaps(8, iv.unordered(iv.or_(iv.term("w0007"), iv.term("w0012")),
                                       iv.term("w0042"))),
        ),
        ast.IntervalQuery(
            "",
            iv.ordered(iv.or_(iv.term("w0007"), iv.term("w0100")),
                       iv.term("w0042")),
        ),
    ]
    for q in zoo:
        for dtype in ("f32", "f64"):
            assert not K._INTERVAL_FAST_OFF
            fast = ls.search(q, k=100000, dtype=dtype)
            monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", True)
            slow = ls.search(q, k=100000, dtype=dtype)
            monkeypatch.setattr(K, "_INTERVAL_FAST_OFF", False)
            assert fast == slow and fast, (q, dtype)


def test_interval_results_stable_across_merges(spark, tmp_path):
    """Interval scores are a pure function of the (live) postings —
    concat merge and squeeze merge must not change them."""
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.index.merge import force_merge

    corpus = make_pages(120)
    d = str(tmp_path / "iq_merge")
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    q = ast.IntervalQuery(
        "", iv.maxgaps(5, iv.unordered(iv.term("w0007"), iv.term("w0042")))
    )
    s0 = Searcher(spark, d)
    base = {(r["url"], r["score"]) for r in s0.score_docs_df(q, dtype="f32").collect()}
    assert base
    dead = sorted({u for u, _ in base})[:2]
    delete_docs(spark, d, keys=dead)
    force_merge(spark, d)
    after_concat = {
        (r["url"], r["score"])
        for r in Searcher(spark, d).score_docs_df(q, dtype="f32").collect()
    }
    assert after_concat == {(u, sc) for u, sc in base if u not in dead}
    force_merge(spark, d, squeeze=True)
    after_squeeze = {
        (r["url"], r["score"])
        for r in Searcher(spark, d).score_docs_df(q, dtype="f32").collect()
    }
    assert after_squeeze == after_concat


def test_random_nested_trees_plane_identity(iq_idx):
    """Randomized DEEP interval trees (nested combinators that fall off
    the sweep fast paths) stay identical across pruned/exhaustive/
    serving — coverage for the generic per-doc iterator plane."""
    import random

    spark, d, _ = iq_idx
    s = Searcher(spark, d)
    ls = LocalSearcher(d)
    rng = random.Random(101)
    vocab = ["w0007", "w0012", "w0042", "w0100", "w0200", "w0001"]

    def rand_source(depth):
        if depth == 0 or rng.random() < 0.35:
            return iv.term(rng.choice(vocab))
        kind = rng.choice(
            ["ordered", "unordered", "or", "maxgaps", "containing",
             "not_containing", "within", "at_least"]
        )
        if kind == "ordered":
            return iv.ordered(rand_source(depth - 1), rand_source(depth - 1))
        if kind == "unordered":
            return iv.unordered(rand_source(depth - 1), rand_source(depth - 1))
        if kind == "or":
            return iv.or_(rand_source(depth - 1), rand_source(depth - 1))
        if kind == "maxgaps":
            return iv.maxgaps(rng.randint(0, 12), rand_source(depth - 1))
        if kind == "containing":
            return iv.containing(
                iv.unordered(rand_source(depth - 1), rand_source(depth - 1)),
                rand_source(depth - 1),
            )
        if kind == "not_containing":
            return iv.not_containing(
                iv.unordered(rand_source(depth - 1), rand_source(depth - 1)),
                rand_source(depth - 1),
            )
        if kind == "within":
            return iv.within(
                rand_source(depth - 1), rng.randint(1, 8),
                rand_source(depth - 1),
            )
        return iv.at_least(
            2, rand_source(depth - 1), rand_source(depth - 1),
            rand_source(depth - 1),
        )

    matched = 0
    for trial in range(12):
        q = ast.IntervalQuery("", rand_source(2), pivot=1.0)
        a = [(r["doc_id"], r["score"]) for r in s.search(q, k=15, pruned=True).collect()]
        b = [(r["doc_id"], r["score"]) for r in s.search(q, k=15, pruned=False).collect()]
        c = [(doc, sc) for doc, sc, _ in ls.search(q, k=15)]
        assert a == b == c, (trial, q)
        matched += bool(a)
    assert matched >= 4  # the tree zoo is not degenerate
