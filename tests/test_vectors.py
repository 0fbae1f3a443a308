"""Term vectors: the TermVectorsFormat analog (doc-major per-field
(term, position, char-span) streams, ``codecs/lucene90/
Lucene90CompressingTermVectorsFormat.java`` role) and the highlighter's
TERM_VECTORS offset source (``uhighlight/UnifiedHighlighter.java``
OffsetSource.TERM_VECTORS / ``uhighlight/TermVectorOffsetStrategy.java``).

Checks: the stored stream equals re-analysis exactly, both offset
sources produce byte-identical snippets on every plane, vectors are
carried through concat and squeeze merges and cleaned by vacuum, and
CheckIndex validates the vector invariants."""

import os

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.index.check import check_index
from lucene_spark.search.searcher import Searcher
from lucene_spark.search.serve import LocalSearcher

QUERIES = [
    "w0042",
    "w0007 AND w0042",
    "w0012 OR w0042 OR w0100",
    '"w0007 w0042"',
    "w004*",
    "w0042~1",
]


@pytest.fixture(scope="module")
def vec_idx(spark, tmp_path_factory):
    corpus = make_pages(150)
    d = str(tmp_path_factory.mktemp("vec_idx"))
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(
            num_segments=3,
            analyzer=ENGLISH,
            stored_cols=("text",),
            vector_fields=("",),
        ),
    )
    return spark, d, {r["url"]: r["text"] for r in corpus}


def test_vectors_equal_reanalysis(vec_idx):
    spark, d, texts = vec_idx
    s = Searcher(spark, d)
    hits = s.search("w0042", k=8).collect()
    ids = [r["doc_id"] for r in hits]
    url_of = {r["doc_id"]: r["url"] for r in hits}
    got = {r["doc_id"]: r for r in s.term_vectors(ids).collect()}
    assert set(got) == set(ids)
    for did in ids:
        toks, poss, st, en = ENGLISH.tokenize_offsets(texts[url_of[did]])
        r = got[did]
        assert list(r["terms"]) == toks
        assert [int(x) for x in r["positions"]] == poss
        assert [int(x) for x in r["starts"]] == st
        assert [int(x) for x in r["ends"]] == en


def test_empty_stream_docs_have_no_row(spark, tmp_path):
    d = str(tmp_path / "vec_empty")
    rows = [
        ("u0", "alpha beta gamma"),
        ("u1", "the of and"),  # all stopwords: empty emitted stream
        ("u2", ""),
    ]
    build_index(
        spark,
        spark.createDataFrame(rows, ["url", "text"]),
        d,
        IndexConfig(
            num_segments=1, analyzer=ENGLISH,
            stored_cols=("text",), vector_fields=("",),
        ),
    )
    s = Searcher(spark, d)
    vecs = s.vectors().collect()
    assert {r["url"] for r in vecs} == {"u0"}
    # LocalSearcher mirror: absent docs simply missing from the dict
    ls = LocalSearcher(d)
    tv = ls.term_vectors([0, 1, 2])
    assert len(tv) == 1


def test_unknown_vector_field_rejected(spark, tmp_path):
    d = str(tmp_path / "vec_bad")
    df = spark.createDataFrame([("u0", "alpha")], ["url", "text"])
    with pytest.raises(Exception, match="not an indexed field"):
        build_index(
            spark, df, d,
            IndexConfig(num_segments=1, vector_fields=("title",)),
        )


def test_highlight_sources_identical_spark(vec_idx):
    spark, d, _ = vec_idx
    s = Searcher(spark, d)
    for q in QUERIES:
        a = s.highlight(q, k=6, offset_source="analysis").collect()
        v = s.highlight(q, k=6, offset_source="vectors").collect()
        auto = s.highlight(q, k=6).collect()  # auto -> vectors here
        assert [tuple(r) for r in a] == [tuple(r) for r in v]
        assert [tuple(r) for r in a] == [tuple(r) for r in auto]
        assert any(r["snippet"] for r in a)


def test_highlight_sources_identical_serving(vec_idx):
    _, d, _ = vec_idx
    ls = LocalSearcher(d)
    for q in QUERIES:
        a = ls.highlight(q, k=6, offset_source="analysis")
        v = ls.highlight(q, k=6, offset_source="vectors")
        assert a == v
        assert any(snip for _, _, _, snip in a)


def test_vectors_offset_source_requires_vectors(spark, tmp_path):
    d = str(tmp_path / "no_vec")
    build_index(
        spark,
        spark.createDataFrame([("u0", "alpha beta")], ["url", "text"]),
        d,
        IndexConfig(num_segments=1, stored_cols=("text",)),
    )
    s = Searcher(spark, d)
    with pytest.raises(Exception, match="no term vectors"):
        s.highlight("alpha", offset_source="vectors").collect()
    # auto on a vector-less index silently uses re-analysis
    rows = s.highlight("alpha", k=1).collect()
    assert rows and rows[0]["snippet"]
    ls = LocalSearcher(d)
    with pytest.raises(Exception, match="no term vectors"):
        ls.highlight("alpha", offset_source="vectors")


def test_checkindex_validates_vectors(vec_idx):
    spark, d, _ = vec_idx
    totals = check_index(spark, d)
    assert totals.get("vector_rows", 0) > 0


def test_vectors_survive_merges_and_vacuum(spark, tmp_path):
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.index.merge import force_merge, vacuum

    corpus = make_pages(120)
    d = str(tmp_path / "vec_merge")
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in corpus], ["url", "text"]
        ),
        d,
        IndexConfig(
            num_segments=3, analyzer=ENGLISH,
            stored_cols=("text",), vector_fields=("",),
        ),
    )
    s0 = Searcher(spark, d)
    dead = {r["url"] for r in s0.search("w0042", k=3).collect()}
    delete_docs(spark, d, keys=sorted(dead))

    # concat merge: ids preserved, dead docs masked
    force_merge(spark, d)
    s1 = Searcher(spark, d)
    for q in QUERIES:
        a = s1.highlight(q, k=6, offset_source="analysis").collect()
        v = s1.highlight(q, k=6, offset_source="vectors").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in v]
        assert not any(r["url"] in dead for r in v)
    assert check_index(spark, d).get("vector_rows", 0) > 0

    # squeeze merge: dead docs reclaimed, ids renumbered
    force_merge(spark, d, squeeze=True)
    removed = vacuum(d)
    assert removed
    s2 = Searcher(spark, d)
    texts = {r["url"]: r["text"] for r in corpus}
    for q in QUERIES:
        a = s2.highlight(q, k=6, offset_source="analysis").collect()
        v = s2.highlight(q, k=6, offset_source="vectors").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in v]
        assert not any(r["url"] in dead for r in v)
    # the surviving docs' vectors still equal re-analysis after renumbering
    hits = s2.search("w0007", k=8).collect()
    ids = [r["doc_id"] for r in hits]
    url_of = {r["doc_id"]: r["url"] for r in hits}
    got = {r["doc_id"]: r for r in s2.term_vectors(ids).collect()}
    for did in ids:
        toks, poss, st, en = ENGLISH.tokenize_offsets(texts[url_of[did]])
        assert list(got[did]["terms"]) == toks
        assert [int(x) for x in got[did]["positions"]] == poss
    assert check_index(spark, d).get("vector_rows", 0) > 0


def test_sharded_highlight_vectors_parity(vec_idx):
    from lucene_spark.search.serve import ShardedSearcher

    _, d, _ = vec_idx
    ss = ShardedSearcher(d, shards=2)
    try:
        ls = LocalSearcher(d)
        for q in QUERIES[:3]:
            a = ss.highlight(q, k=6, offset_source="analysis")
            v = ss.highlight(q, k=6, offset_source="vectors")
            assert a == v
            assert v == ls.highlight(q, k=6, offset_source="vectors")
    finally:
        ss.close()


def test_vectors_through_nrt_appends(spark, tmp_path):
    """NRT appends write vectors for the new segments (config fields
    carried by dataclasses.replace; commit key by the splice) and the
    vectors offset source stays byte-identical across generations."""
    from lucene_spark.streaming.nrt import append_batch

    corpus = make_pages(90)
    d = str(tmp_path / "vec_nrt")
    cfg = IndexConfig(
        num_segments=2, analyzer=ENGLISH,
        stored_cols=("text",), vector_fields=("",),
    )
    df0 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[:60]], ["url", "text"]
    )
    build_index(spark, df0, d, cfg)
    df1 = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus[60:]], ["url", "text"]
    )
    append_batch(spark, df1, d, cfg)
    s = Searcher(spark, d)
    texts = {r["url"]: r["text"] for r in corpus}
    # vectors exist for hit docs of BOTH generations, equal re-analysis
    hits = s.search("w0007", k=30).collect()
    appended_urls = {r["url"] for r in corpus[60:]}
    assert {r["url"] for r in hits} & appended_urls, "no appended-gen hit"
    ids = [r["doc_id"] for r in hits]
    url_of = {r["doc_id"]: r["url"] for r in hits}
    got = {r["doc_id"]: r for r in s.term_vectors(ids).collect()}
    assert set(got) == set(ids)
    for did in ids:
        toks, poss, st, en = ENGLISH.tokenize_offsets(texts[url_of[did]])
        assert list(got[did]["terms"]) == toks
    for q in QUERIES[:3]:
        a = s.highlight(q, k=8, offset_source="analysis").collect()
        v = s.highlight(q, k=8, offset_source="vectors").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in v]
