"""Offsets-in-postings (the 4th IndexOptions level,
DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS) + the Matches API's POSTINGS
offset source."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH, Analyzer
from lucene_spark.codec import blocks as blk
from lucene_spark.index.builder import invert_field
from lucene_spark.search import ast
from lucene_spark.search.local import LocalIndex
from lucene_spark.search.segment import SegmentView

A = Analyzer()


def test_pack_offsets_roundtrip():
    # 3 postings with tfs 2,1,3: per-doc delta starts + lengths
    tfs = np.array([2, 1, 3], dtype=np.int64)
    starts = np.array([0, 7, 3, 1, 9, 20], dtype=np.int64)
    ends = starts + np.array([5, 4, 6, 2, 5, 1], dtype=np.int64)
    st2, en2 = blk.unpack_offsets(blk.pack_offsets(starts, ends, tfs), tfs)
    np.testing.assert_array_equal(st2, starts)
    np.testing.assert_array_equal(en2, ends)
    e1, e2 = blk.unpack_offsets(b"", tfs)
    assert e1.size == 0 and e2.size == 0


def test_encode_term_postings_offset_blocks():
    n = 600
    docs = np.arange(n, dtype=np.int64)
    tfs = np.full(n, 2, dtype=np.int64)
    pos = np.tile(np.array([0, 3], dtype=np.int64), n)
    starts = np.tile(np.array([0, 17], dtype=np.int64), n) + np.repeat(
        np.arange(n, dtype=np.int64), 2
    )
    ends = starts + 4
    norms = np.full(n, 80, dtype=np.uint8)
    rows = blk.encode_term_postings(
        docs, tfs, pos, norms, offsets_flat=(starts, ends)
    )
    assert all("off_bin" in r for r in rows)
    got_s: list = []
    got_e: list = []
    for r in rows:
        t = blk.decode_tfs(r["tfs_bin"])
        s, e = blk.unpack_offsets(r["off_bin"], t)
        got_s.extend(s)
        got_e.extend(e)
    np.testing.assert_array_equal(np.array(got_s), starts)
    np.testing.assert_array_equal(np.array(got_e), ends)


def test_invert_offsets_match_analysis():
    """Per-term offsets decoded from the postings equal the analyzer's
    own tokenize_offsets spans (the stream IS the analysis stream)."""
    texts = [
        "Quick brown fox",
        "the quick  fox jumped",
        "BROWN broWn brown",
    ]
    block_rows, _, _, _, _ = invert_field(
        "", texts, ENGLISH, True, store_offsets=True
    )
    rows_by_term: dict = {}
    for r in block_rows:
        rows_by_term.setdefault(r["term"], []).append(r)
    seg = SegmentView.from_block_rows(
        "t", 0, np.full(len(texts), 100, np.uint8), rows_by_term
    )
    # expected spans per (term, doc) from the reference offsets path
    want: dict = {}
    for di, t in enumerate(texts):
        for tok, p, s, e in zip(*ENGLISH.tokenize_offsets(t)):
            want.setdefault((tok, di), []).append((p, s, e))
    for term, tb in seg.terms.items():
        d_all, t_all = tb.decode_all()
        flat, bounds = tb.decode_positions(0)
        st, en = tb.decode_offsets(0)
        for j, d in enumerate(d_all):
            got = list(
                zip(
                    flat[bounds[j] : bounds[j + 1]],
                    st[bounds[j] : bounds[j + 1]],
                    en[bounds[j] : bounds[j + 1]],
                )
            )
            assert [(int(a), int(b), int(c)) for a, b, c in got] == want[
                (term, int(d))
            ]


def test_local_store_offsets_search_unchanged():
    """store_offsets must not change any search result (extra stream,
    same postings)."""
    from lucene_spark.fixtures import make_pages

    rows = make_pages(80)
    plain = LocalIndex.build(rows, num_segments=2, analyzer=ENGLISH)
    off = LocalIndex.build(
        rows, num_segments=2, analyzer=ENGLISH, store_offsets=True
    )
    for q in ["w0000", "w0000 AND w0001", '"w0000 w0001"', "w0042 OR w0007"]:
        assert plain.search(q, k=10) == off.search(q, k=10)


@pytest.fixture(scope="module")
def spark_offsets_index(spark, tmp_path_factory):
    from lucene_spark.fixtures import make_pages
    from lucene_spark.index.builder import IndexConfig, build_index

    corpus = make_pages(120)
    d = str(tmp_path_factory.mktemp("off_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in corpus], ["url", "text"]
    )
    build_index(
        spark, df, d,
        IndexConfig(
            num_segments=2, analyzer=ENGLISH, stored_cols=("text",),
            store_offsets=True,
        ),
    )
    return spark, d, corpus


QUERIES = [
    "w0000 AND w0001",
    '"w0000 w0001"',
    "w004*",
    "w0042 OR w0007",
]


def test_matches_postings_source_equals_analysis(spark_offsets_index):
    """The POSTINGS offset source must produce byte-identical spans to
    the ANALYSIS source — the persisted stream IS the analysis
    stream."""
    from lucene_spark.search.searcher import Searcher

    spark, d, corpus = spark_offsets_index
    s = Searcher(spark, d)
    for q in QUERIES:
        a = s.matches(q, k=5, offset_source="analysis").collect()
        p = s.matches(q, k=5, offset_source="postings").collect()
        assert [r["url"] for r in a] == [r["url"] for r in p]
        for ra, rp in zip(a, p):
            assert [tuple(m) for m in ra["matches"]] == [
                tuple(m) for m in rp["matches"]
            ], q


def test_matches_postings_survives_squeeze(spark_offsets_index):
    from lucene_spark.index.check import check_index
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.searcher import Searcher

    spark, d, corpus = spark_offsets_index
    s = Searcher(spark, d)
    before = {
        r["url"]: [tuple(m) for m in r["matches"]]
        for r in s.matches(QUERIES[0], k=8, offset_source="postings").collect()
    }
    dead = [r["url"] for r in corpus[::7]]
    delete_docs(spark, d, keys=dead)
    commit = force_merge(spark, d, squeeze=True)
    assert commit["num_segments"] == 1
    check_index(spark, d)  # offset invariants incl. alignment
    s2 = Searcher(spark, d)
    after = {
        r["url"]: [tuple(m) for m in r["matches"]]
        for r in s2.matches(QUERIES[0], k=8, offset_source="postings").collect()
    }
    for url, spans in after.items():
        assert url not in dead
        if url in before:
            assert spans == before[url]


def test_postings_source_requires_offsets(spark, tmp_path_factory):
    from lucene_spark.fixtures import make_pages
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher

    d = str(tmp_path_factory.mktemp("nooff_idx"))
    df = spark.createDataFrame(
        [(r["url"], r["text"]) for r in make_pages(40)], ["url", "text"]
    )
    build_index(spark, df, d, IndexConfig(num_segments=1, analyzer=ENGLISH))
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="store_offsets"):
        s.matches("w0000", k=3, offset_source="postings").collect()


def test_payload_index_with_offsets(spark, tmp_path_factory):
    """Payloads + offsets together: payload-filtered interval matches
    through the POSTINGS source read BOTH streams from the index."""
    from lucene_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import intervals as iv
    from lucene_spark.search.searcher import Searcher

    pa_an = DelimitedPayloadAnalyzer()

    def posn(text):
        return " ".join(f"{t}|pos:{i}" for i, t in enumerate(text.split()))

    rows = [
        ("d0", posn("a sentence with words repeated words words quite often words")),
        ("d1", posn("words and more words")),
    ]
    d = str(tmp_path_factory.mktemp("payoff_idx"))
    df = spark.createDataFrame(rows, ["url", "text"])
    build_index(
        spark, df, d,
        IndexConfig(num_segments=1, analyzer=pa_an, store_offsets=True),
    )
    s = Searcher(spark, d, analyzer=pa_an)
    q = ast.IntervalQuery(
        field="",
        source=iv.payload_filtered_term(
            "words", lambda b: b is not None and not b.endswith(b"5")
        ),
    )
    got = s.matches(q, k=5, offset_source="postings").collect()
    assert [r["url"] for r in got] == ["d0", "d1"]
    d0 = [tuple(m) for m in got[0]["matches"]]
    # surviving positions 3, 6, 9 (position 5 filtered by payload)
    assert [(m[0], m[1]) for m in d0] == [(3, 3), (6, 6), (9, 9)]
    # offsets cover the raw token|payload spans in the DECORATED text
    text0 = rows[0][1]
    for sp, ep, so, eo, label in d0:
        assert text0[so:eo].startswith("words|pos:")
