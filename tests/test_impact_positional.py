"""Impact-pruned POSITIONAL decode (round-5 VERDICT item #1).

The reference drives phrases through ``ImpactsDISI`` on the conjunction
approximation (``search/PhraseScorer.java:45-68``,
``search/ImpactsDISI.java:28-123``): blocks whose impact-derived score
bound cannot beat minCompetitiveScore are skipped before any position
read.  This engine mirrors that at block granularity, vectorized across
candidates (``kernels._cand_block_bounds`` for phrase/sloppy/multi-
phrase leaves; the lazy ``_IntervalLeaf`` per-candidate tf-sum bound for
interval queries): with an active theta, non-competitive candidates
never trigger a ``pos_bin`` decode.

Corpus note: block-max pruning is DATA-dependent, exactly as in the
reference — on the Zipf fixture the head terms appear in ~every doc
with near-constant competitive impacts, so no bound (reference or
engine) can discriminate.  The impact corpus below concentrates hot
(high-tf, short) docs into one 256-doc block per 4096-doc WINDOW:
window-level bounds stay high everywhere (no window skip), so any
measured ``pos_bin`` drop is attributable to the per-candidate
containing-block bound alone.

Pruning must be invisible — pruned == exhaustive bit-identically at
threshold=1 (theta active from the first filled heap) — while the
position-block counter (``segment.pos_decode_count``) drops."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search import segment as seg_mod
from lucene_spark.search.local import LocalIndex

N_DOCS = 20000
BLOCK = 256  # codec block size (Lucene104PostingsFormat BLOCK_SIZE)
WINDOW_BLOCKS = 16  # 4096-doc WAND window / 256-doc block


def make_impact_corpus(n=N_DOCS):
    """Docs whose competitive impacts VARY by block: doc i is HOT
    (the w0000/w0001 pair repeated 30x, short doc => high tf, high
    impact) when its 256-doc block is the first of its 4096-doc
    window; every other doc is COLD (the pair once inside 200 filler
    tokens => tf 1, long doc, low impact).  Every window contains hot
    docs (window bounds can never skip), but 15 of its 16 blocks are
    provably non-competitive once the heap holds hot scores."""
    rows = []
    for i in range(n):
        hot = (i // BLOCK) % WINDOW_BLOCKS == 0
        if hot:
            text = ("w0000 w0001 " * 30).strip()
        else:
            filler = " ".join(f"fill{(i * 7 + j) % 211:03d}" for j in range(200))
            text = f"w0000 w0001 {filler}"
        rows.append({"url": f"u{i:06d}", "text": text})
    return rows


@pytest.fixture(scope="module")
def engine():
    return LocalIndex.build(make_impact_corpus(), num_segments=1, analyzer=ENGLISH)


@pytest.fixture(scope="module")
def zipf_engine():
    return LocalIndex.build(make_pages(4000), num_segments=2, analyzer=ENGLISH)


def SP(terms, slop, positions=None):
    return ast.PhraseQuery(
        terms=tuple(terms),
        positions=tuple(positions if positions is not None else range(len(terms))),
        slop=slop,
    )


def MP(slots, slop=0):
    return ast.MultiPhraseQuery(
        slots=tuple(tuple(s) for s in slots),
        positions=tuple(range(len(slots))),
        slop=slop,
    )


def IQ(src, **kw):
    return ast.IntervalQuery("", src, **kw)


# decode-drop shapes.  The sloppy SUM bound has a floor of
# (#members x tf-1 impact) — a tf-1 member on an avg-length doc bounds
# near 0.44*weight, so sum bounds discriminate only for 2-member
# sloppy shapes (the reference prunes sloppy phrases not at all:
# SloppyPhraseMatcher.java:119-127 dummy impacts — anything here is
# strictly beyond parity).  Exact shapes use the per-slot MIN combine
# and discriminate at any width.
DENSE_SHAPES = [
    SP(["w0000", "w0001"], slop=0),
    SP(["w0000", "w0001"], slop=2),
    # exact multi-phrase: min over slot sums
    MP([("w0000", "fill000"), ("w0001",)], slop=0),
    # 2-member sloppy multi-phrase (sum bound still discriminates)
    MP([("w0000",), ("w0001",)], slop=2),
    IQ(iv.ordered(iv.term("w0000"), iv.term("w0001"))),
    IQ(iv.unordered(iv.term("w0000"), iv.term("w0001"))),
    IQ(iv.maxgaps(4, iv.unordered(iv.term("w0000"), iv.term("w0001")))),
    IQ(iv.ordered(iv.term("w0000"), iv.term("w0001")), pivot=2.5),
]

# bit-identity-only shapes: >=3-member sloppy sums sit above the
# pruning floor by construction — correctness must still hold
EXTRA_SHAPES = [
    MP([("w0000", "fill000"), ("w0001",)], slop=2),
    # multi-term-repeat (hasMultiTermRpts) sloppy multi-phrase
    MP([("w0000", "w0001"), ("w0001",)], slop=2),
    SP(["w0000", "w0001", "w0000"], slop=3),
]


def _clear_caches(engine):
    for seg in engine.segments:
        for tb in seg.terms.values():
            tb._cache.clear()


def _run(engine, q, pruned, threshold):
    _clear_caches(engine)
    seg_mod.reset_decode_count()
    hits = engine.search(q, k=3, pruned=pruned, total_hits_threshold=threshold)
    return hits, seg_mod.pos_decode_count()


@pytest.mark.parametrize("qi", range(len(DENSE_SHAPES)))
def test_pos_decode_drops_bit_identical(engine, qi):
    q = DENSE_SHAPES[qi]
    a, pruned_pos = _run(engine, q, pruned=True, threshold=1)
    b, exhaustive_pos = _run(engine, q, pruned=False, threshold=1)
    assert a == b, q
    assert len(a) == 3, q  # shapes are not vacuous on this corpus
    # the drop must be substantial (>= 2x), not incidental: 15/16 of
    # the blocks are non-competitive by construction
    assert pruned_pos * 2 <= exhaustive_pos, (q, pruned_pos, exhaustive_pos)


def test_pruned_equals_exhaustive_all_thresholds(engine):
    for q in DENSE_SHAPES + EXTRA_SHAPES:
        for th in (1, 1000):
            a = engine.search(q, k=10, pruned=True, total_hits_threshold=th)
            b = engine.search(q, k=10, pruned=False)
            assert a == b, (q, th)


def test_f64_mirror(engine):
    for q in DENSE_SHAPES + EXTRA_SHAPES:
        a = engine.search(q, k=10, pruned=True, dtype="f64", total_hits_threshold=1)
        b = engine.search(q, k=10, pruned=False, dtype="f64")
        assert a == b, q


def test_zipf_differentials(zipf_engine):
    """On the Zipf fixture (flat impacts — pruning rarely fires) the
    same shapes stay bit-identical across pruned/exhaustive/threshold,
    both dtypes, multi-segment with theta sharing."""
    shapes = [
        SP(["w0000", "w0001"], slop=0),
        SP(["w0000", "w0001"], slop=2),
        SP(["w0000", "w0001", "w0002"], slop=4),
        MP([("w0000", "w0003"), ("w0001",)], slop=2),
        MP([("w0000", "w0001"), ("w0001",)], slop=2),
        IQ(iv.ordered(iv.term("w0000"), iv.term("w0001"))),
        IQ(iv.unordered(iv.term("w0007"), iv.term("w0042"), iv.term("w0012"))),
        IQ(iv.or_(iv.term("w0007"), iv.phrase("w0042", "w0100"))),
        IQ(
            iv.not_containing(
                iv.unordered(iv.term("w0007"), iv.term("w0042")),
                iv.term("w0100"),
            )
        ),
        IQ(iv.maxgaps(3, iv.ordered(iv.term("w0007"), iv.term("w0042"))), exp=2.0),
    ]
    for q in shapes:
        for dt in ("f32", "f64"):
            b = zipf_engine.search(q, k=10, pruned=False, dtype=dt)
            for th in (1, 1000, 10**9):
                a = zipf_engine.search(
                    q, k=10, pruned=True, dtype=dt, total_hits_threshold=th
                )
                assert a == b, (q, dt, th)


def test_interval_inside_boolean_tree(engine):
    """Interval leaves nested under boolean clauses keep exact probe
    semantics (memoized per-doc scores, no theta pruning in probe)."""
    qs = [
        ast.BooleanQuery(
            must=(
                ast.TermQuery("fill000"),
                IQ(iv.unordered(iv.term("w0000"), iv.term("w0001"))),
            )
        ),
        ast.BooleanQuery(
            should=(
                ast.TermQuery("fill007"),
                IQ(iv.ordered(iv.term("w0000"), iv.term("w0001"))),
            ),
            min_should_match=1,
        ),
        ast.BooleanQuery(
            must=(IQ(iv.ordered(iv.term("w0000"), iv.term("w0001"))),),
            must_not=(ast.TermQuery("fill003"),),
        ),
        ast.BoostQuery(IQ(iv.unordered(iv.term("w0000"), iv.term("w0001"))), 2.5),
    ]
    for q in qs:
        for th in (1, 1000):
            a = engine.search(q, k=10, pruned=True, total_hits_threshold=th)
            b = engine.search(q, k=10, pruned=False)
            assert a == b, (q, th)
