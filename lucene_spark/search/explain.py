"""Explanation API — the ``IndexSearcher.explain`` /
``Similarity.explain`` analog (``search/IndexSearcher.java`` explain,
``similarities/BM25Similarity.java:240-290`` score breakdown).

``explain(ls, query, doc_id)`` returns a nested dict
``{"match": bool, "value": float, "description": str, "details": [...]}``
mirroring the reference's ``Explanation`` tree. The VALUE of every node
is computed by the same ``score_exhaustive`` kernel the engine searches
with (restricted to the owning segment), so the root value is
bit-identical to the score ``search`` returns for that doc — the
explanation can never drift from the scorer.

Leaf BM25 nodes break the score into the reference's components: boost,
idf (with df and docCount), and tf (with freq, k1, b, the
SmallFloat-quantized doc length, and avgdl).
"""

from __future__ import annotations

import numpy as np

from lucene_spark.search import ast
from lucene_spark.search import kernels
from lucene_spark.similarity import bm25
from lucene_spark.util.smallfloat import LENGTH_TABLE


def _node(match: bool, value: float, description: str, details=()):
    return {
        "match": bool(match),
        "value": float(value),
        "description": description,
        "details": list(details),
    }


def _doc_value(seg, q, scorers, dtype: str, doc: int, boost: float):
    docs, scores = kernels.score_exhaustive(seg, q, scorers, dtype, boost)
    i = int(np.searchsorted(docs, doc))
    if i < docs.size and docs[i] == doc:
        v = scores[i]
        return True, float(np.float32(v)) if dtype == "f32" else float(v)
    return False, 0.0


def _bm25_details(seg, stats, term: str, freq: float, doc: int,
                  boost: float, dtype: str):
    """The BM25Similarity.explain component list for one scored leaf."""
    field = ast.field_of(term)
    dc, stf = stats.collection(field)
    df = stats.df(term)
    idf_v = bm25.idf(df, dc)
    av = bm25.avgdl(stf, dc)
    norm_b = int(seg.norms_for_term(term)[doc])
    qdl = float(LENGTH_TABLE[norm_b])
    k1, b = bm25.K1_DEFAULT, bm25.B_DEFAULT
    return [
        _node(True, boost, "boost"),
        _node(
            True, idf_v,
            f"idf, computed as ln(1 + (N - n + 0.5) / (n + 0.5)) "
            f"from n={df} (docFreq), N={dc} (docCount)",
        ),
        _node(
            True, freq, f"freq, occurrences of term within document {doc}"
        ),
        _node(
            True,
            float(
                np.float32(freq)
                / (
                    np.float32(freq)
                    + np.float32(k1)
                    * (
                        np.float32(1.0)
                        - np.float32(b)
                        + np.float32(b) * np.float32(qdl) / np.float32(av)
                    )
                )
            ),
            f"tf, computed as freq / (freq + k1 * (1 - b + b * dl / "
            f"avgdl)) from freq={freq}, k1={k1}, b={b}, dl={qdl} "
            f"(length of field, SmallFloat-approximated), "
            f"avgdl={av} (average length of field)",
        ),
    ]


def explain_node(seg, q, scorers, stats, dtype: str, doc: int,
                 boost: float = 1.0) -> dict:
    q = ast.rewrite(q)
    matched, value = _doc_value(seg, q, scorers, dtype, doc, boost)
    if isinstance(q, ast.BoostQuery):
        child = explain_node(
            seg, q.query, scorers, stats, dtype, doc, boost * q.boost
        )
        return _node(
            matched, value, f"boost {q.boost} applied to:", [child]
        )
    if isinstance(q, ast.ConstantScoreQuery):
        inner_m, _ = _doc_value(seg, q.query, scorers, dtype, doc, 1.0)
        return _node(
            matched, value,
            f"ConstantScore({q.query!r})"
            + ("" if inner_m else " — inner query does not match"),
        )
    if isinstance(q, ast.TermQuery):
        if not matched:
            return _node(False, 0.0, f"no matching term {q.term!r}")
        tb = seg.term_blocks(q.term)
        docs, tfs = tb.decode_all()
        freq = float(tfs[int(np.searchsorted(docs, doc))])
        return _node(
            True, value,
            f"weight({q.term}:{doc}) score(freq={freq}), computed as "
            f"boost * idf * tf from:",
            _bm25_details(seg, stats, q.term, freq, doc, boost, dtype),
        )
    if isinstance(q, ast.PhraseQuery):
        if not matched:
            return _node(
                False, 0.0, f"no matching phrase {' '.join(q.terms)!r}"
            )
        docs, freqs = kernels._phrase_doc_freqs(seg, q)
        freq = float(freqs[int(np.searchsorted(docs, doc))])
        kind = "phraseFreq" if q.slop == 0 else f"sloppyFreq(slop={q.slop})"
        det = _bm25_details(seg, stats, q.terms[0], freq, doc, boost, dtype)
        det[1] = _node(
            True,
            bm25.idf_phrase(
                [stats.df(t) for t in q.terms],
                stats.collection(ast.field_of(q.terms[0]))[0],
            ),
            "idf, sum of per-term idfs:",
            [
                _node(
                    True,
                    bm25.idf(
                        stats.df(t),
                        stats.collection(ast.field_of(t))[0],
                    ),
                    f"idf(term={t!r})",
                )
                for t in q.terms
            ],
        )
        return _node(
            True, value,
            f"weight(\"{' '.join(q.terms)}\"~{q.slop}:{doc}) "
            f"score({kind}={freq}), computed as boost * idf * tf from:",
            det,
        )
    if isinstance(q, ast.MultiTermQuery):
        if not matched:
            return _node(
                False, 0.0, f"no dictionary term matches {q.mode}{q.args!r}"
            )
        from lucene_spark.search.multiterm import term_key_matcher

        pred = term_key_matcher(q.mode, q.args, q.field)
        hits = []
        for t, tb in seg.terms.items():
            if pred(t):
                d, _ = tb.decode_all()
                j = int(np.searchsorted(d, doc))
                if j < d.size and d[j] == doc:
                    hits.append(t)
        shown = ", ".join(sorted(hits)[:8]) + ("..." if len(hits) > 8 else "")
        return _node(
            True, value,
            f"ConstantScore({q.mode}{q.args!r}), {len(hits)} matching "
            f"dictionary term(s) in doc: {shown}",
        )
    if isinstance(q, ast.BooleanQuery):
        details = []
        for label, clauses, cb in (
            ("must", q.must, boost),
            ("should", q.should, boost),
            ("filter", q.filter, 1.0),
        ):
            for c in clauses:
                child = explain_node(seg, c, scorers, stats, dtype, doc, cb)
                child["description"] = (
                    f"[{label}] " + child["description"]
                )
                details.append(child)
        for c in q.must_not:
            m, _ = _doc_value(seg, c, scorers, dtype, doc, 1.0)
            if m:
                details.append(
                    _node(True, 0.0, f"[must_not] excluded by: {c!r}")
                )
        if not matched:
            return _node(
                False, 0.0,
                "boolean query does not match "
                f"(minShouldMatch={q.min_should_match})",
                details,
            )
        return _node(
            True, value, "sum of matching clause scores:", details
        )
    if isinstance(q, ast.IntervalQuery):
        if not matched:
            return _node(False, 0.0, "no matching intervals")
        from lucene_spark.search import intervals as iv
        from lucene_spark.search.kernels import expand_interval_source

        src = expand_interval_source(seg.terms.keys(), q.source, q.field)
        pos_of: dict = {}
        for t in sorted(src.terms()):
            tb = seg.term_blocks(
                t if ast.FIELD_SEP in t else ast.fielded(q.field, t)
            )
            if tb is None:
                continue
            d, _ = tb.decode_all()
            j = int(np.searchsorted(d, doc))
            if j < d.size and d[j] == doc:
                pos_of[t] = kernels._positions_for_docs(
                    tb, np.asarray([doc], dtype=np.int64)
                )[0]
        freq = (
            iv.interval_freq(src, pos_of)
            if dtype == "f32"
            else iv.interval_freq64(src, pos_of)
        )
        # IntervalScoreFunction.explain wording
        fn = "Saturation" if q.exp is None else "Sigmoid"
        return _node(
            True, value,
            f"{fn} function on interval frequency, computed as "
            "w * S / (S + k) from:",
            [
                _node(True, float(np.float32(boost)) if dtype == "f32" else boost,
                      "w, weight of this function"),
                _node(True, float(q.pivot),
                      "k, pivot feature value that would give a score "
                      "contribution equal to w/2"),
                _node(True, freq,
                      "S, the sloppy frequency of the interval query"),
            ],
        )
    if isinstance(q, (ast.MatchAllDocsQuery, ast.FieldExistsQuery)):
        return _node(matched, value, f"{type(q).__name__}")
    return _node(matched, value, f"{type(q).__name__} (no detail)")


def explain(ls, query, doc_id: int, dtype: str = "f32") -> dict:
    """Explain ``doc_id``'s score for ``query`` against a
    LocalSearcher-like object (owns segments + stats). Root value is
    bit-identical to ``search``'s score for that doc."""
    from lucene_spark.search import ast as ast_mod
    from lucene_spark.search.scoring import build_scorers

    q = (
        ls.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
    )
    seg_meta = None
    for s in ls.all_segments if hasattr(ls, "all_segments") else ls.segments:
        meta = s if isinstance(s, dict) else None
        if meta is None:
            continue
        lo = int(meta["doc_base"])
        if lo <= doc_id < lo + int(meta["num_docs"]):
            seg_meta = meta
            break
    if seg_meta is None:
        raise KeyError(f"doc_id {doc_id} not in any live segment")
    terms = ast_mod.query_terms(q)
    mt_leaves = ast_mod.multi_term_leaves(q)
    tset = set(terms)
    if mt_leaves:
        tset |= ls._expand_multi_term(seg_meta, mt_leaves)
    view = ls._view(seg_meta, tset)
    stats = ls._global_stats(ls.global_term_stats(terms))
    scorers = build_scorers(q, stats, dtype=dtype)
    local = int(doc_id) - int(seg_meta["doc_base"])
    out = explain_node(view, q, scorers, stats, dtype, local)
    out["doc_id"] = int(doc_id)
    return out
