"""DuckDB oracle SQL for the driver's correctness gate.

Generates ANSI-ish SQL (DuckDB dialect, list lambdas) that recomputes
the engine's answers directly from the raw ``documents`` parquet —
tokenization, SmallFloat length quantization, global stats, and the
float64 BM25 of :class:`lucene_spark.search.scoring.ScorerF64` — with
the exact same operation order, so Spark and DuckDB agree bitwise.

Why f64 here: the rank-identity contract vs Lucene is float32 and is
gated by the pytest oracle (tests/test_rank_identity.py). The driver
gate instead cross-checks the *whole distributed pipeline* (analysis,
postings, stats, top-k plumbing) against an independent engine, which
requires IEEE-double reproducibility: every float op below mirrors
``ScorerF64`` / the f64 kernel accumulation op-for-op.

On this corpus (ASCII ``[a-z0-9 .,!?'\\n-]`` text without medial
joiners) the UAX#29 analyzer reduces to lowercase alnum runs, so the
SQL tokenizer ``regexp_extract_all(lower(text), '[a-z0-9]+')`` is
exactly the analyzer (tests assert this equivalence).
"""

from __future__ import annotations

import numpy as np

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS
from lucene_spark.util.smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75

_STOP = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
_LT = ", ".join(repr(float(v)) for v in np.asarray(LENGTH_TABLE, dtype=np.float64))


def base_ctes(table: str = "documents") -> str:
    """tok/docs/stats CTEs: filtered tokens (33-word stop list), raw
    tokens (positions with stopword holes), doc length, SmallFloat-
    quantized length (largest LENGTH_TABLE value <= dl — exact for the
    floor-monotone intToByte4), and global collection stats."""
    return f"""
tok AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS raw,
         list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                     t -> t NOT IN ({_STOP})) AS toks
  FROM {table}
),
docs AS (
  SELECT doc_id, raw, toks, len(toks) AS dl,
         list_max(list_filter([{_LT}], v -> v <= CAST(len(toks) AS DOUBLE))) AS qdl
  FROM tok
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg
  FROM docs
)"""


def _tf(term: str) -> str:
    return f"len(list_filter(toks, t -> t = '{term}'))"


def _df_cte(terms) -> str:
    """dfs CTE: one row, global docFreq per term."""
    cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE {_tf(t)} > 0) AS BIGINT) AS df_{i}"
        for i, t in enumerate(terms)
    )
    return f"dfs AS (SELECT {cols} FROM docs)"


def _idf(i: int) -> str:
    """float64 idf with ScorerF64's op order:
    ln(1 + (n - df + 0.5) / (df + 0.5))."""
    return (
        f"ln(1.0 + (CAST(n - df_{i} AS DOUBLE) + 0.5) / "
        f"(CAST(df_{i} AS DOUBLE) + 0.5))"
    )


def _nf() -> str:
    """norm factor k1*(1-b + (b*qdl)/avg) — ScorerF64.norm_factor."""
    return f"{K1} * ({1.0 - B} + ({B} * qdl) / avg)"


def _score(idf_expr: str, tf_expr: str) -> str:
    """ScorerF64.score: w - w / (1 + tf/nf)."""
    return (
        f"({idf_expr}) - ({idf_expr}) / "
        f"(1.0 + CAST({tf_expr} AS DOUBLE) / ({_nf()}))"
    )


def term_postings_sql(term: str, table: str = "documents") -> str:
    """(doc_id, tf) for one term — the postings-list contract."""
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({_tf(term)} AS BIGINT) AS tf
FROM docs WHERE {_tf(term)} > 0
ORDER BY doc_id"""


def collection_stats_sql(table: str = "documents") -> str:
    """(term, doc_freq, total_tf) for every term — the full term
    dictionary with global stats."""
    return f"""WITH {base_ctes(table)},
flat AS (SELECT doc_id, unnest(toks) AS t FROM docs)
SELECT t AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(count(*) AS BIGINT) AS total_tf
FROM flat GROUP BY t ORDER BY term"""


def term_topk_sql(term: str, k: int = 10, table: str = "documents") -> str:
    return f"""WITH {base_ctes(table)},
{_df_cte([term])}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(_idf(0), _tf(term))} AS score
FROM docs, stats, dfs
WHERE {_tf(term)} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def bool_topk_sql(
    must: list, should: list, k: int = 10, table: str = "documents"
) -> str:
    """Top-k for pure-AND (``must``) or pure-OR (``should``) term
    queries in f64. IMPORTANT float contract: the engine accumulates
    clause scores left-to-right; the SQL sum below is written in the
    same clause order (for AND, callers must pass terms in ascending-
    docFreq order — the block-max-conjunction lead order)."""
    terms = list(must) + list(should)
    parts = []
    for i, t in enumerate(terms):
        s = _score(_idf(i), _tf(t))
        if should:
            parts.append(f"(CASE WHEN {_tf(t)} > 0 THEN {s} ELSE 0.0 END)")
        else:
            parts.append(f"({s})")
    score = "0.0 + " + " + ".join(parts)
    if must:
        match = " AND ".join(f"{_tf(t)} > 0" for t in must)
    else:
        match = " OR ".join(f"{_tf(t)} > 0" for t in should)
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {match}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def match_sql(
    must=(), should=(), must_not=(), min_should_match: int = 0,
    table: str = "documents",
) -> str:
    """(doc_id) membership for a Boolean term query — the unscored
    FILTER/MUST_NOT/minimumNumberShouldMatch algebra."""
    conds = [f"{_tf(t)} > 0" for t in must]
    conds += [f"NOT ({_tf(t)} > 0)" for t in must_not]
    if should:
        msm = max(min_should_match, 0 if must else 1)
        hits = " + ".join(
            f"(CASE WHEN {_tf(t)} > 0 THEN 1 ELSE 0 END)" for t in should
        )
        conds.append(f"({hits}) >= {msm}")
    where = " AND ".join(conds) if conds else "FALSE"
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs WHERE {where}
ORDER BY doc_id"""


def _phrase_freq(terms, offsets) -> str:
    """Occurrences of the positioned phrase in the RAW token list
    (stopword holes match any filler — Lucene position semantics)."""
    max_off = max(offsets)
    conds = " AND ".join(
        f"raw[i + {off}] = '{t}'" for t, off in zip(terms, offsets)
    )
    return f"len(list_filter(range(1, len(raw) + 1 - {max_off}), i -> {conds}))"


def phrase_match_sql(terms, offsets, table: str = "documents") -> str:
    """(doc_id, freq) of exact-phrase occurrences."""
    pf = _phrase_freq(terms, offsets)
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({pf} AS BIGINT) AS freq
FROM docs WHERE {pf} > 0
ORDER BY doc_id"""


def phrase_topk_sql(terms, offsets, k: int = 10, table: str = "documents") -> str:
    """Top-k BM25 phrase: idf = sum of member idfs (left-to-right),
    freq = phraseFreq."""
    pf = _phrase_freq(terms, offsets)
    idf_sum = "0.0 + " + " + ".join(_idf(i) for i in range(len(terms)))
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(f"({idf_sum})", pf)} AS score
FROM docs, stats, dfs
WHERE {pf} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def _multi_phrase_freq(slots, offsets) -> str:
    """Occurrences of a multi-phrase (term alternatives per slot) in the
    raw token list."""
    max_off = max(offsets)
    conds = []
    for slot, off in zip(slots, offsets):
        alts = ", ".join(f"'{t}'" for t in slot)
        conds.append(f"raw[i + {off}] IN ({alts})")
    cond = " AND ".join(conds)
    return f"len(list_filter(range(1, len(raw) + 1 - {max_off}), i -> {cond}))"


def multi_phrase_match_sql(slots, offsets, table: str = "documents") -> str:
    """(doc_id, freq) for a MultiPhraseQuery."""
    pf = _multi_phrase_freq(slots, offsets)
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({pf} AS BIGINT) AS freq
FROM docs WHERE {pf} > 0
ORDER BY doc_id"""


def multi_phrase_topk_sql(slots, offsets, k: int = 10, table: str = "documents") -> str:
    """Top-k MultiPhrase BM25: idf = sum over ALL member terms
    (MultiPhraseQuery.java:218-237), freq = multi-phrase occurrences."""
    all_terms = [t for slot in slots for t in slot]
    pf = _multi_phrase_freq(slots, offsets)
    idf_sum = "0.0 + " + " + ".join(_idf(i) for i in range(len(all_terms)))
    return f"""WITH {base_ctes(table)},
{_df_cte(all_terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(f"({idf_sum})", pf)} AS score
FROM docs, stats, dfs
WHERE {pf} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def boosted_or_topk_sql(term_boosts, k: int = 10, table: str = "documents") -> str:
    """Top-k for ``t1^b1 OR t2^b2 ...``: clause weight = boost * idf
    (BoostQuery folded into the leaf weight). Boosts should be dyadic
    rationals (exact doubles) for bitwise oracle parity."""
    terms = [t for t, _ in term_boosts]
    parts = []
    for i, (t, b) in enumerate(term_boosts):
        w = f"({b!r} * ({_idf(i)}))"
        s = _score(w, _tf(t))
        parts.append(f"(CASE WHEN {_tf(t)} > 0 THEN {s} ELSE 0.0 END)")
    score = "0.0 + " + " + ".join(parts)
    match = " OR ".join(f"{_tf(t)} > 0" for t in terms)
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {match}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def constant_score_match_sql(must, must_not=(), boost: float = 1.0,
                             table: str = "documents") -> str:
    """(doc_id, score=boost) — ConstantScoreQuery over a Boolean
    filter."""
    conds = [f"{_tf(t)} > 0" for t in must]
    conds += [f"NOT ({_tf(t)} > 0)" for t in must_not]
    where = " AND ".join(conds)
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({boost!r} AS DOUBLE) AS score
FROM docs WHERE {where}
ORDER BY doc_id"""


def mt_or_topk_sql(
    term: str, prefix: str, k: int = 10, table: str = "documents"
) -> str:
    """Top-k for ``term OR prefix*`` — a scored BM25 TermQuery SHOULD
    clause plus a CONSTANT-SCORE MultiTermQuery leaf
    (MultiTermQuery.CONSTANT_SCORE_REWRITE: contributes exactly 1.0 for
    docs containing any token with the prefix). Clause order in the sum
    mirrors the engine's left-to-right accumulation."""
    s = _score(_idf(0), _tf(term))
    pref = f"len(list_filter(toks, t -> t LIKE '{prefix}%')) > 0"
    score = (
        f"0.0 + (CASE WHEN {_tf(term)} > 0 THEN {s} ELSE 0.0 END)"
        f" + (CASE WHEN {pref} THEN 1.0 ELSE 0.0 END)"
    )
    return f"""WITH {base_ctes(table)},
{_df_cte([term])}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {_tf(term)} > 0 OR {pref}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def multiterm_match_sql(token_pred: str, table: str = "documents") -> str:
    """(doc_id) docs containing any token satisfying ``token_pred``
    (a predicate over token variable ``t``) — the constant-score
    MultiTermQuery rewrite (prefix/wildcard/range/set/fuzzy)."""
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs
WHERE len(list_filter(toks, t -> {token_pred})) > 0
ORDER BY doc_id"""


def fuzzy_restricted_match_sql(
    base: str, max_edits: int, table: str = "documents"
) -> str:
    """(doc_id) docs containing a token within RESTRICTED
    Damerau-Levenshtein distance ``max_edits`` of ``base`` — the
    FuzzyQuery default variant (``LevenshteinAutomata.java:54-55``
    transposition as a primitive edit: a transposed pair cannot be
    edited again, unlike DuckDB's unrestricted
    ``damerau_levenshtein``). The distance is computed independently
    in SQL by a recursive-CTE Wagner-Fischer DP over the distinct
    token vocabulary: recursion over base-position i carries DP rows
    as lists; the insertion dependency (cur[j-1]+1, a prefix scan) is
    closed by cur[j] = min_{{l<=j}}(tmp[l] + (j-l)) where tmp holds
    the deletion/substitution/transposition candidates."""
    m, e = len(base), int(max_edits)
    inf = 999999
    return f"""WITH RECURSIVE {base_ctes(table)},
vocab AS (SELECT DISTINCT unnest(toks) AS t FROM docs),
cand AS (
  SELECT t FROM vocab WHERE abs(len(t) - {m}) <= {e}
),
dp AS (
  SELECT t, 0 AS i,
         list_transform(range(0, len(t)+1), j -> j) AS prev,
         CAST(NULL AS BIGINT[]) AS prev2
  FROM cand
  UNION ALL
  SELECT t, i+1,
         list_transform(range(0, len(t)+1), j ->
           list_min(list_transform(range(0, j+1), l ->
             (CASE WHEN l = 0 THEN i+1
              ELSE least(
                prev[l+1] + 1,
                prev[l] + (CASE WHEN substr('{base}', i+1, 1)
                                     = substr(t, l, 1)
                           THEN 0 ELSE 1 END),
                CASE WHEN i >= 1 AND l >= 2
                      AND substr('{base}', i+1, 1) = substr(t, l-1, 1)
                      AND substr('{base}', i, 1) = substr(t, l, 1)
                 THEN prev2[l-1] + 1 ELSE {inf} END)
              END) + (j - l)))) AS prev,
         prev AS prev2
  FROM dp WHERE i < {m}
),
matched AS (
  SELECT list(t) AS ts FROM dp WHERE i = {m} AND prev[len(t)+1] <= {e}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs, matched
WHERE list_has_any(toks, ts)
ORDER BY doc_id"""


def term_page2_sql(term: str, k: int = 10, table: str = "documents") -> str:
    """(doc_id, score) rows k+1..2k of the term query's total rank —
    the searchAfter page-composition contract (page 2 via the page-1
    cursor must equal this window exactly)."""
    return f"""WITH {base_ctes(table)},
{_df_cte([term])},
scored AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(_idf(0), _tf(term))} AS score
  FROM docs, stats, dfs
  WHERE {_tf(term)} > 0
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT doc_id, score FROM ranked
WHERE rnk > {k} AND rnk <= {2 * k}
ORDER BY score DESC, doc_id ASC"""


def suggest_sql(prefix: str, k: int = 10, table: str = "documents") -> str:
    """(term, doc_freq) prefix completion over the term dictionary —
    the suggest-module dictionary role, weight = global docFreq, ties
    (doc_freq desc, term asc)."""
    return f"""WITH {base_ctes(table)},
flat AS (SELECT doc_id, unnest(toks) AS t FROM docs)
SELECT t AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM flat WHERE t LIKE '{prefix}%'
GROUP BY t
ORDER BY doc_freq DESC, term ASC
LIMIT {k}"""


def mlt_topk_sql(
    src_doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    table: str = "documents",
) -> str:
    """(doc_id, score) MoreLikeThis oracle
    (``queries/mlt/MoreLikeThis.java`` retrieveTerms + the boolean
    SHOULD rewrite): select the source doc's top ``max_query_terms``
    terms by tf * (ln((N+1)/(df+1)) + 1) with the tf/df floors, then
    BM25-sum per candidate doc over the selected terms PRESENT in it,
    folded in SELECTION-RANK order via list_reduce — the same
    left-to-right clause accumulation the engine's kernels implement
    (the standing float contract of ``bool_topk_sql``). Ties in
    selection break (score desc, term asc) — the engine's documented
    determinism rule."""
    w = (
        "ln(1.0 + (CAST(n - r.df AS DOUBLE) + 0.5) / "
        "(CAST(r.df AS DOUBLE) + 0.5))"
    )
    tf_d = "len(list_filter(docs.toks, x -> x = r.term))"
    s = (
        f"({w}) - ({w}) / "
        f"(1.0 + CAST({tf_d} AS DOUBLE) / ({_nf()}))"
    )
    return f"""WITH {base_ctes(table)},
src AS (SELECT unnest(toks) AS t FROM docs WHERE doc_id = {src_doc_id}),
src_tf AS (
  SELECT t AS term, CAST(count(*) AS BIGINT) AS tf
  FROM src GROUP BY t HAVING count(*) >= {min_term_freq}
),
flat AS (SELECT doc_id, unnest(toks) AS t FROM docs),
alldf AS (
  SELECT t AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM flat GROUP BY t
),
sel AS (
  SELECT s.term, s.tf, d.df,
         CAST(s.tf AS DOUBLE) *
         (ln((CAST(n AS DOUBLE) + 1.0) / (CAST(d.df AS DOUBLE) + 1.0)) + 1.0)
           AS mscore
  FROM src_tf s JOIN alldf d ON d.term = s.term CROSS JOIN stats
  WHERE d.df >= {min_doc_freq}
  ORDER BY mscore DESC, s.term ASC
  LIMIT {max_query_terms}
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY mscore DESC, term ASC) AS rnk
  FROM sel
),
contrib AS (
  SELECT docs.doc_id, r.rnk, {s} AS s
  FROM docs CROSS JOIN stats
  JOIN ranked r ON {tf_d} > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY rnk)),
         (a, x) -> a + x
       ) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def function_score_topk_sql(
    term: str, field: str = "n_chars", k: int = 10, mode: str = "boost",
    table: str = "documents",
) -> str:
    """(doc_id, score) FunctionScoreQuery oracle
    (``queries/function/FunctionScoreQuery.java``): ``boost`` =
    bm25(term) * doc column (boostByValue — the multiply is one f64 op
    after the f64 score, mirroring the engine's post-kernel column
    product); ``replace`` = the column alone over the match set."""
    base = _score(_idf(0), _tf(term))
    val = f"CAST(d.{field} AS DOUBLE)"
    score = f"({base}) * {val}" if mode == "boost" else val
    return f"""WITH {base_ctes(table)},
{_df_cte([term])}
SELECT CAST(docs.doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs, {table} d
WHERE d.doc_id = docs.doc_id AND {_tf(term)} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def classic_tfidf_sql(term: str, table: str = "documents") -> str:
    """(doc_id, score) under ClassicSimilarity (TF-IDF plugin):
    sqrt(tf) * idf^2 * (1/sqrt(qdl)), idf = 1 + ln((N+1)/(df+1))."""
    idf = (
        f"(1.0 + ln(CAST(n + 1 AS DOUBLE) / (CAST(df_0 AS DOUBLE) + 1.0)))"
    )
    score = (
        f"(sqrt(CAST({_tf(term)} AS DOUBLE)) * ({idf} * {idf})) * (1.0 / sqrt(qdl))"
    )
    return f"""WITH {base_ctes(table)},
{_df_cte([term])}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {_tf(term)} > 0
ORDER BY doc_id"""


def facet_count_sql(term: str, facet_col: str = "lang",
                    table: str = "documents") -> str:
    """(facet, n_docs): per-value match counts over the result set of a
    term query — the facet-module computation (GROUP BY + COUNT)."""
    return f"""WITH {base_ctes(table)}
SELECT d2.{facet_col} AS facet, CAST(count(*) AS BIGINT) AS n_docs
FROM docs JOIN {table} d2 ON d2.doc_id = docs.doc_id
WHERE {_tf(term)} > 0
GROUP BY d2.{facet_col}
ORDER BY facet"""


def sort_by_field_sql(term: str, field: str = "n_chars", k: int = 10,
                      table: str = "documents") -> str:
    """(doc_id, {field}): TopFieldCollector analog — matching docs
    sorted by an arbitrary stored field, doc-id tie-break."""
    return f"""WITH {base_ctes(table)}
SELECT CAST(docs.doc_id AS BIGINT) AS doc_id,
       CAST(d2.{field} AS BIGINT) AS {field}
FROM docs JOIN {table} d2 ON d2.doc_id = docs.doc_id
WHERE {_tf(term)} > 0
ORDER BY d2.{field} DESC, docs.doc_id ASC
LIMIT {k}"""


def synonym_scores_sql(terms, table: str = "documents") -> str:
    """(doc_id, score) SynonymQuery: pseudo-term df = max member df,
    per-doc freq = sum of member tfs, one BM25 scorer."""
    tf_sum = " + ".join(_tf(t) for t in terms)
    df_max = "greatest(" + ", ".join(f"df_{i}" for i in range(len(terms))) + ")"
    idf = (
        f"ln(1.0 + (CAST(n - {df_max} AS DOUBLE) + 0.5) / "
        f"(CAST({df_max} AS DOUBLE) + 0.5))"
    )
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(f"({idf})", f"({tf_sum})")} AS score
FROM docs, stats, dfs
WHERE ({tf_sum}) > 0
ORDER BY doc_id"""


def dismax_scores_sql(terms, table: str = "documents") -> str:
    """(doc_id, score) DisjunctionMax with tieBreaker=0: score = max
    over matching clauses (order-free float: a single max)."""
    cases = ", ".join(
        f"(CASE WHEN {_tf(t)} > 0 THEN {_score(_idf(i), _tf(t))} END)"
        for i, t in enumerate(terms)
    )
    match = " OR ".join(f"{_tf(t)} > 0" for t in terms)
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       list_max(list_filter([{cases}], x -> x IS NOT NULL)) AS score
FROM docs, stats, dfs
WHERE {match}
ORDER BY doc_id"""


# --------------------------------------------------------- multi-field gate


def fielded_ctes(
    title_words: int = 8, table: str = "documents", title_stop: bool = True
) -> str:
    """Two-field corpus CTEs: body = text, title = first ``title_words``
    whitespace words of text (the derived second field of the driver
    gate). Each field gets its OWN token list, quantized length and
    CollectionStatistics (docCount = docs with >=1 token of the field,
    avg = sumTotalTermFreq / docCount — Terms.getDocCount semantics,
    mirroring GlobalStats.collection per-field stats).

    ``title_stop=False`` models a PER-FIELD analyzer (title indexed
    with the empty StandardAnalyzer stop set while body keeps the
    33-word English list — IndexConfig.field_analyzers /
    PerFieldAnalyzerWrapper semantics)."""
    title = (
        f"array_to_string(list_slice(str_split(text, ' '), 1, {title_words}), ' ')"
    )
    ttoks = f"regexp_extract_all(lower({title}), '[a-z0-9]+')"
    if title_stop:
        ttoks = f"list_filter({ttoks}, t -> t NOT IN ({_STOP}))"
    return f"""
tok AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                     t -> t NOT IN ({_STOP})) AS btoks,
         {ttoks} AS ttoks
  FROM {table}
),
docs AS (
  SELECT doc_id, btoks, ttoks,
         list_max(list_filter([{_LT}], v -> v <= CAST(len(btoks) AS DOUBLE))) AS bqdl,
         list_max(list_filter([{_LT}], v -> v <= CAST(len(ttoks) AS DOUBLE))) AS tqdl
  FROM tok
),
stats AS (
  SELECT CAST(count(*) FILTER (WHERE len(btoks) > 0) AS BIGINT) AS bn,
         CAST(sum(len(btoks)) AS DOUBLE)
           / CAST(count(*) FILTER (WHERE len(btoks) > 0) AS DOUBLE) AS bavg,
         CAST(count(*) FILTER (WHERE len(ttoks) > 0) AS BIGINT) AS tn,
         CAST(sum(len(ttoks)) AS DOUBLE)
           / CAST(count(*) FILTER (WHERE len(ttoks) > 0) AS DOUBLE) AS tavg
  FROM docs
)"""


def _ftf(col: str, term: str) -> str:
    return f"len(list_filter({col}, t -> t = '{term}'))"


def _fidf(n: str, df: str) -> str:
    return f"ln(1.0 + (CAST({n} - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"


def _fscore(idf: str, tf: str, qdl: str, avg: str) -> str:
    nf = f"{K1} * ({1.0 - B} + ({B} * {qdl}) / {avg})"
    return f"({idf}) - ({idf}) / (1.0 + CAST({tf} AS DOUBLE) / ({nf}))"


def field_title_topk_sql(
    term: str,
    k: int = 10,
    title_words: int = 8,
    table: str = "documents",
    title_stop: bool = True,
) -> str:
    """Top-k BM25 over the TITLE field only — field-scoped docFreq,
    docCount, avgdl and norms. ``title_stop=False`` = the per-field-
    analyzer index (title keeps stopwords)."""
    tf = _ftf("ttoks", term)
    score = _fscore(_fidf("tn", "df_t"), tf, "tqdl", "tavg")
    return f"""WITH {fielded_ctes(title_words, table, title_stop)},
dfs AS (SELECT CAST(count(*) FILTER (WHERE {tf} > 0) AS BIGINT) AS df_t FROM docs)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {tf} > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def combined_field_scores_sql(
    term: str,
    w_title: float = 2.0,
    w_body: float = 1.0,
    title_words: int = 8,
    title_stop: bool = True,
    table: str = "documents",
) -> str:
    """(doc_id, score) CombinedFieldQuery (BM25F) oracle
    (``search/CombinedFieldQuery.java`` + ``MultiNormsLeafSimScorer``):
    freq = w_t*tf_title + w_b*tf_body; combined quantized length =
    largest LENGTH_TABLE value <= floor(w_t*tqdl + w_b*bqdl + 0.5)
    (intToByte4 of Math.round); pseudo stats df = max per-field df,
    docCount = max per-field docCount, sumTotalTermFreq =
    w_t*sum_title + w_b*sum_body."""
    wt = f"CAST('{float(w_title)!r}' AS DOUBLE)"
    wb = f"CAST('{float(w_body)!r}' AS DOUBLE)"
    tf_t = _ftf("ttoks", term)
    tf_b = _ftf("btoks", term)
    freq = f"({wt} * CAST({tf_t} AS DOUBLE) + {wb} * CAST({tf_b} AS DOUBLE))"
    mlraw = f"floor({wt} * tqdl + {wb} * bqdl + 0.5)"
    ml = f"list_max(list_filter([{_LT}], v -> v <= {mlraw}))"
    idf = (
        f"ln(1.0 + (CAST(cn - cdf AS DOUBLE) + 0.5) / "
        f"(CAST(cdf AS DOUBLE) + 0.5))"
    )
    nf = f"{K1} * ({1.0 - B} + ({B} * {ml}) / cavg)"
    score = f"({idf}) - ({idf}) / (1.0 + {freq} / ({nf}))"
    return f"""WITH {fielded_ctes(title_words, table, title_stop)},
csums AS (
  SELECT CAST(sum(len(ttoks)) AS BIGINT) AS tsum,
         CAST(sum(len(btoks)) AS BIGINT) AS bsum
  FROM docs
),
cdfs AS (
  SELECT greatest(
           CAST(count(*) FILTER (WHERE {tf_t} > 0) AS BIGINT),
           CAST(count(*) FILTER (WHERE {tf_b} > 0) AS BIGINT)
         ) AS cdf
  FROM docs
),
cstats AS (
  SELECT greatest(tn, bn) AS cn,
         ({wt} * CAST(tsum AS DOUBLE) + {wb} * CAST(bsum AS DOUBLE))
           / CAST(greatest(tn, bn) AS DOUBLE) AS cavg
  FROM stats, csums
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, cdfs, cstats
WHERE {freq} > 0.0
ORDER BY doc_id"""


def fielded_or_scores_sql(
    title_term: str, body_term: str, title_words: int = 8, table: str = "documents"
) -> str:
    """(doc_id, score) of ``title:t1 OR t2`` over ALL matching docs —
    each clause scored with its own field's stats/norms, accumulated in
    clause order (title then body) like the boolean kernel."""
    ttf = _ftf("ttoks", title_term)
    btf = _ftf("btoks", body_term)
    ts = _fscore(_fidf("tn", "df_t"), ttf, "tqdl", "tavg")
    bs = _fscore(_fidf("bn", "df_b"), btf, "bqdl", "bavg")
    return f"""WITH {fielded_ctes(title_words, table)},
dfs AS (
  SELECT CAST(count(*) FILTER (WHERE {ttf} > 0) AS BIGINT) AS df_t,
         CAST(count(*) FILTER (WHERE {btf} > 0) AS BIGINT) AS df_b
  FROM docs
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       0.0 + (CASE WHEN {ttf} > 0 THEN {ts} ELSE 0.0 END)
           + (CASE WHEN {btf} > 0 THEN {bs} ELSE 0.0 END) AS score
FROM docs, stats, dfs
WHERE {ttf} > 0 OR {btf} > 0
ORDER BY doc_id"""


def sloppy_match_sql(
    t1: str, t2: str, off2: int, slop: int, table: str = "documents"
) -> str:
    """(doc_id) docs where the two-term sloppy phrase matches: EXISTS
    positions a of t1, b of t2 with window(a - 0, b - off2) <= slop —
    exactly the no-repeats SloppyPhraseMatcher match set (the greedy
    matcher finds a match iff such a selection exists; fuzz-verified).
    The float32 sloppyFreq itself is not SQL-expressible; scores are
    gated by tests/test_sloppy.py instead."""
    p1 = f"list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t1}')"
    p2 = f"list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t2}')"
    win = f"greatest(a, b - {off2}) - least(a, b - {off2})"
    hit = (
        f"len(list_filter({p1}, a -> "
        f"len(list_filter({p2}, b -> {win} <= {slop})) > 0)) > 0"
    )
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs WHERE {hit}
ORDER BY doc_id"""


def nested_or_and_topk_sql(
    a: str, b: str, c: str, k: int = 10, table: str = "documents"
) -> str:
    """Top-k for the NESTED tree ``a OR (b AND c)`` — a conjunctive
    clause inside a scored disjunction (``BooleanQuery.java`` nested
    clauses; scored by the engine's _BoolLeaf WAND adapter). Float64
    accumulation order mirrored: outer clause order (a, nested), inner
    clause order (b, c), nested sum parenthesized before the outer add."""
    terms = [a, b, c]
    sa = _score(_idf(0), _tf(a))
    sb = _score(_idf(1), _tf(b))
    sc = _score(_idf(2), _tf(c))
    nested = f"((0.0 + {sb}) + ({sc}))"
    score = (
        f"0.0 + (CASE WHEN {_tf(a)} > 0 THEN {sa} ELSE 0.0 END)"
        f" + (CASE WHEN {_tf(b)} > 0 AND {_tf(c)} > 0"
        f" THEN {nested} ELSE 0.0 END)"
    )
    match = f"{_tf(a)} > 0 OR ({_tf(b)} > 0 AND {_tf(c)} > 0)"
    return f"""WITH {base_ctes(table)},
{_df_cte(terms)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, {score} AS score
FROM docs, stats, dfs
WHERE {match}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def sloppy_topk_rows_sql(
    t1: str, t2: str, off2: int, slop: int, k: int = 10,
    table: str = "documents",
) -> str:
    """ROWS+SCHEMA oracle for the sloppy-phrase top-k gate entry.

    The matching-doc count (hence the top-k row count, min(k, matches))
    and the column names are exact; the scores are NOT — the engine's
    ordering uses the float32 greedy sloppyFreq accumulation
    (``search/SloppyPhraseMatcher.java:86-95`` via
    ``PhraseScorer.java:86-95``), which is not SQL-expressible, so the
    driver's value hash is expected to mismatch on this one entry
    (rows/schema green, hash red — an upgrade from no-oracle). The
    score values themselves are gated bit-exactly by
    ``tests/test_sloppy.py`` against the Python reference matcher."""
    p1 = f"list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t1}')"
    p2 = f"list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t2}')"
    win = f"greatest(a, b - {off2}) - least(a, b - {off2})"
    hit = (
        f"len(list_filter({p1}, a -> "
        f"len(list_filter({p2}, b -> {win} <= {slop})) > 0)) > 0"
    )
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id, 0.0 AS score
FROM docs WHERE {hit}
ORDER BY doc_id
LIMIT {k}"""


def field_exists_sql(title_words: int = 8, table: str = "documents") -> str:
    """(doc_id) docs whose TITLE field has >=1 token (FieldExistsQuery
    over the per-field norms)."""
    return f"""WITH {fielded_ctes(title_words, table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs WHERE len(ttoks) > 0
ORDER BY doc_id"""


def group_topk_sql(
    term: str, group_col: str = "lang", n_groups: int = 4, k: int = 2,
    table: str = "documents",
) -> str:
    """Grouping two-pass (``Searcher.group_topk``): top ``n_groups``
    groups by best doc score (tie: doc asc, group asc), top ``k`` docs
    within each. Mirrors the engine's two window ranks exactly; the
    engine's NULL group cannot arise here (every doc carries
    ``group_col``)."""
    return f"""WITH {base_ctes(table)},
{_df_cte([term])},
scored AS (
  SELECT d.doc_id, {_score(_idf(0), _tf(term))} AS score, t.{group_col} AS grp
  FROM docs d, stats, dfs
  JOIN {table} t ON t.doc_id = d.doc_id
  WHERE {_tf(term)} > 0
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY grp ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
),
heads AS (
  SELECT grp, CAST(row_number() OVER (
      ORDER BY score DESC, doc_id ASC, grp ASC) AS INTEGER) AS group_rank
  FROM ranked WHERE rank = 1
  ORDER BY score DESC, doc_id ASC, grp ASC
  LIMIT {n_groups}
)
SELECT r.grp AS {group_col}, h.group_rank, r.rank,
       CAST(r.doc_id AS BIGINT) AS doc_id,
       printf('%012d', r.doc_id) AS url, r.score
FROM ranked r JOIN heads h ON r.grp = h.grp
WHERE r.rank <= {k}
ORDER BY h.group_rank, r.rank"""


def facet_ranges_sql(
    term: str, ranges, value_col: str = "n_chars", table: str = "documents",
) -> str:
    """Range facets (``Searcher.facet_ranges``): per-range counts over
    the term's match set; ranges may OVERLAP (conditional sums, not a
    bucketing GROUP BY). ``ranges``: (label, lo, hi[, inc_lo, inc_hi]),
    defaults inc_lo=True / inc_hi=False like the engine."""
    selects = []
    for r in ranges:
        label, lo, hi = r[0], r[1], r[2]
        inc_lo = bool(r[3]) if len(r) > 3 else True
        inc_hi = bool(r[4]) if len(r) > 4 else False
        conds = []
        if lo is not None:
            conds.append(f"v {'>=' if inc_lo else '>'} {lo}")
        if hi is not None:
            conds.append(f"v {'<=' if inc_hi else '<'} {hi}")
        body = (
            f"count(*) FILTER (WHERE {' AND '.join(conds)})"
            if conds else "count(*)"
        )
        selects.append(
            f"SELECT '{label}' AS label, CAST({body} AS BIGINT) AS count FROM vals"
        )
    u = "\nUNION ALL ".join(selects)
    return f"""WITH {base_ctes(table)},
vals AS (
  SELECT t.{value_col} AS v
  FROM docs d JOIN {table} t ON t.doc_id = d.doc_id
  WHERE {_tf(term)} > 0
)
{u}"""


def highlight_topk_sql(
    term: str, k: int = 10, passage_tokens: int = 24,
    table: str = "documents",
) -> str:
    """Single-term best-passage highlight over the top-k
    (``Searcher.highlight`` with max_passages=1): windows of
    ``passage_tokens`` EMITTED (post-stopword) tokens, best window =
    (most occurrences, earliest) — the engine's (-uniq, -occ, w0) key
    degenerates to that for one term — char span from the window's
    first emitted token start to its last emitted token end, each
    occurrence wrapped <b></b>, '...' unless the window touches the
    document edge. Valid because this corpus's text is single-space
    token-joined ASCII, so prefix sums over raw tokens reproduce the
    UAX#29 re-analysis offsets the engine reads
    (``uhighlight/UnifiedHighlighter.java`` OffsetSource.ANALYSIS)."""
    return f"""WITH {base_ctes(table)},
{_df_cte([term])},
topk AS (
  SELECT doc_id, {_score(_idf(0), _tf(term))} AS score
  FROM docs, stats, dfs
  WHERE {_tf(term)} > 0
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
rt AS (
  SELECT d.doc_id, unnest(d.raw) AS tok,
         unnest(range(1, len(d.raw) + 1)) AS i
  FROM docs d JOIN topk USING (doc_id)
),
pos AS (
  SELECT doc_id, tok, i,
         coalesce(sum(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
  FROM rt
),
em AS (
  SELECT doc_id, tok, cs, cs + length(tok) AS ce,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS eidx
  FROM pos WHERE tok NOT IN ({_STOP})
),
wstats AS (
  SELECT doc_id, eidx // {passage_tokens} AS w, count(*) AS occ
  FROM em WHERE tok = '{term}' GROUP BY doc_id, eidx // {passage_tokens}
),
best AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY occ DESC, w ASC) AS rn
    FROM wstats) WHERE rn = 1
),
span AS (
  SELECT e.doc_id, min(e.cs) AS s0, max(e.ce) AS e1,
         min(e.eidx) AS we0, max(e.eidx) AS we1
  FROM em e JOIN best b
    ON e.doc_id = b.doc_id AND e.eidx // {passage_tokens} = b.w
  GROUP BY e.doc_id
),
ncnt AS (SELECT doc_id, count(*) AS n FROM em GROUP BY doc_id)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       printf('%012d', t.doc_id) AS url, t.score,
       (CASE WHEN s.we0 = 0 THEN '' ELSE '...' END) ||
       regexp_replace(substring(d.text, CAST(s.s0 + 1 AS BIGINT),
                                CAST(s.e1 - s.s0 AS BIGINT)),
                      '\\b{term}\\b', '<b>{term}</b>', 'g') ||
       (CASE WHEN s.we1 = c.n - 1 THEN '' ELSE '...' END) AS snippet
FROM topk t
JOIN span s ON s.doc_id = t.doc_id
JOIN ncnt c ON c.doc_id = t.doc_id
JOIN {table} d ON d.doc_id = t.doc_id
ORDER BY t.score DESC, t.doc_id ASC"""


def interval_ordered_topk_sql(
    t1: str, t2: str, k: int = 10, pivot: float = 1.0,
    table: str = "documents",
) -> str:
    """Top-k for IntervalQuery(ordered(t1, t2)) in the engine's f64
    mirror. For two single-position terms the reference's lazy
    minimization enumerates exactly the minimal pairs (a, b) with
    b = min{p2 > a} and no other t1 position inside (a, b)
    (``OrderedIntervalsSource.java`` nextInterval; pinned by the
    golden enumeration tests in tests/test_intervals.py), so
    freq = sum over minimal pairs of 1/max((b - a + 1) - minExtent + 1,
    1) = 1/max(b - a, 1) and score = pivot saturation
    (``IntervalScorer.java:43-52`` + ``IntervalScoreFunction.java``).
    Positions are RAW token indices (stopword holes consume positions),
    matching the indexed position space; pair differences are
    1-base-invariant."""
    p = "list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t}')"
    p1, p2 = p.format(t=t1), p.format(t=t2)
    minb = "list_min(list_filter(p2, b -> b > a))"
    minimal = (
        f"len(list_filter(p2, b -> b > a)) > 0 AND "
        f"len(list_filter(p1, a2 -> a2 > a AND a2 < {minb})) = 0"
    )
    freq = (
        f"list_sum(list_transform(list_filter(p1, a -> {minimal}), "
        f"a -> 1.0 / greatest({minb} - a, 1)))"
    )
    return f"""WITH {base_ctes(table)},
pos AS (SELECT doc_id, {p1} AS p1, {p2} AS p2 FROM docs),
freqs AS (SELECT doc_id, {freq} AS freq FROM pos)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       1.0 - CAST('{pivot}' AS DOUBLE) / (CAST('{pivot}' AS DOUBLE) + freq) AS score
FROM freqs WHERE freq IS NOT NULL AND freq > 0
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def matches_offsets_term_sql(term: str, k: int = 10, table: str = "documents") -> str:
    """Flattened Matches-API spans of a term query's top-k hits,
    offsets read from offsets-in-postings: per occurrence (doc_id,
    start_pos, start_off, end_off).  The top-k CTE is the gate-proven
    BM25 closed form; positions are 1-based indices into the RAW token
    stream (stopword holes consume positions) minus one; char offsets
    derive from the single-space ASCII corpus contract — start of
    token i = len(join(tokens[:i-1])) + 1 separator."""
    off = (
        "CASE WHEN i = 1 THEN 0 "
        "ELSE len(array_to_string(raw[1:i-1], ' ')) + 1 END"
    )
    return f"""WITH {base_ctes(table)},
{_df_cte([term])},
topk AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, {_score(_idf(0), _tf(term))} AS score
  FROM docs, stats, dfs
  WHERE {_tf(term)} > 0
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
occ AS (
  SELECT d.doc_id AS doc_id,
         unnest(list_filter(range(1, len(d.raw) + 1), i -> d.raw[i] = '{term}')) AS i,
         d.raw AS raw
  FROM docs d JOIN topk t ON d.doc_id = t.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(i - 1 AS INT) AS start_pos,
       CAST({off} AS INT) AS start_off,
       CAST(({off}) + len(raw[i]) AS INT) AS end_off
FROM occ
ORDER BY doc_id, start_pos"""


def interval_payload_match_sql(t: str, table: str = "documents") -> str:
    """Match set of IntervalQuery(payload_filtered_term(t, even)):
    the payload-plane index decorates token k as ``tok|k``
    (DelimitedPayloadTokenFilter, identity encoder), so the filtered
    iterator keeps exactly the even 0-based whitespace positions of
    ``t``; a doc matches iff one survives the payload filter
    (``PayloadFilteredTermIntervalsSource.java:118-126``).  The corpus
    text is single-space ASCII, so DuckDB's 1-based string_split
    positions map to the analyzer's 0-based stream as i - 1."""
    return f"""WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS raw FROM {table}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM s
WHERE len(list_filter(range(1, len(raw) + 1),
          i -> raw[i] = '{t}' AND (i - 1) % 2 = 0)) > 0
ORDER BY doc_id"""


def interval_unordered_match_sql(
    t1: str, t2: str, max_gaps: int, table: str = "documents"
) -> str:
    """Match set of IntervalQuery(maxgaps(g, unordered(t1, t2))): a doc
    matches iff SOME pair of positions satisfies |a - b| - 1 <= g —
    equivalent to some minimal interval passing the gaps filter, since
    any within-range pair contains a minimal interval at most as wide
    (``UnorderedIntervalsSource.java`` + FilteredIntervalsSource
    MAXGAPS; gaps of a two-term interval = width - 2)."""
    p = "list_filter(range(1, len(raw) + 1), i -> raw[i] = '{t}')"
    p1, p2 = p.format(t=t1), p.format(t=t2)
    hit = (
        f"len(list_filter({p1}, a -> len(list_filter({p2}, "
        f"b -> abs(a - b) <= {max_gaps} + 1)) > 0)) > 0"
    )
    return f"""WITH {base_ctes(table)}
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM docs WHERE {hit}
ORDER BY doc_id"""
