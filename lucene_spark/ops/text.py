"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-marker heuristic), quality scoring, token
counting, and document fingerprinting over the ``documents`` table
(``doc_id, text, lang, source, n_chars``). Every op renders to both
Spark SQL (the engine path — built-in functions only, whole-stage
codegen) and DuckDB SQL (the driver's oracle) via
:mod:`lucene_spark.ops.dialect`.

Scale notes (100 TB): all ops are embarrassingly parallel per-row
projections — no shuffle, no UDF; Catalyst pushes the needed-column
pruning to the parquet scan (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from lucene_spark.ops import dialect as dl
from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS

STOPWORDS = sorted(ENGLISH_STOP_WORDS)

# deterministic language marker sets (stub heuristic: real n-gram models
# are external data — forbidden here; the *plumbing* is the deliverable)
_MARKERS = {
    "en": ["the", "a", "an", "and", "of", "is", "to", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "y"],
}


def _toks(d: str) -> str:
    return dl.tokens(d)


def token_count_sql(d: str, table: str = "documents") -> str:
    """(doc_id, n_tokens, n_types): token & distinct-token counts."""
    t = _toks(d)
    return f"""
SELECT doc_id,
       CAST({dl.list_size(d, t)} AS BIGINT) AS n_tokens,
       CAST({dl.list_size(d, dl.list_distinct(d, t))} AS BIGINT) AS n_types
FROM {table}
ORDER BY doc_id
"""


def quality_sql(d: str, table: str = "documents") -> str:
    """(doc_id, n_chars, n_tokens, stop_ratio, avg_token_len, alpha_ratio).

    Quality signals: length, stopword density, mean token length,
    alphabetic-char ratio. All divisions are single float64 ops on exact
    integers — bit-identical across engines.
    """
    t = _toks(d)
    stop_in = dl.in_list(d, "tk", STOPWORDS)
    n_stop = dl.list_size(d, dl.filter_(d, "toks", "tk", stop_in))
    sum_len = dl.isum(d, dl.transform(d, "toks", "tk", "CAST(length(tk) AS BIGINT)"))
    return f"""
WITH tok AS (
  SELECT doc_id, length(text) AS n_chars, {t} AS toks FROM {table}
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST({dl.list_size(d, 'toks')} AS BIGINT) AS n_tokens,
       CAST({n_stop} AS DOUBLE) / {dl.list_size(d, 'toks')} AS stop_ratio,
       CAST({sum_len} AS DOUBLE) / {dl.list_size(d, 'toks')} AS avg_token_len,
       CAST({sum_len} AS DOUBLE) / n_chars AS alpha_ratio
FROM tok
WHERE {dl.list_size(d, 'toks')} > 0
ORDER BY doc_id
"""


def lang_id_sql(d: str, table: str = "documents") -> str:
    """(doc_id, pred_lang): argmax of per-language marker-word hit
    counts; 'und' when no marker hits. Deterministic tie-break by
    language code order en < de < fr < es (first max wins)."""
    t = _toks(d)
    scores = []
    for lang in ("en", "de", "fr", "es"):
        hit = dl.in_list(d, "tk", sorted(_MARKERS[lang]))
        scores.append(
            f"CAST({dl.list_size(d, dl.filter_(d, 'toks', 'tk', hit))} AS BIGINT) AS s_{lang}"
        )
    score_cols = ",\n       ".join(scores)
    best = (
        "CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und' "
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"
    )
    return f"""
WITH tok AS (SELECT doc_id, {t} AS toks FROM {table}),
scored AS (
  SELECT doc_id,
       {score_cols}
  FROM tok
)
SELECT doc_id, {best} AS pred_lang FROM scored ORDER BY doc_id
"""


def fingerprint_sql(d: str, table: str = "documents") -> str:
    """(doc_id, fp, content_sha): md5 fingerprint of the normalized
    (lowercased, tokenized, space-rejoined) text + sha256 of raw text.
    The md5-of-normalized form is the exact-dedup key that survives
    whitespace/punctuation jitter."""
    t = _toks(d)
    joined = (
        f"array_join({t}, ' ')" if d == dl.SPARK else f"array_to_string({t}, ' ')"
    )
    return f"""
SELECT doc_id,
       {dl.md5(d, joined)} AS fp,
       {dl.sha256(d, 'text')} AS content_sha
FROM {table}
ORDER BY doc_id
"""
