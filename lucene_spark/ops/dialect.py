"""Tiny dual-dialect (Spark SQL / DuckDB SQL) expression builders.

The analytics operators must produce *bit-identical* results in Spark
(the engine) and DuckDB (the driver's oracle). Both engines speak SQL
with higher-order list functions, but with different names and list
indexing conventions; this module renders one logical expression into
both dialects so the formulas cannot drift apart.

Conventions:
- list indexing is 1-based in rendered expressions (DuckDB native;
  Spark via ``element_at``),
- integer list sums may reassociate (exact in int64),
- float folds use an explicit sequential left fold in BOTH dialects
  (Spark ``aggregate``, DuckDB ``list_reduce``) so IEEE-754 double
  results are bit-identical given identical inputs.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

TOKEN_PATTERN = "[a-z0-9]+"


def tokens(d: str, text: str = "text") -> str:
    """All word tokens of lower(text): the analyzer-equivalent token
    stream for this ASCII corpus (see analysis/analyzer.py — on text
    restricted to [a-z0-9 .,!?'\\n-] without medial joiners, UAX#29
    reduces to alnum runs)."""
    if d == SPARK:
        return f"regexp_extract_all(lower({text}), '{TOKEN_PATTERN}', 0)"
    return f"regexp_extract_all(lower({text}), '{TOKEN_PATTERN}')"


def elem(d: str, arr: str, i: str) -> str:
    """1-based list element."""
    if d == SPARK:
        return f"element_at({arr}, {i})"
    return f"{arr}[{i}]"


def transform(d: str, arr: str, var: str, body: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def filter_(d: str, arr: str, var: str, body: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def seq_incl(d: str, lo: str, hi: str) -> str:
    """[lo..hi] inclusive; EMPTY when hi < lo (guarded for Spark, whose
    sequence() would count down)."""
    if d == SPARK:
        # guard hi<lo without an untyped empty-array branch (Spark's
        # sequence() counts DOWN when hi<lo; array() is array<null>)
        return f"filter(sequence({lo}, greatest({hi}, {lo})), _x -> _x <= ({hi}))"
    return f"range({lo}, ({hi}) + 1)"


def list_size(d: str, arr: str) -> str:
    return f"size({arr})" if d == SPARK else f"len({arr})"


def list_min(d: str, arr: str) -> str:
    return f"array_min({arr})" if d == SPARK else f"list_min({arr})"


def list_max(d: str, arr: str) -> str:
    return f"array_max({arr})" if d == SPARK else f"list_max({arr})"


def list_distinct(d: str, arr: str) -> str:
    # NB: element ORDER after distinct differs between engines — only use
    # where downstream is order-insensitive (set semantics / counts).
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def isum(d: str, arr: str) -> str:
    """Integer sum of a BIGINT list (order-free: exact arithmetic)."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"coalesce(list_sum({arr}), 0)"


def ffold_sum(d: str, arr: str) -> str:
    """Sequential left float64 fold: 0.0 + x1 + x2 + ... — bit-identical
    across engines (x+0.0 is exact; both folds are left-to-right)."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), (acc, x) -> acc + x)"


def instr(d: str, s: str, sub: str) -> str:
    """1-based position of sub in s (0 if absent)."""
    return f"instr({s}, {sub})" if d == SPARK else f"strpos({s}, {sub})"


def md5(d: str, s: str) -> str:
    return f"md5({s})"  # lowercase hex in both engines


def sha256(d: str, s: str) -> str:
    return f"sha2({s}, 256)" if d == SPARK else f"sha256({s})"


def concat_sep(d: str, sep: str, parts: list) -> str:
    inner = f", '{sep}', ".join(parts)
    return f"concat({inner})" if len(parts) > 1 else parts[0]


def shiftleft(d: str, x: str, n: str) -> str:
    return f"shiftleft({x}, {n})" if d == SPARK else f"(({x}) << ({n}))"


def shiftright(d: str, x: str, n: str) -> str:
    return f"shiftright({x}, {n})" if d == SPARK else f"(({x}) >> ({n}))"


def bitand(d: str, x: str, y: str) -> str:
    return f"({x} & {y})"


def cast_bigint(d: str, x: str) -> str:
    return f"CAST({x} AS BIGINT)"


def cast_double(d: str, x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


def if_(d: str, cond: str, a: str, b: str) -> str:
    return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"


def in_list(d: str, x: str, values: list) -> str:
    vals = ", ".join(f"'{v}'" for v in values)
    return f"({x} IN ({vals}))"


# ---------------------------------------------------------------- compounds


def hex_to_int(d: str, hx: str, nchars: int) -> str:
    """Parse the first ``nchars`` lowercase-hex chars of ``hx`` into a
    BIGINT: sum of digit_i << 4*(n-i). Exact integer math both sides."""
    pos = instr(d, "'0123456789abcdef'", f"substring({hx}, i, 1)")
    digit = f"({pos} - 1)"
    body = shiftleft(d, cast_bigint(d, digit), f"4 * ({nchars} - i)")
    arr = transform(d, seq_incl(d, "1", str(nchars)), "i", body)
    return isum(d, arr)


def word_shingles(d: str, toks: str, n: int = 3) -> str:
    """Space-joined word n-grams of a token list (empty when < n
    tokens)."""
    parts = [elem(d, toks, f"i + {j}") for j in range(n)]
    body = concat_sep(d, " ", parts)
    rng = seq_incl(d, "1", f"{list_size(d, toks)} - {n - 1}")
    return transform(d, rng, "i", body)
