"""Helpers that render DuckDB-ANSI SQL fragments mirroring the engine's
vector/hash expressions, for the correctness oracle.

The Spark side folds arrays sequentially in double precision; these
fragments do the same (``list_sum`` over an index-ordered
``list_transform``), and computed floats are rounded to 6 dp on both sides
before comparison.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

_ROUND_CALL = re.compile(r"(?<![A-Za-z0-9_])round\s*\(", re.IGNORECASE)


def _next_round_match(sql: str) -> "re.Match | None":
    """First ``round(`` match OUTSIDE single-quoted SQL literals.

    A bare ``_ROUND_CALL.search`` would also hit a ``round(`` spelled
    inside a string literal (e.g. a regexp pattern), and then either
    corrupt the literal by wrapping it in place or — when the literal
    leaves parens unbalanced — abort normalization for the whole
    remainder. Scan with the same quote-skip loop the paren scanner
    uses so literals are transparent to the search. ``--`` line
    comments are skipped too: an apostrophe in comment prose (\"the
    Spark side's ...\") would otherwise flip the quote state and
    swallow every genuine round( after it."""
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "-" and sql.startswith("--", i):
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl + 1
            continue
        if sql[i] == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
            i += 1
            continue
        m = _ROUND_CALL.match(sql, i)
        if m:
            return m
        i += 1
    return None


def normalize_round_sign(sql: str) -> str:
    """Rewrite every ``round(...)`` in an oracle SQL string to
    ``(round(...) + 0.0)``.

    Why: Spark's ``round`` goes through Java BigDecimal, which has no
    signed zero, so Spark can never emit IEEE ``-0.0``; DuckDB's
    ``round`` preserves it (``round(-1e-17, 6)`` -> ``-0.0``). The
    driver's value hash distinguishes the two, so any oracle that rounds
    a potentially-negative-but-tiny expression (cosine self-distance,
    dot products, slopes, drifts) is a latent coin-flip — this was the
    r3 ``ann_knn_join`` red row. Adding ``+ 0.0`` maps ``-0.0`` to
    ``+0.0`` (IEEE round-to-nearest) and is exact for every other value,
    so applying it blanket-fashion at registration is safe.

    The scanner is quote-aware at BOTH steps — finding the next
    ``round(`` (a ``round(`` inside a quoted literal is never a match)
    and matching its closing paren (quoted parens don't count) — and
    recurses into both the call arguments and the remainder, so nested
    rounds are wrapped too.
    """
    m = _next_round_match(sql)
    if not m:
        return sql
    j = m.end() - 1  # at '('
    depth = 0
    n = len(sql)
    while j < n:
        c = sql[j]
        if c == "-" and sql.startswith("--", j):
            nl = sql.find("\n", j)
            j = (n if nl < 0 else nl) - 1  # -1: loop's += 1 lands on \n
        elif c == "'":
            j += 1
            while j < n and sql[j] != "'":
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if j >= n:  # unbalanced — leave untouched rather than corrupt
        return sql
    inner = normalize_round_sign(sql[m.end():j])
    rest = normalize_round_sign(sql[j + 1:])
    return sql[:m.start()] + "(round(" + inner + ") + 0.0)" + rest


def sql_double_list(values: Sequence[float]) -> str:
    return "([" + ", ".join(repr(float(v)) for v in values) + "]::DOUBLE[])"


def sql_dot(a: str, b: str) -> str:
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_l2_sq(a: str, b: str) -> str:
    """Squared L2 distance — the same sequential element-order fold as
    functions/vector.py:l2_sq."""
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) "
            f"* ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))")


def sql_cosine_distance(a: str, b: str) -> str:
    return f"(1.0 - {sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"


# ---- text / hash mirrors (functions/text.py, functions/hashing.py) ------

def sql_words(col: str) -> str:
    return f"string_split({col}, ' ')"


def sql_shingles(words: str, n: int = 3) -> str:
    """Word n-gram shingles over a words-list expression."""
    return (f"CASE WHEN len({words}) >= {n} THEN "
            f"list_transform(generate_series(1, len({words}) - {n - 1}), "
            f"i -> array_to_string(list_slice({words}, i, i + {n - 1}), ' ')) "
            f"ELSE []::VARCHAR[] END")


def sql_minhash_signature(shingles: str, num_hashes: int = 16) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingles}, s -> md5('{i}|' || s)))"
        for i in range(num_hashes)
    )
    return f"[{mins}]"


def sql_lsh_band_keys(sig: str, bands: int, rows_per_band: int) -> str:
    keys = ", ".join(
        f"md5('{b}' || ',' || array_to_string("
        f"list_slice({sig}, {b * rows_per_band + 1}, {(b + 1) * rows_per_band}), ','))"
        for b in range(bands)
    )
    return f"[{keys}]"


HEX_HIGH_SQL = "('8','9','a','b','c','d','e','f')"


def sql_simhash32(words: str) -> str:
    return (
        "array_to_string(list_transform(generate_series(1, 32), j -> "
        f"CASE WHEN list_sum(list_transform({words}, t -> "
        f"CASE WHEN substring(md5(t), j, 1) IN {HEX_HIGH_SQL} THEN 1 ELSE -1 END)) > 0 "
        "THEN '1' ELSE '0' END), '')"
    )


def sql_stopword_hits(words_lower: str, stopwords: Sequence[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return f"len(list_filter({words_lower}, t -> t IN ({inlist})))"


def sql_hash_bucket(h: str, bits: int = 6) -> str:
    """6-bit feature-hash bucket from the high bits of the first `bits`
    md5 hex nibbles (functions/embed.py)."""
    terms = " + ".join(
        f"(CASE WHEN substring({h}, {i + 1}, 1) IN {HEX_HIGH_SQL} "
        f"THEN {1 << (bits - 1 - i)} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def sql_hash_sign(h: str, bits: int = 6) -> str:
    return (f"(CASE WHEN substring({h}, {bits + 1}, 1) IN {HEX_HIGH_SQL} "
            f"THEN 1 ELSE -1 END)")


# ---- driver-safe array serialization ------------------------------------
#
# The driver's pandas canonicalizer sorts result columns, which raises
# `TypeError: unhashable type: 'list'` on array-typed cells. Queries whose
# *output* is a vector therefore serialize it to a deterministic string on
# both sides; arrays stay arrays internally.

def sql_arr_int_str(a: str) -> str:
    """Integer list -> comma-joined string (matches Spark's
    ``array_join(cast(a as array<string>), ',')`` for integral types)."""
    return f"array_to_string({a}, ',')"


def sql_arr_num6_str(a: str) -> str:
    """Float list -> comma-joined fixed-point string. The DECIMAL(18,6)
    pivot makes the rendering engine-independent (double repr is not)."""
    return (f"array_to_string(list_transform({a}, "
            f"x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) "
            f"AS VARCHAR)), ',')")


def sql_arr_str_str(a: str, sep: str = "|") -> str:
    """String list -> joined string ('|' avoids commas inside values)."""
    return f"array_to_string({a}, '{sep}')"
