"""Helpers that render DuckDB-ANSI SQL fragments mirroring the engine's
vector/hash expressions, for the correctness oracle.

The Spark side folds arrays sequentially in double precision; these
fragments do the same (``list_sum`` over an index-ordered
``list_transform``), and computed floats are rounded to 6 dp on both sides
before comparison.
"""

from __future__ import annotations

from collections.abc import Sequence


def sql_double_list(values: Sequence[float]) -> str:
    return "([" + ", ".join(repr(float(v)) for v in values) + "]::DOUBLE[])"


def sql_dot(a: str, b: str) -> str:
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine_distance(a: str, b: str) -> str:
    return f"(1.0 - {sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
