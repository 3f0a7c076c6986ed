"""Tokenization and shingling builders (Spark Column + DuckDB SQL).

The ``documents.text`` fixture is whitespace-tokenizable by
construction (FIXTURES.md); shingles are n-token windows joined by a
single space, deduplicated — the standard unit for MinHash/Jaccard
near-dup detection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_spark(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, " ")


def tokens_duck(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def shingles_spark(text: Column, n: int = 3) -> Column:
    """Distinct n-token shingles of ``text`` as array<string>.

    Empty when the document has fewer than n tokens (guarded — Spark's
    ``sequence(1, k)`` would count *down* for k < 1).
    """
    toks = tokens_spark(text)
    n_sh = F.size(toks) - (n - 1)
    make = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.when(n_sh >= 1, make).otherwise(F.array()))


def shingles_duck(expr: str, n: int = 3) -> str:
    """DuckDB SQL twin of :func:`shingles_spark` (same shingle strings;
    DuckDB's range(a, b) is empty when b <= a, so no guard needed)."""
    toks = tokens_duck(expr)
    return (
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )
