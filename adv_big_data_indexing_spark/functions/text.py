"""Shared text primitives for the text-analysis / dedup operator families.

All expression-only (JVM-side, whole-stage-codegen friendly): tokenize,
word n-gram shingles, deterministic 64-bit-hex minhash material. Each
has an exact DuckDB mirror used by the oracles, so results are
bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a single-space-separated document."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


#: DuckDB mirror of :func:`tokens`.
DUCK_TOKENS = "regexp_split_to_array(trim({col}), '\\s+')"


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* tokens column.

    ``toks`` must be a plain column reference (project ``tokens(...)``
    first): Spark does no subexpression elimination inside higher-order
    lambdas, so passing the split expression directly re-tokenizes the
    document for every element access (~100× slower).

    Uses transform over an index sequence rather than a window — no
    shuffle, purely per-row, scales embarrassingly.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)])  # noqa: E731
    return F.array_distinct(F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(F.array()))


#: DuckDB mirror of :func:`shingles` (n=3), 1-based list indexing.
DUCK_SHINGLES3 = (
    "list_distinct(CASE WHEN len({toks}) >= 3 THEN "
    "list_transform(generate_series(1, len({toks}) - 2), "
    "i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) "
    "ELSE [] END)"
)


def minhash_hex(shingle: Column, seed: Column) -> Column:
    """64-bit-hex hash material: first 16 hex chars of md5(seed ':' shingle).

    Fixed-width lowercase hex ⇒ lexicographic MIN == numeric MIN, so
    min-hashing works on strings — portable to any engine with md5.
    """
    return F.substring(F.md5(F.concat_ws(":", seed.cast("string"), shingle)), 1, 16)


#: DuckDB mirror of :func:`minhash_hex`.
DUCK_MINHASH = "substr(md5(CAST({seed} AS VARCHAR) || ':' || {shingle}), 1, 16)"

#: Nibble value of one hex char (both engines): strpos over the hex alphabet.
HEX_ALPHABET = "0123456789abcdef"


def hex_nibble(ch: Column) -> Column:
    """hex char -> 0..15 as int."""
    return (F.instr(F.lit(HEX_ALPHABET), ch) - 1).cast("int")


DUCK_HEX_NIBBLE = "(strpos('0123456789abcdef', {ch}) - 1)"
