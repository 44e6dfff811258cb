"""Cross-engine-deterministic scalar/array builders.

Design constraints (these drive the whole correctness strategy):

* Every function must be expressible identically in DuckDB SQL so the
  driver's oracle comparison hash-matches.  The only hash primitive that
  is bit-identical across Spark and DuckDB is `md5(string)`; 64-bit
  integer hashes are derived as the first 15 hex chars (60 bits, always
  positive in an int64).
* Floating-point aggregation order is not deterministic under parallel
  execution, so money-style sums accumulate in exact DECIMAL and are cast
  to double at the end — bit-identical in any engine, any partition order.
* Everything is a Catalyst expression (whole-stage codegen, vectorized);
  no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for derived integer hashes: fits products within int64
HASH_MOD = 1_000_000_007


def md5_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit positive integer hash of a string column.

    Spark:  conv(substr(md5(x),1,15),16,10)::bigint
    DuckDB: ('0x'||substring(md5(x),1,15))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: split(trim(x), '\\s+').

    DuckDB equivalent: regexp_split_to_array(trim(x), '\\s+')
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def tokens_sql(col_sql: str) -> str:
    """SQL-text twin of tokens() (plan-build fast path; see
    test_minhash_sql_parity for the pinning pattern)."""
    return f"split(trim({col_sql}), '\\\\s+')"


def ngrams_sql(tokens_sql_expr: str, n: int, sep: str = " ") -> str:
    """SQL-text twin of ngrams(): word n-grams from a token-array SQL
    expression, let-bound via the one-element array(...) transform so
    the input evaluates once per row; short docs yield an EMPTY array
    (the sequence(1,0)-descends guard)."""
    grams = ", ".join(f"element_at(t, cast(i + {j} as int))" for j in range(n))
    return (
        f"element_at(transform(array({tokens_sql_expr}), t -> "
        f"case when size(t) >= {n} then "
        f"transform(sequence(1, size(t) - {n - 1}), i -> concat_ws('{sep}', {grams})) "
        "else cast(array() as array<string>) end), 1)"
    )


def ngrams(tokens_col: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams as strings from a token array (1-indexed element_at).

    Empty result (not null) when the doc has fewer than n tokens.
    DuckDB equivalent:
        list_transform(range(1, len(t)-(n-1)+1), i -> t[i] || ' ' || t[i+1] ...)

    The input expression is let-bound via a single-element-array transform
    so it evaluates ONCE per row: referencing `tokens_col` directly inside
    the index lambda would re-evaluate it (e.g. the regexp split) for
    every element_at of every n-gram — measured 14x slower.
    """

    def build(t: Column) -> Column:
        # NB: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty —
        # guard short docs explicitly.
        idx = F.sequence(F.lit(1), F.size(t) - F.lit(n - 1))

        def make(i: Column) -> Column:
            cols = [F.element_at(t, (i + F.lit(j)).cast("int")) for j in range(n)]
            return F.concat_ws(sep, *cols)

        return F.when(F.size(t) >= n, F.transform(idx, make)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(tokens_col), build), 1)


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a money-like double column.

    Accumulates in DECIMAL(18,scale) (exact, associative) and casts the
    final value to double — deterministic under any partition order.
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def safe_avg(col: Column | str, scale: int = 6, round_to: int = 4) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double
    space, rounded.  DuckDB:
    ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x), 4)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c), round_to
    )
