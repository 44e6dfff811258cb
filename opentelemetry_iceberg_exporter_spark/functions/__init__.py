"""Reusable scalar/array column builders (all JVM-side Catalyst expressions,
no Python UDFs) shared by the operator library and query surface."""

from .textfns import (
    md5_hash64,
    money_sum,
    ngrams,
    safe_avg,
    tokens,
)

__all__ = ["md5_hash64", "money_sum", "ngrams", "safe_avg", "tokens"]
