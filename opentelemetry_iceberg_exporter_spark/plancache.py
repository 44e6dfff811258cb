"""Process-level caches for immutable Column expression trees.

Column objects are py4j handles into the ACTIVE JVM gateway: caching
them across a gateway restart (embedded use stopping and relaunching
Spark, some test harnesses) would hand back references to dead JVM
objects that fail opaquely on next use. `column_cache` is lru_cache
with the live gateway's identity folded into the key, so a relaunched
gateway transparently rebuilds the Column trees while the steady-state
hit path stays a plain dict lookup.
"""

from __future__ import annotations

import functools


def gateway_epoch() -> int | None:
    """Identity of the active py4j gateway (None before any context):
    changes whenever Spark is stopped and relaunched in-process."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return id(sc._gateway) if sc is not None else None


def column_cache(maxsize: int = 16):
    """lru_cache for functions returning Column expressions, keyed on
    the live gateway in addition to the arguments. Exposes cache_clear/
    cache_info like functools.lru_cache."""

    def deco(fn):
        @functools.lru_cache(maxsize=maxsize)
        def cached(_epoch, *args, **kwargs):
            return fn(*args, **kwargs)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return cached(gateway_epoch(), *args, **kwargs)

        wrapper.cache_clear = cached.cache_clear
        wrapper.cache_info = cached.cache_info
        return wrapper

    return deco
