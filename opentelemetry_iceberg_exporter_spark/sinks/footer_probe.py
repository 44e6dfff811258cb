"""Distributed parquet-footer probing shared by variant_prune and
bloom_prune.

Both pruners decide per candidate file whether the footer PROVES the
file matchless (variant row-group stats, split-block bloom bitsets).
The decision function is pure Python over one file path; what differs
is WHERE it runs:

* Small candidate lists run on driver threads — the reads are tiny
  ranged tail fetches, I/O bound, and a Spark job would cost more than
  it saves.
* At `DISTRIBUTED_THRESHOLD`+ files (and with a live session) the
  probe ships to EXECUTORS via one `mapInPandas` job. That matters
  precisely for the bloom case: blooms exist for predicates where
  min/max bounds DON'T prune, so the candidate list is the table's
  entire live file set — on a 100 TB table that is O(100k) footer
  reads plus bloom bitsets (up to ~1 MB each). Executor-side, each
  partition opens its own footers/bitsets against shared storage and
  ONLY `(path, verdict)` booleans travel back, keeping the driver at
  O(files) booleans regardless of bitset size.

One Spark job, verdicts-only to the driver — `tests/test_footer_probe.py`
pins both the routing and the plan shape.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable

# Below this many candidates the driver-threaded path wins: a Spark
# job's scheduling overhead exceeds ~64 small ranged reads.
DISTRIBUTED_THRESHOLD = 64

# Ranged tail reads are latency-bound, not CPU-bound: overlap them.
_IO_THREADS = 16


def _driver_verdicts(
    paths: list[str], probe_fn: Callable[[str], bool]
) -> dict[str, bool]:
    """Threaded driver-side probe for small candidate lists."""
    with ThreadPoolExecutor(max_workers=min(_IO_THREADS, len(paths))) as ex:
        return dict(zip(paths, ex.map(probe_fn, paths)))


def _distributed_verdicts(
    spark, paths: list[str], probe_fn: Callable[[str], bool]
) -> dict[str, bool]:
    """One mapInPandas job over the candidate paths: footers and bloom
    bitsets are opened EXECUTOR-side (each partition overlaps its own
    ranged reads on a small thread pool); the job's output schema is
    `(path string, dead boolean)` — booleans only, never footer bytes,
    so driver memory stays O(files) whatever the bitset sizes are."""
    import pandas as pd

    def run(batches: Iterable["pd.DataFrame"]):
        with ThreadPoolExecutor(max_workers=_IO_THREADS) as ex:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "path": pdf["path"],
                        "dead": list(ex.map(probe_fn, pdf["path"])),
                    }
                )

    # ~32 files per task amortizes task launch over enough I/O to keep
    # an executor busy, capped at the cluster's parallelism
    slices = max(
        1,
        min(
            (len(paths) + 31) // 32,
            int(spark.sparkContext.defaultParallelism),
        ),
    )
    rows = (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(slices)
        .mapInPandas(run, "path string, dead boolean")
        .collect()
    )
    return {r["path"]: bool(r["dead"]) for r in rows}


def probe_verdicts(
    paths: list[str],
    probe_fn: Callable[[str], bool],
    spark=None,
    threshold: int = DISTRIBUTED_THRESHOLD,
) -> dict[str, bool]:
    """{path: provably-matchless} for every candidate. Routing: driver
    threads below `threshold` or without a session; executor-side
    mapInPandas at/above it. `probe_fn` must be picklable (module-level
    function or functools.partial over one) and must itself swallow
    per-file read errors into a keep verdict — a probe failure must
    never fail the plan."""
    if not paths:
        return {}
    if spark is None or len(paths) < threshold:
        return _driver_verdicts(paths, probe_fn)
    return _distributed_verdicts(spark, paths, probe_fn)
