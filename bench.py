"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced (count()) — not collected — so the measurement is
plan execution, not driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries
from opentelemetry_iceberg_exporter_spark.session import build_session

# headline set: one per operator family — star join, multi-agg, window
# top-k, pushdown scan, epoch-hour partition, as-of join, sessionize,
# exact dedup, minhash LSH, jaccard pairs, signatures, knn, IVF ANN,
# doc features, top bigrams, streaming window
HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q08_top_orders_per_priority",
    "q09_top10_filtered_lineitems",
    "e01_epoch_hour_partition",
    "e07_asof_join_last_order",
    "e09_sessionize",
    "d01_exact_dedup",
    "d03_minhash_lsh_pairs",
    "d04_ngram_jaccard_pairs",
    "d02_signatures",
    "s01_knn_bruteforce",
    "s02_ann_lsh",
    "s03_ann_ivf",
    "t01_doc_features",
    "t05_top_bigrams",
    "st01_stream_tumbling_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()

    # warm the JVM + file metadata cache outside the measured section
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # cold pass (includes first-run plan compile, comparable round-over-
    # round) then a steady pass (2nd run, plans cached) so regressions are
    # attributable to plan changes rather than plan-compile noise.
    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
    for name in HEADLINE:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        steady[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "value_steady": round(sum(steady.values()), 3),
                "queries_steady": steady,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
