"""Capture .explain('formatted') for headline queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> [query,query,...]
Writes plans/r13/<name>_<suffix>.txt for each query.
Plan-only (no execution) — safe to run any time.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries
from opentelemetry_iceberg_exporter_spark.session import build_session

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q08_top_orders_per_priority",
    "q09_top10_filtered_lineitems",
    "e01_epoch_hour_partition",
    "e07_asof_join_last_order",
    "e09_sessionize",
    "d08_substr_spans",
    "d03_minhash_lsh_pairs",
    "d04_ngram_jaccard_pairs",
    "d02_signatures",
    "s01_knn_bruteforce",
    "s02_ann_lsh",
    "s03_ann_ivf",
    "t01_doc_features",
    "t05_top_bigrams",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        app_name="capture-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
