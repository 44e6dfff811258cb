"""Ad-hoc runner: python tests/run_oracle_check.py [sf_dir]

Prints one line per registered query: OK/FAIL + detail. Used while
iterating; the pytest wrapper (test_queries_oracle.py) runs the same
comparison as part of the suite.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries
from opentelemetry_iceberg_exporter_spark.session import build_session
from oracle_harness import compare, duck_connection


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    only = argv[1].split(",") if len(argv) > 1 else None
    if vanilla:
        # replicate the round driver exactly: a bare session with none of
        # build_session's configs (UTC tz, AQE tuning, Arrow, ...)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
    else:
        spark = build_session(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    specs = load_all_queries()
    n_fail = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            res = compare(name, df, con, spec.oracle)
            status = "OK  " if res.ok else "FAIL"
            if not res.ok:
                n_fail += 1
            print(
                f"{status} {name}: {res.detail} "
                f"(rows s={res.spark_rows} d={res.duck_rows}) [{time.time()-t0:.1f}s]"
            )
        except Exception as e:
            n_fail += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
