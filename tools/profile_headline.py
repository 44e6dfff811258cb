"""Profile headline queries: split wall time into DataFrame build
(driver/py4j/analysis) vs execution, and pull per-stage executor metrics
from the local UI REST API.

Usage: python tools/profile_headline.py [query,...]   (default: all headline)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from opentelemetry_iceberg_exporter_spark.queries import load_all_queries
from opentelemetry_iceberg_exporter_spark.session import build_session

from capture_plans import HEADLINE  # noqa: E402


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    app_id = spark.sparkContext.applicationId

    # warm like bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # one full warm pass (cold JIT/codegen out of the way)
    for name in names:
        specs[name].fn(spark, sf_dir).count()

    results = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        jobs = [j for j in rest(f"applications/{app_id}/jobs") if j.get("jobGroup") == name]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in rest(f"applications/{app_id}/stages/{sid}"):
                    stages.append(
                        {
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:60],
                            "tasks": att["numCompleteTasks"],
                            "runTimeMs": att["executorRunTime"],
                            "cpuMs": att["executorCpuTime"] // 1_000_000,
                            "shuffleReadMB": round(att["shuffleReadBytes"] / 1e6, 2),
                            "shuffleWriteMB": round(att["shuffleWriteBytes"] / 1e6, 2),
                            "durMs": att.get("executorDeserializeTime", 0),
                        }
                    )
            except Exception:
                pass
        results[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_ids),
            "sum_task_time_s": round(sum(s["runTimeMs"] for s in stages) / 1000, 2),
            "sum_cpu_s": round(sum(s["cpuMs"] for s in stages) / 1000, 2),
            "stages": stages,
        }
        print(
            f"{name}: build={results[name]['build_s']}s exec={results[name]['exec_s']}s "
            f"jobs={len(jobs)} stages={len(stage_ids)} "
            f"taskTime={results[name]['sum_task_time_s']}s cpu={results[name]['sum_cpu_s']}s"
        )
    with open("/tmp/profile_headline.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/profile_headline.json")
    spark.stop()


if __name__ == "__main__":
    main()
