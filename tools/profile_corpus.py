"""Profile the corpus_build funnel: per-stage wall time (plan/codegen +
job), and the fully-lazy (report_counts=False) single-action variant for
comparison.

Usage: python tools/profile_corpus.py [mode...]
  modes: staged (default), lazy, both
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from opentelemetry_iceberg_exporter_spark.operators import corpus_build  # noqa: E402
from opentelemetry_iceberg_exporter_spark.session import build_session  # noqa: E402
from opentelemetry_iceberg_exporter_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    modes = [a for a in sys.argv[1:] if a != "--hint"] or ["staged"]
    if "both" in modes:
        modes = ["staged", "lazy", "staged", "lazy"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="profile_corpus",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    base = load_table(spark, sf_dir, "documents")
    docs = base.select("doc_id", "text")
    if "--hint" in sys.argv:
        sys.argv.remove("--hint")
        docs._graft_src_bytes = getattr(base, "_graft_src_bytes", None)
    benchmark = docs.filter(
        F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(97)) == 0
    ).select("text")

    import urllib.request
    import json as _json

    app_id = spark.sparkContext.applicationId

    def rest(path):
        with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
            return _json.loads(r.read())

    # per-stage timestamps via the report hook
    orig_add = corpus_build.CorpusReport.add
    marks: list[tuple[str, float]] = []

    def timed_add(self, stage, rows):
        marks.append((stage, time.perf_counter()))
        # label the NEXT stage's jobs with the label we'll discover at
        # its own add() call; group by ordinal
        spark.sparkContext.setJobGroup(f"stage_{len(marks)}", f"after {stage}")
        orig_add(self, stage, rows)

    corpus_build.CorpusReport.add = timed_add
    try:
        for mode in modes:
            marks.clear()
            spark.sparkContext.setJobGroup("stage_0", "funnel start")
            t0 = time.perf_counter()
            out, report = corpus_build.build_corpus(
                spark,
                docs,
                benchmark=benchmark,
                bench_text_col="text",
                substr_k=50,
                substr_stride=8,
                pack_budget=2048,
                report_counts=(mode == "staged"),
            )
            t_build = time.perf_counter()
            rows = out.count()
            t_end = time.perf_counter()
            print(f"== mode={mode} rows={rows} total={t_end - t0:.3f}s "
                  f"(build {t_build - t0:.3f}s + final count {t_end - t_build:.3f}s)")
            prev = t0
            for stage, tm in marks:
                print(f"   {stage:<22} +{tm - prev:.3f}s")
                prev = tm
            print(f"   stages: {report.as_dict()}")
            if mode == "staged":
                jobs = rest(f"applications/{app_id}/jobs")
                by_group: dict[str, list] = {}
                for j in jobs:
                    g = j.get("jobGroup") or ""
                    if g.startswith("stage_"):
                        by_group.setdefault(g, []).extend(j["stageIds"])
                for gi, (stage, _) in enumerate(marks):
                    sids = sorted(set(by_group.get(f"stage_{gi}", [])))
                    rows = []
                    for sid in sids:
                        try:
                            for att in rest(f"applications/{app_id}/stages/{sid}"):
                                rows.append(
                                    f"      s{sid} t={att['numCompleteTasks']} "
                                    f"run={att['executorRunTime']}ms "
                                    f"cpu={att['executorCpuTime'] // 1_000_000}ms "
                                    f"{att['name'].splitlines()[0][:50]}"
                                )
                        except Exception:
                            pass
                    if rows:
                        print(f"   [{stage}] {len(sids)} stages")
                        for r in rows:
                            print(r)
                # only detail the first staged run
                marks_detail_done = True  # noqa: F841
    finally:
        corpus_build.CorpusReport.add = orig_add
    spark.stop()


if __name__ == "__main__":
    main()
