"""Phase + per-stage task-time profile of the batched query path
(`Searcher.search_many`) at one core count — the evidence harness for
the 2-vs-8 batched-QPS scaling gate (VERDICT r3 item #3).

Decomposes one batched run into:
  - driver prep (parse + stats job + scorer build)      [serial-ish]
  - the full `search_many(...).collect()` wall time
and, from the Spark event log, per-stage task histograms
(ExecutorRunTime / ExecutorCpuTime per task) so "the kernels took the
same CPU at both levels; the residual is fixed driver/scheduling cost
or memory-path contention" is a measurement, not an inference.

Usage: python scripts/batched_profile.py <cpus> <index_dir> [reps] [out.json]
Prints one JSON line (and writes it to out.json if given).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cpus: int, index_dir: str, reps: int = 3, out_path: str | None = None) -> None:
    from pyspark.sql import SparkSession

    from lucene_spark.fixtures import make_queries
    from lucene_spark.search import ast as ast_mod
    from lucene_spark.search.scoring import build_scorers
    from lucene_spark.search.searcher import Searcher

    evdir = tempfile.mkdtemp(prefix=f"ls_ev_{cpus}_")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.compression.codec", "none")
        .appName(f"batched_profile_{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    searcher = Searcher(spark, index_dir, preload_stats=True)
    qset = [q["query"] for q in make_queries()][::2]
    searcher.search("w0000", k=10).collect()  # warm (cache fill + JIT)
    searcher.search_many(qset[:4], k=10).collect()  # warm the batch shape

    # --- driver prep phase, measured alone (same work search_many does)
    prep = []
    for _ in range(reps):
        t0 = time.time()
        parsed = {str(i): searcher.parse(q) for i, q in enumerate(qset)}
        all_terms: set = set()
        for q in parsed.values():
            all_terms |= ast_mod.query_terms(q)
        tstats = searcher.global_term_stats(all_terms)
        stats = searcher._global_stats(tstats)
        scorers: dict = {}
        for q in parsed.values():
            scorers.update(build_scorers(q, stats, dtype="f32"))
        prep.append(time.time() - t0)

    # --- full batched runs
    totals = []
    for _ in range(reps):
        t0 = time.time()
        searcher.search_many(qset, k=10, pruned=True, dtype="f32").collect()
        totals.append(time.time() - t0)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # --- parse the event log: per-stage task run/cpu times
    stages: dict = {}
    names: dict = {}
    paths = []
    for p in glob.glob(os.path.join(evdir, "*")):
        # Spark 4 rolling event log: a directory of events_* files
        paths.extend(sorted(glob.glob(os.path.join(p, "events_*")))
                     if os.path.isdir(p) else [p])
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si["Stage Name"].split()[0]
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    run_ms = m.get("Executor Run Time", 0)
                    cpu_ms = (m.get("Executor CPU Time", 0)) / 1e6
                    stages.setdefault(sid, []).append((run_ms, cpu_ms))

    stage_rows = []
    for sid in sorted(stages):
        runs = sorted(r for r, _ in stages[sid])
        cpus_ms = [c for _, c in stages[sid]]
        stage_rows.append(
            {
                "stage": sid,
                "name": names.get(sid, "?"),
                "tasks": len(runs),
                "run_ms_sum": round(sum(runs), 1),
                "run_ms_p50": round(runs[len(runs) // 2], 1),
                "run_ms_max": round(runs[-1], 1),
                "cpu_ms_sum": round(sum(cpus_ms), 1),
            }
        )

    out = {
        "cpus": cpus,
        "app_id": app_id,
        "reps": reps,
        "prep_secs": [round(x, 3) for x in prep],
        "batched_total_secs": [round(x, 3) for x in totals],
        "qps_batched_best": round(len(qset) / min(totals), 3),
        "stages": stage_rows,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]),
        sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        sys.argv[4] if len(sys.argv) > 4 else None,
    )
