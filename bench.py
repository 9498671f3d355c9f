#!/usr/bin/env python
"""Per-query benchmark harness (SURVEY.md §7 step 6).

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01": sec, ...}, "sf": 0.1, ...}

Method: each query is executed to completion with the `noop` sink
(full pipeline runs, nothing is collected to the driver — the same
shape a cluster job has). One global warm-up amortizes JVM/codegen
startup. Each query runs up to BENCH_RUNS times (median reported);
queries whose first run exceeds SLOW_CUTOFF_S run once — their
runtime already dominates measurement noise.

Progress goes to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402

BENCH_RUNS = int(os.environ.get("CALASPARK_BENCH_RUNS", "3"))
SLOW_CUTOFF_S = float(os.environ.get("CALASPARK_BENCH_SLOW_CUTOFF", "10"))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_spark("calaspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, parquet footer caches.
    _run_once(QUERIES["q05"], spark, sf_dir)

    times: dict[str, float] = {}
    for qid, fn in QUERIES.items():
        runs = [_run_once(fn, spark, sf_dir)]
        if runs[0] < SLOW_CUTOFF_S:
            for _ in range(BENCH_RUNS - 1):
                runs.append(_run_once(fn, spark, sf_dir))
        times[qid] = round(statistics.median(runs), 3)
        print(f"  {qid:<18} {times[qid]:>8.3f}s  ({len(runs)} runs)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(sf_dir),
        "n_queries": len(times),
        "cpus": int(cpus),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "runs_per_query": BENCH_RUNS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
