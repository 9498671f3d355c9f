#!/usr/bin/env python
"""Per-query FLOOR decomposition (optimization round — guide §1).

Splits each query's steady cost into:

- ``build``  — calling the query builder (driver-side Python +
  py4j + Catalyst ANALYSIS round trips; serial at any scale), and
- ``exec``   — the noop-sink action (optimization + scheduling +
  execution).

Motivation: 182 of 226 queries run under 1 s and together cost ~75 s
of the bench; if a material share is *build*, that is driver wall
the guide's §4.4/§5.3 class of fixes (fewer py4j round trips, fewer
analysis passes) can reclaim for every deployment, not just local.

Usage: python tools/floor_probe.py [qids... | --all] [--sf DIR]

Output: per-query ``build/exec`` medians over RUNS steady runs (a
throwaway first run warms each query), plus registry-wide totals and
the top build-heavy ids.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

from calaspark.queries import QUERIES  # noqa: E402

RUNS = int(os.environ.get("CALASPARK_FLOOR_RUNS", "2"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    qids = list(QUERIES) if (not args or args == ["--all"]) else args

    from calaspark.session import get_spark

    spark = get_spark("floor-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm: JVM, codegen, footers.
    df = QUERIES["q05"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()

    rows = []
    for qid in qids:
        fn = QUERIES[qid]
        builds, execs = [], []
        for r in range(RUNS + 1):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if r == 0:
                continue  # warm-up run: cold IO/JIT lands here
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = statistics.median(builds)
        e = statistics.median(execs)
        rows.append((qid, b, e))
        print(f"{qid:<22} build {b:7.3f}s  exec {e:7.3f}s", file=sys.stderr)

    tot_b = sum(r[1] for r in rows)
    tot_e = sum(r[2] for r in rows)
    print(f"\nTOTAL build {tot_b:8.2f}s   exec {tot_e:8.2f}s   n={len(rows)}")
    rows.sort(key=lambda r: -r[1])
    print("\ntop build-heavy:")
    for qid, b, e in rows[:25]:
        print(f"  {qid:<22} build {b:7.3f}s  exec {e:7.3f}s")


if __name__ == "__main__":
    main()
