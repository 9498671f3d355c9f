#!/usr/bin/env python
"""Isolated-movers protocol runner (SURVEY round-13/-16 convention).

A bench mover is adjudicated HOST vs CODE only from an ISOLATED
fresh-session measurement: fresh JVM, q05 warm-up, N noop-sink runs
of the one query, the cpu canary at both ends, and the plan
fingerprint — printed as one JSON line to paste into the round
record. Check ``uptime`` first: this host is bimodal up to ~4x under
external load the single-thread canary undercounts (q123 measured
2.2 s quiet vs 9.2 s at loadavg 5.5 on identical code, round 16).

Usage: python tools/isolate_mover.py <qid> [runs=7] [sf_dir]
"""
from __future__ import annotations

import importlib.util
import json
import statistics
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

spec = importlib.util.spec_from_file_location("benchmod", HERE / "bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402


def main() -> None:
    qid = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    c0 = bench._cpu_canary()
    spark = get_spark("isolate-" + qid)
    spark.sparkContext.setLogLevel("ERROR")
    bench._run_once(QUERIES["q05"], spark, sf_dir)  # warm-up

    runs, fp = [], None
    for _ in range(n):
        t, df = bench._run_once(QUERIES[qid], spark, sf_dir)
        runs.append(round(t, 3))
        fp = bench._fingerprint(df)
    c1 = bench._cpu_canary()
    print(
        json.dumps(
            {
                "qid": qid,
                "sf_dir": sf_dir,
                "runs": runs,
                "steady_median": round(statistics.median(runs[1:]), 3),
                "fingerprint": fp,
                "canary": [c0, round(c1, 4)],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
