#!/usr/bin/env python
"""Capture ``explain("formatted")`` for a list of query ids into
``plans/<tag>/<qid>_<suffix>.txt`` (optimization-round deliverable:
the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> <qid> [qid ...]
e.g.   python tools/capture_plans.py r17 before q33 q73 q96

Driver-loop queries (bpe_train_merges, ann_recall) EXECUTE work at
build time and return a driver-built frame; their file then shows
the final frame's plan plus a note — the interesting plans for those
live in the stage decomposition (tools/profile_query.py).
"""
from __future__ import annotations

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    qids = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = HERE / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        df = QUERIES[qid](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{qid}_{suffix}.txt").write_text(txt)
        print(f"wrote plans/{tag}/{qid}_{suffix}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
