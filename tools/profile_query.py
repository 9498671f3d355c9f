#!/usr/bin/env python
"""Per-job / per-stage decomposition of ONE query (optimization
round instrumentation — guide §1: measure first, §7.1 UI-equivalent).

The local session runs with the UI disabled, so this uses the event
log instead: run the query under a fresh session with
``spark.eventLog.enabled``, then parse the JSON event log into a
job/stage table — submission order, wall duration, shuffle
read/write bytes, task counts — for the STEADY run only (each run is
wrapped in its own job group so cold/steady separate cleanly).

Usage: python tools/profile_query.py <qid> [runs=2] [sf_dir]

Output: one line per job of the last run, with the dominant stages
inlined — the local stand-in for "open the Stages tab, find where
the time goes".
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

from calaspark.queries import QUERIES  # noqa: E402


def main() -> None:
    qid = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    log_dir = tempfile.mkdtemp(prefix="calaspark-evlog-")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from calaspark.session import RUNTIME_CONFS, prepare

    builder = (
        SparkSession.builder.appName(f"profile-{qid}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("CALASPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = prepare(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JVM/codegen/footers)
    QUERIES["q05"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for i in range(runs):
        spark.sparkContext.setJobGroup(f"run{i}", f"{qid} run {i}")
        t0 = time.perf_counter()
        QUERIES[qid](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark may write the log as <appId>, <appId>.inprogress, or an
    # eventLogV2 directory — pick whatever holds the appId.
    cands = [p for p in Path(log_dir).glob(f"*{app_id}*")]
    if not cands:
        raise SystemExit(f"no event log for {app_id} in {log_dir}")
    ev = cands[0]
    if ev.is_dir():
        text = "\n".join(
            p.read_text() for p in sorted(ev.glob("events*")) if p.is_file()
        )
    else:
        text = ev.read_text()
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in text.splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev_t = d.get("Event")
        if ev_t == "SparkListenerJobStart":
            props = d.get("Properties") or {}
            jobs[d["Job ID"]] = {
                "start": d["Submission Time"],
                "group": props.get("spark.jobGroup.id", ""),
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in d.get("Stage Infos", [])],
            }
        elif ev_t == "SparkListenerJobEnd":
            if d["Job ID"] in jobs:
                jobs[d["Job ID"]]["end"] = d["Completion Time"]
        elif ev_t == "SparkListenerStageCompleted":
            si = d["Stage Info"]
            sid = si["Stage ID"]
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
            stages[sid] = {
                "name": si.get("Name", ""),
                "tasks": si.get("Number of Tasks"),
                "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                if si.get("Submission Time")
                else None,
                "shuf_r": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                or 0,
                "shuf_w": acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                or 0,
                "in": acc.get("internal.metrics.input.bytesRead", 0) or 0,
            }

    last_group = f"run{runs - 1}"
    sel = sorted(
        (j for j in jobs.values() if j.get("group") == last_group),
        key=lambda j: j["start"],
    )
    total = 0.0
    for j in sel:
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        total += dur
        parts = []
        for sid in j["stages"]:
            s = stages.get(sid)
            if not s or s["ms"] is None:
                continue
            nm = (s["name"].split() or ["?"])[0]
            parts.append(
                f"{nm}#{sid}:{s['ms'] / 1000:.2f}s"
                f"/{s['tasks']}t"
                + (f"/w{s['shuf_w'] // 1024}K" if s["shuf_w"] else "")
            )
        print(f"job {dur:7.3f}s  {' '.join(parts)}")
    print(f"TOTAL jobs wall (sum) {total:.3f}s  n_jobs={len(sel)}")


if __name__ == "__main__":
    main()
