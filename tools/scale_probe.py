#!/usr/bin/env python
"""Scale-probe: measure how an operator's runtime scales with data
volume BEYOND the largest driver-generated SF (round-17 convention).

The 2x3 evidence matrix proves correctness up to sf0.1 (10x the
driver gate); this tool probes THROUGHPUT at k times sf0.1 by
replicating the LLM-pipeline tables with re-keyed ids into a scaled
directory, then timing one registry query there with the bench
protocol (q05 warm-up, N noop-sink runs, cpu canary both ends).
A near-linear runs-vs-mult ratio is the evidence the 100-TB design
story needs; a superlinear one is a found cliff.

Replication is SHAPE-PRESERVING, not copy-paste:

- documents: every replica r > 0 suffixes EVERY token with ``_r`` —
  per-replica token universes are DISJOINT, so the within-replica
  near-dup/dedup structure is isomorphic to the original corpus and
  cross-replica similarity is exactly zero. True pair/cluster/dup
  volume therefore scales exactly *mult (the "same shape, k times
  more data" workload near-dup throughput must be judged on; naive
  duplication would instead create mult-sized artificial cliques and
  quadratic pair growth). doc_id shifts by r*OFF; n_chars recomputed.
- embeddings: vec_id shifts; each replica applies a PER-REPLICA
  ISOMETRY (circular coordinate shift by r plus an r-parity sign
  flip): within-replica cosines are preserved EXACTLY, so the
  near-dup/ANN structure of every replica is isomorphic to the
  original corpus, while cross-replica cosines decorrelate to noise
  — true pair volume scales exactly *mult. (A small additive
  perturbation instead piles all replicas of a vector into one grid
  cell and grows the TRUE near-dup output quadratically — measured
  on q73: 21x time at 16x data, all of it genuine output volume,
  none of it engine; the isometry design is what "same shape, k
  times more data" means in cosine space.)
- events: event_id AND user_id shift — the user universe grows with
  volume, so per-key streaming state parallelism is stressed the way
  a real higher-rate stream stresses it; the time horizon is kept,
  which multiplies per-window row counts.
- every other table is symlinked unscaled (TPC-H relational shapes
  are already proven by the sf0.001..0.1 sweeps).

Scaled tables are written as parquet DIRECTORIES — which also
exercises the multi-file fallbacks (e.g. _token_volume_estimate ->
None -> Spark footer row count).

Usage: python tools/scale_probe.py <qid> [mult=16] [runs=5] [sf_dir]
Prints one JSON line; check ``uptime`` first (host bimodality note in
tools/isolate_mover.py applies verbatim).
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

import pyspark.sql.functions as F  # noqa: E402

from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402

#: id offset per replica — far above any generated id at any SF
OFF = 10_000_000


def build_scaled_dir(spark, sf_dir: str, mult: int) -> str:
    # v2: embedding replication switched to the per-replica isometry
    out = Path(f"/tmp/calaspark_scale_{Path(sf_dir).name}_x{mult}_v2")
    marker = out / "_SCALED_OK"
    if marker.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    scaled = {"documents", "embeddings", "events"}
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        dst = out / p.name
        if p.stem not in scaled and not dst.exists():
            dst.symlink_to(p)
    reps = spark.range(mult).withColumnRenamed("id", "_rep")

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            "text",
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1_"), F.col("_rep").cast("string")),
        )
    )
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * OFF).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )
        .repartition(max(4, mult))
        .write.mode("overwrite")
        .parquet(str(out / "documents.parquet"))
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(
        e.select("embedding").head()["embedding"]
    )  # model-sized peek: one row
    # circular shift by (r mod dim), then flip the sign of every
    # other coordinate for odd r — an exact isometry per replica
    shift = F.pmod(F.col("_rep"), F.lit(dim))
    shifted = F.when(shift == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
            F.slice(F.col("embedding"), 1, shift),
        )
    )
    iso = F.transform(
        shifted,
        lambda x, i: F.when(
            (F.pmod(F.col("_rep"), F.lit(2)) == 1) & (F.pmod(i, F.lit(2)) == 1),
            (-x).cast("float"),
        ).otherwise(x),
    )
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_rep") * OFF).alias("vec_id"),
            iso.alias("embedding"),
            "label",
        )
        .repartition(max(4, mult))
        .write.mode("overwrite")
        .parquet(str(out / "embeddings.parquet"))
    )

    from calaspark.tables import load_table

    ev = load_table(spark, sf_dir, "events")  # ns ts handled here
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("_rep") * OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_rep") * OFF).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(max(4, mult))
        .write.mode("overwrite")
        .parquet(str(out / "events.parquet"))
    )
    marker.touch()
    return str(out)


def main() -> None:
    qid = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    fn = QUERIES[qid]

    c0 = bench._cpu_canary()
    spark = get_spark(f"scale-probe-{qid}-x{mult}")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled_dir(spark, sf_dir, mult)
    bench._run_once(QUERIES["q05"], spark, scaled)  # warm-up

    runs = []
    for _ in range(n):
        sec, _df = bench._run_once(fn, spark, scaled)
        runs.append(round(sec, 3))
    c1 = bench._cpu_canary()
    steady = statistics.median(runs[1:]) if len(runs) > 1 else runs[0]
    print(
        json.dumps(
            {
                "qid": qid,
                "mult": mult,
                "scaled_dir": scaled,
                "runs": runs,
                "steady_median": round(steady, 3),
                "canary": [round(c0, 4), round(c1, 4)],
            }
        )
    )


if __name__ == "__main__":
    main()
