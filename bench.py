#!/usr/bin/env python
"""Per-query benchmark harness (SURVEY.md §7 step 6).

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
compact JSON line::

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "sf": 0.1, "queries": {"q01": sec, ...}}

The driver captures only a bounded tail of stdout, so the stdout line
carries ONLY per-query times (compact separators).  Everything else —
plan fingerprints, deltas vs the previous round, run counts, session
config — goes to ``BENCH_full_local.json`` next to this script.

Method: each query is executed to completion with the `noop` sink
(full pipeline runs, nothing is collected to the driver — the same
shape a cluster job has). One global warm-up amortizes JVM/codegen
startup. Each query runs at least twice; whether to keep running (up
to BENCH_RUNS) is decided from the LATEST run, not the first — a
query whose first run pays a one-time cost (index build, JIT) but is
fast thereafter still collects a full set of steady-state samples.
The reported time is the STEADY-STATE median: if the first run is
≥2× the median of the rest it is excluded (and recorded in the
sidecar as ``cold_first_run``) — round 4 reported ann_ivf_topk at
17.7 s because the median of [index-build 33 s, probe 2 s] is their
mean; the honest steady-state figure is ~2 s with the build cost
visible in the sidecar, not smeared into the median.

Progress goes to stderr; stdout carries exactly the one JSON line.

Round-over-round hygiene (sidecar): a PLAN FINGERPRINT per query
(md5 of the optimized plan with expression/plan ids normalized away)
and a per-query time delta vs the most recent ``BENCH_r*.json`` with
data — so a regression localizes immediately to "plan changed" vs
"same plan, got slower".

HOST-SPEED CANARY (round 15, verdict ask 2): the machine has measured
194–250 s for the SAME registry on UNCHANGED code across rounds
13–14 (r13 re-run on identical code moved 194.3→219.6 s; r14's
final-code triplet spanned 229–250 s), so a raw total can no longer
distinguish a ~25 % code regression from a slow host. Each run times
a fixed pure-Python LCG loop OUTSIDE Spark (immune to any engine or
query change) at bench start and end; the sidecar records it under
``host_canary`` and, when the previous sidecar carries one too,
``delta_vs_prev_normalized`` divides this run's times by the canary
ratio before differencing — a uniform host slowdown then reads ~0
while a real per-query regression survives normalization. Until a
prior canary exists the registry-median time ratio is the bootstrap
normalizer (``normalizer.kind`` records which was used; see the
fallback's in-line caveat).
"""

from __future__ import annotations

import hashlib
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
# Even past the cutoff, take at least this many runs so one cold run
# cannot print as a multi-second regression.
MIN_RUNS = int(os.environ.get("CALASPARK_BENCH_MIN_RUNS", "2"))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


#: Queries whose plan fingerprint flips with NO code change —
#: ``RewriteDistinctAggregates`` orders its distinct groups from a
#: hash-keyed collection whose iteration order moves with the
#: session's accumulated expression ids, permuting Expand/Aggregate
#: column lists cosmetically (root-caused round 14; see
#: _fingerprint's KNOWN RESIDUAL CLASS note). Recorded in the sidecar
#: so a round-over-round diff auto-annotates these ids instead of
#: re-deriving the class. q180 joined the list in round 15 after its
#: r14→r15 flip was reproduced in controlled session states: the
#: Expand gid labels of its two-distinct audit aggregate
#: (k_cluster/k_doc) swap 1↔2 with session history — same shape,
#: same semantics.
_KNOWN_FINGERPRINT_NOISE = ["q18", "q90", "q171", "q180"]


def _cpu_canary() -> float:
    """Fixed pure-Python LCG loop — a host-speed probe with zero
    dependence on Spark, the JVM, or any code under benchmark. The
    work (2M 64-bit LCG steps + xor-fold) is constant by
    construction, so the measured seconds move only with host speed
    as seen by ONE python thread (CPU clock, core contention on the
    canary's core, interpreter). KNOWN LIMITATION (round-16 advice):
    the probe is single-threaded while the bench is a 32-thread JVM,
    so host effects that hit ONLY parallel/JVM throughput — thermal
    throttling that kicks in under all-core load, noisy neighbors
    pinned to other cores, IO contention — can move the bench
    without moving the canary, and delta_vs_prev_normalized can then
    misattribute host movement as a per-query regression. The
    sidecar therefore also records os.getloadavg() at start/end
    (``loadavg_1m_*``) for triage; a residual mover on a loaded host
    still needs the isolated fresh-session protocol before it is
    called a regression (SURVEY movers protocol)."""
    t0 = time.perf_counter()
    x, acc, mask = 0x9E3779B97F4A7C15, 0, (1 << 64) - 1
    for _ in range(2_000_000):
        x = (x * 6364136223846793005 + 1442695040888963407) & mask
        acc ^= x >> 33
    el = time.perf_counter() - t0
    assert acc >= 0  # keep the loop un-elidable
    return round(el, 4)


def _run_once(fn, spark, sf_dir: str):
    """Build + execute one query; return (elapsed_sec, DataFrame).

    The build is inside the timing on purpose: eager driver-side work
    (e.g. IVF training) is part of the query's cost.  The DataFrame is
    returned so the caller can fingerprint the plan WITHOUT invoking
    the builder an extra time.
    """
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, df


def _fingerprint(df) -> str:
    """Stable hash of the optimized plan: tokens that vary run to run
    (or SESSION to session) are normalized away, the plan shape is
    not. Beyond expression ids (#123) and plan ids, three
    session-scoped JVM counters leak into optimizedPlan text and
    churned 53 ids' fingerprints in round 12 with no code change
    (measured by diffing the normalized text of the same query in two
    cache states):

    - ``_common_expr_N`` — the common-subexpression rewrite names its
      aliases from a session-global counter;
    - ``lambda x_N`` — higher-order-function lambda variables are
      numbered by a session-global counter (q34's zip_with/aggregate);
      the arg-name capture admits digits/underscores (round-13
      advice: ``lambda x1: ...`` would otherwise leak the counter),
      anchored by the ``lambda `` prefix + ``_N#`` suffix so it can
      never touch a real column name;
    - ``<qid>_drain_N`` — the streaming gates' memory-sink table
      names carry a per-session sequence (bench reruns bump it).

    Each is normalized by its full generated-name pattern (never bare
    ``\\w+_\\d+`` — real column names like ``h_1`` must keep their
    digits so genuinely different plans still hash apart).

    KNOWN RESIDUAL CLASS (round 14, root-caused by plan-text diff):
    queries with several ``COUNT(DISTINCT col)`` over different
    columns (q90's profile report) can flip fingerprints with NO
    code change — ``RewriteDistinctAggregates`` orders its distinct
    groups from a hash-keyed collection whose iteration order moves
    with the session's accumulated expression ids, permuting the
    Expand/Aggregate column lists cosmetically (same shape, same
    grouping SET). Not normalized away: sorting bracketed lists by
    regex could mask real plan changes, and the class is recognized
    instead — a fingerprint delta on a multi-distinct query with a
    near-zero time delta and no code change is this."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)
    s = re.sub(r"lambda ([A-Za-z][A-Za-z0-9_]*?)_\d+#", r"lambda \1_#", s)
    s = re.sub(r"_drain_\d+", "_drain_", s)
    return hashlib.md5(s.encode()).hexdigest()[:12]


def _prev_bench(here: Path) -> tuple[str, dict, dict] | None:
    """Most recent BENCH_r*.json that actually carries query times,
    with keys translated back to FULL query ids — returned as
    ``(filename, full_times, paired_sidecar)``.

    PAIRING (round-16 advice — one gate, one place): the on-disk
    sidecar describes SOME past run; its key map, canary and plan
    fingerprints apply only if it was written by the same run that
    produced the newest BENCH_r file. Same-run is decided here, once:
    by ``run_id`` equality when both files carry one (written into
    the stdout line and the sidecar since round 16); when exactly ONE
    side carries a run_id the files are from different eras BY
    CONSTRUCTION (both files of one post-r16 run always carry it), so
    mixed-era is UNPAIRED — falling back to the total gate there
    could pair a sidecar from a different run on a 2-dp total
    coincidence (round-17 advice closure). Only when NEITHER side has
    a run_id (both pre-r16) does the legacy total-match gate apply
    (|value diff| < 0.011, stdout's 2-dp rounding). ``paired_sidecar``
    is ``{}`` when the gate fails — callers must not read
    canary/fingerprints from an unpaired file.

    Driver BENCH files store the stdout dict, whose keys are the
    SHORT forms since round 9 (base36 / abbreviations) — comparing
    them against this run's full-name times silently matched only
    the handful of ids whose short form equals the full name (the
    round-10 delta_vs_prev had 7 entries out of 205). The current
    registry's short→full map inverts them; short keys that no
    longer resolve (renamed/removed ids) are dropped. Deciseconds
    lines (queries_unit == "ds") are rescaled to seconds.
    """
    inv = {_short_key(qid): qid for qid in QUERIES}
    # pre-round-10 files carry the abbreviations in lowercase (the
    # reserved namespace was uppercased); accept them wherever the
    # lowercase form isn't already a live base36 id. This heuristic
    # is ambiguous with the base36 numeric namespace ('lm' == q778),
    # so the RECORDED stdout_key_map wins whenever available: the
    # driver runs this script, so the on-disk sidecar's map was
    # written by the same run that produced the newest BENCH_r file
    # (round-10 advice — never attribute an old key by guesswork
    # when the exact map was recorded).
    for name, ab in _STDOUT_ABBREV.items():
        inv.setdefault(ab.lower(), name)
    side: dict = {}
    try:
        side = json.loads((here / "BENCH_full_local.json").read_text())
    except (OSError, json.JSONDecodeError):
        side = {}
    best: tuple[int, str, dict, dict] | None = None
    for p in here.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)", p.name)
        if not m:
            continue
        try:
            d = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps our JSON line under "parsed"
        payload = d if d.get("queries") else (d.get("parsed") or {})
        q = payload.get("queries")
        if isinstance(q, str) and payload.get("queries_enc") == "kv":
            # tier-3 packed line (armed round 14): "k:v k2:v2 ...".
            # A malformed pair in an OLD file must degrade to "no
            # prior data from this file", not kill the whole bench
            # run after all queries were already timed (round-14
            # review find — this loop is the only consumer of
            # untrusted historical payloads).
            try:
                q = _kv_decode(q)
            except (ValueError, TypeError):
                continue
        if isinstance(q, dict) and q and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p.name, payload, q)
    if best is None:
        return None
    _, name, payload, q = best
    # The single same-run gate (see docstring): run_id when both
    # sides carry one; mixed-era (exactly one side) is unpaired;
    # the legacy 2-dp total match only when neither has one.
    if payload.get("run_id") and side.get("run_id"):
        paired = payload["run_id"] == side["run_id"]
    elif payload.get("run_id") or side.get("run_id"):
        paired = False
    else:
        paired = (
            isinstance(payload.get("value"), (int, float))
            and isinstance(side.get("value"), (int, float))
            and abs(float(payload["value"]) - float(side["value"])) < 0.011
        )
    if not paired and payload.get("run_id"):
        # Round-17 verdict item 6: a SECOND bench run (the driver's
        # 8-core companion) used to overwrite BENCH_full_local.json,
        # orphaning the first run's fingerprints/run lists. Every run
        # now ALSO writes a run-scoped BENCH_sidecar_<run_id>.json
        # (see main()), so when the latest sidecar does not pair with
        # the newest BENCH_r file, look up the run-scoped one that
        # does — pairing resolves for BOTH runs of a multi-run driver.
        scoped = here / f"BENCH_sidecar_{payload['run_id']}.json"
        try:
            cand = json.loads(scoped.read_text())
            if cand.get("run_id") == payload["run_id"]:
                side, paired = cand, True
        except (OSError, json.JSONDecodeError):
            pass
    recorded = side.get("stdout_key_map") or {}
    use_recorded = bool(recorded) and isinstance(recorded, dict) and paired
    scale = 0.1 if payload.get("queries_unit") == "ds" else 1.0
    full = {}
    for k, v in q.items():
        qid = (recorded.get(k) if use_recorded else None) or inv.get(k, k)
        if qid in QUERIES:
            full[qid] = v * scale
    return (name, full, side if paired else {})


#: Fixed stdout abbreviations for the non-numeric query ids — the
#: driver's 2000-byte capture tail can't afford their full names at
#: 138+ queries. Numeric ids go base36 instead (round 9). The exact
#: map used is recorded in the sidecar (`stdout_key_map`); full
#: names + 3-decimal times always live there.
#:
#: Round 10 (advice): abbreviations are UPPERCASE — a reserved
#: namespace base36 (lowercase digits) can never produce — so a
#: future numeric id cannot collide with a demo key by construction;
#: `_validate_stdout_keys` additionally proves the whole map
#: collision-free at startup, BEFORE any query is timed.
_STDOUT_ABBREV = {
    "lsh_minhash_pairs": "LM",
    "ann_ivf_topk": "AI",
    "ann_lsh_topk": "AL",
    "ann_pq_topk": "AP",
    "ann_ivfpq_topk": "AQ",
    "ann_recall": "AR",
    "pandas_udf_quality": "PU",
    "pandas_grouped_ops": "PG",
    "udtf_tokens": "UT",
    "arrow_native": "AW",
    "sampling_stratified": "SS",
    "approx_sketches": "SK",
    "sketch_error": "SE",
    "multimodal_features": "MM",
    "text_quality": "TQ",
    "text_langid": "LI",
    "dedup_clusters_lsh": "DC",
    "embedding_neardup": "EN",
    "ngram_neardup": "NG",
    "simhash_neardup": "SH",
    "tfidf_topterms": "TF",
    "semdedup_clusters": "SD",
    "hybrid_search": "HY",
    "cms_shingle_error": "CM",
    "bpe_train_merges": "BT",
    "bpe_encode_words": "BE",
    # companion ids (q13_latest…) — previously emitted verbatim,
    # ~8 bytes/entry of line budget each
    "q13_latest": "QL",
    "q18_distinct_rows": "QD",
    "q25_monthly": "QM",
    "q29_doc_distinct": "QC",
    "q32_keyed": "QK",
    "q38_right": "QR",
    "q38_cross": "QX",
}


def _validate_stdout_keys(qids) -> None:
    """Prove the stdout key map is collision-free BEFORE timing
    anything (round-9 advice: _short_keyed raised only at report
    time, after the whole benchmark had run). Also enforces the
    reserved-namespace invariant: every abbreviation must contain an
    uppercase letter, which base36 output (lowercase) cannot."""
    for name, ab in _STDOUT_ABBREV.items():
        if ab == ab.lower():
            raise RuntimeError(
                f"abbrev {ab!r} for {name!r} is all-lowercase — "
                "collides with the base36 numeric-id namespace"
            )
    seen: dict[str, str] = {}
    for q in qids:
        sk = _short_key(q)
        if sk in seen:
            raise RuntimeError(
                f"stdout key collision: {sk!r} maps both {seen[sk]!r} "
                f"and {q!r}"
            )
        seen[sk] = q


def _short_key(qid: str) -> str:
    """Compact stdout key: numeric ids in base36 (q113 -> '35' — at
    190 queries even bare decimal ids brush the 2000-byte capture;
    base36 keeps every id ≤2 chars up to q1295), every non-numeric
    id via _STDOUT_ABBREV (KeyError on an unregistered name — caught
    by _validate_stdout_keys at startup, not after the run). The
    sidecar's stdout_key_map records the exact mapping every run."""
    if qid.startswith("q") and qid[1:].isdigit():
        n = int(qid[1:])
        digs = "0123456789abcdefghijklmnopqrstuvwxyz"
        out = ""
        while True:
            out = digs[n % 36] + out
            n //= 36
            if n == 0:
                return out
    return _STDOUT_ABBREV[qid]  # non-numeric ids MUST be in the map


def _stdout_payload(times: dict, sf, run_id: str) -> tuple[dict, str]:
    """Build the driver stdout line: ONLY the fields the driver
    needs, compact — its capture keeps a bounded tail (2000 bytes
    TOTAL including any preceding stderr), and extras overflowed it
    in round 3 (BENCH_r03.json parsed=null). Round 8: at 138 queries
    even 2-decimal full-name keys hit 1,876/2,000 bytes, so the line
    carries SHORT keys (numeric ids in base36; named demos use the
    fixed abbreviations above) and 1-decimal times. Full names +
    3-decimal figures stay in the sidecar, which also records the
    exact stdout_key_map used, so cross-round per-query comparison
    needs no guesswork.

    Compression tiers, each armed in-band and fired only past 1,900
    bytes (and kept only if it actually shrinks the line):
      1. seconds dict (default, ``queries_unit: "s"``);
      2. INTEGER DECISECONDS dict (round 10, ``queries_unit: "ds"``)
         — ~2 bytes/query smaller in the common sub-10s regime;
      3. PACKED KV STRING (round 14, ``queries_enc: "kv"`` —
         ``"k:v k2:v2 ..."`` over the ds values) — drops the two
         quote bytes per key that JSON dict syntax forces, another
         ~2 bytes/query; decoded by _kv_decode (used by _prev_bench
         when a future BENCH_r file carries a packed line).
    test_stdout_line_headroom_at_250_ids projects tier capacity: the
    registry can grow past 250 ids before 1,950 bytes is brushed.
    """
    total = round(sum(times.values()), 3)
    out = {
        "metric": "total_query_sec",
        "value": round(total, 2),
        "unit": "sec",
        "sf": sf,
        # written into BOTH the stdout line (→ the driver's BENCH_r
        # file) and the sidecar, so _prev_bench can pair them exactly
        # instead of by total-coincidence (round-16 advice)
        "run_id": run_id,
        # ALWAYS explicit (round-10 verdict: r10's ds line next to
        # r9's unit-less seconds line read as a phantom 10× regression
        # to any tool that diffed the raw dicts)
        "queries_unit": "s",
        "queries": _short_keyed(times),
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        ds = {k: int(round(v * 10)) for k, v in _short_keyed(times).items()}
        alt = dict(out, queries_unit="ds", queries=ds)
        alt_line = json.dumps(alt, separators=(",", ":"))
        if len(alt_line) < len(line):
            out, line = alt, alt_line
        if len(line) > 1900:
            packed = " ".join(f"{k}:{v}" for k, v in ds.items())
            alt = dict(out, queries_unit="ds", queries_enc="kv", queries=packed)
            alt_line = json.dumps(alt, separators=(",", ":"))
            if len(alt_line) < len(line):
                out, line = alt, alt_line
    return out, line


def _kv_decode(s: str) -> dict:
    """Invert the tier-3 packed encoding: ``"k:v k2:v2"`` → dict with
    numeric values (the inverse of the packing in _stdout_payload —
    kept adjacent so the two can't drift apart)."""
    out = {}
    for pair in s.split():
        k, _, v = pair.partition(":")
        out[k] = float(v) if "." in v else int(v)
    return out


def _short_keyed(times: dict) -> dict:
    """Apply _short_key to every id, REFUSING silent collisions — a
    base36 numeric key landing on a demo abbreviation would merge two
    queries' figures in the stdout dict."""
    out = {}
    for k, v in times.items():
        sk = _short_key(k)
        if sk in out:
            raise RuntimeError(f"stdout key collision: {sk} ({k})")
        r = round(v, 1)
        # integral times print as ints ("2" not "2.0") — line budget
        out[sk] = int(r) if r == int(r) else r
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    _validate_stdout_keys(QUERIES)  # fail fast, before any timing
    # unique per process start: pairs this run's stdout line (the
    # driver's BENCH_r file) with the sidecar it writes at the end
    run_id = hashlib.md5(
        f"{time.time_ns()}-{os.getpid()}".encode()
    ).hexdigest()[:10]
    loadavg_start = tuple(round(v, 2) for v in os.getloadavg())
    canary_start = _cpu_canary()
    spark = get_spark("calaspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM, codegen, parquet footer caches.
    _run_once(QUERIES["q05"], spark, sf_dir)

    # Pre-warm the persisted IVF index so ann_ivf_topk's measured
    # runs are pure probes (the build/probe split is the operator's
    # whole point — round 6 reported 2.29 s because the mtime-keyed
    # index was absent on the driver machine and the build smeared
    # into the sampled runs). The build cost is recorded SEPARATELY
    # in the sidecar, not hidden: `ivf_prewarm` carries whether the
    # index already existed and what the warm-up call cost.
    ivf_prewarm: dict = {}
    try:
        from calaspark.queries.demos import _ivf_index_path

        idx_path = Path(_ivf_index_path(sf_dir))
        # mirror load_or_build_ivf_index's presence check: BOTH halves
        # must carry _SUCCESS, else the warm-up rebuilds and
        # existed=True would misreport a half-written index
        existed = all(
            (idx_path / part / "_SUCCESS").exists()
            for part in ("centroids", "invfile")
        )
        t0 = time.perf_counter()
        _run_once(QUERIES["ann_ivf_topk"], spark, sf_dir)
        ivf_prewarm = {
            "index_existed": existed,
            "warmup_sec": round(time.perf_counter() - t0, 3),
        }
    except Exception as exc:  # never let warm-up kill the bench
        ivf_prewarm = {"error": str(exc)[:200]}

    times: dict[str, float] = {}
    plans: dict[str, str] = {}
    run_counts: dict[str, int] = {}
    all_runs: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    for qid, fn in QUERIES.items():
        t, df = _run_once(fn, spark, sf_dir)
        runs = [t]
        # Always take a second run; keep going (to BENCH_RUNS) while
        # the LATEST run is under the cutoff — so an amortized-build
        # query (slow first, fast after) still gets steady samples.
        while len(runs) < MIN_RUNS or (
            len(runs) < BENCH_RUNS and runs[-1] < SLOW_CUTOFF_S
        ):
            t, df = _run_once(fn, spark, sf_dir)
            runs.append(t)
        rest = runs[1:]
        if rest and runs[0] >= 2 * statistics.median(rest):
            cold[qid] = round(runs[0], 3)  # one-time cost, sidecar
            steady = rest
        else:
            steady = runs
        times[qid] = round(statistics.median(steady), 3)
        plans[qid] = _fingerprint(df)  # plan of the last timed run
        run_counts[qid] = len(runs)
        all_runs[qid] = [round(r, 3) for r in runs]
        note = f"  [cold first run {cold[qid]}s]" if qid in cold else ""
        print(
            f"  {qid:<18} {times[qid]:>8.3f}s  ({len(runs)} runs){note}",
            file=sys.stderr,
        )

    canary_end = _cpu_canary()
    here = Path(__file__).resolve().parent
    prev = _prev_bench(here)
    deltas = (
        {
            qid: round(t - prev[1][qid], 3)
            for qid, t in times.items()
            if qid in prev[1]
        }
        if prev
        else {}
    )

    # Host-speed normalization (round 15): scale this run's times by
    # the canary ratio before differencing, so a uniform host
    # slowdown reads ~0 and only per-query movement survives.
    canary_now = round((canary_start + canary_end) / 2, 4)
    prev_side = prev[2] if prev else {}
    prev_canary = (prev_side.get("host_canary") or {}).get("cpu_loop_sec")
    normalizer: dict = {"kind": None, "scale": None}
    if isinstance(prev_canary, (int, float)) and prev_canary > 0:
        normalizer = {
            "kind": "cpu_loop",
            "scale": round(canary_now / prev_canary, 4),
        }
    elif prev:
        # Bootstrap fallback until a prior canary exists (one round):
        # the MEDIAN time ratio over all common ids. Robust to any
        # minority of real movers, and strictly better than a single
        # query's ratio — q05 was first tried and immediately proved
        # unusable (its own r14→r15 ratio was 0.44 against a 1.07
        # registry median; it is one of the documented
        # fingerprint-identical 2x host movers). Caveat by
        # construction: a uniform CODE regression across >50% of the
        # registry would read as host movement under this bootstrap —
        # the cpu_loop canary exists precisely to close that hole
        # from the next round on.
        common = [q for q in times if q in prev[1] and prev[1][q] > 0]
        if common:
            normalizer = {
                "kind": "median_ratio",
                "scale": round(
                    statistics.median(
                        sorted(times[q] / prev[1][q] for q in common)
                    ),
                    4,
                ),
            }
    norm_deltas = (
        {
            qid: round(t / normalizer["scale"] - prev[1][qid], 3)
            for qid, t in times.items()
            if qid in prev[1]
        }
        if prev and normalizer["scale"]
        else {}
    )

    # Fingerprint flips vs the previous sidecar, auto-annotated with
    # the RewriteDistinctAggregates noise class (round-14 advice 5b).
    prev_plans = prev_side.get("plan_fingerprints") or {}
    fp_flips = {
        qid: {
            "prev": prev_plans[qid],
            "now": fp,
            "known_noise": qid in _KNOWN_FINGERPRINT_NOISE,
        }
        for qid, fp in plans.items()
        if qid in prev_plans and prev_plans[qid] != fp
    }

    out, line = _stdout_payload(times, _sf_of(sf_dir), run_id)
    if len(line) > 1950:
        print(
            f"WARNING: stdout line {len(line)} bytes — approaching the "
            "driver's 2000-byte capture; shrink the key map or encoding "
            "BEFORE adding queries",
            file=sys.stderr,
        )
    print(f"stdout line: {len(line)} bytes", file=sys.stderr)
    sys.stderr.flush()
    print(line)
    sys.stdout.flush()

    sidecar = {
        # drop the stdout-only encoding markers so they cannot
        # mislabel the sidecar's always-seconds, always-dict times
        **{
            k: v
            for k, v in out.items()
            if k not in ("queries_unit", "queries_enc")
        },
        "value": round(sum(times.values()), 3),
        "n_queries": len(times),
        # sidecar times are ALWAYS seconds
        "queries": times,  # full names + 3-decimal figures
        "stdout_key_map": {_short_key(k): k for k in times},
        "plan_fingerprints": plans,
        "delta_vs_prev": deltas,
        "host_canary": {
            "cpu_loop_sec": canary_now,
            "cpu_loop_sec_start": canary_start,
            "cpu_loop_sec_end": canary_end,
            "q05_sec": times.get("q05"),
            # triage for parallel-only host effects the single-thread
            # loop cannot see (see _cpu_canary's KNOWN LIMITATION)
            "loadavg_1m_start": loadavg_start[0],
            "loadavg_start": list(loadavg_start),
            "loadavg_end": [round(v, 2) for v in os.getloadavg()],
        },
        "normalizer": normalizer,
        "delta_vs_prev_normalized": norm_deltas,
        "known_fingerprint_noise": _KNOWN_FINGERPRINT_NOISE,
        "fingerprint_flips_vs_prev": fp_flips,
        "prev_bench": prev[0] if prev else None,
        "run_counts": run_counts,
        "runs": all_runs,
        "cold_first_run": cold,
        "ivf_prewarm": ivf_prewarm,
        "cpus": int(cpus),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "runs_per_query": BENCH_RUNS,
        "min_runs": MIN_RUNS,
        "slow_cutoff_s": SLOW_CUTOFF_S,
    }
    # Local experiment runs must not clobber the DRIVER-paired
    # sidecar: the round-16 cpu_loop normalization goes live only if
    # the on-disk sidecar still pairs with the newest BENCH_r file at
    # driver bench time (see _prev_bench's pairing note). Builder-side
    # refreshes set CALASPARK_BENCH_SIDECAR to write elsewhere.
    side_path = os.environ.get(
        "CALASPARK_BENCH_SIDECAR", str(here / "BENCH_full_local.json")
    )
    Path(side_path).write_text(json.dumps(sidecar, indent=1))
    # Run-scoped copy (round-17 verdict item 6): BENCH_full_local.json
    # is "latest run" and a second run in the same round overwrites
    # it; the run-scoped file preserves every run's fingerprints and
    # run lists, and _prev_bench pairs through it when the latest
    # sidecar belongs to a different run. Skipped when the builder
    # redirected the sidecar (experiment runs should not litter
    # run-scoped files next to the driver-paired ones).
    if "CALASPARK_BENCH_SIDECAR" not in os.environ:
        (here / f"BENCH_sidecar_{run_id}.json").write_text(
            json.dumps(sidecar, indent=1)
        )
    spark.stop()


if __name__ == "__main__":
    main()
