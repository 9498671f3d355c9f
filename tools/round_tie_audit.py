#!/usr/bin/env python
"""ROUND divergence audit over the DuckDB oracle set (§2.6 rule 8).

Round-14 found that ``ROUND(double, n)`` diverges between Spark and
DuckDB on q192's 18.27125 → 18.2713 (Spark) vs 18.2712 (DuckDB).
Root cause, established by this tool's first run: Spark's ``Round``
on DOUBLE goes through ``BigDecimal.valueOf(x)`` — the SHORTEST
decimal representation — then ``setScale(n, HALF_UP)``, so a repr
that textually ends in ``5`` at the (n+1)th place is a tie and
rounds up even when the binary value is strictly BELOW the true
mid-point; DuckDB rounds the binary value numerically and goes
down. (EXACT binary ties — 1227.75 at scale 1 — agree in both
engines: half-away == HALF_UP on them; the oracle set's long-green
q23/q02/q92/q95 hits of the v1 predicate proved that class safe.)

This tool therefore runs the DIRECT divergence test: it replays
every oracled query in DuckDB with ``ROUND`` swapped for a UDF that
records each distinct ``(x, n)`` argument, then compares, for every
recorded pair,

  spark_emu  = float(Decimal(repr(x)).quantize(1e-n, ROUND_HALF_UP))
  duck_native = DuckDB ``ROUND(x, n)``

and reports pairs where they differ. A reported pair is a LATENT
rule-8 flake if the site feeds a hash-gated output as DOUBLE;
decimal-typed sites (rule 1) are immune (both engines round the
DECIMAL) and must be triaged as such — map the query id back to its
site before acting.

EMULATION-FIDELITY CAVEAT (round-16 advice): spark_emu assumes
``repr`` in CPython == ``Double.toString`` in the JVM. CPython's
repr is always the shortest round-tripping decimal; the JVM's
``Double.toString`` is only guaranteed shortest from JDK 19 (the
Ryū rewrite) — pre-19 JVMs (JDK-4511638) occasionally emit a
NON-shortest digit string, and Spark's ``Round`` feeds exactly that
string into ``BigDecimal.valueOf``, so on the JDK 17 this container
ships the emulation can in rare cases mis-model the live engine in
either direction. ``--live-check`` closes the hole empirically: it
starts a local Spark session and replays every divergent pair plus
a deterministic sample of clean pairs through the REAL ``F.round``,
reporting any ``EMU-MISMATCH`` (which fails the gate — it means the
tool's model, not the queries, is wrong). Run it whenever the JVM
changes and once per round with the battery.

Usage: python tools/round_tie_audit.py [--live-check] [sf_dir ...]
Defaults to sf0.001 and sf0.01 (the driver gate scale). The swap is
name-only, results of the instrumented run are discarded.
"""

from __future__ import annotations

import re
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from calaspark.oracles import ORACLES  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: Adjudicated divergence CLASSES that are NOT live hash exposures —
#: still printed, but excluded from the exit-code verdict so the tool
#: works as a regression gate. Keyed by query id BUT matched per
#: divergence by a predicate over the recorded (x, n) pair (round-16
#: advice: an id-only allowlist made the gate blind to a FRESH
#: divergence class — or an outright ERR — appearing in q02/q175; a
#: hit that fails its id's predicate now flips the exit code like any
#: other). ERR / ARG-CAP-OVERFLOW lines are never benign. Each entry:
#: (reason, predicate(x, n) -> bool); see §2.6 rule 8's audit note
#: for the full analysis behind each class.
_KNOWN_BENIGN = {
    # q02's only ROUND site is ROUND(DECIMAL(12,2)*DECIMAL(6,4), 2) —
    # decimal-typed, rule-1 immune; the audit UDF's DOUBLE signature
    # coerces it, a harness false positive. The class: scale 2, and
    # the argument is (the double nearest) an exact 6-dp decimal of
    # price magnitude, so its shortest repr has ≤6 fractional digits.
    "q02": (
        "decimal-typed site (rule 1 — both engines round the DECIMAL "
        "identically; the audit UDF's DOUBLE signature coerced it)",
        lambda x, n: n == 2
        and abs(x) < 1e9
        and Decimal(repr(x)) == Decimal(repr(x)).quantize(Decimal("1e-6")),
    ),
    # q175's intermediate fragment ROUND(s2^2/4n, 6) reaches 1.7e14
    # at sf0.1 where DuckDB's multiply-round-divide is lossy (|x|·10^6
    # is far above 2^53); the wobble is divided by nn(nn+1)~2e10
    # before the output's own ROUND — ~2e-12 of grain, sub-tie.
    "q175": (
        "big-magnitude DOUBLE round: DuckDB's multiply-round-divide "
        "loses low bits for |x|*10^n near/above 2^53; sub-grain "
        "downstream of the output ROUND",
        lambda x, n: n == 6 and abs(x) > 1e12,
    ),
}

_ARGS: set[tuple[float, int]] = set()
_CAP = 2_000_000  # distinct-arg guard; loud overflow, never silent


def _round_audit(x: float | None, n: int | None) -> float | None:
    if x is None:
        return None
    nn = 0 if n is None else int(n)
    v = float(x)
    if v == v and abs(v) != float("inf") and len(_ARGS) < _CAP:
        _ARGS.add((v, nn))
    return round(v, nn)


def spark_emu(x: float, n: int) -> float:
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def instrument(sql: str) -> str:
    # single-arg ROUND(expr) → ROUND(expr, 0); only the trivial
    # no-nested-paren no-comma shape exists in the oracle set.
    sql = re.sub(r"(?i)\bROUND\(([^(),]*)\)", r"ROUND(\1, 0)", sql)
    return re.sub(r"(?i)\bROUND\(", "round_audit(", sql)


def divergences(
    con: duckdb.DuckDBPyConnection,
) -> list[tuple[float, int, float, float]]:
    if not _ARGS:
        return []
    con.execute("CREATE OR REPLACE TEMP TABLE _ra(x DOUBLE, n BIGINT)")
    con.executemany("INSERT INTO _ra VALUES (?, ?)", list(_ARGS))
    native = con.execute("SELECT x, n, ROUND(x, n::INT) FROM _ra").fetchall()
    out = []
    for x, n, duck in native:
        sp = spark_emu(x, int(n))
        if sp != duck:
            out.append((x, int(n), sp, duck))
    return out


def audit(sf_dir: str) -> dict[str, list]:
    con = duckdb.connect()
    con.create_function(
        "round_audit",
        _round_audit,
        ["DOUBLE", "BIGINT"],
        "DOUBLE",
        null_handling="special",
    )
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    report: dict[str, list] = {}
    sampled_args: set[tuple[float, int]] = set()
    for qid, sql in ORACLES.items():
        if "round(" not in sql.lower():
            continue
        _ARGS.clear()
        try:
            con.execute(instrument(sql)).fetchall()
        except Exception as e:  # noqa: BLE001 — report, don't abort
            report[qid] = [("err", "ERR: " + str(e).splitlines()[0])]
            continue
        overflow = len(_ARGS) >= _CAP
        # keep a bounded deterministic per-query sample of CLEAN args
        # for --live-check (sorted + stride, no randomness)
        pool = sorted(_ARGS)
        stride = max(1, len(pool) // 40)
        sampled_args.update(pool[::stride][:40])
        div = divergences(con)
        if div or overflow:
            report[qid] = ([("overflow",)] if overflow else []) + [
                ("div", x, n, sp, dk) for x, n, sp, dk in sorted(div)[:20]
            ]
    con.close()
    report["__sampled_args__"] = sorted(sampled_args)
    return report


def _is_benign(qid: str, hit: tuple) -> bool:
    """A hit is benign ONLY if its id has an adjudicated class AND the
    specific (x, n) pair matches that class's predicate. ERR and
    ARG-CAP-OVERFLOW hits are never benign."""
    if hit[0] != "div" or qid not in _KNOWN_BENIGN:
        return False
    _, x, n, _sp, _dk = hit
    _reason, pred = _KNOWN_BENIGN[qid]
    return bool(pred(x, n))


def live_check(
    div_pairs: set[tuple[float, int]], clean_pairs: list[tuple[float, int]]
) -> list[str]:
    """Replay pairs through the REAL Spark ``F.round`` and compare to
    spark_emu — the empirical answer to the pre-JDK-19
    ``Double.toString`` caveat (see module docstring). Returns
    EMU-MISMATCH lines; any line means the tool's Spark model is
    wrong on this JVM and the gate must fail."""
    pairs = sorted(div_pairs | set(clean_pairs))
    if not pairs:
        return []
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("round-tie-live-check")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    bad: list[str] = []
    try:
        by_n: dict[int, list[float]] = {}
        for x, n in pairs:
            by_n.setdefault(n, []).append(x)
        for n, xs in sorted(by_n.items()):
            df = spark.createDataFrame([(x,) for x in xs], "x double")
            # F.round takes a LITERAL scale — one pass per distinct n
            rows = df.select("x", F.round("x", n).alias("r")).collect()
            for row in rows:
                emu = spark_emu(row["x"], n)
                if emu != row["r"]:
                    bad.append(
                        f"EMU-MISMATCH: x={row['x']!r} n={n} "
                        f"live_spark={row['r']!r} emu={emu!r}"
                    )
    finally:
        spark.stop()
    return bad


def main() -> None:
    argv = sys.argv[1:]
    do_live = "--live-check" in argv
    sf_dirs = [a for a in argv if a != "--live-check"] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    clean = True
    div_pairs: set[tuple[float, int]] = set()
    clean_sample: list[tuple[float, int]] = []
    for sf in sf_dirs:
        rep = audit(sf)
        clean_sample.extend(rep.pop("__sampled_args__", []))
        n_q = sum(1 for sql in ORACLES.values() if "round(" in sql.lower())
        print(
            f"{sf}: {n_q} oracled queries with ROUND sites, "
            f"{len(rep)} with Spark/DuckDB ROUND divergence"
        )
        for qid, hits in sorted(rep.items()):
            for h in hits:
                benign = _is_benign(qid, h)
                if not benign:
                    clean = False
                tag = " [known-benign]" if benign else ""
                if h[0] == "div":
                    _, x, n, sp, dk = h
                    div_pairs.add((x, n))
                    msg = f"x={x!r} n={n} spark={sp!r} duck={dk!r}"
                else:
                    msg = h[1] if h[0] == "err" else "ARG-CAP-OVERFLOW"
                print(f"  {qid}{tag}: {msg}")
    if do_live:
        mismatches = live_check(div_pairs, clean_sample)
        for m in mismatches:
            print(f"  {m}")
        if mismatches:
            clean = False
        else:
            print(
                f"live-check: {len(div_pairs | set(clean_sample))} pairs "
                "replayed through live Spark F.round — emulation exact"
            )
    print("CLEAN (known-benign only)" if clean else "DIVERGENT")
    sys.exit(0 if clean else 1)


if __name__ == "__main__":
    main()
