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

and reports pairs where they differ. ``repr`` in CPython and
``Double.toString`` in the JVM both produce the shortest
round-tripping decimal, so spark_emu is value-exact to Spark's
semantics. A reported pair is a LATENT rule-8 flake if the site
feeds a hash-gated output as DOUBLE; decimal-typed sites (rule 1)
are immune (both engines round the DECIMAL) and must be triaged as
such — map the query id back to its site before acting.

Usage: python tools/round_tie_audit.py [sf_dir ...]
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

#: Adjudicated divergence reports that are NOT live hash exposures —
#: still printed, but excluded from the exit-code verdict so the tool
#: works as a regression gate. Each entry documents why (see §2.6
#: rule 8's audit note for the full analysis).
_KNOWN_BENIGN = {
    "q02": "decimal-typed site: the audit UDF's DOUBLE signature "
    "coerces a DECIMAL(19,6) argument; both engines round the "
    "DECIMAL identically (rule 1) — harness false positive",
    "q175": "intermediate fragment ROUND(s2^2/4n, 6) reaches 1.7e14 "
    "at sf0.1 where DuckDB's multiply-round-divide is lossy; the "
    "wobble is divided by nn(nn+1)~2e10 before the output's own "
    "ROUND — ~2e-12 of grain, sub-tie",
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
    for qid, sql in ORACLES.items():
        if "round(" not in sql.lower():
            continue
        _ARGS.clear()
        try:
            con.execute(instrument(sql)).fetchall()
        except Exception as e:  # noqa: BLE001 — report, don't abort
            report[qid] = ["ERR: " + str(e).splitlines()[0]]
            continue
        overflow = len(_ARGS) >= _CAP
        div = divergences(con)
        if div or overflow:
            report[qid] = (["ARG-CAP-OVERFLOW"] if overflow else []) + [
                f"x={x!r} n={n} spark={sp!r} duck={dk!r}"
                for x, n, sp, dk in sorted(div)[:20]
            ]
    con.close()
    return report


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    clean = True
    for sf in sf_dirs:
        rep = audit(sf)
        n_q = sum(1 for sql in ORACLES.values() if "round(" in sql.lower())
        print(
            f"{sf}: {n_q} oracled queries with ROUND sites, "
            f"{len(rep)} with Spark/DuckDB ROUND divergence"
        )
        for qid, hits in sorted(rep.items()):
            benign = qid in _KNOWN_BENIGN
            if not benign:
                clean = False
            tag = " [known-benign]" if benign else ""
            for h in hits:
                print(f"  {qid}{tag}: {h}")
    print("CLEAN (known-benign only)" if clean else "DIVERGENT")
    sys.exit(0 if clean else 1)


if __name__ == "__main__":
    main()
