"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists,
the DuckDB twin; compares row count, sorted column names, and
order-insensitive exact values (floats must match bit-for-bit — the
same bar as a value hash).

Usage:  python tools/verify_local.py [--sf /root/testdata/sf0.01] [ids...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from calaspark import TABLES  # noqa: E402
from calaspark.oracles import ORACLES  # noqa: E402
from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402


def _norm(v):
    """Normalize a cell to a hashable, engine-neutral value."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(rows, cols):
    """Rows → multiset of tuples with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )
    return out, [cols[i] for i in order]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("ids", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("calaspark-verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    ids = args.ids or sorted(QUERIES)
    failures = []
    for qid in ids:
        t0 = time.time()
        try:
            sdf = QUERIES[qid](spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(qid)
            print(f"{qid:18s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        if qid not in ORACLES:
            print(f"{qid:18s} rows-only    rows={len(s_rows):7d}  "
                  f"({time.time()-t0:5.1f}s)")
            if not s_rows:
                failures.append(qid)
            continue
        try:
            res = con.execute(ORACLES[qid])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(qid)
            print(f"{qid:18s} ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}")
            continue

        s_set, s_names = _rowset(s_rows, s_cols)
        d_set, d_names = _rowset(d_rows, d_cols)
        status, detail = "OK", ""
        if s_names != d_names:
            status, detail = "SCHEMA-MISMATCH", f"spark={s_names} duck={d_names}"
        elif len(s_set) != len(d_set):
            status, detail = "COUNT-MISMATCH", f"spark={len(s_set)} duck={len(d_set)}"
        elif s_set != d_set:
            status = "VALUE-MISMATCH"
            for a, b in zip(s_set, d_set):
                if a != b:
                    detail = f"first diff: spark={a} duck={b}"
                    break
        if status != "OK":
            failures.append(qid)
        print(f"{qid:18s} {status:15s} rows={len(s_set):7d}  "
              f"({time.time()-t0:5.1f}s) {detail}")

    print(f"\n{len(ids)-len(failures)}/{len(ids)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
