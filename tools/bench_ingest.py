"""Ingest-pipeline throughput harness (separate from bench.py's query
contract): synthesizes an RCPT_CD-shaped dirty TSV at a given row
count from the orders testdata, then times clean → quarantine →
type → parquet-load end-to-end.

Usage: python tools/bench_ingest.py [n_rows] (default 500_000)

The synthesis injects the FIXTURES.md pathologies at fixed rates
(1/1000 short rows, 1/1000 long rows, 1/500 bad dates, 1/200 empty
amounts) so quarantine and typing both do real work. Reference
comparison: the reference's serial cleaner processes CAL-ACCESS
(~10^7–10^8 rows) in hours; this pipeline's per-core throughput ×
cluster width is the 100 TB story.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from calaspark.ingest import split_clean, type_table, write_parquet  # noqa: E402
from calaspark.ingest.schemas import RCPT_CD  # noqa: E402
from calaspark.session import get_spark  # noqa: E402


def synthesize(n_rows: int, dest: Path) -> None:
    """Dirty TSV from orders rows (DuckDB does the heavy lifting)."""
    con = duckdb.connect()
    cols = list(RCPT_CD)
    header = "\t".join(cols)
    q = f"""
    COPY (
      SELECT
        CASE WHEN i % 1000 = 7 THEN 'SHORT\tROW'
             WHEN i % 1000 = 13 THEN base || CHR(9) || 'EXTRA'
             ELSE base END AS line
      FROM (
        SELECT i,
          CAST(1000000 + i AS VARCHAR) || CHR(9) ||          -- FILING_ID
          CAST(i % 5 AS VARCHAR) || CHR(9) ||                 -- AMEND_ID
          CAST(i % 100 AS VARCHAR) || CHR(9) ||               -- LINE_ITEM
          'RCPT' || CHR(9) || 'A' || CHR(9) ||
          'T' || CAST(i AS VARCHAR) || CHR(9) || 'IND' || CHR(9) ||
          'NAME' || CAST(i % 997 AS VARCHAR) || CHR(9) || 'F' || CHR(9) ||
          'CITY' || CHR(9) || 'CA' || CHR(9) || '95814' || CHR(9) ||
          'EMP' || CHR(9) || 'OCC' || CHR(9) ||
          CASE WHEN i % 500 = 3 THEN '99/99/XXXX'
               ELSE CAST((i % 12) + 1 AS VARCHAR) || '/' ||
                    CAST((i % 28) + 1 AS VARCHAR) || '/2001' END || CHR(9) ||
          CASE WHEN i % 200 = 5 THEN ''
               ELSE CAST(ROUND((i % 100000) / 100.0, 2) AS VARCHAR) END
            || CHR(9) ||
          '0.00' || CHR(9) ||
          CASE i % 3 WHEN 0 THEN 'Y' WHEN 1 THEN 'N' ELSE '' END || CHR(9) ||
          '' || CHR(9) || 'C' || CAST(i % 89 AS VARCHAR) AS base
        FROM generate_series(0, {n_rows - 1}) t(i)
      )
    ) TO '{dest}' (FORMAT CSV, QUOTE '', HEADER false)
    """
    dest.write_text(header + "\n")
    con.sql(q.replace(f"TO '{dest}'", f"TO '{dest}.body'"))
    with open(dest, "ab") as out, open(f"{dest}.body", "rb") as body:
        out.write(body.read())
    Path(f"{dest}.body").unlink()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    work = Path("/tmp/calaspark_ingest_bench")
    work.mkdir(exist_ok=True)
    tsv = work / "RCPT_CD.TSV"
    synthesize(n_rows, tsv)
    size_mb = tsv.stat().st_size / 1e6

    spark = get_spark("calaspark-ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    res = split_clean(spark, str(tsv), list(RCPT_CD))
    typed = type_table(res.good, RCPT_CD)
    write_parquet(typed, str(work / "lake"))
    n_bad = res.quarantine.count()
    t = time.perf_counter() - t0
    n_good = spark.read.parquet(str(work / "lake")).count()
    print(
        f"rows={n_rows} size={size_mb:.1f}MB good={n_good} "
        f"quarantined={n_bad} wall={t:.2f}s "
        f"throughput={n_rows / t / 1e3:.0f}k rows/s ({size_mb / t:.0f} MB/s)"
    )
    assert n_good + n_bad == n_rows, "count accounting failed"
    spark.stop()


if __name__ == "__main__":
    main()
