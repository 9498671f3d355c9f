"""Pipeline orchestrator — the `updatecalaccessrawdata.py
§Command.handle` twin (SURVEY.md §2.1 O1).

Drives clean → type → load → verify per raw file with manifest-backed
resumability: a re-run on unchanged inputs does no Spark work at all
(skip-unchanged), and a run killed mid-way resumes from the last
completed file. Each file's work is independent — on a real cluster
the per-file jobs pipeline through the scheduler back to back, and a
single file's data-level parallelism is the text scan's split count.

The reference's download/extract phases (S1/S2: HTTP zip → TSVs) are
I/O-side effects outside the engine proper; ``discover`` accepts any
local/posix directory of ``*.TSV`` the same way the reference's
extract step leaves them.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

from .clean import split_clean, type_table
from .load import (
    archive_raw,
    verify_counts,
    write_parquet_observed,
    write_quarantine,
)
from .manifest import Manifest, now
from .schemas import SCHEMAS


def discover(raw_dir: str) -> dict[str, str]:
    """Map schema-known table name → TSV path found in ``raw_dir``."""
    out: dict[str, str] = {}
    for p in sorted(Path(raw_dir).glob("*.TSV")):
        name = p.stem
        if name in SCHEMAS:
            out[name] = str(p)
    return out


def update(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    manifest_path: str | None = None,
    force: bool = False,
    keep_files: bool = False,
) -> Manifest:
    """Run the full pipeline over every known TSV in ``raw_dir``.

    Idempotent: files whose size+mtime match a previously *loaded*
    manifest entry are skipped (``force=True`` overrides).
    ``keep_files`` archives each raw TSV as gzip (the reference's
    --keep-files flag, S6). Returns the saved manifest.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    man = Manifest(manifest_path or out / "manifest.json")

    for name, src in discover(raw_dir).items():
        if not force and man.is_current(name, src):
            man.record(name).extra["last_action"] = "skipped_unchanged"
            continue
        rec = man.stamp_source(name, src)
        rec.extra["last_action"] = "processed"
        schema = SCHEMAS[name]
        try:
            rec.clean_start, rec.status = now(), "pending"
            res = split_clean(spark, src, list(schema))
            good = type_table(res.good, schema, table=name)
            # V1 accounting inputs, each measured INDEPENDENTLY:
            # body lines from the pre-split cleaned frame, quarantine
            # from its own side, load count from the parquet read-back
            # — so good + quarantine == body is a real gate, not an
            # identity of derived numbers.
            rec.n_body_lines = res.body.count()
            rec.error_count = res.quarantine.count()
            if rec.error_count:
                write_quarantine(res.quarantine, str(out / f"{name}.errors"))
            if keep_files:
                rec.extra["archive"] = archive_raw(src, str(out / "archive"))
            rec.clean_finish = now()
            rec.status = "cleaned"

            rec.load_start = now()
            dest = str(out / name)
            # clean_count is observed DURING the write (one pass, V1
            # metric riding the load job); load_count is the parquet
            # read-back — an independent measure of what landed, so
            # clean_count == load_count is a real write-loss check,
            # not an identity.
            rec.clean_count = write_parquet_observed(good, dest)
            rec.load_count = spark.read.parquet(dest).count()
            rec.load_finish = now()
            v = verify_counts(rec.n_body_lines, rec.clean_count, rec.error_count)
            if not v["accounted"]:
                raise RuntimeError(f"count mismatch for {name}: {v}")
            if rec.load_count != rec.clean_count:
                raise RuntimeError(
                    f"write loss for {name}: observed {rec.clean_count} "
                    f"written, {rec.load_count} read back"
                )
            rec.status = "loaded"
        except Exception as e:
            rec.status = "failed"
            rec.extra["error"] = repr(e)
            raise
        finally:
            man.save()

    man.version_meta["last_update_finish"] = now()
    man.version_meta["raw_dir"] = os.fspath(raw_dir)
    man.save()
    # lake-table twin of the JSON manifest (SURVEY §1.1): idempotent
    # upsert-by-file_name so concurrent runs over disjoint inputs
    # coexist; the V2 report reads from here in table deployments
    man.write_table(spark, str(out / "_manifest"))
    return man
