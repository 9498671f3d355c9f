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
    write_parquet_wap,
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


def _maybe_compact(
    spark: SparkSession, dest: str, threshold: int, target_bytes: int
) -> dict | None:
    """Post-load lake maintenance (S5/E24): when a freshly loaded
    table landed as ≥ ``threshold`` parquet files, rewrite it toward
    ``target_bytes``-sized files via ``ops.layout.compact_parquet``
    (to a sibling temp dir — the helper refuses in-place — then an
    atomic-enough local rename swap; object stores swap via a
    manifest/rename of their own). Returns the before/after stats
    dict for the manifest, or None when no compaction was needed."""
    import shutil

    from ..ops.layout import compact_parquet

    files = [p for p in Path(dest).rglob("*.parquet")]
    if len(files) < threshold:
        return None
    tmp = f"{dest}__compacting"
    if Path(tmp).exists():  # leftover from a killed run — rebuild it
        shutil.rmtree(tmp)
    stats = compact_parquet(spark, dest, tmp, target_file_bytes=target_bytes)
    shutil.rmtree(dest)
    Path(tmp).rename(dest)
    return stats


def update(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    manifest_path: str | None = None,
    force: bool = False,
    keep_files: bool = False,
    compact_threshold: int | None = 8,
    compact_target_bytes: int = 128 << 20,
) -> Manifest:
    """Run the full pipeline over every known TSV in ``raw_dir``.

    Idempotent: files whose size+mtime match a previously *loaded*
    manifest entry are skipped (``force=True`` overrides).
    ``keep_files`` archives each raw TSV as gzip (the reference's
    --keep-files flag, S6). Returns the saved manifest.

    ``compact_threshold``: when a loaded table lands as at least this
    many parquet files, a post-load compaction pass collapses it
    toward ``compact_target_bytes``-sized files and records the
    before/after stats under the table's manifest ``extra``
    ("compaction"); pass None to disable.
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
            # from its own side, load count from write_parquet_wap's
            # pre-publish read-back of the STAGE dir — so good +
            # quarantine == body is a real gate, not an identity of
            # derived numbers.
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
            # Write-audit-publish (load.write_parquet_wap): the full
            # table lands in a stage dir with the V1 count observed
            # DURING the write; an independent stage read-back audits
            # what landed; only then do atomic renames publish —
            # readers never see a torn table and a failed load leaves
            # the previously published version intact (the
            # reference's transactional-COPY semantics).
            wap = write_parquet_wap(spark, good, dest)
            rec.clean_count = wap["observed"]
            rec.load_count = wap["audited"]
            rec.load_finish = now()
            v = verify_counts(rec.n_body_lines, rec.clean_count, rec.error_count)
            if not v["accounted"]:
                raise RuntimeError(f"count mismatch for {name}: {v}")
            # Belt-and-braces only: write_parquet_wap already RAISES on
            # any observed/audited mismatch (the audit is a pre-publish
            # read-back of the stage dir), so the two counts it returns
            # are equal by construction on every non-raising path.
            # An explicit raise, not `assert` — asserts vanish under
            # `python -O`, and this backstop must survive even if the
            # WAP-internal invariant is ever weakened (round-12
            # advice). Both counts are already computed: no extra job.
            if rec.load_count != rec.clean_count:
                raise RuntimeError(
                    f"write loss for {name}: observed {rec.clean_count} "
                    f"written, {rec.load_count} audited"
                )
            if compact_threshold is not None:
                stats = _maybe_compact(
                    spark, dest, compact_threshold, compact_target_bytes
                )
                if stats is not None:
                    if stats["rows"] != rec.load_count:
                        raise RuntimeError(
                            f"compaction row drift for {name}: "
                            f"{stats['rows']} != {rec.load_count}"
                        )
                    rec.extra["compaction"] = stats
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
