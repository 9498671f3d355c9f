"""Run manifest — the `calaccess_raw/models/tracking.py
§RawDataVersion / §RawDataFile` twin (SURVEY.md §2.3 V1/V2, §2.1 O1).

The reference tracks, per downloaded version and per file: byte
sizes, row counts at each phase (download/clean/load), phase
timestamps, and error counts — this is what makes its update command
resumable and idempotent (`updatecalaccessrawdata.py §Command.handle`
skips work already done).

Storage: one JSON file. Manifest rows are per-INPUT-FILE metadata
(thousands of entries even at 100 TB of data), so this is driver-side
bookkeeping by design — the heavy lifting stays in Spark; analytics
over the manifest (the coverage report) lifts it into a DataFrame.
Writes are atomic (tmp + rename) so a killed run never corrupts it.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FileRecord:
    """RawDataFile twin: one raw input file's lifecycle."""

    file_name: str
    size_bytes: int = 0
    mtime_ns: int = 0
    n_body_lines: int = 0
    clean_count: int = 0
    error_count: int = 0
    load_count: int = 0
    clean_start: float | None = None
    clean_finish: float | None = None
    load_start: float | None = None
    load_finish: float | None = None
    status: str = "pending"  # pending | cleaned | loaded | failed
    extra: dict = field(default_factory=dict)


class Manifest:
    """RawDataVersion twin: a keyed collection of FileRecords."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self.files: dict[str, FileRecord] = {}
        self.version_meta: dict = {}
        if self.path.exists():
            raw = json.loads(self.path.read_text())
            self.version_meta = raw.get("version", {})
            self.files = {
                k: FileRecord(**v) for k, v in raw.get("files", {}).items()
            }

    def save(self) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(
            json.dumps(
                {
                    "version": self.version_meta,
                    "files": {k: asdict(v) for k, v in self.files.items()},
                },
                indent=1,
                sort_keys=True,
            )
        )
        os.replace(tmp, self.path)

    def record(self, file_name: str) -> FileRecord:
        if file_name not in self.files:
            self.files[file_name] = FileRecord(file_name=file_name)
        return self.files[file_name]

    def is_current(self, file_name: str, src_path: str) -> bool:
        """Skip-unchanged rule: same size + mtime and fully loaded."""
        rec = self.files.get(file_name)
        if rec is None or rec.status != "loaded":
            return False
        st = os.stat(src_path)
        return rec.size_bytes == st.st_size and rec.mtime_ns == st.st_mtime_ns

    def stamp_source(self, file_name: str, src_path: str) -> FileRecord:
        rec = self.record(file_name)
        st = os.stat(src_path)
        rec.size_bytes, rec.mtime_ns = st.st_size, st.st_mtime_ns
        return rec

    # -------------------------------------------------- reporting (V2)

    def report_df(self, spark: SparkSession) -> DataFrame:
        """Coverage report as a DataFrame (groupBy-able at any size)."""
        rows = [
            (
                r.file_name,
                r.status,
                r.size_bytes,
                r.n_body_lines,
                r.clean_count,
                r.error_count,
                r.load_count,
                (
                    float(r.error_count) / r.n_body_lines
                    if r.n_body_lines
                    else 0.0
                ),
            )
            for r in self.files.values()
        ]
        return spark.createDataFrame(
            rows,
            "file_name string, status string, size_bytes long, "
            "n_body_lines long, clean_count long, error_count long, "
            "load_count long, error_pct double",
        )


def now() -> float:
    return time.time()
