"""Ingest layer: TSV clean/quarantine/type/load pipeline + manifest
orchestration (SURVEY.md §2.1 S3–S6/O1, §2.2 C1–C4/T1–T3, §2.3 V1/V2).

The distributed twin of the reference's management commands:
`cleancalaccessrawfile` → :mod:`.clean`, `loadcalaccessrawfile` →
:mod:`.load`, `updatecalaccessrawdata` → :mod:`.orchestrator`,
`models/tracking.py` → :mod:`.manifest`.
"""

from .clean import CleanResult, clean_line, split_clean, type_table, coverage_stats
from .download import acquire, download, extract
from .load import write_clean_csv, write_parquet, write_quarantine, verify_counts
from .manifest import FileRecord, Manifest
from .orchestrator import discover, update
from .schemas import SCHEMAS

__all__ = [
    "acquire", "download", "extract",
    "CleanResult", "clean_line", "split_clean", "type_table",
    "coverage_stats", "write_clean_csv", "write_parquet",
    "write_quarantine", "verify_counts", "FileRecord", "Manifest",
    "discover", "update", "SCHEMAS",
]
