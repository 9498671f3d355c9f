"""Acquisition layer: HTTP(S) zip download + extract (SURVEY.md §2.1
S1/S2).

The reference's `downloadcalaccessrawdata.py §Command.handle` streams
the state's published zip (with resume + size verification against
the HTTP Content-Length) and `extractcalaccessrawfiles` unpacks the
TSVs. These are driver-side I/O side effects, not distributed
compute — one archive feeds the whole run — so plain stdlib
streaming is the right tool; the distributed work starts at
:func:`calaspark.ingest.clean.read_lines` on the extracted files.

``file://`` URLs are first-class (tests and air-gapped runs); no
third-party HTTP client is required or used.
"""

from __future__ import annotations

import shutil
import urllib.request
import zipfile
from pathlib import Path

_CHUNK = 1 << 20  # 1 MiB streaming chunks — bounded memory at any size


def download(url: str, dest: str | Path, expected_size: int | None = None) -> dict:
    """S1: stream ``url`` to ``dest``; verify size when declared.

    Skip-if-present: an existing file matching the expected (or
    remote-declared) size is not re-downloaded — the manifest-level
    idempotency rule applied at the transport layer.
    """
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller's URL)
        declared = resp.headers.get("Content-Length")
        declared_size = int(declared) if declared else expected_size
        if (
            dest.exists()
            and declared_size is not None
            and dest.stat().st_size == declared_size
        ):
            return {
                "url": url,
                "path": str(dest),
                "size_bytes": dest.stat().st_size,
                "downloaded": False,
            }
        with open(dest, "wb") as out:
            shutil.copyfileobj(resp, out, _CHUNK)
    size = dest.stat().st_size
    if declared_size is not None and size != declared_size:
        raise OSError(
            f"download size mismatch for {url}: got {size}, "
            f"expected {declared_size}"
        )
    return {"url": url, "path": str(dest), "size_bytes": size, "downloaded": True}


def extract(archive: str | Path, out_dir: str | Path) -> list[str]:
    """S2: unpack every member, flattening to basenames (the
    reference's extract does the same — TSVs land in one directory
    for the cleaner). Traversal-safe: member paths never escape
    ``out_dir``. Returns extracted paths, sorted."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths: list[str] = []
    with zipfile.ZipFile(archive) as zf:
        for m in zf.infolist():
            if m.is_dir():
                continue
            name = Path(m.filename).name  # flatten, defeat ../ traversal
            target = out_dir / name
            with zf.open(m) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst, _CHUNK)
            paths.append(str(target))
    return sorted(paths)


def acquire(url: str, work_dir: str | Path) -> dict:
    """S1+S2: download the archive and extract it to
    ``work_dir/raw/`` — the input layout :func:`calaspark.ingest.
    orchestrator.update` consumes."""
    work_dir = Path(work_dir)
    archive = work_dir / "download.zip"
    info = download(url, archive)
    info["extracted"] = extract(archive, work_dir / "raw")
    info["raw_dir"] = str(work_dir / "raw")
    return info
