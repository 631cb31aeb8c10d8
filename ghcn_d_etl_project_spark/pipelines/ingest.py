"""Ingestion façade (SURVEY §2.1 S1-S3): acquire → verify → extract.

Reference analogs: HTTPS download with skip-if-exists caching and
partial-file cleanup (``src/ingest/data_downloader.py:17-59``), integrity
verification (``data_downloader.py:61-95``), tar member-filtered
extraction (``src/ingest/file_extractor.py:38-74``).

These are driver-side by nature — they run once per archive on one node
and feed files to the engine's distributed fixed-width scan
(``sources/readers.read_fixed_width``). Two deliberate divergences from
the reference, per SURVEY §3/§4:

  * NO post-extract file rewriting: the reference re-reads every ``.dly``
    and rewrites it year-filtered on the driver
    (``file_extractor.py:76-105``); here year filtering is a pushed-down
    engine predicate (``pipelines/ghcn.py``), so extraction only selects
    members.
  * extraction refuses path-traversal member names (``../``/absolute),
    which the reference's bare ``tar.extract`` allows.

stdlib only (urllib/tarfile) — no third-party HTTP dependency.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from pathlib import Path
from urllib.parse import urlparse


def download_file(
    url: str,
    dest_dir: str,
    filename: str | None = None,
    force: bool = False,
    chunk_size: int = 8192,
    timeout: float = 60.0,
) -> str:
    """Stream ``url`` into ``dest_dir``; skip when the file already exists
    (unless ``force``); remove the partial file on any failure so a retry
    never resumes from a truncated artifact. ``timeout`` (seconds) bounds
    both connect and per-read stalls — without it a dead connection hangs
    the driver forever (urlopen's default is no timeout)."""
    if filename is None:
        filename = os.path.basename(urlparse(url).path)
        if not filename:
            raise ValueError(f"cannot derive a filename from url: {url}")
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    path = dest / filename
    if path.exists() and not force:
        return str(path)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(path, "wb") as out:
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                out.write(chunk)
    except BaseException:
        if path.exists():
            path.unlink()
        raise
    return str(path)


def verify_file_integrity(path: str) -> bool:
    """Cheap post-download sanity checks: non-empty; ``.txt`` has a
    non-blank first line; ``.tar.gz`` opens and lists as a gzipped tar."""
    p = Path(path)
    if not p.exists() or p.stat().st_size == 0:
        return False
    if p.name.endswith(".txt"):
        with open(p, encoding="utf-8", errors="replace") as f:
            if not f.readline().strip():
                return False
    elif p.name.endswith(".tar.gz"):
        try:
            with tarfile.open(p, "r:gz") as tar:
                tar.getnames()[:1]
        except (tarfile.TarError, OSError, EOFError):
            return False
    return True


def parse_station_ids(stations_file: str, state: str) -> set[str]:
    """Station IDs for one state from the fixed-width stations file —
    the tiny driver-side set used to pre-filter tar members BEFORE
    extraction (the distributed scan in ``pipelines/ghcn.read_stations``
    is the analytical path; this one exists to avoid extracting archive
    members that would be immediately discarded)."""
    ids: set[str] = set()
    with open(stations_file, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.strip():
                if line[38:40].strip() == state:
                    ids.add(line[0:11].strip())
    return ids


def extract_members(
    tar_path: str,
    dest_dir: str,
    suffix: str = ".dly",
    stems: set[str] | None = None,
) -> list[str]:
    """Extract only the archive members worth reading: name ends with
    ``suffix`` and (when ``stems`` is given) the basename-without-suffix
    is in ``stems``. Rejects absolute / parent-escaping member names."""
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    out: list[str] = []
    with tarfile.open(tar_path, "r:gz") as tar:
        for member in tar.getmembers():
            if not (member.isfile() and member.name.endswith(suffix)):
                continue
            stem = os.path.basename(member.name)[: -len(suffix)]
            if stems is not None and stem not in stems:
                continue
            target = (dest / member.name).resolve()
            if not str(target).startswith(str(dest.resolve()) + os.sep):
                raise ValueError(f"unsafe member path in archive: {member.name}")
            tar.extract(member, dest)
            out.append(str(dest / member.name))
    return out


def ingest(
    archive_url: str,
    stations_url: str,
    base_dir: str,
    state: str | None = None,
    force: bool = False,
) -> dict[str, object]:
    """S1→S2→S3 composition: download both artifacts, verify, extract the
    (optionally state-filtered) ``.dly`` members. Returns the local paths
    ready for the distributed scan."""
    raw = os.path.join(base_dir, "raw")
    stations_path = download_file(stations_url, raw, force=force)
    archive_path = download_file(archive_url, raw, force=force)
    for p in (stations_path, archive_path):
        if not verify_file_integrity(p):
            raise RuntimeError(f"integrity check failed: {p}")
    stems = parse_station_ids(stations_path, state) if state else None
    dly_paths = extract_members(archive_path, raw, suffix=".dly", stems=stems)
    return {
        "stations_path": stations_path,
        "archive_path": archive_path,
        "dly_paths": dly_paths,
    }
