"""Ingestion façade (S1-S3) tests — local file:// fixtures, no network.

Covers the reference behaviors: skip-if-exists caching, partial-file
cleanup on failure (data_downloader.py:52-58), integrity checks
(data_downloader.py:61-95), member-filtered extraction
(file_extractor.py:38-74) — plus the traversal guard the reference lacks.
"""

from __future__ import annotations

import tarfile
from pathlib import Path

import pytest

from ghcn_d_etl_project_spark.pipelines.ingest import (
    download_file,
    extract_members,
    ingest,
    parse_station_ids,
    verify_file_integrity,
)

S_GA1, S_GA2, S_FL = "USC0GA00001", "USC0GA00002", "USC0FL00001"


def _station_line(sid: str, state: str) -> str:
    return f"{sid:<11} {33.7:>8.4f} {-84.4:>9.4f} {320.0:>6.1f} {state:<2} NAME".ljust(
        81
    ) + "US"


@pytest.fixture()
def fixtures(tmp_path: Path):
    stations = tmp_path / "ghcnd-stations.txt"
    stations.write_text(
        "\n".join(_station_line(s, s[4:6]) for s in (S_GA1, S_GA2, S_FL)) + "\n"
    )
    src = tmp_path / "src"
    src.mkdir()
    for sid in (S_GA1, S_GA2, S_FL):
        (src / f"{sid}.dly").write_text(f"{sid:<11}2021...\n")
    (src / "readme.txt").write_text("not a dly\n")
    archive = tmp_path / "ghcnd_all.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        for p in src.iterdir():
            tar.add(p, arcname=f"ghcnd_all/{p.name}")
    return stations, archive


def test_download_skip_and_force(fixtures, tmp_path):
    stations, _ = fixtures
    url = stations.as_uri()
    out = download_file(url, str(tmp_path / "raw"))
    assert Path(out).read_text() == stations.read_text()
    # skip-if-exists: mutate the local copy; a second download must NOT overwrite
    Path(out).write_text("sentinel")
    assert download_file(url, str(tmp_path / "raw")) == out
    assert Path(out).read_text() == "sentinel"
    # force=True re-fetches
    download_file(url, str(tmp_path / "raw"), force=True)
    assert Path(out).read_text() == stations.read_text()


def test_download_failure_cleans_partial(tmp_path):
    with pytest.raises(OSError):
        download_file(
            (tmp_path / "missing.bin").as_uri(), str(tmp_path / "raw")
        )
    assert not (tmp_path / "raw" / "missing.bin").exists()


def test_integrity(fixtures, tmp_path):
    stations, archive = fixtures
    assert verify_file_integrity(str(stations))
    assert verify_file_integrity(str(archive))
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    assert not verify_file_integrity(str(empty))
    blank = tmp_path / "blank.txt"
    blank.write_text("\n\n")
    assert not verify_file_integrity(str(blank))
    fake = tmp_path / "fake.tar.gz"
    fake.write_text("this is not a tarball")
    assert not verify_file_integrity(str(fake))


def test_member_filtered_extract(fixtures, tmp_path):
    stations, archive = fixtures
    ids = parse_station_ids(str(stations), "GA")
    assert ids == {S_GA1, S_GA2}
    out = extract_members(str(archive), str(tmp_path / "x"), stems=ids)
    names = sorted(Path(p).name for p in out)
    assert names == [f"{S_GA1}.dly", f"{S_GA2}.dly"]  # FL + readme excluded
    for p in out:
        assert Path(p).exists()


def test_traversal_rejected(tmp_path):
    evil = tmp_path / "evil.tar.gz"
    payload = tmp_path / "payload.dly"
    payload.write_text("boom\n")
    with tarfile.open(evil, "w:gz") as tar:
        tar.add(payload, arcname="../escaped.dly")
    with pytest.raises(ValueError, match="unsafe member path"):
        extract_members(str(evil), str(tmp_path / "x"))
    assert not (tmp_path / "escaped.dly").exists()


def test_ingest_composition(fixtures, tmp_path):
    stations, archive = fixtures
    res = ingest(
        archive.as_uri(), stations.as_uri(), str(tmp_path / "base"), state="GA"
    )
    assert len(res["dly_paths"]) == 2
    assert Path(res["stations_path"]).exists()


def test_download_sets_socket_timeout(fixtures, tmp_path, monkeypatch):
    """download_file must pass a finite timeout to urlopen — the default
    (None) hangs the driver forever on a stalled connection."""
    import urllib.request

    seen: dict[str, object] = {}
    real = urllib.request.urlopen

    def spy(url, *args, timeout=None, **kwargs):
        seen["timeout"] = timeout
        return real(url, *args, timeout=timeout, **kwargs)

    monkeypatch.setattr(urllib.request, "urlopen", spy)
    stations, _ = fixtures
    download_file(stations.as_uri(), str(tmp_path / "raw2"), timeout=12.5)
    assert seen["timeout"] == 12.5


# ---------------------------------------------------------------------------
# Delimited / JSON-lines scans (schema-contract readers)
# ---------------------------------------------------------------------------


def test_read_delimited_contract_and_quarantine(spark, tmp_path):
    from ghcn_d_etl_project_spark.sources.readers import read_delimited

    p = tmp_path / "x.csv"
    p.write_text("id,name,score\n1,alice,2.5\n2,bob,3.5\nbad,row\n")
    # PERMISSIVE + corrupt capture: malformed row quarantines, not lost
    df = read_delimited(
        spark, str(p), "id long, name string, score double",
        mode="PERMISSIVE", corrupt_col="_bad",
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score == 2.5 and rows[2].name == "bob"
    bad = [r for r in rows.values() if r._bad is not None]
    assert len(bad) == 1 and bad[0]._bad.startswith("bad,row")
    # FAILFAST: the same file raises loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_delimited(
            spark, str(p), "id long, name string, score double"
        ).collect()
    # corrupt_col without PERMISSIVE is a usage error
    with _pytest.raises(ValueError):
        read_delimited(spark, str(p), "id long", corrupt_col="_bad")


def test_read_jsonl_contract(spark, tmp_path):
    from ghcn_d_etl_project_spark.sources.readers import read_jsonl

    p = tmp_path / "x.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "extra": true}\n'
        '{"id": 2}\n'
        "{broken\n"
    )
    df = read_jsonl(spark, str(p), "id long, name string, missing double")
    rows = df.collect()
    ok = {r.id: r for r in rows if r._corrupt_record is None}
    # extra field ignored; absent fields NULL; broken line quarantined
    assert ok[1].name == "a" and ok[1].missing is None
    assert ok[2].name is None
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
