"""Web database layer: the reference's download-and-cache contract
(``/root/reference/src/sasktran2/database/web.py:13-90``, ``zenodo.py``)
exercised against ``file://`` URLs so no egress is needed."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from sasktran2_tpu.database import (
    StandardDatabase,
    WebDatabase,
    ZipWebDatabase,
    download_zenodo_record,
)


def _write_npz(path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        coord_x=np.arange(3.0),
        xs=np.array([1.0, 2.0, 3.0]),
        dims_xs=np.array(["x"]),
    )


@pytest.fixture
def served(tmp_path):
    """A 'server' directory exposed via file:// and a fresh cache root."""
    src = tmp_path / "server"
    cache = tmp_path / "cache"
    src.mkdir()
    cache.mkdir()
    return src, cache


def test_web_database_fetch_cache_clear(served):
    src, cache = served
    _write_npz(src / "data.npz")
    url = (src / "data.npz").as_uri()

    db = WebDatabase(url, rel_path="sub/dir", db_root=cache)
    out = db.load()
    assert out == cache / "sub" / "dir" / "data.npz"
    assert out.exists()

    # cache semantics: a second load must NOT re-fetch — delete the
    # source and load() still succeeds from cache
    (src / "data.npz").unlink()
    assert db.load() == out

    ds = db.load_ds()
    np.testing.assert_allclose(ds["data_vars"]["xs"][1], [1.0, 2.0, 3.0])

    db.clear()
    assert not out.exists()
    with pytest.raises(FileNotFoundError):
        db.load()  # source is gone and cache is cleared


def test_web_database_missing_source_raises(served):
    src, cache = served
    db = WebDatabase((src / "absent.npz").as_uri(), db_root=cache)
    with pytest.raises(FileNotFoundError, match="absent.npz"):
        db.load()
    # a failed fetch must not leave a partial/empty cache entry
    assert not db.output_file().exists()


def test_zip_web_database_extracts(served):
    src, cache = served
    inner = src / "payload"
    _write_npz(inner / "a.npz")
    _write_npz(inner / "nested" / "b.npz")
    zpath = src / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in sorted(inner.rglob("*.npz")):
            zf.write(p, p.relative_to(src))

    db = ZipWebDatabase(zpath.as_uri(), db_root=cache)
    db.load()
    # archive cached + contents extracted into the db root (reference
    # ZipWebDatabase extracts into db_root)
    assert (cache / "bundle.zip").exists()
    assert (cache / "payload" / "a.npz").exists()
    assert (cache / "payload" / "nested" / "b.npz").exists()


def test_standard_database_versioned_keys(served):
    src, cache = served
    _write_npz(src / "v_latest" / "cross_sections" / "o3.npz")

    db = StandardDatabase(base_url=src.as_uri(), db_root=cache)
    p = db.path("cross_sections/o3.npz")
    assert p.exists()
    assert p == cache / "cross_sections" / "o3.npz"
    ds = db.load_ds("cross_sections/o3.npz")
    assert "xs" in ds["data_vars"]
    with pytest.raises(NotImplementedError):
        db.clear()


def test_zenodo_record_download(served):
    src, cache = served
    # lay out a file:// tree shaped like the Zenodo records API:
    # <api>/records/<id> is a JSON record whose file entries carry
    # absolute download links
    files_dir = src / "files"
    _write_npz(files_dir / "table.npz")
    (files_dir / "readme.txt").write_text("hello")
    record = {
        "files": [
            {"key": "table.npz",
             "links": {"self": (files_dir / "table.npz").as_uri()}},
            {"key": "readme.txt",
             "links": {"self": (files_dir / "readme.txt").as_uri()}},
        ]
    }
    flat = src / "api"
    (flat / "records").mkdir(parents=True)
    (flat / "records" / "999").write_text(json.dumps(record))

    out = download_zenodo_record("999", cache / "zenodo",
                                 api_base=flat.as_uri())
    assert sorted(p.name for p in out) == ["readme.txt", "table.npz"]
    assert (cache / "zenodo" / "table.npz").exists()
    assert (cache / "zenodo" / "readme.txt").read_text() == "hello"

    # cache semantics: delete the source, re-download is a no-op
    (files_dir / "table.npz").unlink()
    out2 = download_zenodo_record("999", cache / "zenodo",
                                  api_base=flat.as_uri())
    assert (cache / "zenodo" / "table.npz").exists()
    assert len(out2) == 2
