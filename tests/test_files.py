"""File attach/download (S7/S8) — store.py:127-166 / read_only_store.py:98-183
semantics over the local binary-column Parquet file store."""

import os

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.store.files import (DownloadingError, FileStore,
                                         UploadingError, attach_dataset)


@pytest.fixture
def src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "a.txt").write_bytes(b"alpha")
    (d / "b.json").write_bytes(b"{}")
    (d / ".hidden").write_bytes(b"x")
    return d


def test_upload_one_and_resource_shape(tmp_path, src):
    fs = FileStore(str(tmp_path / "store"))
    r = fs.upload(str(src / "a.txt"))
    assert r["type"] == "DataDownload"
    assert r["name"] == "a.txt" and r["contentSize"] == 5
    assert r["digest"]["algorithm"] == "sha256"
    assert r["encodingFormat"] == "text/plain"
    assert r["contentUrl"].startswith("urn:file:")


def test_upload_dir_skips_hidden(tmp_path, src):
    fs = FileStore(str(tmp_path / "store"))
    rs = fs.upload(str(src))
    assert [r["name"] for r in rs] == ["a.txt", "b.json"]


def test_upload_missing_raises(tmp_path):
    fs = FileStore(str(tmp_path / "store"))
    with pytest.raises(UploadingError):
        fs.upload(str(tmp_path / "nope.bin"))


def test_download_follow_and_overwrite(tmp_path, src):
    fs = FileStore(str(tmp_path / "store"))
    r = fs.upload(str(src / "a.txt"))
    resource = {"id": "urn:r1", "distribution": r}
    out = tmp_path / "out"
    written = fs.download(resource, "distribution.contentUrl", str(out))
    assert written == [str(out / "a.txt")]
    assert (out / "a.txt").read_bytes() == b"alpha"
    # second download without overwrite -> timestamped sibling
    written2 = fs.download(resource, "distribution.contentUrl", str(out))
    assert written2[0] != written[0] and os.path.exists(written2[0])


def test_download_missing_follow_raises(tmp_path, src):
    fs = FileStore(str(tmp_path / "store"))
    with pytest.raises(DownloadingError, match="was not found"):
        fs.download({"id": "x"}, "distribution.contentUrl", str(tmp_path))


def test_download_content_type_filter(tmp_path, src):
    fs = FileStore(str(tmp_path / "store"))
    rs = fs.upload(str(src))
    resource = {"id": "urn:r1", "distribution": rs}
    out = tmp_path / "out2"
    written = fs.download(resource, "distribution.contentUrl", str(out),
                          content_type="application/json")
    assert [os.path.basename(w) for w in written] == ["b.json"]
    with pytest.raises(DownloadingError, match="content_type"):
        fs.download(resource, "distribution.contentUrl", str(out),
                    content_type="video/mp4")


def test_attach_dataset_binary_columns(tmp_path, src):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"path": [str(src / "a.txt"), str(src / "b.json")]}))
    out = attach_dataset(ds, str(tmp_path / "attached"))
    back = pd.read_parquet(out)
    assert sorted(back["name"]) == ["a.txt", "b.json"]
    row = back.set_index("name").loc["a.txt"]
    assert bytes(row["content"]) == b"alpha" and row["contentSize"] == 5
