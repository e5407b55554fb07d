"""File attach/download — the Store archetype's upload/download surface
(kgforge/core/archetypes/store.py:127-166, read_only_store.py:98-183) over a
binary-column Parquet file store (no network in this environment: contentUrls
are urn:file: keys into the managed table, not HTTP).

Reproduced semantics:
- upload(path): file OR directory (dir = every non-hidden file,
  store.py:147-155); returns DataDownload-shaped resource dict(s) with
  contentUrl / encodingFormat / contentSize / digest(sha256) / name — the
  shape of the reference's file_resource_mapping output.
- download(data, follow, path): collect contentUrls at the dotted follow
  path across resources (collect_values; empty -> DownloadingError with the
  reference's message), optional content_type constraint filter, existing
  file + overwrite=False -> timestamped sibling (read_only_store.py:130-143).
- scale path: attach_dataset streams (name, content binary, metadata) rows
  to partitioned Parquet — the binary-column layout ops/multimodal.py stages
  consume; one row group per batch keeps payload blocks small.
"""

from __future__ import annotations

import glob
import hashlib
import mimetypes
import os
import time

import pandas as pd
import ray.data

from nexus_forge_ray.core.reshaping import collect_values
from nexus_forge_ray.store.parquet_store import StoreError


class UploadingError(StoreError):
    pass


class DownloadingError(StoreError):
    pass


FILE_COLS = ["name", "contentUrl", "encodingFormat", "contentSize",
             "sha256", "content"]


class FileStore:
    def __init__(self, base_dir: str):
        self.base = base_dir
        self.files_dir = os.path.join(base_dir, "files")
        os.makedirs(self.files_dir, exist_ok=True)
        self._seq = len(glob.glob(os.path.join(self.files_dir, "*.parquet")))

    # ------------------------------------------------------------------ upload

    def upload(self, path: str, content_type: str | None = None):
        """File or directory -> DataDownload resource dict(s)."""
        if os.path.isdir(path):
            files = sorted(
                p for p in (os.path.join(path, f) for f in os.listdir(path))
                if os.path.isfile(p)
                and not os.path.basename(p).startswith("."))
            return [self._upload_one(p, content_type) for p in files]
        return self._upload_one(path, content_type)

    def _upload_one(self, path: str, content_type: str | None) -> dict:
        if not os.path.isfile(path):
            raise UploadingError(f"FileMissing: {path}")
        with open(path, "rb") as f:
            content = f.read()
        name = os.path.basename(path)
        digest = hashlib.sha256(content).hexdigest()
        url = f"urn:file:{digest[:16]}:{name}"
        fmt = content_type or mimetypes.guess_type(name)[0] \
            or "application/octet-stream"
        row = {"name": name, "contentUrl": url, "encodingFormat": fmt,
               "contentSize": len(content), "sha256": digest,
               "content": content}
        part = os.path.join(self.files_dir, f"part-{self._seq:06d}.parquet")
        self._seq += 1
        pd.DataFrame([row])[FILE_COLS].to_parquet(part, index=False)
        return {"type": "DataDownload", "contentUrl": url,
                "encodingFormat": fmt, "contentSize": len(content),
                "digest": {"algorithm": "sha256", "value": digest},
                "name": name}

    # ---------------------------------------------------------------- download

    def _lookup(self, urls: list[str]) -> dict[str, tuple[str, bytes]]:
        out: dict[str, tuple[str, bytes]] = {}
        want = set(urls)
        for part in sorted(glob.glob(os.path.join(self.files_dir,
                                                  "*.parquet"))):
            df = pd.read_parquet(part)
            hit = df[df["contentUrl"].isin(want)]
            for _, r in hit.iterrows():
                out[r["contentUrl"]] = (r["name"], bytes(r["content"]))
        return out

    def download(self, data, follow: str = "distribution.contentUrl",
                 path: str = ".", overwrite: bool = False,
                 content_type: str | None = None) -> list[str]:
        """Write the files referenced at `follow` to `path`; returns the
        written file paths."""
        resources = data if isinstance(data, list) else [data]
        urls: list[str] = []
        for r in resources:
            urls.extend(v for v in collect_values(r, follow)
                        if isinstance(v, str))
        if not urls:
            raise DownloadingError(
                f"path to follow '{follow}' was not found in any provided "
                f"resource.")
        found = self._lookup(urls)
        if content_type:
            fmts = {u: f for u, (n, _) in found.items()
                    for f in [mimetypes.guess_type(n)[0]
                              or "application/octet-stream"]}
            urls = [u for u in urls if fmts.get(u) == content_type]
            if not urls:
                raise DownloadingError(
                    f"No resource with content_type {content_type} was found "
                    f"when following the resource path '{follow}'.")
        os.makedirs(path, exist_ok=True)
        stamp = time.strftime("%Y%m%d%H%M%S")
        written = []
        for u in urls:
            if u not in found:
                raise DownloadingError(f"FileMissing: {u}")
            name, content = found[u]
            target = os.path.join(path, name)
            if os.path.exists(target) and not overwrite:
                target = f"{target}.{stamp}"
            with open(target, "wb") as f:
                f.write(content)
            written.append(target)
        return written


def attach_dataset(paths_ds: ray.data.Dataset, out_dir: str, *,
                   path_col: str = "path") -> str:
    """Scale sink: a Dataset of file paths -> partitioned binary-column
    Parquet (name, contentUrl, encodingFormat, contentSize, sha256, content).
    Payload reads happen inside map_batches (distributed, streaming)."""
    def read_files(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p in batch[path_col]:
            with open(p, "rb") as f:
                content = f.read()
            name = os.path.basename(p)
            digest = hashlib.sha256(content).hexdigest()
            rows.append({
                "name": name, "contentUrl": f"urn:file:{digest[:16]}:{name}",
                "encodingFormat": mimetypes.guess_type(name)[0]
                or "application/octet-stream",
                "contentSize": len(content), "sha256": digest,
                "content": content})
        return pd.DataFrame(rows, columns=FILE_COLS)

    paths_ds.map_batches(read_files, batch_format="pandas",
                         batch_size=64).write_parquet(out_dir)
    return out_dir
