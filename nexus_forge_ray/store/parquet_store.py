"""Versioned Parquet store — the reference's Store archetype as columnar data.

Invariants reproduced from demo_store.py:225-337 + demo_store.feature (F5):
- register new        -> {version: 1, deprecated: False}; existing id -> RegistrationError
- update              -> version+1, previous version archived (retrievable)
- update deprecated   -> UpdatingError (RecordDeprecated)
- deprecate           -> version+1, deprecated=True; twice -> DeprecationError
- tag (rid, version)  -> tag->version lookup; duplicate tag -> TaggingError
- retrieve by version int / tag str -> exact archived payload
- freeze              -> every nested id rewritten via versioned_id_template
                         "{id}?_version={version}" (tests/conftest.py:462)
- missing id on register -> deterministic minted id (content hash; the
  reference's uuid4 at demo_store.py:315-317 is replaced for resume idempotency)

Layout (resumable, partitioned):
    {base}/records/*.parquet    current rows (id, data, version, deprecated)
    {base}/archives/*.parquet   archived rows (id, data, version, deprecated)
    {base}/tags/*.parquet       (id, tag, version)

Bulk path: `register_dataset` streams a Dataset straight to partitioned
Parquet with id minting + dedup-by-id inside map_batches — the scale sink.
Interactive CRUD (register/update/.../retrieve) maintains the same files via
small pandas frames (metadata-sized, not data-sized).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


class StoreError(Exception):
    pass


class RegistrationError(StoreError):
    pass


class UpdatingError(StoreError):
    pass


class DeprecationError(StoreError):
    pass


class TaggingError(StoreError):
    pass


class RetrievalError(StoreError):
    pass


def mint_id(data: dict) -> str:
    """Deterministic content-derived id (replaces uuid4, demo_store.py:315-317)."""
    payload = json.dumps(data, sort_keys=True, default=str)
    return "urn:hash:" + hashlib.sha256(payload.encode()).hexdigest()[:24]


def _atomic_write(df: pd.DataFrame, path: str) -> None:
    tmp = path + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)


class ParquetStore:
    def __init__(self, base_dir: str):
        self.base = base_dir
        for sub in ("records", "archives", "tags"):
            os.makedirs(os.path.join(base_dir, sub), exist_ok=True)
        self._records = self._load("records")
        self._archives = self._load("archives")
        self._tags = self._load("tags")

    # ------------------------------------------------------------- persistence

    def _load(self, sub: str) -> pd.DataFrame:
        d = os.path.join(self.base, sub)
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        if not files:
            if sub == "tags":
                return pd.DataFrame({"id": [], "tag": [], "version": []})
            return pd.DataFrame({"id": [], "data": [], "version": [],
                                 "deprecated": []})
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def _persist(self) -> None:
        _atomic_write(self._records, os.path.join(self.base, "records",
                                                  "part-0.parquet"))
        _atomic_write(self._archives, os.path.join(self.base, "archives",
                                                   "part-0.parquet"))
        _atomic_write(self._tags, os.path.join(self.base, "tags",
                                               "part-0.parquet"))

    # ------------------------------------------------------------------- CRUD

    def register(self, data: dict) -> dict:
        data = dict(data)
        rid = data.get("id") or mint_id(data)
        data["id"] = rid
        if (self._records["id"] == rid).any():
            raise RegistrationError(f"RecordExists: {rid}")
        row = {"id": rid, "data": json.dumps(data, sort_keys=True, default=str),
               "version": 1, "deprecated": False}
        self._records = pd.concat([self._records, pd.DataFrame([row])],
                                  ignore_index=True)
        self._persist()
        return {"data": data, "metadata": {"version": 1, "deprecated": False}}

    def _current(self, rid: str) -> pd.Series:
        hit = self._records[self._records["id"] == rid]
        if hit.empty:
            raise RetrievalError(f"RecordMissing: {rid}")
        return hit.iloc[0]

    def update(self, data: dict) -> dict:
        rid = data.get("id")
        try:
            cur = self._current(rid)
        except RetrievalError as exc:
            raise UpdatingError(str(exc)) from exc
        if cur["deprecated"]:
            raise UpdatingError(f"RecordDeprecated: {rid}")
        self._archive(cur)
        new_version = int(cur["version"]) + 1
        mask = self._records["id"] == rid
        self._records.loc[mask, "data"] = json.dumps(data, sort_keys=True,
                                                     default=str)
        self._records.loc[mask, "version"] = new_version
        self._persist()
        return {"data": dict(data),
                "metadata": {"version": new_version, "deprecated": False}}

    def deprecate(self, rid: str) -> dict:
        try:
            cur = self._current(rid)
        except RetrievalError as exc:
            raise DeprecationError(str(exc)) from exc
        if cur["deprecated"]:
            raise DeprecationError(f"RecordDeprecated: {rid}")
        self._archive(cur)
        new_version = int(cur["version"]) + 1
        mask = self._records["id"] == rid
        self._records.loc[mask, "version"] = new_version
        self._records.loc[mask, "deprecated"] = True
        self._persist()
        return {"data": json.loads(cur["data"]),
                "metadata": {"version": new_version, "deprecated": True}}

    def _archive(self, cur: pd.Series) -> None:
        self._archives = pd.concat([self._archives, cur.to_frame().T],
                                   ignore_index=True)

    def tag(self, rid: str, version: int, value: str) -> None:
        if not (self._records["id"] == rid).any():
            raise TaggingError(f"RecordMissing: {rid}")
        dup = (self._tags["id"] == rid) & (self._tags["tag"] == value)
        if dup.any():
            raise TaggingError(f"TagExists: {rid}@{value}")
        self._tags = pd.concat(
            [self._tags, pd.DataFrame([{"id": rid, "tag": value,
                                        "version": int(version)}])],
            ignore_index=True)
        self._persist()

    def retrieve(self, rid: str, version: int | str | None = None) -> dict:
        if version is None:
            cur = self._current(rid)
            return {"data": json.loads(cur["data"]),
                    "metadata": {"version": int(cur["version"]),
                                 "deprecated": bool(cur["deprecated"])}}
        if isinstance(version, str):
            hit = self._tags[(self._tags["id"] == rid)
                             & (self._tags["tag"] == version)]
            if hit.empty:
                raise RetrievalError(f"TagMissing: {rid}@{version}")
            version = int(hit.iloc[0]["version"])
        cur = self._current(rid)
        if int(cur["version"]) == version:
            return {"data": json.loads(cur["data"]),
                    "metadata": {"version": version,
                                 "deprecated": bool(cur["deprecated"])}}
        hit = self._archives[(self._archives["id"] == rid)
                             & (self._archives["version"] == version)]
        if hit.empty:
            raise RetrievalError(f"VersionMissing: {rid}@{version}")
        row = hit.iloc[0]
        return {"data": json.loads(row["data"]),
                "metadata": {"version": int(row["version"]),
                             "deprecated": bool(row["deprecated"])}}

    # ------------------------------------------------------------------ search

    def search(self, *filters, include_deprecated: bool = False) -> list[dict]:
        """Find current records matching all Filters (demo_store.py find,
        :299-301) with the implicit deprecated==False filter
        (bluebrain_nexus.py:947-959). Filters may be Filter objects or dicts."""
        import json as _json

        from nexus_forge_ray.core.conversions import flatten_record
        from nexus_forge_ray.core.filters import (Filter, apply_filters_frame,
                                                  filters_from_dict)
        flist = []
        for f in filters:
            if isinstance(f, dict):
                flist.extend(filters_from_dict(f))
            else:
                flist.append(f)
        if self._records.empty:
            return []
        datas = [flatten_record(_json.loads(d)) for d in self._records["data"]]
        frame = pd.DataFrame(datas)
        frame["deprecated"] = self._records["deprecated"].to_numpy()
        frame["_version"] = self._records["version"].to_numpy()
        if not include_deprecated:
            frame = frame[~frame["deprecated"].astype(bool)]
        hit = apply_filters_frame(frame.drop(columns=["deprecated"]), flist)
        out = []
        for i in hit.index:
            out.append({"data": _json.loads(self._records["data"].iloc[i]),
                        "metadata": {
                            "version": int(self._records["version"].iloc[i]),
                            "deprecated": bool(
                                self._records["deprecated"].iloc[i])}})
        return out

    # ------------------------------------------------------------------ freeze

    VERSIONED_ID_TEMPLATE = "{id}?_version={version}"

    def freeze(self, data: Any) -> Any:
        """Recursively pin every nested id to its current store version
        (store.py:300-311 _freeze_one)."""
        if isinstance(data, dict):
            out = {k: self.freeze(v) for k, v in data.items()}
            if "id" in out and isinstance(out["id"], str):
                try:
                    meta = self.retrieve(out["id"])["metadata"]
                    out["id"] = self.VERSIONED_ID_TEMPLATE.format(
                        id=out["id"], version=meta["version"])
                except RetrievalError:
                    pass
            return out
        if isinstance(data, list):
            return [self.freeze(v) for v in data]
        return data

    # --------------------------------------------------------------- bulk path

    @staticmethod
    def register_dataset(ds: ray.data.Dataset, out_dir: str, *,
                         id_col: str = "id",
                         num_partitions: int | None = None) -> str:
        """Scale sink: dedup by id (first wins, deterministic by min id),
        stamp version=1/deprecated=False, write partitioned Parquet.
        """
        def stamp(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if id_col not in batch.columns:
                batch[id_col] = [
                    mint_id(r) for r in batch.to_dict("records")]
            batch["version"] = 1
            batch["deprecated"] = False
            return batch

        from nexus_forge_ray.ops.agg import min_by_rows
        from nexus_forge_ray.utils import stable_hash_u64

        def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            # deterministic duplicate winner: min row-content hash per id
            # (the reference's "first writer wins" is arrival-order-dependent;
            # a total order keeps replays byte-identical)
            h = np.zeros(len(batch), dtype="uint64")
            for c in sorted(batch.columns):
                h ^= stable_hash_u64(batch[c].astype(str))
            batch["__row_fp"] = h
            return batch

        import numpy as np
        stamped = ds.map_batches(stamp, batch_format="pandas") \
            .map_batches(fingerprint, batch_format="pandas")
        deduped = min_by_rows(stamped, id_col, "__row_fp") \
            .drop_columns(["__row_fp"])
        if num_partitions:
            deduped = deduped.repartition(num_partitions)
        deduped.write_parquet(out_dir)
        return out_dir
