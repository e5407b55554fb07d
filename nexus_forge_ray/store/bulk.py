"""Bulk store mutations — the reference's `_update_many` / `_deprecate_many` /
`_tag_many` batched paths (bluebrain_nexus.py:126-164, 413-520; per-resource
success/error callbacks, actions.py semantics) as Dataset transforms over the
bulk Parquet store layout (`ParquetStore.register_dataset` output:
data columns + id/version/deprecated).

Each operation:
- joins the mutation set to the current records with ONE bucketed hash
  shuffle (both sides co-located by hash(id) — nothing touches the driver);
- applies the same per-record rules as the interactive CRUD (version bump,
  archive previous, deprecated guard, duplicate-tag guard);
- emits a tagged union of (records', archives', actions) rows, split into
  three Datasets after one materialization;
- writes a new snapshot directory (records/ + archives/ + tags/), leaving the
  input snapshot untouched — versioned store directories are the resumable
  unit (a failed bulk run is re-run against the unchanged input snapshot).

Per-record outcomes mirror the reference: an item that fails (missing id,
deprecated record, duplicate tag) yields a failed action, it does not abort
the batch (BatchRequestHandler callbacks record per-task errors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.utils import stable_hash_u64

META_COLS = ["version", "deprecated"]


def _tag_union(left: ray.data.Dataset, right: ray.data.Dataset,
               lcols: list[str], rcols: list[str], key_cols: list[str],
               num_buckets: int):
    """Union of side-tagged, column-padded frames bucketed by hash(keys)."""
    allcols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in allcols})
            h = np.zeros(len(batch), dtype=np.uint64)
            for k in key_cols:
                h ^= stable_hash_u64(batch[k].astype(str))
            out["__bucket"] = (h % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    return left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas"))


def _split(result: ray.data.Dataset, kind: str,
           cols: list[str]) -> ray.data.Dataset:
    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = df.loc[df["__kind"] == kind, cols]
        return out.infer_objects()
    return result.map_batches(f, batch_format="pandas")


def _actions_frame(ids, succeeded, errors, operation: str) -> pd.DataFrame:
    return pd.DataFrame({"id": ids, "operation": operation,
                         "succeeded": succeeded, "error": errors})


def bulk_update(records: ray.data.Dataset, updates: ray.data.Dataset, *,
                id_col: str = "id", num_buckets: int = 32
                ) -> tuple[ray.data.Dataset, ray.data.Dataset, ray.data.Dataset]:
    """Returns (records', archives, actions).

    Rules (demo_store.py:241-256 generalized): matched + not deprecated ->
    new data, version+1, previous row archived; matched + deprecated ->
    failed action RecordDeprecated (row kept as-is); update id not in store
    -> failed action RecordMissing; untouched rows pass through.
    """
    rec_cols = [c for c in records.schema().names]
    data_cols = [c for c in rec_cols if c not in META_COLS]
    upd_cols = [id_col] + [f"{c}__new" for c in data_cols if c != id_col]

    def rename_new(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={c: f"{c}__new" for c in df.columns
                                  if c != id_col})

    both = _tag_union(records, updates.map_batches(rename_new,
                                                   batch_format="pandas"),
                      rec_cols, upd_cols, [id_col], num_buckets)
    out_cols = rec_cols + ["__kind", "operation", "succeeded", "error"]

    def apply_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][rec_cols].infer_objects()
        rg = group[group["__side"] == "r"][upd_cols].infer_objects()
        m = lg.merge(rg, on=id_col, how="outer", indicator=True)
        frames = []
        cur = m["_merge"] != "right_only"
        upd = m["_merge"] == "both"
        ok = upd & ~m["deprecated"].fillna(False).astype(bool)
        # records': untouched/deprecated rows as-is, updated rows bumped
        rec_out = m[cur].copy()
        sel = ok[cur].to_numpy()
        for c in data_cols:
            if c == id_col:
                continue
            vals = rec_out[c].to_numpy(dtype=object)
            vals[sel] = rec_out.loc[ok[cur], f"{c}__new"].to_numpy()
            rec_out[c] = vals
        ver = rec_out["version"].to_numpy(dtype=object)
        ver[sel] = [int(v) + 1 for v in ver[sel]]
        rec_out["version"] = ver
        rec_out = rec_out[rec_cols]
        rec_out["__kind"] = "record"
        frames.append(rec_out)
        # archives: the previous row of every successful update
        arch = m[ok][rec_cols].copy()
        arch["__kind"] = "archive"
        frames.append(arch)
        # actions: one per attempted update
        att = m[m["_merge"] != "left_only"]
        acts = _actions_frame(
            att[id_col].to_numpy(),
            (att["_merge"] == "both").to_numpy()
            & ~att["deprecated"].fillna(False).astype(bool).to_numpy(),
            np.where(att["_merge"] == "right_only", "RecordMissing",
                     np.where(att["deprecated"].fillna(False).astype(bool),
                              "RecordDeprecated", "")),
            "update")
        acts["__kind"] = "action"
        frames.append(acts)
        out = pd.concat(frames, ignore_index=True)
        for c in out_cols:
            if c not in out.columns:
                out[c] = None
        return out[out_cols]

    result = both.groupby("__bucket").map_groups(
        apply_bucket, batch_format="pandas").materialize()
    return (_split(result, "record", rec_cols),
            _split(result, "archive", rec_cols),
            _split(result, "action", ["id", "operation", "succeeded", "error"]))


def bulk_deprecate(records: ray.data.Dataset, ids: ray.data.Dataset, *,
                   id_col: str = "id", num_buckets: int = 32
                   ) -> tuple[ray.data.Dataset, ray.data.Dataset,
                              ray.data.Dataset]:
    """Returns (records', archives, actions) — deprecate = version+1 +
    deprecated=True; already-deprecated or missing -> failed action
    (demo_store.py:258-270)."""
    rec_cols = [c for c in records.schema().names]

    def key_only(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col], "__dep": True})

    both = _tag_union(records, ids.map_batches(key_only, batch_format="pandas"),
                      rec_cols, [id_col, "__dep"], [id_col], num_buckets)
    out_cols = rec_cols + ["__kind", "operation", "succeeded", "error"]

    def apply_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][rec_cols].infer_objects()
        rg = group[group["__side"] == "r"][[id_col, "__dep"]].infer_objects()
        rg = rg.drop_duplicates(subset=[id_col])
        m = lg.merge(rg, on=id_col, how="outer", indicator=True)
        ok = (m["_merge"] == "both") \
            & ~m["deprecated"].fillna(False).astype(bool)
        frames = []
        rec_out = m[m["_merge"] != "right_only"].copy()
        sel = ok[m["_merge"] != "right_only"].to_numpy()
        ver = rec_out["version"].to_numpy(dtype=object)
        ver[sel] = [int(v) + 1 for v in ver[sel]]
        rec_out["version"] = ver
        dep = rec_out["deprecated"].to_numpy(dtype=object)
        dep[sel] = True
        rec_out["deprecated"] = dep
        rec_out = rec_out[rec_cols]
        rec_out["__kind"] = "record"
        frames.append(rec_out)
        arch = m[ok][rec_cols].copy()
        arch["__kind"] = "archive"
        frames.append(arch)
        att = m[m["_merge"] != "left_only"]
        acts = _actions_frame(
            att[id_col].to_numpy(), ok[m["_merge"] != "left_only"].to_numpy(),
            np.where(att["_merge"] == "right_only", "RecordMissing",
                     np.where(att["deprecated"].fillna(False).astype(bool),
                              "RecordDeprecated", "")),
            "deprecate")
        acts["__kind"] = "action"
        frames.append(acts)
        out = pd.concat(frames, ignore_index=True)
        for c in out_cols:
            if c not in out.columns:
                out[c] = None
        return out[out_cols]

    result = both.groupby("__bucket").map_groups(
        apply_bucket, batch_format="pandas").materialize()
    return (_split(result, "record", rec_cols),
            _split(result, "archive", rec_cols),
            _split(result, "action", ["id", "operation", "succeeded", "error"]))


def bulk_tag(records: ray.data.Dataset, tags: ray.data.Dataset,
             existing_tags: ray.data.Dataset | None = None, *,
             id_col: str = "id", num_buckets: int = 32
             ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Returns (tags', actions). tags: (id, tag) rows; the tagged version is
    the record's CURRENT version (demo_store.py:272-283). Missing record or
    duplicate (id, tag) -> failed action."""
    def rec_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col], "version": df["version"],
                             "tag": None, "__r": "rec"})

    def new_tags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col], "version": None,
                             "tag": df["tag"], "__r": "new"})

    def old_tags(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col], "version": df["version"],
                             "tag": df["tag"], "__r": "old"})

    parts = [records.map_batches(rec_keys, batch_format="pandas"),
             tags.map_batches(new_tags, batch_format="pandas")]
    if existing_tags is not None:
        parts.append(existing_tags.map_batches(old_tags,
                                               batch_format="pandas"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.union(p)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (stable_hash_u64(df[id_col].astype(str))
                          % np.uint64(num_buckets)).astype("int32")
        return df

    def apply_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rec = group[group["__r"] == "rec"]
        ver = dict(zip(rec[id_col], rec["version"]))
        old = group[group["__r"] == "old"]
        seen = set(zip(old[id_col], old["tag"]))
        new = group[group["__r"] == "new"]
        rows = []
        for rid, tg in zip(new[id_col], new["tag"]):
            if rid not in ver:
                rows.append((rid, tg, None, False, "RecordMissing"))
            elif (rid, tg) in seen:
                rows.append((rid, tg, None, False, f"TagExists: {rid}@{tg}"))
            else:
                seen.add((rid, tg))
                rows.append((rid, tg, int(ver[rid]), True, ""))
        out = pd.DataFrame(rows, columns=[id_col, "tag", "version",
                                          "succeeded", "error"])
        out["operation"] = "tag"
        return out

    result = allp.map_batches(bucket, batch_format="pandas") \
        .groupby("__bucket").map_groups(apply_bucket,
                                        batch_format="pandas").materialize()
    tags_out = result.map_batches(
        lambda df: df.loc[df["succeeded"].astype(bool),
                          [id_col, "tag", "version"]].infer_objects(),
        batch_format="pandas")
    actions = result.map_batches(
        lambda df: df[[id_col, "operation", "succeeded", "error"]],
        batch_format="pandas")
    return tags_out, actions


def write_snapshot(records: ray.data.Dataset, archives: ray.data.Dataset,
                   out_dir: str, tags: ray.data.Dataset | None = None) -> str:
    """Materialize a new store snapshot directory (records/ archives/ tags/)."""
    records.write_parquet(f"{out_dir}/records")
    archives.write_parquet(f"{out_dir}/archives")
    if tags is not None:
        tags.write_parquet(f"{out_dir}/tags")
    return out_dir
