"""Snapshot diff: classify rows across two versions of a keyed table.

A KG/corpus refresh pipeline needs to know what a recrawl changed before
reprocessing (the reference's store keeps per-record versions,
parquet_store.py freeze/retrieve; this is the set-level counterpart for
whole-table snapshots). One bucketed full-outer exchange co-locates each
key's old and new rows; classification is a vectorized np.select per
bucket. Emits (key, status, <compare>_old, <compare>_new) with status in
added / removed / changed / unchanged — filter `unchanged` out downstream
when only the delta should flow (the common case: reprocess the delta,
skip the rest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.joins import partitioned_join


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset, on: str,
                  compare: list[str], *, num_buckets: int = 32,
                  include_unchanged: bool = True) -> ray.data.Dataset:
    old_cols = [f"{c}_old" for c in compare]
    new_cols = [f"{c}_new" for c in compare]

    def tag(suffix: str, flag: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[on] + compare].rename(
                columns={c: f"{c}{suffix}" for c in compare})
            out = out.copy()
            out[flag] = True
            return out
        return fn

    o = old.map_batches(tag("_old", "__in_old"), batch_format="pandas")
    n = new.map_batches(tag("_new", "__in_new"), batch_format="pandas")
    j = partitioned_join(o, n, on=on, how="outer",
                         num_buckets=num_buckets,
                         lcols=[on] + old_cols + ["__in_old"],
                         rcols=[on] + new_cols + ["__in_new"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        in_old = df["__in_old"].fillna(False).astype(bool).to_numpy()
        in_new = df["__in_new"].fillna(False).astype(bool).to_numpy()
        differs = np.zeros(len(df), dtype=bool)
        for c in compare:
            a, b = df[f"{c}_old"], df[f"{c}_new"]
            differs |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
        status = np.select([~in_old, ~in_new, differs],
                           ["added", "removed", "changed"],
                           default="unchanged")
        out = pd.DataFrame({on: df[on], "status": status})
        for c in old_cols + new_cols:
            out[c] = df[c]
        if not include_unchanged:
            out = out[out["status"] != "unchanged"]
        return out

    return j.map_batches(classify, batch_format="pandas")
