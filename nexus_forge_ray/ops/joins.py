"""Join strategies for Ray Data.

The reference has no relational join operator — every "join" is a lookup
against broadcast-small state (SURVEY.md §2.4). We generalize:

- `broadcast_join`: small side `ray.put` once; every map_batches task merges
  its Arrow batch against the in-memory table. No shuffle. This is the right
  plan whenever one side fits in a worker heap (dimension tables, KBs).
- `partitioned_join`: both sides large → explicit bucketed hash join: add
  `bucket = hash(key) % B` to both sides, groupby bucket, pairwise merge per
  bucket in map_groups. B is the shuffle-parallelism knob; hot keys can be
  salted by widening B.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from nexus_forge_ray.utils import stable_hash_u64


def broadcast_join(big: ray.data.Dataset, small_df: pd.DataFrame, on,
                   how: str = "inner", suffix: str = "_r") -> ray.data.Dataset:
    """Join a large Dataset against a small pandas table without a shuffle.

    The small side is put in the object store ONCE; each task reads it
    zero-copy. `on` is a column name or list present in both sides.
    """
    small_ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(small_ref)
        return batch.merge(small, on=on, how=how, suffixes=("", suffix))

    return big.map_batches(merge, batch_format="pandas")


def semi_join(big: ray.data.Dataset, keys, on: str) -> ray.data.Dataset:
    """Keep rows of `big` whose `on` value appears in `keys` (broadcast key set)."""
    keys_ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        return batch[batch[on].isin(ks)]

    return big.map_batches(filt, batch_format="pandas")


def anti_join(big: ray.data.Dataset, keys, on: str) -> ray.data.Dataset:
    """Drop rows of `big` whose `on` value appears in `keys` — the reference's
    deprecated-filter semantics (bluebrain_nexus.py:947-959) generalized."""
    keys_ref = ray.put(frozenset(keys))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        return batch[~batch[on].isin(ks)]

    return big.map_batches(filt, batch_format="pandas")


def partitioned_anti_join(left: ray.data.Dataset, right_keys: ray.data.Dataset,
                          on: str, num_buckets: int = 32,
                          lcols: list[str] | None = None) -> ray.data.Dataset:
    """Bucketed anti-join: drop `left` rows whose `on` value appears in
    `right_keys` (a Dataset whose `on` column is the key set).

    Unlike `anti_join`, the key set never touches the driver — both sides
    shuffle ONCE by `hash(key) % B` and each bucket filters locally. This is
    the scale path when the key set is O(corpus) (e.g. near-duplicate page
    ids on a web corpus, 30-50% of pages).
    """
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]

    def tag(side: str, cols: list[str]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in lcols})
            out["__bucket"] = (stable_hash_u64(batch[on])
                               % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    lt = left.map_batches(tag("l", lcols), batch_format="pandas")
    rt = right_keys.map_batches(tag("r", [on]), batch_format="pandas")
    both = lt.union(rt)

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"]
        drop = group.loc[group["__side"] == "r", on]
        out = lg.loc[~lg[on].isin(set(drop)), lcols]
        # the None-padded union widens dtypes to object; surviving rows are
        # all left-side, so soft inference restores the original dtypes
        return out.infer_objects()

    return both.groupby("__bucket").map_groups(filter_bucket,
                                               batch_format="pandas")


def partitioned_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     num_buckets: int = 32, how: str = "inner",
                     lcols: list[str] | None = None,
                     rcols: list[str] | None = None) -> ray.data.Dataset:
    """Bucketed hash join for two large sides.

    Both sides get `__bucket = hash(key) % B` and a side tag, are padded to the
    shared column superset (union needs consistent schemas), unioned, and each
    bucket group performs a local pandas merge. One shuffle total (the groupby);
    co-location is guaranteed because both sides share the bucket fn.

    Pass lcols/rcols when known: `.schema()` on a not-yet-executed aggregate
    triggers a full execution that the union would then REDO (lazy recompute).
    """
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]
    rcols = list(rcols) if rcols is not None else [c for c in right.schema().names]
    allcols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in allcols:
                if c not in batch.columns:
                    batch[c] = None
            batch = batch[allcols]
            batch["__bucket"] = (stable_hash_u64(batch[on].astype("string"))
                                 % num_buckets).astype("int32")
            batch["__side"] = side
            return batch
        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][lcols]
        rg = group[group["__side"] == "r"][rcols]
        return lg.merge(rg, on=on, how=how)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")
