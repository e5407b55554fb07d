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


def _key_hash(col: pd.Series) -> np.ndarray:
    """Bucket hash for a join key column. Integer keys hash natively after
    normalizing to int64 — INCLUDING object-dtype integers (upstream padded
    joins widen int columns to object; hashing the object form directly
    would bucket differently than the other side's int64, silently dropping
    matches). Non-integer keys normalize through a string cast."""
    if col.dtype == object:
        col = col.infer_objects()
    if pd.api.types.is_integer_dtype(col):
        return stable_hash_u64(col.astype("int64"))
    return stable_hash_u64(col.astype("string"))


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


def partitioned_agg_join(left: ray.data.Dataset, right: ray.data.Dataset,
                         on: str, aggs: dict[str, tuple[str, str]], *,
                         num_buckets: int = 32, how: str = "inner",
                         lcols: list[str] | None = None,
                         rcols: list[str] | None = None) -> ray.data.Dataset:
    """groupby(on).agg(aggs) on the left side + join with right — in ONE
    bucketed shuffle. The separate plan (hash_groupby_agg then
    partitioned_join) moves the left partials through two all-to-all
    exchanges; here both sides bucket by hash(on) once and each bucket
    aggregates locally before its merge. `aggs` uses the hash_groupby_agg
    spec (out -> (src_col, how)), hows must be re-aggregable (left batches
    should be pre-combined per batch by the caller).
    """
    from nexus_forge_ray.ops.agg import _FINAL_HOW
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]
    rcols = list(rcols) if rcols is not None else [c for c in right.schema().names]
    allcols = list(dict.fromkeys(lcols + rcols))
    out_l = [on] + list(aggs)

    def tag(side: str, cols: list[str]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in allcols})
            out["__bucket"] = (_key_hash(batch[on])
                               % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    both = left.map_batches(tag("l", lcols), batch_format="pandas").union(
        right.map_batches(tag("r", rcols), batch_format="pandas"))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][lcols].infer_objects()
        rg = group[group["__side"] == "r"][rcols].infer_objects()
        spec = {name: (col, _FINAL_HOW[how_]) for name, (col, how_)
                in aggs.items()}
        la = lg.groupby(on, as_index=False).agg(**spec)[out_l]
        return la.merge(rg, on=on, how=how)

    return both.groupby("__bucket").map_groups(merge_bucket,
                                               batch_format="pandas")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *, on: str,
              by: str, num_buckets: int = 16, direction: str = "backward",
              lcols: list[str] | None = None, rcols: list[str] | None = None,
              suffix: str = "_r", inner: bool = True) -> ray.data.Dataset:
    """Distributed as-of join — an operator Ray Data lacks natively.

    Each left row matches the nearest right row (per `by` key) whose `on`
    value is <= it (direction="backward"; "forward" for >=). Plan: both sides
    bucket by hash(by) so every key's rows co-locate in ONE shuffle, then a
    per-bucket `pandas.merge_asof` over the bucket sorted by `on` (C-path
    binary merge). Partitioning assumption: per-key history fits in a bucket
    — holds whenever no single `by` key dominates the corpus (salt hot keys
    first otherwise, see salted_join).
    """
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]
    rcols = list(rcols) if rcols is not None else [c for c in right.schema().names]
    allcols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in allcols})
            out["__bucket"] = (stable_hash_u64(batch[by])
                               % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas"))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][lcols].infer_objects() \
            .sort_values(on, kind="mergesort")
        rg = group[group["__side"] == "r"][rcols].infer_objects() \
            .sort_values(on, kind="mergesort")
        if not len(lg):
            return lg
        out = pd.merge_asof(lg, rg, on=on, by=by, direction=direction,
                            suffixes=("", suffix))
        if inner:
            probe = next((c for c in rcols if c not in (on, by)), None)
            if probe is not None:
                col = probe + suffix if probe in lcols else probe
                out = out[out[col].notna()]
        return out

    return both.groupby("__bucket").map_groups(merge_bucket,
                                               batch_format="pandas")


def range_join(left: ray.data.Dataset, right: ray.data.Dataset, *, by: str,
               on: str, low, high, num_buckets: int = 16,
               r_on: str | None = None,
               lcols: list[str] | None = None,
               rcols: list[str] | None = None) -> ray.data.Dataset:
    """Distributed range (interval) join: left ⋈ right on `by` equality AND
    right.on in [left.on + low, left.on + high].

    Plan: bucket both sides by hash(by) (one shuffle, co-located keys), then
    per bucket an equi-merge on `by` followed by a vectorized range mask.
    Partitioning assumption: the per-key pair product fits in a bucket —
    right for entity-history joins where each key has bounded activity; for
    head keys pre-filter or salt (salted_join) first.
    """
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]
    rcols = list(rcols) if rcols is not None else [c for c in right.schema().names]
    allcols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in allcols})
            out["__bucket"] = (stable_hash_u64(batch[by])
                               % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas"))

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"][lcols].infer_objects()
        rg = group[group["__side"] == "r"][rcols].infer_objects()
        m = lg.merge(rg, on=by, suffixes=("", "_r"))
        rcol = r_on or on
        if rcol != by and rcol in lcols and rcol in rcols:
            rcol = rcol + "_r"  # collided -> suffixed by the merge
        return m[(m[rcol] >= m[on] + low) & (m[rcol] <= m[on] + high)]

    return both.groupby("__bucket").map_groups(merge_bucket,
                                               batch_format="pandas")


def hot_keys(ds: ray.data.Dataset, on: str, *, threshold: int,
             num_buckets: int = 32) -> list:
    """Distributed head-key detector: keys whose row count exceeds
    `threshold`. One partial-count + bucketed groupby; only the (tiny) hot
    key list reaches the driver. Feed the result to `salted_join`."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    counts = hash_groupby_agg(
        ds.map_batches(lambda df: df[[on]], batch_format="pandas"),
        on, {"__n": (on, "count")}, num_buckets=num_buckets)
    hot = counts.map_batches(
        lambda df: df.loc[df["__n"] > threshold, [on]],
        batch_format="pandas").to_pandas()
    return hot[on].tolist() if on in hot.columns else []


def salted_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                *, hot: list, salt_factor: int = 8, num_buckets: int = 32,
                how: str = "inner", lcols: list[str] | None = None,
                rcols: list[str] | None = None) -> ray.data.Dataset:
    """Skew-aware bucketed hash join — the north rule's 'explicit salting of
    skewed head entities before the shuffle'.

    Rows whose key is in `hot` (from `hot_keys`, or known head entities:
    popular hostnames, Wikipedia-linked mentions) get a salt in [0,
    salt_factor): the LEFT (probe) side salts by row position hash, spreading
    one hot key over `salt_factor` buckets; the RIGHT (build) side replicates
    its hot rows once per salt so every salted bucket can still match. Cold
    keys take salt 0 — identical cost to the unsalted join. Results equal the
    unsalted `partitioned_join` (tested); only the shuffle layout changes.
    """
    hot_ref = ray.put(frozenset(hot))
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]
    rcols = list(rcols) if rcols is not None else [c for c in right.schema().names]

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        df = df.copy()
        is_hot = df[on].isin(hs).to_numpy()
        salt = np.zeros(len(df), dtype=np.int64)
        if is_hot.any():
            salt[is_hot] = (stable_hash_u64(
                pd.Series(np.arange(len(df))[is_hot]))
                % np.uint64(salt_factor)).astype(np.int64)
        df["__salt"] = salt
        return df

    def replicate_right(df: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        df = df.copy()
        is_hot = df[on].isin(hs).to_numpy()
        cold = df[~is_hot].copy()
        cold["__salt"] = 0
        if is_hot.any():
            reps = pd.concat([df[is_hot].assign(__salt=s)
                              for s in range(salt_factor)],
                             ignore_index=True)
            return pd.concat([cold, reps], ignore_index=True)
        return cold

    lt = left.map_batches(salt_left, batch_format="pandas")
    rt = right.map_batches(replicate_right, batch_format="pandas")
    joined = partitioned_join(
        lt, rt, on=on, num_buckets=num_buckets, how=how,
        lcols=lcols + ["__salt"], rcols=rcols + ["__salt"],
        extra_keys=["__salt"])
    return joined.map_batches(lambda df: df.drop(columns="__salt"),
                              batch_format="pandas")


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
    return _partitioned_membership(left, right_keys, on, keep=False,
                                   num_buckets=num_buckets, lcols=lcols)


def _partitioned_membership(left: ray.data.Dataset,
                            right_keys: ray.data.Dataset, on: str, *,
                            keep: bool, num_buckets: int,
                            lcols: list[str] | None) -> ray.data.Dataset:
    """Shared one-exchange membership filter behind the bucketed semi- and
    anti-joins: both sides shuffle ONCE by hash(key) % B, each bucket keeps
    (keep=True) or drops (keep=False) left rows whose key appears on the
    right. Right-side duplicates cannot multiply left rows (it's a
    membership test, not a merge)."""
    lcols = list(lcols) if lcols is not None else [c for c in left.schema().names]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (batch[c] if c in batch.columns else None)
                                for c in lcols})
            out["__bucket"] = (stable_hash_u64(batch[on])
                               % np.uint64(num_buckets)).astype("int32") \
                if len(batch) else np.array([], dtype="int32")
            out["__side"] = side
            return out
        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    # right rows are a membership set: per-batch key dedup BEFORE the
    # exchange (duplicate keys are pure shuffle waste here). The None
    # padding to the left schema stays — the union's blocks must agree on
    # columns — but dedup bounds the padded volume by the key cardinality.
    rt = right_keys.map_batches(
        lambda df: df.drop_duplicates(subset=[on]),
        batch_format="pandas").map_batches(tag("r"), batch_format="pandas")

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["__side"] == "l"]
        keys = set(group.loc[group["__side"] == "r", on])
        mask = lg[on].isin(keys)
        out = lg.loc[mask if keep else ~mask, lcols]
        # the None-padded union widens dtypes to object; surviving rows are
        # all left-side, so soft inference restores the original dtypes
        return out.infer_objects()

    return lt.union(rt).groupby("__bucket").map_groups(
        filter_bucket, batch_format="pandas")


def partitioned_semi_join(left: ray.data.Dataset,
                          right_keys: ray.data.Dataset, on: str,
                          num_buckets: int = 32,
                          lcols: list[str] | None = None) -> ray.data.Dataset:
    """Bucketed semi-join: keep `left` rows whose `on` value appears in
    `right_keys` — the scale twin of `semi_join` for key sets too large to
    broadcast."""
    return _partitioned_membership(left, right_keys, on, keep=True,
                                   num_buckets=num_buckets, lcols=lcols)


def smart_semi_join(left: ray.data.Dataset, right_keys: ray.data.Dataset,
                    on: str, *, broadcast_threshold: int = 5_000_000,
                    num_buckets: int = 32,
                    lcols: list[str] | None = None) -> ray.data.Dataset:
    """Adaptive membership filter with a HARD driver-memory bound.

    `right_keys.count()` <= threshold: the deduped key column (bounded at
    threshold x 8-64 B) collects once and broadcasts via one `ray.put` —
    zero extra all-to-all, which matters because on this runtime every
    sort exchange carries a multi-second scheduling floor regardless of
    data volume. Above the threshold the key set never touches the driver:
    `partitioned_semi_join`, one bucketed exchange for both sides. At
    web scale the count crosses the cap and the plan switches by itself.
    """
    return _smart_membership(left, right_keys, on, keep=True,
                             broadcast_threshold=broadcast_threshold,
                             num_buckets=num_buckets, lcols=lcols)


def smart_anti_join(left: ray.data.Dataset, right_keys: ray.data.Dataset,
                    on: str, *, broadcast_threshold: int = 5_000_000,
                    num_buckets: int = 32,
                    lcols: list[str] | None = None) -> ray.data.Dataset:
    """Adaptive anti-join twin of `smart_semi_join` (same bounded plan)."""
    return _smart_membership(left, right_keys, on, keep=False,
                             broadcast_threshold=broadcast_threshold,
                             num_buckets=num_buckets, lcols=lcols)


def _smart_membership(left, right_keys, on, *, keep, broadcast_threshold,
                      num_buckets, lcols):
    # materialize once: count() would otherwise execute the (lazy) key
    # pipeline and the branch taken would re-execute it
    right_keys = right_keys.materialize()
    n = right_keys.count()
    if n > broadcast_threshold:
        f = partitioned_semi_join if keep else partitioned_anti_join
        return f(left, right_keys, on, num_buckets=num_buckets, lcols=lcols)
    keys = right_keys.to_pandas()[on].drop_duplicates()
    f = semi_join if keep else anti_join
    return f(left, keys.tolist(), on)


def partitioned_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     num_buckets: int = 32, how: str = "inner",
                     lcols: list[str] | None = None,
                     rcols: list[str] | None = None,
                     extra_keys: list[str] | None = None) -> ray.data.Dataset:
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
    join_keys = [on] + list(extra_keys or [])
    from nexus_forge_ray.ops._polars_shuffle import use_polars
    pl_on = use_polars()

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in allcols:
                if c not in batch.columns:
                    batch[c] = None
            batch = batch[allcols]
            h = np.zeros(len(batch), dtype=np.uint64)
            for k in join_keys:
                h ^= _key_hash(batch[k])
            batch["__bucket"] = (h % np.uint64(num_buckets)).astype("int32")
            batch["__side"] = side
            return batch
        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # infer_objects: the None-padding above widens the other side's int
        # columns to object within the concatenated group; without restoring
        # dtypes the merge output carries object ints downstream (where e.g.
        # hash bucketing would bucket them differently than int64). BUT a
        # non-inner merge introduces NaN into the nullable side's non-key
        # columns, and NaN in an int64 column coerces it to float64 —
        # corrupting int values above 2^53 (matched rows included). So
        # restore dtypes only where NaN cannot appear: join keys always
        # (both sides must agree for the merge), non-key columns only on
        # the side whose rows are all preserved. Nullable-side ints stay
        # object (exact) and downstream hash/join helpers canonicalize.
        lg = group[group["__side"] == "l"][lcols]
        rg = group[group["__side"] == "r"][rcols]

        def fix_keys(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                **{k: df[k].infer_objects() for k in join_keys})

        if how == "inner":
            lg, rg = lg.infer_objects(), rg.infer_objects()
        elif how == "left":
            lg, rg = lg.infer_objects(), fix_keys(rg)
        elif how == "right":
            lg, rg = fix_keys(lg), rg.infer_objects()
        else:  # outer: both sides can gain NaN in non-key columns
            lg, rg = fix_keys(lg), fix_keys(rg)
        # polars pilot (GRAFT_SHUFFLE_POLARS=1, VERDICT r4 #3): per-bucket
        # join on polars — NaN keys equal (matching pandas merge), left
        # row order, exact-int back-conversion — with a pandas fallback
        # whenever the bucket's dtypes/columns would change semantics.
        # `pl_on` was read on the DRIVER at pipeline-construction time and
        # captured here (workers don't see driver env changes).
        if pl_on:
            from nexus_forge_ray.ops._polars_shuffle import pl_merge
            out = pl_merge(lg, rg, join_keys, how, allcols)
            if out is not None:
                return out
        return lg.merge(rg, on=join_keys, how=how)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def smart_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
               *, broadcast_threshold: int = 100_000,
               num_buckets: int = 32, how: str = "inner",
               lcols: list[str] | None = None,
               rcols: list[str] | None = None) -> ray.data.Dataset:
    """Adaptive join: broadcast the right side when it is small (one
    `ray.put`, zero shuffle — the dimension-table path), else fall back to
    the bucketed hash join (both sides co-partition, one shuffle).

    The size probe is `right.count()` — free for un-transformed Parquet
    reads (metadata row count) and one cheap execution otherwise; callers
    on a hot path who already know the side's size should call
    `broadcast_join` / `partitioned_join` directly. Only inner joins take
    the broadcast path (a broadcast right side can't express its own
    unmatched rows)."""
    n = right.count()
    if n <= broadcast_threshold and how == "inner":
        small = right.to_pandas()
        if rcols is not None:
            small = small[rcols]
        return broadcast_join(left, small, on=on)
    return partitioned_join(left, right, on, num_buckets=num_buckets,
                            how=how, lcols=lcols, rcols=rcols)
