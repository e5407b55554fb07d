"""Bucketed high-cardinality aggregation/dedup.

Ray Data's sort-based `groupby(key).aggregate(...)` and `map_groups` pay
per-group dispatch overhead (~ms/group) — fine for dozens of groups, fatal
for millions. These helpers shuffle by `hash(key) % num_buckets` (tens of
groups regardless of key cardinality) and run ONE vectorized pandas
aggregation per bucket. The partial/combiner stage still runs per batch
before the shuffle, so the exchange moves pre-aggregated rows only.

Supported hows: sum, min, max, count, first (associative / re-aggregable).
Mean is expressed by the caller as sum+count partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.utils import stable_hash_u64

_PARTIAL_HOW = {"sum": "sum", "min": "min", "max": "max", "count": "size",
                "count_nonnull": "count", "first": "first"}
_FINAL_HOW = {"sum": "sum", "min": "min", "max": "max", "count": "sum",
              "count_nonnull": "sum", "first": "first"}


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k]
        # canonicalize dtype before hashing: an object column of ints (e.g.
        # the None-padded output of a bucketed join) must land in the same
        # bucket as the int64 form of the same values, or one logical key
        # splits across two final groups (observed: duplicate groupby rows)
        if col.dtype == object:
            col = col.infer_objects()
        if pd.api.types.is_integer_dtype(col) and col.dtype != np.int64:
            col = col.astype("int64")
        h ^= stable_hash_u64(col)
    return (h % np.uint64(num_buckets)).astype("int32")


def hash_groupby_agg(ds: ray.data.Dataset, keys: str | list[str],
                     aggs: dict[str, tuple[str, str]],
                     num_buckets: int = 32) -> ray.data.Dataset:
    """groupby(keys).agg(aggs) with bucketed shuffle.

    aggs: out_name -> (source_col, how); how in
    sum/min/max/count/first/collect. `collect` gathers the group's values
    as a SORTED string list (deterministic regardless of block layout —
    the GROUP_CONCAT/array_agg shape; all values move, inherent to
    collection). Output columns: keys + list(aggs).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def _collect_partial(s: pd.Series) -> list:
        return s.dropna().astype(str).tolist()

    def _collect_final(s: pd.Series) -> list:
        return sorted(x for lst in s for x in lst)

    # polars pilot (GRAFT_SHUFFLE_POLARS=1, VERDICT r4 #3): the group_by
    # kernel measured 5-9x the pandas one on 2M-row buckets (BASELINE.md
    # microbench). Per-batch fallback to pandas whenever the batch's
    # dtypes would change semantics; `collect` stays pandas (sorted string
    # lists). The flag reads at call time so tests can flip it.
    from nexus_forge_ray.ops._polars_shuffle import pl_groupby_agg, use_polars
    # flag read HERE (driver, pipeline-construction time) and captured in
    # the closures — worker processes don't see driver env changes
    pl_ok = use_polars() and all(how != "collect"
                                 for _, how in aggs.values())

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: null group keys form their own group (SQL GROUP BY /
        # SPARQL semantics — a key bound only via OPTIONAL must not silently
        # drop its rows); _bucket_of hashes NaN deterministically
        g = None
        if pl_ok:
            g = pl_groupby_agg(
                batch, keys,
                [(name, col, _PARTIAL_HOW[how])
                 for name, (col, how) in aggs.items()])
        if g is None:
            spec = {name: (col, _collect_partial if how == "collect"
                           else _PARTIAL_HOW[how])
                    for name, (col, how) in aggs.items()}
            g = batch.groupby(keys, as_index=False, dropna=False).agg(**spec)
        else:
            g = g.copy()
        g["__bucket"] = _bucket_of(g, keys, num_buckets)
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        if pl_ok:
            g = pl_groupby_agg(
                group, keys,
                [(name, name, _FINAL_HOW[how])
                 for name, (_, how) in aggs.items()])
            if g is not None:
                return g
        spec = {name: (name, _collect_final if how == "collect"
                       else _FINAL_HOW[how])
                for name, (_, how) in aggs.items()}
        return group.groupby(keys, as_index=False, dropna=False).agg(**spec)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(final, batch_format="pandas")


def distinct_rows(ds: ray.data.Dataset, keys: str | list[str],
                  num_buckets: int = 32,
                  keep_cols: list[str] | None = None) -> ray.data.Dataset:
    """DISTINCT on keys (first occurrence, deterministic only if rows equal)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # polars pilot: same flag/fallback contract as hash_groupby_agg
    from nexus_forge_ray.ops._polars_shuffle import pl_unique, use_polars
    pl_on = use_polars()

    def _dedup(b: pd.DataFrame) -> pd.DataFrame:
        if pl_on:
            u = pl_unique(b, keys)
            if u is not None:
                return u
        return b.drop_duplicates(subset=keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _dedup(batch)
        if keep_cols is not None:
            b = b[list(dict.fromkeys(keys + keep_cols))]
        b = b.copy()
        b["__bucket"] = _bucket_of(b, keys, num_buckets)
        return b

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return _dedup(group).drop(columns="__bucket")

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__bucket").map_groups(final, batch_format="pandas")


def grouped_topk(ds: ray.data.Dataset, keys: str | list[str], order_col: str,
                 k: int, *, ascending: bool = False,
                 tiebreak: list[str] | None = None,
                 num_buckets: int = 16) -> ray.data.Dataset:
    """Top-k rows per group (e.g. best-quality docs per language bucket).

    Partial top-k per batch first, so the shuffle moves at most
    k x groups_per_batch rows — never the corpus. Deterministic when
    `tiebreak` totally orders ties (sorted ascending after order_col)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    by = [order_col] + list(tiebreak or [])
    asc = [ascending] + [True] * len(tiebreak or [])
    # polars pilot: same flag/fallback contract as the other kernels
    from nexus_forge_ray.ops._polars_shuffle import (pl_grouped_head,
                                                     use_polars)
    pl_on = use_polars()

    def _head(b: pd.DataFrame) -> pd.DataFrame:
        if pl_on:
            h = pl_grouped_head(b, keys, by, asc, k)
            if h is not None:
                return h
        return b.sort_values(by, ascending=asc, kind="mergesort") \
            .groupby(keys, sort=False).head(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _head(batch).copy()
        b["__bucket"] = _bucket_of(b, keys, num_buckets)
        return b

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return _head(group).drop(columns="__bucket")

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__bucket").map_groups(final, batch_format="pandas")


def global_topk(ds: ray.data.Dataset, by: list[str], k: int, *,
                ascending: list[bool] | None = None) -> pd.DataFrame:
    """Global top-k rows under a multi-key sort order.

    Partial top-k per block, then a driver merge of <= k x blocks rows —
    never the dataset. For the unbounded-k case use a distributed sort
    instead (`Dataset.sort`)."""
    asc = ascending if ascending is not None else [True] * len(by)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=asc, kind="mergesort").head(k)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return parts.sort_values(by, ascending=asc, kind="mergesort") \
        .head(k).reset_index(drop=True)


def min_by_rows(ds: ray.data.Dataset, keys: str | list[str],
                order_col: str | list[str],
                num_buckets: int = 32) -> ray.data.Dataset:
    """Keep the row with minimal order_col per key group (deterministic;
    pass a list for a composite order — later columns break ties)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_col = ([order_col] if isinstance(order_col, str)
                 else list(order_col))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(order_col, kind="mergesort") \
            .drop_duplicates(subset=keys).copy()
        b["__bucket"] = _bucket_of(b, keys, num_buckets)
        return b

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(order_col, kind="mergesort") \
            .drop_duplicates(subset=keys).drop(columns="__bucket")

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__bucket").map_groups(final, batch_format="pandas")


def attach_group_stat(ds: ray.data.Dataset, keys: str | list[str],
                      col: str, how: str, out: str,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """Append a per-key aggregate column to EVERY row — the distributed
    window-function shape (`agg OVER (PARTITION BY keys)`): one bucketed
    shuffle co-locates each key group, then a vectorized pandas
    `groupby().transform` computes the stat in place. The data moves once
    (compare: separate agg + join ships the table plus the agg through two
    exchanges). how: size/count/sum/min/max/mean."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = _bucket_of(batch, keys, num_buckets)
        return batch

    def window(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").copy()
        src = g[keys[0]] if how == "size" else g[col]
        g[out] = src.groupby([g[k] for k in keys]).transform(
            "size" if how == "size" else how)
        return g

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__bucket").map_groups(window, batch_format="pandas")


def attach_group_stats(ds: ray.data.Dataset, keys: str | list[str],
                       specs: dict[str, tuple[str, str]],
                       num_buckets: int = 32) -> ray.data.Dataset:
    """Multi-stat `attach_group_stat`: append several per-key aggregate
    columns (out -> (src_col, how)) in the SAME single bucketed shuffle —
    the multi-window `agg OVER (PARTITION BY keys)` shape (e.g. mean and
    variance sums for z-score normalization)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = _bucket_of(batch, keys, num_buckets)
        return batch

    def window(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").copy()
        gb = [g[k] for k in keys]
        for out, (col, how) in specs.items():
            src = g[keys[0]] if how == "size" else g[col]
            g[out] = src.groupby(gb).transform(
                "size" if how == "size" else how)
        return g

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__bucket").map_groups(window, batch_format="pandas")


def grouped_percentiles(ds: ray.data.Dataset, keys: str | list[str],
                        col: str, ps: dict[str, float],
                        num_buckets: int = 16,
                        ndigits: int | None = 2) -> ray.data.Dataset:
    """Exact per-group percentiles (linear interpolation — SQL
    `quantile_cont`). Exact quantiles need each group's values co-located:
    one bucketed shuffle of (keys, col) pairs, then a vectorized
    np.percentile per group computes ALL requested quantiles in one sorted
    pass. For key cardinalities where even the per-group value lists blow a
    bucket, use a mergeable sketch instead (ops/sketches has the pattern).

    ps: out_column -> percentile in [0, 100].
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = list(ps.values())
    names = list(ps)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys + [col]].copy()
        b["__bucket"] = _bucket_of(b, keys, num_buckets)
        return b

    def quant(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc
        out = []
        for kv, g in group.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            vals = np.percentile(g[col].to_numpy(), qs, method="linear")
            if ndigits is not None:
                # half-away rounding to match SQL ROUND — interpolated
                # quantiles land on exact .xx5 ties at scale (hit at sf0.1)
                vals = pc.round(pa.array(vals, type=pa.float64()),
                                ndigits=ndigits,
                                round_mode="half_towards_infinity") \
                    .to_numpy(zero_copy_only=False)
            out.append(dict(zip(keys, kv))
                       | {n: float(v) for n, v in zip(names, vals)})
        return pd.DataFrame(out, columns=keys + names)

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__bucket").map_groups(quant, batch_format="pandas")


def grouped_row_number(ds: ray.data.Dataset, keys: str | list[str],
                       order_by: list[str], out: str = "rn", *,
                       keep_first: int | None = None,
                       num_buckets: int = 16) -> ray.data.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order_by): one bucketed
    shuffle co-locates each key group, a mergesort within the bucket plus a
    vectorized cumcount assigns ranks. With `keep_first=n` the partial stage
    pre-cuts each batch to its n smallest rows per group (same trick as
    grouped_topk), so the shuffle moves at most n x groups rows."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    by = keys + list(order_by)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(by, kind="mergesort")
        if keep_first is not None:
            b = b.groupby(keys, sort=False).head(keep_first)
        b = b.copy()
        b["__bucket"] = _bucket_of(b, keys, num_buckets)
        return b

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(by, kind="mergesort") \
            .drop(columns="__bucket")
        g[out] = g.groupby(keys, sort=False).cumcount().to_numpy() + 1
        if keep_first is not None:
            g = g[g[out] <= keep_first]
        return g

    return ds.map_batches(tag, batch_format="pandas") \
        .groupby("__bucket").map_groups(rank, batch_format="pandas")


def exact_percentiles_lowcard(ds: ray.data.Dataset, col: str,
                              qs: list[float],
                              num_buckets: int = 16) -> dict[float, float]:
    """Exact GLOBAL percentiles (quantile_cont semantics) of a column whose
    distinct-value count is small relative to the corpus (lengths, scores,
    small ints): one bucketed (value -> count) groupby, then a driver cumsum
    over the tiny distinct table — the raw column never leaves the cluster
    and never sorts globally. Returns {percentile: value}.

    Interpolation is lo + frac * (hi - lo) on the expanded multiset's order
    statistics, matching DuckDB's quantile_cont."""
    counts = hash_groupby_agg(ds, col, {"n": (col, "count")},
                              num_buckets=num_buckets).to_pandas()
    counts = counts.sort_values(col, kind="mergesort")
    v = counts[col].to_numpy(dtype=np.float64)
    cum = np.cumsum(counts["n"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    out = {}
    for q in qs:
        pos = (n - 1) * (q / 100.0)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        xlo = v[np.searchsorted(cum, lo + 1)]
        xhi = v[np.searchsorted(cum, hi + 1)]
        out[q] = float(xlo + (pos - lo) * (xhi - xlo))
    return out


def global_row_number(ds: ray.data.Dataset, keys: list[str], *,
                      descending: bool | list[bool] = False,
                      rank_col: str = "rank") -> ray.data.Dataset:
    """Global 0-based row numbers in (keys) order — the distributed
    ROW_NUMBER() OVER (ORDER BY ...).

    One range-partitioned sort, then per-block offsets: each sorted block
    contributes a single (first-key, count) summary row; the driver cumsums
    those into exclusive prefixes (one scalar pair PER BLOCK, never data
    rows) and the offset table ships back in task closures. Requires the
    key tuple to be UNIQUE per row (append an id column as the last key) —
    uniqueness makes block ranges disjoint, so a block is identified by its
    first key.
    """
    s = ds.sort(keys, descending=descending).materialize()
    kcols = [f"__k{i}" for i in range(len(keys))]

    def head(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: [] for c in (*kcols, "__n")})
        return pd.DataFrame(
            {c: [df[k].iloc[0]] for c, k in zip(kcols, keys)}
            | {"__n": [len(df)]})

    summ = s.map_batches(head, batch_size=None,
                         batch_format="pandas").to_pandas()
    desc = ([descending] * len(keys) if isinstance(descending, bool)
            else list(descending))
    summ = summ.sort_values(kcols, ascending=[not d for d in desc],
                            kind="mergesort").reset_index(drop=True)
    offs = summ["__n"].cumsum().shift(fill_value=0).astype("int64")
    table = {tuple(row): int(o) for row, o in
             zip(summ[kcols].itertuples(index=False, name=None), offs)}
    if len(table) != len(summ):
        raise ValueError(
            "global_row_number: duplicate key tuples straddle block "
            "boundaries — the key columns must be unique per row (append "
            "an id column as the last key)")

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(**{rank_col: pd.Series([], dtype="int64")})
        off = table[tuple(df[k].iloc[0] for k in keys)]
        return df.assign(
            **{rank_col: off + np.arange(len(df), dtype=np.int64)})

    return s.map_batches(rank, batch_size=None, batch_format="pandas")


def ntile_of(rank: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE bucket (1-based) for 0-based global ranks: the first
    n % tiles buckets get ceil(n/tiles) rows, the rest floor(n/tiles)."""
    q, r = divmod(n, tiles)
    if q == 0:
        return rank.astype(np.int64) + 1
    big = (q + 1) * r
    rank = rank.astype(np.int64)
    return np.where(rank < big, rank // (q + 1), r + (rank - big) // q) + 1
