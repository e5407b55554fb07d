"""Opt-in polars kernels for the two shuffle cores (GRAFT_SHUFFLE_POLARS=1).

BASELINE.md's microbench (round 4) measured polars group_by/join at 5-9x the
pandas kernels on 2M-row buckets; this module is the pilot VERDICT r4 asked
for: `hash_groupby_agg` partial/final and `partitioned_join`'s per-bucket
merge run on polars when the flag is set, with a per-batch pandas fallback
whenever a bucket's dtypes or shape would change semantics. The pandas
kernels stay the default — their NaN-key matching and object-int exactness
are load-bearing for ~170 oracle-checked queries — and every polars result
is converted back through `to_pandas_exact`, which restores big-int
exactness (an Int64 column with nulls round-trips as an exact object
column instead of decaying to float64).

Semantics matched deliberately:
- pandas `merge` treats NaN keys as equal -> `nan_to_null` + the join's
  `nulls_equal=True`;
- pandas GroupBy.first skips nulls -> `drop_nulls().first()`;
- pandas `size`/`count` partials are int64 -> `pl.len()` u32 cast up;
- `pl.from_pandas` maps object-int columns to exact Int64 (verified to
  2^60+1); anything polars keeps as Object dtype falls back to pandas.

Known benign difference under the flag: list columns (e.g. embeddings)
round-trip as numpy arrays instead of python lists — every downstream
consumer `np.stack`s them, and the full oracle sweep is green under the
flag (205/205, round 5).
"""

from __future__ import annotations

import os

import pandas as pd


def use_polars() -> bool:
    """Read the flag at call time so tests can flip it per-case."""
    return os.environ.get("GRAFT_SHUFFLE_POLARS") == "1"


def to_pandas_exact(pdf) -> pd.DataFrame:
    """polars -> pandas preserving integer exactness: an integer column
    containing nulls becomes an object column of python ints/None (the
    same exact form the pandas kernels produce) instead of float64, which
    silently corrupts values above 2^53."""
    out = {}
    for name, dtype in zip(pdf.columns, pdf.dtypes):
        s = pdf[name]
        if dtype.is_integer() and s.null_count() > 0:
            out[name] = pd.Series(s.to_list(), dtype=object)
        else:
            out[name] = s.to_pandas()
    return pd.DataFrame(out)


def pl_frames(*frames: pd.DataFrame):
    """Convert pandas frames to polars, or None when any column lands as
    polars Object dtype (mixed-type object columns — the pandas kernels'
    exact semantics there are load-bearing, so the caller falls back)."""
    import polars as pl
    try:
        outs = [pl.from_pandas(f, nan_to_null=True) for f in frames]
    except Exception:
        return None
    for o in outs:
        if any(dt == pl.Object for dt in o.dtypes):
            return None
    return outs


def pl_groupby_agg(batch: pd.DataFrame, keys: list[str],
                   spec: list[tuple[str, str, str]]) -> pd.DataFrame | None:
    """group_by(keys).agg on polars; spec rows are (out_name, src_col,
    how) with how in sum/min/max/size/count/first. Returns None when the
    batch needs the pandas kernel (Object dtypes / unsupported how)."""
    import polars as pl
    conv = pl_frames(batch)
    if conv is None:
        return None
    (pdf,) = conv
    exprs = []
    for name, src, how in spec:
        if how == "size":
            exprs.append(pl.len().cast(pl.Int64).alias(name))
        elif how == "count":
            exprs.append(pl.col(src).count().cast(pl.Int64).alias(name))
        elif how == "first":
            exprs.append(pl.col(src).drop_nulls().first().alias(name))
        elif how in ("sum", "min", "max"):
            exprs.append(getattr(pl.col(src), how)().alias(name))
        else:
            return None
    try:
        g = pdf.group_by(keys).agg(exprs)
    except Exception:
        return None
    return to_pandas_exact(g.select(keys + [n for n, _, _ in spec]))


def pl_unique(batch: pd.DataFrame, keys: list[str]) -> pd.DataFrame | None:
    """drop_duplicates(subset=keys) on polars: keep="first" with
    maintain_order=True matches the pandas kernel's first-occurrence,
    input-order contract. Returns None to request the pandas fallback."""
    conv = pl_frames(batch)
    if conv is None:
        return None
    (pdf,) = conv
    try:
        u = pdf.unique(subset=keys, keep="first", maintain_order=True)
    except Exception:
        return None
    return to_pandas_exact(u.select(list(batch.columns)))


def pl_grouped_head(batch: pd.DataFrame, keys: list[str], by: list[str],
                    asc: list[bool], k: int) -> pd.DataFrame | None:
    """Per-group top-k matching the pandas kernel: stable sort by
    (order, tiebreak) then the first k rows of each group, rows returned
    in sorted order. Returns None to request the pandas fallback."""
    import polars as pl
    conv = pl_frames(batch)
    if conv is None:
        return None
    (pdf,) = conv
    try:
        s = pdf.sort(by, descending=[not a for a in asc],
                     maintain_order=True, nulls_last=True)
        # the pandas kernel's groupby(dropna=True) default drops null-key
        # rows — match it
        s = s.filter(~pl.any_horizontal(
            [pl.col(c).is_null() for c in keys]))
        out = s.filter(pl.int_range(0, pl.len()).over(keys) < k)
    except Exception:
        return None
    return to_pandas_exact(out.select(list(batch.columns)))


_HOW_PL = {"inner": "inner", "left": "left", "right": "right",
           "outer": "full"}


def pl_merge(lg: pd.DataFrame, rg: pd.DataFrame, join_keys: list[str],
             how: str, out_cols: list[str]) -> pd.DataFrame | None:
    """Per-bucket join on polars matching the pandas-merge contract:
    NaN keys equal, left row order for non-full joins, output columns in
    `out_cols` order. Returns None to request the pandas fallback."""
    if how not in _HOW_PL:
        return None
    # overlapping non-key columns would suffix differently than pandas
    overlap = (set(lg.columns) & set(rg.columns)) - set(join_keys)
    if overlap:
        return None
    conv = pl_frames(lg, rg)
    if conv is None:
        return None
    pll, plr = conv
    try:
        j = pll.join(plr, on=join_keys, how=_HOW_PL[how],
                     nulls_equal=True, coalesce=True,
                     maintain_order="left_right")
        return to_pandas_exact(j.select(out_cols))
    except Exception:
        return None
