"""Table profiling: per-column statistics in two streaming passes.

The data-quality rollup every ingest pipeline runs before committing a
partition. Scale shape:

- nulls / min / max / row counts are map-side partials (one tiny row per
  column per batch) merged on the driver — kilobytes at any corpus size;
- exact distinct counts explode each batch to its DEDUPLICATED
  (column, value) pairs, so the single bucketed shuffle moves at most
  distinct-values-per-batch rows per column, then a per-column count.
  For truly high-cardinality columns swap in the HLL sketch
  (`ops/sketches.approx_distinct_grouped`) — this exact variant is the
  oracle-checkable path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg


def profile_numeric(ds: ray.data.Dataset, cols: list[str], *,
                    num_buckets: int = 16) -> pd.DataFrame:
    """(col, n_rows, n_nulls, n_distinct, min_val, max_val) per column."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = df[c]
            rows.append({"col": c, "n": len(v),
                         "n_nulls": int(v.isna().sum()),
                         "mn": float(v.min()) if v.notna().any() else np.nan,
                         "mx": float(v.max()) if v.notna().any() else np.nan})
        return pd.DataFrame(rows)

    base = ds.map_batches(partial, batch_format="pandas").to_pandas() \
        .groupby("col", as_index=False) \
        .agg(n_rows=("n", "sum"), n_nulls=("n_nulls", "sum"),
             min_val=("mn", "min"), max_val=("mx", "max"))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        parts = [pd.DataFrame({"col": c,
                               "value": df[c].dropna().unique()
                               .astype(np.float64)})
                 for c in cols]
        return pd.concat(parts, ignore_index=True)

    dist = distinct_rows(ds.map_batches(explode, batch_format="pandas"),
                         ["col", "value"], num_buckets=num_buckets)
    nd = hash_groupby_agg(dist, "col", {"n_distinct": ("value", "count")},
                          num_buckets=4).to_pandas()
    out = base.merge(nd, on="col")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_nulls"] = out["n_nulls"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out[["col", "n_rows", "n_nulls", "n_distinct",
                "min_val", "max_val"]].sort_values("col") \
        .reset_index(drop=True)
