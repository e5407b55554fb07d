"""Deterministic dataset splits (train/valid/test) for training pipelines.

Hash-based assignment is the web-scale idiom: reproducible across reruns
and engines (the hash basis equals DuckDB's ``md5_number_lower``, so the
assignment is exactly SQL-checkable), embarrassingly parallel (one
vectorized map, zero shuffle), and stable under repartitioning — a document
keeps its split when the corpus grows, which random splits cannot
guarantee. Writing emits one partitioned Parquet directory per split so a
failed run resumes per split and downstream jobs read only their split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.utils import md5_u64


def _compile(splits: dict[str, int], denom: int) -> list[tuple[str, int]]:
    """(name, exclusive upper bound) in declaration order."""
    total = sum(splits.values())
    if total != denom:
        raise ValueError(f"split shares sum to {total}, expected {denom}")
    bounds, acc = [], 0
    for name, share in splits.items():
        acc += share
        bounds.append((name, acc))
    return bounds


def assign_split(ds: ray.data.Dataset, key_col: str,
                 splits: dict[str, int], *, denom: int = 100,
                 out: str = "split") -> ray.data.Dataset:
    """Append a split label: h = md5(key) % denom falls into consecutive
    share-sized ranges in declaration order ({"train": 90, "valid": 5,
    "test": 5} -> train [0,90), valid [90,95), test [95,100))."""
    bounds = _compile(splits, denom)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[key_col].astype(str)) % np.uint64(denom)
        conds = []
        lo = 0
        for _, hi in bounds:
            conds.append((h >= lo) & (h < hi))
            lo = hi
        df = df.copy()
        df[out] = np.select(conds, [n for n, _ in bounds])
        return df

    return ds.map_batches(fn, batch_format="pandas")


def write_splits(ds: ray.data.Dataset, key_col: str,
                 splits: dict[str, int], out_dir: str, *,
                 denom: int = 100) -> dict[str, str]:
    """Materialize one partitioned Parquet directory per split
    (`{out_dir}/{name}/`); returns name -> path. The assignment pass runs
    once (materialized) and each split's filter+write streams from it."""
    labeled = assign_split(ds, key_col, splits, denom=denom).materialize()
    paths = {}
    for name in splits:
        path = f"{out_dir}/{name}"
        labeled.map_batches(
            lambda df, n=name: df.loc[df["split"] == n].drop(
                columns="split"),
            batch_format="pandas").write_parquet(path)
        paths[name] = path
    return paths
