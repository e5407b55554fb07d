"""Reshaping: keep only listed (dot-)paths of each record; path extraction.

Reference semantics:
- Reshaper.reshape (kgforge/core/reshaping.py:25-78): keep the listed paths,
  recursing into nested dicts and lists; absent paths are skipped silently;
  optional versioned-id rewrite via the store's freeze template.
- collect_values (kgforge/core/reshaping.py:82-134): JSONPath-ish extraction
  of every value at a dotted path (lists fan out), with an optional error on
  empty result.

Engine form: `reshape_dataset` is a map_batches stage; for flat columns it is
a pure projection (select_columns — zero work), for nested paths a per-batch
dict rewrite.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import ray.data


def _get_path(node: Any, parts: list[str]) -> tuple[bool, Any]:
    """(found, value) walking dicts/lists; lists fan out downstream."""
    if not parts:
        return True, node
    if isinstance(node, dict):
        if parts[0] not in node:
            return False, None
        return _get_path(node[parts[0]], parts[1:])
    if isinstance(node, list):
        hits = [v for found, v in (_get_path(x, parts) for x in node) if found]
        return (True, hits) if hits else (False, None)
    return False, None


def reshape_record(record: dict, keep: list[str]) -> dict:
    """Keep only the listed dotted paths (reshaping.py:40-62 semantics)."""
    out: dict = {}
    for path in keep:
        parts = path.split(".")
        node = record
        # walk to check presence, then graft into output tree
        found, value = _get_path(node, parts)
        if not found:
            continue
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        leaf = parts[-1]
        if isinstance(value, list) and parts[:-1]:
            cur[leaf] = value
        else:
            cur[leaf] = value
    return out


def collect_values(record: dict, path: str) -> list:
    """All values at a dotted path; lists fan out (reshaping.py:82-110)."""
    parts = path.split(".")

    def walk(node: Any, ps: list[str]) -> list:
        if not ps:
            return node if isinstance(node, list) else [node]
        if isinstance(node, dict):
            if ps[0] not in node:
                return []
            return walk(node[ps[0]], ps[1:])
        if isinstance(node, list):
            return [v for x in node for v in walk(x, ps)]
        return []

    return walk(record, parts)


def reshape_dataset(ds: ray.data.Dataset, keep: list[str], *,
                    record_col: str | None = None) -> ray.data.Dataset:
    """forge.reshape as a Dataset transform.

    Flat keep-lists over flat columns = select_columns (pure projection, no
    Python); nested paths or a record column = per-batch dict rewrite.
    """
    flat = all("." not in p for p in keep)
    if flat and record_col is None:
        names = ds.schema().names
        present = [p for p in keep if p in names]
        return ds.select_columns(present)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if record_col is not None:
            recs = [reshape_record(r if isinstance(r, dict) else {}, keep)
                    for r in batch[record_col]]
            return pd.DataFrame({record_col: recs})
        recs = [reshape_record(r, keep) for r in batch.to_dict("records")]
        return pd.DataFrame({"record": recs})

    return ds.map_batches(fn, batch_format="pandas")


def collect_values_dataset(ds: ray.data.Dataset, path: str, *,
                           record_col: str | None = None,
                           out_col: str = "value") -> ray.data.Dataset:
    """Flat-map every value at `path` out of each record (one row per value)."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        vals = []
        source = batch[record_col] if record_col is not None \
            else batch.to_dict("records")
        for r in source:
            vals.extend(collect_values(r if isinstance(r, dict) else {}, path))
        return pd.DataFrame({out_col: vals})

    return ds.map_batches(fn, batch_format="pandas")
