"""Search filters — the reference's Filter/FilterOperator predicates.

Reference semantics (kgforge/core/wrappings/paths.py:21-52, 108-121;
kgforge/specializations/stores/demo_store.py:155-159, 299-301):
- a Filter is (path: list[str], operator, value) with operator one of
  __eq__/__ne__/__lt__/__le__/__gt__/__ge__;
- `forge.search(...)` conjunction of filters; dict form {"a": {"b": v}}
  becomes Filter(["a","b"], "__eq__", v);
- stores append `deprecated == False` unless asked otherwise
  (bluebrain_nexus.py:947-959).

Engine form: filters compile to ONE vectorized pandas mask per batch
(flat columns use dotted names after flattening).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from typing import Any

import pandas as pd
import ray.data

OPERATORS = {
    "__eq__": operator.eq, "__ne__": operator.ne,
    "__lt__": operator.lt, "__le__": operator.le,
    "__gt__": operator.gt, "__ge__": operator.ge,
}


@dataclass(frozen=True)
class Filter:
    path: list[str] | tuple[str, ...] | str
    operator: str
    value: Any

    def column(self) -> str:
        if isinstance(self.path, str):
            return self.path
        return ".".join(self.path)


def filters_from_dict(d: dict, prefix: tuple = ()) -> list[Filter]:
    """{"a": {"b": v}} -> [Filter(("a","b"), "__eq__", v)] (paths.py:108-121)."""
    out: list[Filter] = []
    for k, v in d.items():
        if isinstance(v, dict):
            out.extend(filters_from_dict(v, prefix + (k,)))
        else:
            out.append(Filter(prefix + (k,), "__eq__", v))
    return out


def apply_filters_frame(df: pd.DataFrame, filters: list[Filter]) -> pd.DataFrame:
    mask = pd.Series(True, index=df.index)
    for f in filters:
        col = f.column()
        if col not in df.columns:
            return df.iloc[0:0]
        mask &= OPERATORS[f.operator](df[col], f.value)
    return df[mask.fillna(False)]


def search(ds: ray.data.Dataset, *filters: Filter | dict,
           include_deprecated: bool = False) -> ray.data.Dataset:
    """forge.search over a Dataset: conjunction of Filters as one vectorized
    mask per batch; rows with deprecated == True are excluded by default when
    the column exists (the reference's implicit deprecated filter)."""
    flist: list[Filter] = []
    for f in filters:
        if isinstance(f, dict):
            flist.extend(filters_from_dict(f))
        else:
            flist.append(f)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = apply_filters_frame(batch, flist)
        if not include_deprecated and "deprecated" in out.columns:
            out = out[~out["deprecated"].astype(bool)]
        return out

    return ds.map_batches(fn, batch_format="pandas")
