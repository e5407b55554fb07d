"""Record readers beyond Parquet: JSONL and CSV sources.

The reference ingests JSON resources (kgforge/core/forge.py from_json /
from_dataframe paths); here the same records stream through Ray Data's
native readers. Parquet stays the scale default (column pruning + row-group
filters); JSONL/CSV exist for interchange — both project to the requested
columns immediately after decode so only needed data crosses stage
boundaries.
"""

from __future__ import annotations

import ray.data


def read_jsonl(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read newline-delimited JSON records (Arrow JSON decoder under the
    hood — vectorized, not per-row json.loads)."""
    ds = ray.data.read_json(path)
    return ds.select_columns(columns) if columns else ds


def read_csv(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    ds = ray.data.read_csv(path)
    return ds.select_columns(columns) if columns else ds


def from_records(records: list[dict]) -> ray.data.Dataset:
    """Driver-held record list -> Dataset (the from_json entry shape)."""
    return ray.data.from_items(records)
