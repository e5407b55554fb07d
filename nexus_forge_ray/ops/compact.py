"""Small-file compaction for partitioned Parquet output.

Long-running ingestion (the sharded flagship, incremental dedup deltas,
per-split writes) accumulates many small part files; at 100 TB the
metadata and open() overhead of tiny files dominates read planning. This
is the storage-maintenance pass: stream the directory back through one
repartition exchange sized from the (metadata-only) row count and rewrite
it as ~target-sized files. Output goes to a NEW directory — the caller
swaps directories after success, so a failed compaction never corrupts
the live data (same atomic discipline as the shard manifests in
pipelines/sharded.py).
"""

from __future__ import annotations

import glob
import math
import os

import ray.data


def compact_parquet(in_dir: str, out_dir: str, *,
                    target_rows_per_file: int = 1_000_000) -> dict:
    """Rewrite `in_dir`'s Parquet files into ~target_rows_per_file files
    under `out_dir`; returns {rows, files_in, files_out}."""
    ds = ray.data.read_parquet(in_dir)
    n = ds.count()          # metadata-only for an untransformed read
    files_in = len(glob.glob(os.path.join(in_dir, "*.parquet")))
    blocks = max(1, math.ceil(n / max(1, target_rows_per_file)))
    ds.repartition(blocks).write_parquet(out_dir)
    files_out = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    return {"rows": n, "files_in": files_in, "files_out": files_out}
