"""Resumable sharded execution of the flagship pipeline.

The input is split into hash shards (doc_id % num_shards); each shard runs
the full streaming DAG and writes one output directory + an atomically
committed manifest (partition id, input fingerprint, counters, wall time).
A rerun skips committed shards — "resume from the last committed partition
checkpoint" (north rule). Partial outputs of a killed shard are wiped before
its rerun, so replays are idempotent (all ids are content-derived).

Partitioning assumption (documented per SURVEY §7.3): canonicalization runs
WITHIN a shard — near-duplicates are co-located because page replicas derive
from the same doc_id. For corpora where near-dups cross shards, run the
global `canonical_map` over the concatenated shard outputs as a second phase.
"""

from __future__ import annotations

import glob
import os

import pandas as pd

from nexus_forge_ray.state.lineage import PartitionedRunner, fingerprint_paths


def flagship_sharded(sf_dir: str, out_root: str, *, num_shards: int = 4,
                     replicate: int = 1) -> dict:
    """Run the flagship per shard with resume. Returns {shard: status}."""
    from nexus_forge_ray.pipelines.kg_pipeline import flagship

    src = f"{sf_dir}/documents.parquet"
    base_fp = fingerprint_paths([src])
    shards = {f"{i:03d}": i for i in range(num_shards)}
    fps = {sid: f"{base_fp}:r{replicate}:s{idx}/{num_shards}"
           for sid, idx in shards.items()}
    runner = PartitionedRunner(out_root)

    def run_shard(sid: str, idx: int, out_dir: str) -> dict:
        ds = flagship(sf_dir, replicate=replicate,
                      shard=(num_shards, idx), out_dir=out_dir)
        import pyarrow.parquet as pq
        n = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(out_dir, "*.parquet")))
        return {"triples": n, "operation": "flagship",
                "succeeded": True, "error": ""}

    return runner.run(shards, run_shard, fps)


def read_sharded_triples(out_root: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_root, "shard=*", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
