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
                      shard=(num_shards, idx), out_dir=out_dir,
                      write_sigs=True)
        import pyarrow.parquet as pq
        n = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(out_dir, "*.parquet")))
        return {"triples": n, "operation": "flagship",
                "succeeded": True, "error": ""}

    return runner.run(shards, run_shard, fps)


def read_sharded_triples(out_root: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_root, "shard=*", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def global_canonicalize(out_root: str, out_dir: str) -> str:
    """Phase 2: merge near-duplicates that CROSS shard boundaries.

    Per-shard canonicalization only sees duplicates co-located by the doc_id
    hash. This phase reads every shard's persisted compact signature rows,
    computes global components, drops the triples of non-representative pages
    across ALL shards, and writes one globally-canonical sorted triple set.
    The phase has its own manifest (reruns skip when shard inputs unchanged).
    """
    import ray.data as rd

    from nexus_forge_ray.kg.canonicalize import components_from_compact
    from nexus_forge_ray.kg.triples import sort_and_write

    sig_files = sorted(glob.glob(os.path.join(out_root, "shard=*", "_sigs",
                                              "*.parquet")))
    triple_files = sorted(
        f for f in glob.glob(os.path.join(out_root, "shard=*", "*.parquet")))
    runner = PartitionedRunner(out_dir)
    fp = fingerprint_paths(sig_files + triple_files)

    def run_phase(sid: str, _spec, phase_dir: str) -> dict:
        from nexus_forge_ray.pipelines.kg_pipeline import (_dup_key_rows,
                                                           drop_dup_triples)
        sigs = rd.read_parquet(sig_files)
        comp = components_from_compact(sigs, id_col="page_nid", num_bands=8)
        dup_keys = comp.map_batches(_dup_key_rows,
                                    batch_format="pandas").materialize()
        n_dup = dup_keys.count()

        def add_nid(batch: pd.DataFrame) -> pd.DataFrame:
            # subjects are DOC_BASE + nid; recover the nid as the filter key
            batch = batch.copy()
            batch["page_nid"] = pd.to_numeric(
                batch["subj"].str.rsplit("/", n=1).str[-1],
                errors="coerce").fillna(-1).astype("int64")
            return batch

        # columns=: also keeps Ray from inferring a hive `shard` partition
        # column out of the shard=NNN directory names
        tcols = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype"]
        triples = rd.read_parquet(triple_files, columns=tcols) \
            .map_batches(add_nid, batch_format="pandas")
        triples = drop_dup_triples(triples, dup_keys) \
            .map_batches(lambda df: df.drop(columns="page_nid"),
                         batch_format="pandas")
        sort_and_write(triples, phase_dir)
        return {"operation": "global_canonicalize", "succeeded": True,
                "cross_shard_dups": int(n_dup), "error": ""}

    runner.run({"global": None}, run_phase, {"global": fp})
    return runner.shard_out("global")
