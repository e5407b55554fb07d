"""Per-partition lineage manifests + checkpoint resume + Actions-style metrics.

The reference's lineage unit is the per-record `Action` (operation, succeeded,
error) counted into a summary (kgforge/core/commons/actions.py:22-59). Here:

- `actions_summary(ds)` — the columnar equivalent: groupby(operation,
  succeeded, error) count over a status dataset.
- `PartitionManifest` / `PartitionedRunner` — resumable execution: input is
  split into shards; each shard runs the (streaming) sub-pipeline and commits
  an atomic JSON manifest (partition id, input fingerprint, counters, status).
  A rerun skips shards whose manifest is committed with the same fingerprint —
  "resume from last committed partition checkpoint" (north rule). Outputs are
  one directory per shard, written before the manifest commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field

import ray.data
from ray.data.aggregate import Count


def actions_summary(ds: ray.data.Dataset, *, operation_col: str = "operation",
                    succeeded_col: str = "succeeded",
                    error_col: str = "error"):
    """Count × (operation, succeeded, error) — actions.py:46-59 semantics."""
    return ds.groupby([operation_col, succeeded_col, error_col]).count()


@dataclass
class PartitionManifest:
    partition_id: str
    input_fingerprint: str
    counters: dict = field(default_factory=dict)
    committed: bool = False
    wall_s: float = 0.0

    def path(self, manifest_dir: str) -> str:
        return os.path.join(manifest_dir, f"{self.partition_id}.json")

    def commit(self, manifest_dir: str) -> None:
        os.makedirs(manifest_dir, exist_ok=True)
        self.committed = True
        tmp = self.path(manifest_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, sort_keys=True)
        os.replace(tmp, self.path(manifest_dir))  # atomic commit

    @classmethod
    def load(cls, manifest_dir: str, partition_id: str):
        p = os.path.join(manifest_dir, f"{partition_id}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return cls(**json.load(f))


def fingerprint_paths(paths: list[str]) -> str:
    """Cheap input fingerprint: names + sizes + mtimes (content-stable files)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


class PartitionedRunner:
    """Run fn(shard) per input shard with skip-if-committed resume.

    fn receives (shard_id, shard_spec, out_dir) and returns a counters dict;
    its outputs must land under out_dir (one directory per shard). The shard
    output directory is cleaned before a (re)run so replays are idempotent.
    """

    def __init__(self, out_root: str):
        self.out_root = out_root
        self.manifest_dir = os.path.join(out_root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def shard_out(self, shard_id: str) -> str:
        return os.path.join(self.out_root, f"shard={shard_id}")

    def run(self, shards: dict[str, object], fn,
            fingerprints: dict[str, str] | None = None) -> dict:
        """shards: shard_id -> spec. Returns {shard_id: 'skipped'|'ran'}."""
        status = {}
        for sid, spec in shards.items():
            fp = (fingerprints or {}).get(sid, "")
            existing = PartitionManifest.load(self.manifest_dir, sid)
            if existing and existing.committed and \
                    existing.input_fingerprint == fp:
                status[sid] = "skipped"
                continue
            out_dir = self.shard_out(sid)
            if os.path.exists(out_dir):  # partial output from a killed run
                import shutil
                shutil.rmtree(out_dir)
            t0 = time.time()
            counters = fn(sid, spec, out_dir) or {}
            m = PartitionManifest(partition_id=sid, input_fingerprint=fp,
                                  counters=counters, wall_s=round(time.time() - t0, 3))
            m.commit(self.manifest_dir)
            status[sid] = "ran"
        return status
