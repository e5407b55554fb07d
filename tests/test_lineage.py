"""Lineage manifests + checkpoint resume (north rule: resume from last
committed partition; kill/rerun => byte-identical output)."""

import os

import pandas as pd
import pyarrow.parquet as pq

from nexus_forge_ray.state.lineage import (PartitionManifest, PartitionedRunner,
                                           fingerprint_paths)


def test_manifest_commit_atomic(tmp_path):
    m = PartitionManifest("p0", "fp0", {"rows": 10})
    m.commit(str(tmp_path))
    got = PartitionManifest.load(str(tmp_path), "p0")
    assert got.committed and got.counters == {"rows": 10}
    assert PartitionManifest.load(str(tmp_path), "missing") is None


def test_runner_skips_committed_and_reruns_on_fingerprint_change(tmp_path):
    runs = []

    def fn(sid, spec, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        pd.DataFrame({"v": [spec]}).to_parquet(f"{out_dir}/part.parquet")
        runs.append(sid)
        return {"rows": 1}

    r = PartitionedRunner(str(tmp_path / "out"))
    shards = {"a": 1, "b": 2}
    fps = {"a": "f1", "b": "f2"}
    assert r.run(shards, fn, fps) == {"a": "ran", "b": "ran"}
    assert runs == ["a", "b"]
    # resume: all committed -> all skipped
    assert r.run(shards, fn, fps) == {"a": "skipped", "b": "skipped"}
    assert runs == ["a", "b"]
    # input changed for one shard -> only it reruns
    fps2 = {"a": "f1", "b": "CHANGED"}
    assert r.run(shards, fn, fps2) == {"a": "skipped", "b": "ran"}
    assert runs == ["a", "b", "b"]


def test_killed_run_resumes_byte_identical(tmp_path):
    """Simulate a crash after shard a: rerun completes b; outputs identical to
    a clean run."""
    def fn(sid, spec, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        pd.DataFrame({"v": [spec] * 3}).to_parquet(f"{out_dir}/part.parquet")
        return {"rows": 3}

    shards = {"a": 1, "b": 2}
    fps = {"a": "x", "b": "y"}

    # clean run
    clean = PartitionedRunner(str(tmp_path / "clean"))
    clean.run(shards, fn, fps)

    # crashed run: only shard a committed; shard b left partial (no manifest)
    crashed = PartitionedRunner(str(tmp_path / "crashed"))
    crashed.run({"a": 1}, fn, {"a": "x"})
    os.makedirs(crashed.shard_out("b"), exist_ok=True)
    with open(os.path.join(crashed.shard_out("b"), "junk.parquet"), "w") as f:
        f.write("partial garbage")
    # resume
    status = crashed.run(shards, fn, fps)
    assert status == {"a": "skipped", "b": "ran"}
    for sid in shards:
        a = pq.read_table(os.path.join(clean.shard_out(sid), "part.parquet"))
        b = pq.read_table(os.path.join(crashed.shard_out(sid), "part.parquet"))
        assert a.equals(b)
    assert not os.path.exists(os.path.join(crashed.shard_out("b"),
                                           "junk.parquet"))


def test_fingerprint_paths(sf_dir):
    p = [f"{sf_dir}/documents.parquet"]
    assert fingerprint_paths(p) == fingerprint_paths(p)
    assert fingerprint_paths(p) != fingerprint_paths(
        [f"{sf_dir}/lineitem.parquet"])
