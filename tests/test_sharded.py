"""Sharded flagship: resume-from-committed-checkpoint with byte-identical
output (the north rule's kill/rerun test on the REAL pipeline)."""

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from nexus_forge_ray.pipelines.sharded import (flagship_sharded,
                                               read_sharded_triples)


def test_sharded_run_and_resume(sf_dir, tmp_path):
    out = str(tmp_path / "run")
    status = flagship_sharded(sf_dir, out, num_shards=2)
    assert status == {"000": "ran", "001": "ran"}
    full = read_sharded_triples(out)
    assert len(full) > 0

    # resume: everything committed -> all skipped, output unchanged
    status2 = flagship_sharded(sf_dir, out, num_shards=2)
    assert status2 == {"000": "skipped", "001": "skipped"}
    pd.testing.assert_frame_equal(read_sharded_triples(out), full)


def test_sharded_kill_rerun_byte_identical(sf_dir, tmp_path):
    clean_dir = str(tmp_path / "clean")
    flagship_sharded(sf_dir, clean_dir, num_shards=2)

    # simulate a crash: shard 000 committed, shard 001 half-written (manifest
    # missing), by deleting 001's manifest and corrupting its output
    crashed_dir = str(tmp_path / "crashed")
    flagship_sharded(sf_dir, crashed_dir, num_shards=2)
    os.remove(os.path.join(crashed_dir, "_manifests", "001.json"))
    shard1 = os.path.join(crashed_dir, "shard=001")
    for f in os.listdir(shard1):
        os.remove(os.path.join(shard1, f))
    with open(os.path.join(shard1, "partial.parquet"), "w") as f:
        f.write("garbage from a killed run")

    status = flagship_sharded(sf_dir, crashed_dir, num_shards=2)
    assert status == {"000": "skipped", "001": "ran"}

    a = read_sharded_triples(clean_dir).sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    b = read_sharded_triples(crashed_dir).sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shards_partition_docs_disjointly(sf_dir, tmp_path):
    out = str(tmp_path / "p")
    flagship_sharded(sf_dir, out, num_shards=2)
    full = read_sharded_triples(out)
    # same subject never appears in two shards
    import glob
    subj_by_shard = {}
    for d in glob.glob(os.path.join(out, "shard=*")):
        dfs = [pd.read_parquet(f) for f in glob.glob(os.path.join(d, "*.parquet"))]
        subj_by_shard[d] = set(pd.concat(dfs)["subj"]) if dfs else set()
    shards = list(subj_by_shard.values())
    assert not (shards[0] & shards[1])
    # manifests carry counters
    import json
    m = json.load(open(os.path.join(out, "_manifests", "000.json")))
    assert m["committed"] and m["counters"]["triples"] > 0
