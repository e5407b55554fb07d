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
        p = os.path.join(shard1, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
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


def test_global_canonicalize_merges_cross_shard_dups(tmp_path):
    """Docs with identical text but doc_ids hashing to DIFFERENT shards are
    only merged by the global phase."""
    import pandas as pd
    from nexus_forge_ray.pipelines.sharded import (flagship_sharded,
                                                   global_canonicalize)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],   # % 2 -> shards 0,1,0,1
        "text": ["spark table join sort merge filter window customer"] * 2
        + ["vector stream query hash spark table unique one",
           "totally different content that stands alone here"],
        "lang": ["en"] * 4,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    out = str(tmp_path / "run")
    flagship_sharded(str(sf), out, num_shards=2)
    per_shard = pd.concat(
        [pd.read_parquet(f) for f in
         __import__("glob").glob(os.path.join(out, "shard=*", "*.parquet"))],
        ignore_index=True)
    # docs 0 and 1 are exact dups in different shards: per-shard output keeps both
    subs = per_shard["subj"].nunique()

    final_dir = global_canonicalize(out, str(tmp_path / "canonical"))
    merged = pd.concat([pd.read_parquet(f) for f in
                        __import__("glob").glob(os.path.join(final_dir,
                                                             "*.parquet"))],
                       ignore_index=True)
    assert merged["subj"].nunique() == subs - 1  # one cross-shard dup merged
    # rerun skips (manifest committed)
    from nexus_forge_ray.state.lineage import PartitionManifest
    m = PartitionManifest.load(os.path.join(str(tmp_path / "canonical"),
                                            "_manifests"), "global")
    assert m.committed and m.counters["cross_shard_dups"] >= 1


def test_sharded_plus_global_equals_unsharded(tmp_path):
    """Byte-identical triples: sharded run + global canonicalization ==
    one unsharded run, on a corpus whose near-dup pairs STRADDLE shard
    boundaries (doc_ids of each dup pair land in different doc_id%2
    shards). The 1M-page version of this check runs in
    tools/bench_sharded.py and is recorded in BASELINE.md."""
    import glob as _glob

    import pandas as pd

    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    from nexus_forge_ray.pipelines.sharded import (flagship_sharded,
                                                   global_canonicalize)

    base = ["spark table join sort merge filter window customer",
            "vector stream query hash spark table unique one",
            "alpha beta gamma delta epsilon zeta eta theta"]
    docs = pd.DataFrame({
        # pairs (0,1), (2,3), (4,5): identical text, opposite parity shards
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7],
        "text": [base[0], base[0], base[1], base[1], base[2], base[2],
                 "totally different content that stands alone here",
                 "another unique page with its own words entirely"],
        "lang": ["en"] * 8,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    def read_sorted(d):
        files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
        df = pd.concat([pd.read_parquet(f) for f in files],
                       ignore_index=True)
        cols = sorted(df.columns)
        return df[cols].sort_values(cols, kind="mergesort") \
            .reset_index(drop=True)

    un_dir = str(tmp_path / "unsharded")
    flagship(str(sf), replicate=2, out_dir=un_dir)

    out = str(tmp_path / "run")
    flagship_sharded(str(sf), out, num_shards=2, replicate=2)
    final_dir = global_canonicalize(out, str(tmp_path / "canonical"))

    want, got = read_sorted(un_dir), read_sorted(final_dir)
    pd.testing.assert_frame_equal(got, want)
