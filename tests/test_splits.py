"""Deterministic split assignment + partitioned split writing."""

import shutil
import tempfile

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops.splits import assign_split, write_splits

SPLITS = {"train": 80, "valid": 10, "test": 10}


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])


def test_assignment_is_exhaustive_and_stable(ray_session, sf_dir):
    out = assign_split(_docs(sf_dir), "doc_id", SPLITS).to_pandas()
    assert set(out["split"].unique()) <= set(SPLITS)
    assert out["split"].notna().all()
    # stable under repartitioning (hash of the key, not of position)
    out2 = assign_split(_docs(sf_dir).repartition(7), "doc_id",
                        SPLITS).to_pandas()
    m = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert m.sort_index().equals(m2.sort_index())


def test_shares_must_sum_to_denom(ray_session, sf_dir):
    with pytest.raises(ValueError):
        assign_split(_docs(sf_dir), "doc_id", {"train": 50, "test": 10})


def test_write_splits_disjoint_exhaustive(ray_session, sf_dir):
    root = tempfile.mkdtemp(prefix="splits_")
    try:
        paths = write_splits(_docs(sf_dir), "doc_id", SPLITS, root)
        parts = {name: ray.data.read_parquet(path).to_pandas()
                 for name, path in paths.items()}
        all_ids = pd.concat(parts.values())["doc_id"]
        src = _docs(sf_dir).to_pandas()["doc_id"]
        # exhaustive: every doc lands in exactly one split
        assert sorted(all_ids) == sorted(src)
        assert all_ids.is_unique
        # and the written label matches the assignment pass
        assigned = assign_split(_docs(sf_dir), "doc_id", SPLITS).to_pandas()
        for name, df in parts.items():
            want = set(assigned.loc[assigned["split"] == name, "doc_id"])
            assert set(df["doc_id"]) == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
