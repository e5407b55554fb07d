"""Sort-merge-bucket persisted layout: shuffle-free join equals the
bucketed in-memory join, and mismatched layouts are refused."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops.smb import bucketed_join_read, bucketed_write


def _mk(tmp, name, df, on, nb):
    d = str(tmp / name)
    bucketed_write(ray.data.from_pandas(df).repartition(4), d, on,
                   num_buckets=nb)
    return d


def test_smb_join_matches_pandas_merge(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    l = pd.DataFrame({"k": rng.randint(0, 50, 300),
                      "x": rng.rand(300).round(4)})
    r = pd.DataFrame({"k": rng.randint(0, 50, 120),
                      "y": rng.randint(0, 9, 120)})
    ld = _mk(tmp_path, "l", l, "k", 8)
    rd = _mk(tmp_path, "r", r, "k", 8)
    got = bucketed_join_read(ld, rd, "k").to_pandas()
    want = l.merge(r, on="k")
    cols = ["k", "x", "y"]
    got = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    want = want[cols].sort_values(cols, kind="mergesort") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_smb_left_join_and_column_pruning(ray_session, tmp_path):
    l = pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30], "junk": ["a"] * 3})
    r = pd.DataFrame({"k": [2, 3, 4], "y": [200, 300, 400]})
    ld = _mk(tmp_path, "l2", l, "k", 4)
    rd = _mk(tmp_path, "r2", r, "k", 4)
    got = bucketed_join_read(ld, rd, "k", how="left",
                             lcols=["k", "x"], rcols=["k", "y"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got.columns) == ["k", "x", "y"]
    assert got["k"].tolist() == [1, 2, 3]
    assert got["y"].fillna(-1).tolist() == [-1, 200, 300]


def test_smb_rejects_mismatched_layouts(ray_session, tmp_path):
    l = pd.DataFrame({"k": [1], "x": [1]})
    r = pd.DataFrame({"k": [1], "y": [1]})
    ld = _mk(tmp_path, "l3", l, "k", 4)
    rd = _mk(tmp_path, "r3", r, "k", 8)
    with pytest.raises(ValueError, match="SMB layouts disagree"):
        bucketed_join_read(ld, rd, "k")


def test_smart_semi_join_paths_agree(ray_session):
    """Broadcast (under cap) and partitioned (over cap) plans are equal."""
    import pandas as pd
    import ray.data
    from nexus_forge_ray.ops.joins import smart_semi_join, smart_anti_join
    left = pd.DataFrame({"k": list(range(100)), "v": list(range(100))})
    keys = pd.DataFrame({"k": [3, 5, 5, 97]})
    lds, kds = ray.data.from_pandas(left), ray.data.from_pandas(keys)
    a = smart_semi_join(lds, kds, "k", broadcast_threshold=1000,
                        lcols=["k", "v"]).to_pandas()
    b = smart_semi_join(lds, kds, "k", broadcast_threshold=0,
                        lcols=["k", "v"]).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"]) == [3, 5, 97]
    c = smart_anti_join(lds, kds, "k", broadcast_threshold=1000,
                        lcols=["k", "v"]).to_pandas()
    d = smart_anti_join(lds, kds, "k", broadcast_threshold=0,
                        lcols=["k", "v"]).to_pandas()
    assert sorted(c["k"]) == sorted(d["k"]) == sorted(
        set(range(100)) - {3, 5, 97})
