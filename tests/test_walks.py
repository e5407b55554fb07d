"""Deterministic random walks (kg/walks.py)."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.kg.walks import random_walks
from nexus_forge_ray.utils import md5_u64


def run(pairs, length=3):
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["src", "dst"])).repartition(2)
    return random_walks(ds, length=length, num_buckets=2).to_pandas() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)


def test_walks_stop_at_sinks(ray_session):
    # b is a sink: the walk from a reaches b at step 1 and stops there
    out = run([("a", "b")], length=3)
    assert out[out["walk_id"] == "a"][["step", "node"]].values.tolist() \
        == [[0, "a"], [1, "b"]]


def test_walks_match_manual_hash_choice(ray_session):
    pairs = [("a", "b"), ("a", "c"), ("a", "d"),
             ("b", "a"), ("c", "a"), ("d", "a")]
    out = run(pairs, length=2)
    walk_a = out[out["walk_id"] == "a"].set_index("step")["node"]
    # step 1: argmin over {b,c,d} of md5("a:1:" + n)
    cands = ["b", "c", "d"]
    h = md5_u64(pd.Series([f"a:1:{n}" for n in cands]))
    want1 = cands[int(np.argmin(h))]
    assert walk_a[1] == want1
    # step 2: only neighbor of want1 is a
    assert walk_a[2] == "a"


def test_walks_deterministic_across_runs(ray_session):
    rng = np.random.RandomState(11)
    pairs = list({(int(a), int(b))
                  for a, b in zip(rng.randint(0, 30, 200),
                                  rng.randint(0, 30, 200)) if a != b})
    a = run(pairs, length=3)
    b = run(pairs, length=3)
    pd.testing.assert_frame_equal(a, b)
    # every walk has consecutive steps starting at 0 and edges that exist
    eset = set(pairs)
    for wid, g in a.groupby("walk_id"):
        steps = g["step"].tolist()
        assert steps == list(range(len(steps)))
        nodes = g["node"].tolist()
        assert nodes[0] == wid
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in eset
