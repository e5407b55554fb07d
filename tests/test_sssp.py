"""Weighted shortest paths (kg/sssp.py) vs a local Dijkstra oracle."""

import heapq
from collections import defaultdict

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.kg.sssp import sssp


def dijkstra(pairs, sources):
    adj = defaultdict(list)
    for a, b, w in pairs:
        adj[a].append((b, w))
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj[v]:
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


def run(pairs, sources):
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["src", "dst", "w"])).repartition(2)
    out = sssp(ds, sources, num_buckets=2).to_pandas()
    return dict(zip(out["node"], out["dist"]))


def test_sssp_prefers_cheap_long_path(ray_session):
    # direct edge costs 10; the 3-hop detour costs 3
    pairs = [("s", "t", 10), ("s", "a", 1), ("a", "b", 1), ("b", "t", 1)]
    assert run(pairs, ["s"]) == {"s": 0, "a": 1, "b": 2, "t": 3}


def test_sssp_multi_source_and_unreachable(ray_session):
    pairs = [("s1", "a", 5), ("s2", "a", 2), ("x", "y", 1)]
    got = run(pairs, ["s1", "s2"])
    assert got == {"s1": 0, "s2": 0, "a": 2}   # x, y unreachable: absent


def test_sssp_random_graphs(ray_session):
    rng = np.random.RandomState(5)
    for trial in range(3):
        n = 30
        pairs = list({(int(a), int(b), int(w))
                      for a, b, w in zip(rng.randint(0, n, 120),
                                         rng.randint(0, n, 120),
                                         rng.randint(1, 9, 120))
                      if a != b})
        # dedupe parallel edges keeping the min weight (the engine relaxes
        # all of them; dijkstra oracle handles them too) — keep both raw
        got = run(pairs, [0])
        want = dijkstra(pairs, [0])
        assert got == want, f"trial {trial}"


def test_kg_sssp_matches_oracle(duck, sf_dir):
    from nexus_forge_ray.pipelines.kg_queries import kg_sssp
    from nexus_forge_ray.pipelines.oracles import ORACLES
    got = kg_sssp(sf_dir).reset_index(drop=True)
    want = duck.sql(ORACLES["kg_sssp"]).df()
    want["dist"] = want["dist"].astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
