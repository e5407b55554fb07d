"""Distributed SCC (kg/scc.py) vs a local Kosaraju oracle."""

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.scc import strongly_connected_components


def kosaraju(pairs):
    """Local oracle: (node -> min member id of its SCC) for edge-touched
    nodes."""
    adj, radj, nodes = defaultdict(list), defaultdict(list), set()
    for a, b in pairs:
        adj[a].append(b)
        radj[b].append(a)
        nodes.update((a, b))
    seen, order = set(), []
    for s in sorted(nodes):
        if s in seen:
            continue
        seen.add(s)
        stack = [(s, iter(adj[s]))]
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        comp[s] = s
        stack = [s]
        while stack:
            v = stack.pop()
            for w in radj[v]:
                if w not in comp:
                    comp[w] = s
                    stack.append(w)
    groups = defaultdict(list)
    for v, c in comp.items():
        groups[c].append(v)
    return {v: min(vs) for c, vs in groups.items() for v in vs}


def run_scc(pairs, **kw):
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    out = strongly_connected_components(
        ray.data.from_pandas(df).repartition(2), num_buckets=2, **kw
    ).to_pandas()
    return dict(zip(out["node"], out["scc"]))


CASES = {
    "two_triangles_one_way": [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6),
                              (6, 4), (3, 4)],
    "chain_increasing": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "chain_decreasing": [(5, 4), (4, 3), (3, 2), (2, 1)],
    "rho": [(10, 11), (11, 12), (12, 13), (13, 11), (1, 10)],
    "two_cycles_bridged_both_ways_is_one_scc":
        [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3), (4, 1)],
    "self_contained_star": [(0, 1), (0, 2), (0, 3), (1, 0)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_small_graphs(ray_session, name):
    pairs = CASES[name]
    assert run_scc(pairs) == kosaraju(pairs)


def test_scc_random_graphs(ray_session):
    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 40
        src = rng.randint(0, n, size=90)
        dst = rng.randint(0, n, size=90)
        pairs = [(int(a), int(b)) for a, b in zip(src, dst) if a != b]
        assert run_scc(pairs) == kosaraju(pairs), f"trial {trial}"


def test_scc_string_node_ids(ray_session):
    pairs = [("a", "b"), ("b", "a"), ("b", "c")]
    assert run_scc(pairs) == {"a": "a", "b": "a", "c": "c"}


def test_kg_scc_matches_oracle(duck, sf_dir):
    from nexus_forge_ray.pipelines.kg_queries import kg_scc
    from nexus_forge_ray.pipelines.oracles import ORACLES
    got = kg_scc(sf_dir).reset_index(drop=True)
    want = duck.sql(ORACLES["kg_scc"]).df()
    want["node"] = want["node"].astype("int64")
    want["scc"] = want["scc"].astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
