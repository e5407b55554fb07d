"""Label propagation on planted community structure."""

import pandas as pd
import ray.data

from nexus_forge_ray.kg.communities import label_propagation


def _clique_edges(nodes, w=10):
    return [(a, b, w) for i, a in enumerate(nodes)
            for b in nodes[i + 1:]]


def test_two_cliques_converge_to_two_communities(ray_session):
    """Two 4-cliques joined by a single weak bridge: after a few rounds
    every member of a clique carries the same label, and the two labels
    differ."""
    left = ["a1", "a2", "a3", "a4"]
    right = ["b1", "b2", "b3", "b4"]
    edges = _clique_edges(left) + _clique_edges(right) + [("a4", "b1", 1)]
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    out = label_propagation(ray.data.from_pandas(df).repartition(3),
                            weight="w", rounds=4).to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert len({lab[n] for n in left}) == 1
    assert len({lab[n] for n in right}) == 1
    assert lab["a1"] != lab["b1"]


def test_unweighted_defaults_and_layout_independence(ray_session):
    df = pd.DataFrame(_clique_edges(["x", "y", "z"], w=1),
                      columns=["src", "dst", "w"])[["src", "dst"]]
    one = label_propagation(ray.data.from_pandas(df), rounds=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    many = label_propagation(ray.data.from_pandas(df).repartition(5),
                             rounds=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    # a triangle is a clique: everyone adopts the smallest label
    assert set(one["label"]) == {"x"}
