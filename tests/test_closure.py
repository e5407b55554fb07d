"""Transitive closure: chains, branches, cycles, fixpoint detection."""

import pandas as pd
import ray.data

from nexus_forge_ray.kg.closure import reachable_from, transitive_closure


def _edges(pairs):
    return ray.data.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))


def test_chain_closure(ray_session):
    # a->b->c->d: closure adds a->c, a->d, b->d
    out = transitive_closure(_edges([("a", "b"), ("b", "c"), ("c", "d")]))
    got = set(map(tuple, out.to_pandas().to_numpy()))
    assert got == {("a", "b"), ("b", "c"), ("c", "d"),
                   ("a", "c"), ("b", "d"), ("a", "d")}


def test_branching_and_cycle(ray_session):
    # diamond + cycle x->y->x: self-pairs excluded, cycle pairs kept
    out = transitive_closure(_edges([("r", "l"), ("r", "m"), ("l", "s"),
                                     ("m", "s"), ("x", "y"), ("y", "x")]))
    got = set(map(tuple, out.to_pandas().to_numpy()))
    assert ("r", "s") in got and ("x", "y") in got and ("y", "x") in got
    assert ("x", "x") not in got


def test_doubling_converges_fast(ray_session):
    # a 16-node chain closes within log2(15) ~ 4 doubling rounds
    chain = [(f"n{i}", f"n{i+1}") for i in range(15)]
    out = transitive_closure(_edges(chain), max_rounds=5).to_pandas()
    assert len(out) == 15 * 16 // 2          # all ordered pairs i<j


def test_reachable_from(ray_session):
    out = reachable_from(_edges([("a", "b"), ("b", "c"), ("z", "q")]),
                         ["a"])
    assert out["node"].tolist() == ["a", "b", "c"]


def test_sparql_plus_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["A", "B", "C", "x"],
        "pred": ["sub", "sub", "sub", "other"],
        "obj": ["B", "C", "D", "y"],
    }))
    q = "PREFIX : <> SELECT ?a WHERE { ?a :sub+ ?b . VALUES ?b { \"D\" } }"
    out = sparql_select(t, q).to_pandas()
    assert sorted(out["a"]) == ["A", "B", "C"]
