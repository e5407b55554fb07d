"""Luby MIS (kg/mis.py): independence + maximality + determinism."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.kg.mis import maximal_independent_set


def run(pairs):
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["src", "dst"])).repartition(2)
    return maximal_independent_set(ds, num_buckets=2).to_pandas()


def check_mis(pairs, out):
    sel = set(out["node"])
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence: no selected node has a selected neighbor
    for v in sel:
        assert not (adj.get(v, set()) & sel), f"{v} conflicts"
    # maximality: every unselected node has a selected neighbor
    for v in adj:
        if v not in sel and v not in adj.get(v, set()):
            assert adj[v] & sel, f"{v} could have been added"


def test_mis_small_graphs(ray_session):
    cases = [
        [("a", "b"), ("b", "c"), ("c", "d")],            # path
        [("a", "b"), ("b", "c"), ("c", "a")],            # triangle
        [("hub", x) for x in "abcdef"],                  # star
        [("x", "x"), ("x", "y")],                        # self-loop dropped
    ]
    for pairs in cases:
        out = run(pairs)
        check_mis([p for p in pairs if p[0] != p[1]], out)


def test_mis_random_graph_and_determinism(ray_session):
    # one random graph (a Luby run costs ~5 rounds x several exchanges,
    # so keep the distributed-run count low; the per-round MATH is
    # cross-checked against the unrolled SQL oracle in the kg_mis test)
    rng = np.random.RandomState(13)
    n = 40
    pairs = list({(int(min(a, b)), int(max(a, b)))
                  for a, b in zip(rng.randint(0, n, 100),
                                  rng.randint(0, n, 100)) if a != b})
    out = run(pairs)
    check_mis(pairs, out)
    again = run(pairs)
    pd.testing.assert_frame_equal(
        out.sort_values("node").reset_index(drop=True),
        again.sort_values("node").reset_index(drop=True))


def test_kg_mis_matches_oracle(duck, sf_dir):
    from nexus_forge_ray.pipelines.kg_queries import kg_mis
    from nexus_forge_ray.pipelines.oracles import ORACLES
    got = kg_mis(sf_dir).reset_index(drop=True)
    want = duck.sql(ORACLES["kg_mis"]).df()
    want["round"] = want["round"].astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_mis_empty_and_selfloop_only(ray_session):
    # empty edge set and self-loops-only both yield an EMPTY MIS (not an
    # IndexError): no alive nodes means nothing to choose
    for pairs in ([("q", "q")], [("q", "q"), ("r", "r")]):
        out = run(pairs)
        assert len(out) == 0
        # Ray may drop column names on a fully-empty block roundtrip; the
        # contract is "empty result, no IndexError" + the schema when kept
        assert list(out.columns) in ([], ["node", "round"])


def test_mis_priority_exact_above_2_53(ray_session):
    # priorities travel as fixed-width hex strings: lexicographic order on
    # them must equal numeric uint64 order (incl. values above 2^53 that a
    # float64 roundtrip would collapse)
    from nexus_forge_ray.kg.mis import _prio, _prio_hex
    s = pd.Series([f"n{i}" for i in range(2000)])
    nums = _prio(s, 3)
    hexes = _prio_hex(s, 3)
    order_n = np.argsort(nums, kind="stable")
    order_h = np.argsort(hexes, kind="stable")
    assert (order_n == order_h).all()
    assert all(len(h) == 16 for h in hexes)
