"""k-core peeling: cascading removal, fixpoint, empty core."""

import pandas as pd
import ray.data

from nexus_forge_ray.kg.kcore import kcore


def _edges(pairs):
    return ray.data.from_pandas(pd.DataFrame(pairs, columns=["e1", "e2"]))


def test_2core_peels_tail_chain(ray_session):
    # triangle a-b-c plus a pendant chain c-d-e: 2-core = the triangle,
    # and the peel must CASCADE (e drops, then d)
    e = _edges([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")])
    out = kcore(e, 2)
    assert out["node"].tolist() == ["a", "b", "c"]
    assert out["deg"].tolist() == [2, 2, 2]


def test_core_too_deep_is_empty(ray_session):
    out = kcore(_edges([("a", "b"), ("b", "c")]), 2)
    assert len(out) == 0


def test_semi_join_path_matches_broadcast(ray_session):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
             ("e", "f"), ("d", "f"), ("f", "g")]
    a = kcore(_edges(pairs), 2, broadcast_cap=10**9)
    b = kcore(_edges(pairs), 2, broadcast_cap=0)
    pd.testing.assert_frame_equal(a, b)
