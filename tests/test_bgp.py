"""SPARQL basic-graph-pattern executor: joins, repeated vars, guards."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.bgp import bgp_select, match_pattern

TRIPLES = pd.DataFrame({
    "subj": ["d1", "d1", "d2", "d2", "d3", "x"],
    "pred": ["mentions", "lang", "mentions", "lang", "lang", "loop"],
    "obj":  ["e1",       "en",   "e2",       "fr",   "en",   "x"],
})


def _ds():
    return ray.data.from_pandas(TRIPLES)


def test_two_pattern_join(ray_session):
    out = bgp_select(_ds(), [("?d", "mentions", "?e"),
                             ("?d", "lang", "en")], ["?d", "?e"]).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [("d1", "e1")]


def test_repeated_variable_is_equality(ray_session):
    out = match_pattern(_ds(), ("?x", "loop", "?x")).to_pandas()
    assert out["x"].tolist() == ["x"]


def test_cross_join_rejected(ray_session):
    with pytest.raises(ValueError, match="cross join"):
        bgp_select(_ds(), [("?a", "mentions", "?b"),
                           ("?c", "lang", "?d")], ["?a"]).to_pandas()


def test_three_pattern_chain(ray_session):
    # docs that mention something AND are in some lang; select the lang
    out = bgp_select(_ds(), [("?d", "mentions", "?e"),
                             ("?d", "lang", "?l")], ["?d", "?l"]).to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [("d1", "en"), ("d2", "fr")]
