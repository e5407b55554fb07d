"""Resolver scopes (ontology/agent property sets) + similarity linker."""

import pytest

from nexus_forge_ray.resolving.embedding import (EmbeddingLinker,
                                                 ResolverScopes,
                                                 SimilarityLinker)
from nexus_forge_ray.resolving.strategies import ResolvingStrategy as S

ONTO_KB = [
    {"id": "obo:GO_1", "type": "Class", "label": "axon guidance",
     "prefLabel": "Axon Guidance", "notation": "AG",
     "definition": "guidance of axons", "subClassOf": "obo:GO_0"},
    {"id": "obo:GO_2", "type": "Class", "label": "dendrite",
     "altLabel": "dendritic tree"},
]

AGENT_KB = [
    {"id": "agent:1", "type": "Person", "name": "Jane Doe",
     "givenName": "Jane", "familyName": "Doe"},
]


@pytest.fixture(scope="module")
def scopes():
    return (ResolverScopes()
            .register("terms", ONTO_KB, kind="ontology")
            .register("agents", AGENT_KB, kind="agent"))


def test_ontology_property_set(scopes):
    # notation + altLabel resolve (ontology_resolver.py:47 property set)
    assert scopes.resolve("AG", target="terms", strategy=S.EXACT_MATCH)["id"] \
        == "obo:GO_1"
    assert scopes.resolve("dendritic tree", target="terms",
                          strategy=S.EXACT_MATCH)["id"] == "obo:GO_2"
    # expected result fields present (ontology_resolver.py:136-138)
    hit = scopes.resolve("axon guidance", target="terms",
                         strategy=S.EXACT_MATCH)
    assert hit["definition"] and hit["subClassOf"]


def test_agent_property_set(scopes):
    assert scopes.resolve("Jane", target="agents",
                          strategy=S.EXACT_MATCH)["id"] == "agent:1"
    assert scopes.resolve("Doe", target="agents",
                          strategy=S.EXACT_MATCH)["id"] == "agent:1"


def test_unknown_target_raises(scopes):
    with pytest.raises(ValueError, match="Unknown target"):
        scopes.resolve("x", target="nope")


def test_cross_target_fallback(scopes):
    assert scopes.resolve("Jane Doe", strategy=S.EXACT_MATCH)["id"] == "agent:1"
    assert scopes.resolve("zzz", strategy=S.EXACT_MATCH) is None


# ------------------------------------------------------- similarity linker

@pytest.fixture(scope="module")
def sim_linker():
    kb = {"U:1": ("spark", "d1"), "U:2": ("sparkle", "d2")}
    aliases = [("spark", "U:1"), ("sparkle", "U:2")]
    return SimilarityLinker(kb, aliases, dim=256)


def test_similarity_scores_ascend_to_one(sim_linker):
    cands = sim_linker.generate_candidates(["spark"], limit=2)["spark"]
    assert cands[0]["id"] == "U:1" and cands[0]["score"] == 1.0
    assert cands[1]["score"] < 1.0


def test_similarity_rank_semantics(sim_linker):
    cands = sim_linker.generate_candidates(["spark"], limit=2)["spark"]
    exact = SimilarityLinker.rank_candidates(cands, S.EXACT_MATCH)
    assert exact[0]["id"] == "U:1"
    best = SimilarityLinker.rank_candidates(cands, S.BEST_MATCH, threshold=0.99)
    assert best[0]["id"] == "U:1"
    none = SimilarityLinker.rank_candidates(
        sim_linker.generate_candidates(["zzz"], limit=2)["zzz"],
        S.BEST_MATCH, threshold=0.99)
    assert none is None
    all_m = SimilarityLinker.rank_candidates(cands, S.ALL_MATCHES, threshold=0.1)
    scores = [c["score"] for c in all_m]
    assert scores == sorted(scores, reverse=True)  # descending for similarity
