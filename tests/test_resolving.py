"""Resolver strategy semantics vs demo_resolver.py:39-79 and
entity_linking_service.py:34-52 (FIXTURES.md F3 case list)."""

import pytest

from nexus_forge_ray.resolving.dictionary import DictionaryResolver
from nexus_forge_ray.resolving.embedding import EmbeddingLinker
from nexus_forge_ray.resolving.strategies import ResolvingStrategy as S

KB = [
    {"id": "http://purl.obolibrary.org/obo/PATO_0000384", "type": "Class",
     "label": "male", "acronym": "M"},
    {"id": "http://purl.obolibrary.org/obo/PATO_0000383", "type": "Class",
     "label": "female", "acronym": "F"},
    {"id": "E:EA", "type": "Class", "label": "entity alpha"},
    {"id": "E:EAB", "type": "Class", "label": "entity alpha beta"},
    {"id": "P:1", "type": "Person", "label": "male impersonator"},
]


@pytest.fixture(scope="module")
def res():
    return DictionaryResolver(KB)


def test_exact_match(res):
    assert res.resolve("male", S.EXACT_MATCH)["id"].endswith("PATO_0000384")
    assert res.resolve("Male", S.EXACT_MATCH) is None  # case-sensitive


def test_exact_match_on_acronym(res):
    assert res.resolve("F", S.EXACT_MATCH)["id"].endswith("PATO_0000383")


def test_exact_case_insensitive(res):
    assert res.resolve("MALE", S.EXACT_CASE_INSENSITIVE_MATCH)["id"] \
        .endswith("PATO_0000384")


def test_unknown_mention_none(res):
    assert res.resolve("unknown thing", S.EXACT_MATCH) is None
    assert res.resolve("zzz", S.BEST_MATCH) is None


def test_empty_text_none(res):
    assert res.resolve("", S.EXACT_MATCH) is None


def test_fuzzy_scoring_best_match(res):
    # 'male' is substring of 'male', 'female', 'male impersonator';
    # score = len(label) - len(text): male=0, female=2, male impersonator=13
    out = res.resolve("male", S.BEST_MATCH)
    assert out["label"] == "male"


def test_all_matches_sorted_ascending(res):
    out = res.resolve("male", S.ALL_MATCHES)
    assert [o["label"] for o in out] == ["male", "female", "male impersonator"]


def test_all_matches_threshold(res):
    out = res.resolve("male", S.ALL_MATCHES, threshold=2)
    assert [o["label"] for o in out] == ["male", "female"]


def test_type_filter(res):
    # with type filter Person, 'male' fuzzy-resolves to the impersonator
    out = res.resolve("male", S.BEST_MATCH, type="Person")
    assert out["id"] == "P:1"
    assert res.resolve("male", S.EXACT_MATCH, type="Person") is None


def test_best_match_tiebreak_kb_order(res):
    # 'entity alpha' substring-matches EA (score 0) and EAB (score 5)
    assert res.resolve("entity alpha", S.BEST_MATCH)["id"] == "E:EA"


# --------------------------------------------------------- embedding linker

@pytest.fixture(scope="module")
def linker():
    kb = {"U:1": ("spark", "def1"), "U:2": ("sparkle", "def2"),
          "U:3": ("table", "def3")}
    aliases = [("spark", "U:1"), ("sparkle", "U:2"), ("table", "U:3")]
    return EmbeddingLinker(kb, aliases, dim=256)


def test_linker_exact_zero_distance(linker):
    cands = linker.generate_candidates(["spark"], limit=3)["spark"]
    assert cands[0]["id"] == "U:1" and cands[0]["score"] == 0.0


def test_linker_rank_exact_strategy(linker):
    cands = linker.generate_candidates(["spark"], limit=3)["spark"]
    out = EmbeddingLinker.rank_candidates(cands, S.EXACT_MATCH)
    assert out[0]["id"] == "U:1"
    cands2 = linker.generate_candidates(["spa"], limit=3)["spa"]
    assert EmbeddingLinker.rank_candidates(cands2, S.EXACT_MATCH) is None


def test_linker_best_match_threshold(linker):
    cands = linker.generate_candidates(["sparkl"], limit=3)["sparkl"]
    best = EmbeddingLinker.rank_candidates(cands, S.BEST_MATCH, threshold=0.9)
    assert best[0]["id"] == "U:2"   # closest to 'sparkle'
    none = EmbeddingLinker.rank_candidates(cands, S.BEST_MATCH, threshold=1e-9)
    assert none is None


def test_linker_all_matches_ascending(linker):
    cands = linker.generate_candidates(["spark"], limit=3)["spark"]
    out = EmbeddingLinker.rank_candidates(cands, S.ALL_MATCHES, threshold=2.0)
    scores = [c["score"] for c in out]
    assert scores == sorted(scores)


def test_linker_dedups_mentions(linker):
    out = linker.generate_candidates(["spark", "spark", "table"], limit=2)
    assert set(out) == {"spark", "table"}
