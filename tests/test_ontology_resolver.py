"""OntologyResolver golden tests — semantics of
/root/reference/kgforge/specializations/resolvers/ontology_resolver.py:27-140
and resolver.py:208-252 (strategy-dependent match + limits), on a KB shaped
like tests/data/demo-resolver fixtures extended with ontology fields."""

import pytest

from nexus_forge_ray.resolving.ontology import (OntologyResolver,
                                                escape_punctuation)
from nexus_forge_ray.resolving.strategies import ResolvingStrategy

KB = [
    {"id": "obo:PATO_0000384", "type": "Class", "label": "male"},
    {"id": "obo:PATO_0000383", "type": "Class", "label": "female",
     "definition": "A biological sex quality.",
     "subClassOf": "obo:PATO_0000047", "isDefinedBy": "obo:pato.owl"},
    {"id": "nsg:PyramidalNeuron", "type": "Class", "label": "Pyramidal Neuron",
     "prefLabel": "Pyramidal Cell", "altLabel": "PC",
     "subClassOf": ["nsg:Neuron"], "definition": "An excitatory neuron."},
    {"id": "bbp:Lamp_plus", "type": "Class", "label": "Lamp+",
     "notation": "L+"},
    {"id": "bbp:Deprecated", "type": "Class", "label": "male",
     "deprecated": True},
    {"id": "bbp:NotAClass", "type": "Dataset", "label": "male"},
]


@pytest.fixture
def resolver():
    return OntologyResolver(KB)


def test_exact_match_case_sensitive(resolver):
    hit = resolver.resolve("male", strategy=ResolvingStrategy.EXACT_MATCH)
    assert hit["id"] == "obo:PATO_0000384"
    assert resolver.resolve("MALE", strategy=ResolvingStrategy.EXACT_MATCH) \
        is None


def test_exact_ci_match_and_punctuation_escape(resolver):
    hit = resolver.resolve(
        "FEMALE", strategy=ResolvingStrategy.EXACT_CASE_INSENSITIVE_MATCH)
    assert hit["id"] == "obo:PATO_0000383"
    # ontology fields are emitted (expected_fields, ontology_resolver.py:136)
    assert hit["definition"] == "A biological sex quality."
    assert hit["subClassOf"] == "obo:PATO_0000047"
    assert hit["isDefinedBy"] == "obo:pato.owl"
    # 'Lamp+' only matches when '+' is treated literally (escape_punctuation)
    hit = resolver.resolve(
        "lamp+", strategy=ResolvingStrategy.EXACT_CASE_INSENSITIVE_MATCH)
    assert hit["id"] == "bbp:Lamp_plus"


def test_union_over_four_properties(resolver):
    # prefLabel, altLabel and notation all hit via the UNION
    for text, eid in [("pyramidal cell", "nsg:PyramidalNeuron"),
                      ("pc", "nsg:PyramidalNeuron"),
                      ("l\\+", "bbp:Lamp_plus")]:
        hit = resolver.resolve(text, strategy=ResolvingStrategy.BEST_MATCH)
        assert hit is not None and hit["id"] == eid, text


def test_best_match_containment_regex(resolver):
    # BEST_MATCH: text is a case-insensitive regex searched in the properties
    hit = resolver.resolve("neuro", strategy=ResolvingStrategy.BEST_MATCH)
    assert hit["id"] == "nsg:PyramidalNeuron"
    assert hit["subClassOf"] == ["nsg:Neuron"]


def test_all_matches_limit(resolver):
    hits = resolver.resolve("male", strategy=ResolvingStrategy.ALL_MATCHES,
                            limit=10)
    # 'male' contained in 'male' and 'female'; deprecated and non-Class
    # entries are excluded (resolver.py:213-215)
    assert [h["id"] for h in hits] == ["obo:PATO_0000384", "obo:PATO_0000383"]
    hits = resolver.resolve("male", strategy=ResolvingStrategy.ALL_MATCHES,
                            limit=1)
    assert [h["id"] for h in hits] == ["obo:PATO_0000384"]


def test_type_filter_default_class(resolver):
    # bbp:NotAClass has type Dataset: excluded under the default type=Class,
    # included when asked for explicitly
    hits = resolver.resolve("male", strategy=ResolvingStrategy.ALL_MATCHES)
    assert "bbp:NotAClass" not in [h["id"] for h in hits]
    hit = resolver.resolve("male", type="Dataset",
                           strategy=ResolvingStrategy.EXACT_MATCH)
    assert hit["id"] == "bbp:NotAClass"


def test_escape_punctuation_reference_behavior():
    assert escape_punctuation("a+b.c") == "a\\+b\\.c"
    with pytest.raises(TypeError):
        escape_punctuation(42)
