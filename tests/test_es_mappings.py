"""ES mapping generation from Shape specs — golden dicts mirroring the
reference's shape-derived mappings (es_query_builder.py keyword/text/
nested/dense_vector semantics) for the Person/Activity fixture shapes."""

import pytest

from nexus_forge_ray.validation.es_mappings import es_mapping, keyword_path
from nexus_forge_ray.validation.shapes import PropertyConstraint, Shape

ADDRESS = Shape(target_type="PostalAddress", constraints=[
    PropertyConstraint(path="streetAddress", datatype="string"),
    PropertyConstraint(path="postalCode", datatype="integer"),
])

PERSON = Shape(target_type="Person", constraints=[
    PropertyConstraint(path="givenName", min_count=1, datatype="string"),
    PropertyConstraint(path="familyName", min_count=1, datatype="string"),
    PropertyConstraint(path="gender", in_values=["female", "male"]),
    PropertyConstraint(path="birthDate", datatype="date"),
    PropertyConstraint(path="age", datatype="integer", min_inclusive=0),
    PropertyConstraint(path="address", node_shape=ADDRESS),
    PropertyConstraint(path="homepage", node_kind="IRI"),
    PropertyConstraint(path="score", min_inclusive=0.0, max_inclusive=1.0),
    PropertyConstraint(path="affiliation", class_type="Organization"),
])

SHAPES = [PERSON, ADDRESS]

GOLDEN_PERSON = {
    "dynamic": False,
    "properties": {
        "id": {"type": "keyword"},
        "type": {"type": "keyword"},
        "givenName": {"type": "text",
                      "fields": {"keyword": {"type": "keyword",
                                             "ignore_above": 256}}},
        "familyName": {"type": "text",
                       "fields": {"keyword": {"type": "keyword",
                                              "ignore_above": 256}}},
        "gender": {"type": "keyword"},
        "birthDate": {"type": "date"},
        "age": {"type": "long"},
        "address": {"type": "nested",
                    "properties": {
                        "streetAddress": {
                            "type": "text",
                            "fields": {"keyword": {"type": "keyword",
                                                   "ignore_above": 256}}},
                        "postalCode": {"type": "long"}}},
        "homepage": {"type": "keyword"},
        "score": {"type": "double"},
        "affiliation": {"type": "object",
                        "properties": {"id": {"type": "keyword"},
                                       "type": {"type": "keyword"}}},
    },
}


def test_person_mapping_golden():
    assert es_mapping(SHAPES, "Person") == GOLDEN_PERSON


def test_dense_vector_and_unmanaged():
    emb = Shape(target_type="Doc", constraints=[
        PropertyConstraint(path="text", datatype="string"),
        PropertyConstraint(path="embedding", min_count=1),
    ])
    m = es_mapping([emb], "Doc", vector_dims={"embedding": 32})
    assert m["properties"]["embedding"] == {"type": "dense_vector", "dims": 32}
    with pytest.raises(ValueError):
        es_mapping([emb], "Nope")


def test_logical_alternatives_pick_first_concrete():
    s = Shape(target_type="T", constraints=[
        PropertyConstraint(path="age", any_of=[
            PropertyConstraint(datatype="integer", min_inclusive=0),
            PropertyConstraint(in_values=["unknown"])]),
        PropertyConstraint(path="flag", one_of=[
            PropertyConstraint(pattern="x"),           # no typing signal
            PropertyConstraint(datatype="boolean")]),
    ])
    m = es_mapping([s], "T")
    assert m["properties"]["age"] == {"type": "long"}
    assert m["properties"]["flag"] == {"type": "boolean"}


def test_untyped_property_defaults_to_text_keyword():
    s = Shape(target_type="T", constraints=[
        PropertyConstraint(path="name", min_count=1),
    ])
    m = es_mapping([s], "T")
    assert m["properties"]["name"]["type"] == "text"
    assert m["properties"]["name"]["fields"]["keyword"]["type"] == "keyword"


def test_keyword_path_resolution():
    m = es_mapping(SHAPES, "Person")
    # reference _build_keyword_path: keyword -> itself; text -> .keyword sub
    assert keyword_path(m, "gender") == "gender"
    assert keyword_path(m, "givenName") == "givenName.keyword"
    assert keyword_path(m, "age") == "age"                  # term on numerics
    assert keyword_path(m, "address.streetAddress") == \
        "address.streetAddress.keyword"
    # unknown path: None when static (reference raises), passthrough dynamic
    assert keyword_path(m, "nope") is None
    m_dyn = es_mapping(SHAPES, "Person", dynamic=True)
    assert keyword_path(m_dyn, "nope") == "nope"


def test_repeated_path_keeps_first_concrete_type():
    s = Shape(target_type="T", constraints=[
        PropertyConstraint(path="age", datatype="integer"),
        PropertyConstraint(path="age", pattern=r"\d+"),      # no type signal
        PropertyConstraint(path="age", min_inclusive=0),     # weaker signal
    ])
    m = es_mapping([s], "T")
    assert m["properties"]["age"] == {"type": "long"}


def test_exclusive_bounds_imply_number():
    s = Shape(target_type="T", constraints=[
        PropertyConstraint(path="score", min_exclusive=0.0),
    ])
    m = es_mapping([s], "T")
    assert m["properties"]["score"] == {"type": "double"}


def test_generated_mappings_do_not_alias():
    s = Shape(target_type="T", constraints=[
        PropertyConstraint(path="a", datatype="string"),
        PropertyConstraint(path="b", datatype="string"),
    ])
    m1 = es_mapping([s], "T")
    m1["properties"]["a"]["fields"]["keyword"]["ignore_above"] = 9
    assert m1["properties"]["b"]["fields"]["keyword"]["ignore_above"] == 256
    m2 = es_mapping([s], "T")
    assert m2["properties"]["a"]["fields"]["keyword"]["ignore_above"] == 256
