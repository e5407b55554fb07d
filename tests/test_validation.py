"""Validation verdicts vs FIXTURES.md F4 (Person/Organization shape cases)."""

import pandas as pd

from nexus_forge_ray.validation.shapes import (PropertyConstraint, Shape,
                                               ShapeValidator)

PERSON = Shape(target_type="Person", constraints=[
    PropertyConstraint(path="givenName", min_count=1, datatype="string"),
    PropertyConstraint(path="familyName", min_count=1, datatype="string"),
    PropertyConstraint(path="gender", in_values=["female", "male"]),
    PropertyConstraint(path="birthDate", datatype="date"),
    PropertyConstraint(path="age", datatype="integer", min_inclusive=0),
])

ORG = Shape(target_type="Organization", constraints=[
    PropertyConstraint(path="name", min_count=1),
])


def run(rows):
    v = ShapeValidator([PERSON, ORG], type_col="type")
    return v(pd.DataFrame(rows))


def test_valid_person_conforms():
    out = run([{"type": "Person", "givenName": "Jane", "familyName": "Doe",
                "gender": "female", "birthDate": "1970-01-01", "age": 30}])
    assert out["valid"][0] and out["violation"][0] == ""


def test_missing_mandatory_min_count():
    out = run([{"type": "Organization", "name": None}])
    assert not out["valid"][0]
    assert out["violation"][0] == "MinCountConstraint: name"


def test_wrong_enum_in_constraint():
    out = run([{"type": "Person", "givenName": "J", "familyName": "D",
                "gender": "other"}])
    assert out["violation"][0] == "InConstraint: gender"


def test_wrong_datatype():
    out = run([{"type": "Person", "givenName": "J", "familyName": "D",
                "birthDate": "not-a-date"}])
    assert out["violation"][0] == "DatatypeConstraint: birthDate"


def test_range_constraint():
    out = run([{"type": "Person", "givenName": "J", "familyName": "D",
                "age": -4}])
    assert out["violation"][0] == "MinMaxInclusiveConstraint: age"


def test_no_shape_for_type_fails():
    out = run([{"type": "Alien", "name": "zz"}])
    assert not out["valid"][0]
    assert out["violation"][0].startswith("NoShapeForType")


def test_first_violation_reported_and_mixed_batch():
    out = run([
        {"type": "Person", "familyName": "D", "gender": "x"},   # missing given
        {"type": "Person", "givenName": "A", "familyName": "B",
         "gender": "female"},                                    # valid
        {"type": "Organization"},                                # missing name
    ])
    assert out["violation"].tolist() == [
        "MinCountConstraint: givenName", "", "MinCountConstraint: name"]
    assert out["valid"].tolist() == [False, True, False]


# ---- sh:class / sh:node nested shapes + rdfs inference (reference scenarios:
# tests/specializations/models/test_rdf_model.py:80-165 — an Activity whose
# `generated` is an untyped/mistyped node fails; a Patient validates against
# the Person shape only under rdfs inference)

ENTITY = Shape(target_type="Entity", constraints=[])

ACTIVITY = Shape(target_type="Activity", constraints=[
    PropertyConstraint(path="generated", min_count=1, class_type="Entity",
                       node_shape=ENTITY),
    PropertyConstraint(path="status", in_values=["completed", "pending"]),
])

ADDRESS = Shape(target_type="PostalAddress", constraints=[
    PropertyConstraint(path="streetAddress", datatype="string"),
    PropertyConstraint(path="postalCode", min_inclusive=10000,
                       max_inclusive=99999),
])

PERSON_NESTED = Shape(target_type="Person", constraints=[
    PropertyConstraint(path="familyName", min_count=1, datatype="string"),
    PropertyConstraint(path="address", node_shape=ADDRESS),
])


def run_nested(rows, subclass_of=None):
    v = ShapeValidator([ACTIVITY, PERSON_NESTED, ENTITY], type_col="type",
                       subclass_of=subclass_of)
    return v(pd.DataFrame(rows))


def test_class_constraint_typed_nested_node_ok():
    out = run_nested([{"type": "Activity", "status": "completed",
                       "generated": {"type": "Entity"}}])
    assert out["valid"][0] and out["violation"][0] == ""


def test_class_constraint_wrong_type_fails():
    out = run_nested([{"type": "Activity", "status": "completed",
                       "generated": {"type": "Dataset"}}])
    assert out["violation"][0] == "ClassConstraint: generated"


def test_class_constraint_untyped_value_fails():
    # a bare IRI/string value cannot prove its class -> sh:class violation
    out = run_nested([{"type": "Activity", "status": "completed",
                       "generated": "http://ex/e1"}])
    assert out["violation"][0] == "ClassConstraint: generated"


def test_class_constraint_type_list():
    out = run_nested([{"type": "Activity", "status": "completed",
                       "generated": {"type": ["Entity", "Dataset"]}}])
    assert out["valid"][0]


def test_node_constraint_nested_shape_violation():
    out = run_nested([{"type": "Person", "familyName": "Doe",
                       "address": {"type": "PostalAddress",
                                   "streetAddress": "Main St",
                                   "postalCode": 999}}])
    assert out["violation"][0] == "NodeConstraint: address"


def test_node_constraint_nested_ok_and_absent_ok():
    out = run_nested([
        {"type": "Person", "familyName": "Doe",
         "address": {"type": "PostalAddress", "streetAddress": "Main St",
                     "postalCode": 12345}},
        {"type": "Person", "familyName": "Doe"},   # address optional
    ])
    assert out["valid"].tolist() == [True, True]


def test_rdfs_inference_subclass_validates_against_ancestor_shape():
    rows = [{"type": "Patient", "familyName": "Doe"}]
    # inference off: no shape targets Patient -> fails (reference: none_person)
    off = run_nested(rows)
    assert not off["valid"][0] and off["violation"][0].startswith("NoShapeForType")
    # inference on: Patient rdfs:subClassOf Person -> Person shape applies
    on = run_nested(rows, subclass_of={"Patient": ["Person"]})
    assert on["valid"][0]
    # transitive closure
    on2 = run_nested(rows, subclass_of={"Patient": ["Human"],
                                        "Human": ["Person"]})
    assert on2["valid"][0]


# ---- sh:hasValue / sh:nodeKind / sh:and / sh:or / sh:xone (logical
# collectors: reference HasValue/NodeKind/And/Or/Xone collectors at
# kgforge/specializations/models/rdf/collectors.py:81-96,134-153,286-418)

AGENT = Shape(target_type="Agent", constraints=[
    PropertyConstraint(path="role", has_value="curator"),
    PropertyConstraint(path="homepage", node_kind="IRI"),
    PropertyConstraint(path="label", node_kind="Literal"),
    # sh:or — age is a non-negative integer OR the literal "unknown"
    PropertyConstraint(path="age",
                       any_of=[PropertyConstraint(datatype="integer",
                                                  min_inclusive=0),
                               PropertyConstraint(in_values=["unknown"])]),
    # sh:and — name is a string AND matches the prefix pattern
    PropertyConstraint(path="name",
                       all_of=[PropertyConstraint(datatype="string"),
                               PropertyConstraint(pattern=r"^Agent")]),
    # sh:xone — score in [0,10] xor flagged "legacy" (both -> violation)
    PropertyConstraint(path="score",
                       one_of=[PropertyConstraint(min_inclusive=0,
                                                  max_inclusive=10),
                               PropertyConstraint(in_values=["legacy"])]),
])

GOOD_AGENT = {"type": "Agent", "role": "curator",
              "homepage": "http://example.org/a", "label": "an agent",
              "age": 4, "name": "Agent Smith", "score": 3}


def run_agent(rows):
    v = ShapeValidator([AGENT], type_col="type")
    return v(pd.DataFrame(rows))


def test_logical_all_pass():
    out = run_agent([GOOD_AGENT])
    assert out["valid"][0] and out["violation"][0] == ""


def test_has_value_absent_or_wrong_fails():
    out = run_agent([{**GOOD_AGENT, "role": None},
                     {**GOOD_AGENT, "role": "reader"},
                     {**GOOD_AGENT, "role": ["reader", "curator"]}])
    assert out["violation"].tolist() == [
        "HasValueConstraint: role", "HasValueConstraint: role", ""]


def test_node_kind():
    out = run_agent([{**GOOD_AGENT, "homepage": "not a uri"},
                     {**GOOD_AGENT, "label": "urn:x:looks-like-iri"},
                     {**GOOD_AGENT, "homepage": "urn:uuid:1"}])
    assert out["violation"].tolist() == [
        "NodeKindConstraint: homepage", "NodeKindConstraint: label", ""]


def test_or_either_alternative_suffices():
    out = run_agent([{**GOOD_AGENT, "age": "unknown"},
                     {**GOOD_AGENT, "age": -3},
                     {**GOOD_AGENT, "age": "tall"}])
    assert out["violation"].tolist() == [
        "", "OrConstraint: age", "OrConstraint: age"]


def test_and_requires_all():
    out = run_agent([{**GOOD_AGENT, "name": "Smith, Agent"},
                     {**GOOD_AGENT, "name": 7}])
    assert out["violation"].tolist() == [
        "AndConstraint: name", "AndConstraint: name"]


def test_xone_exactly_one():
    out = run_agent([{**GOOD_AGENT, "score": "legacy"},    # 2nd alt only: ok
                     {**GOOD_AGENT, "score": 99},          # neither: fail
                     {**GOOD_AGENT, "score": 3}])          # 1st alt only: ok
    assert out["violation"].tolist() == ["", "XoneConstraint: score", ""]


def test_logical_absent_value_vacuous():
    # or/and/xone gate on presence: an absent optional property conforms
    out = run_agent([{**GOOD_AGENT, "age": None, "score": None}])
    assert out["valid"][0]


def test_alternative_with_own_path():
    # an alternative naming its own path checks that column instead
    shape = Shape(target_type="T", constraints=[
        PropertyConstraint(path="a",
                           any_of=[PropertyConstraint(min_inclusive=10),
                                   PropertyConstraint(path="b",
                                                      min_inclusive=0)])])
    v = ShapeValidator([shape], type_col="type")
    out = v(pd.DataFrame([{"type": "T", "a": 1, "b": 5},
                          {"type": "T", "a": 1, "b": -5}]))
    assert out["valid"].tolist() == [True, False]


def test_property_pair_constraints():
    import numpy as np
    from nexus_forge_ray.validation.shapes import PropertyConstraint
    df = pd.DataFrame({"a": [1, 5, 2, None], "b": [3, 3, 2, 3],
                       "c": ["x", "y", "x", "x"]})
    ok, lab = PropertyConstraint(path="a", less_than="b").check(df)
    assert ok.tolist() == [True, False, False, True]  # absent a -> vacuous
    assert lab[1] == "LessThanConstraint: a"
    ok, _ = PropertyConstraint(path="a", less_than_or_equals="b").check(df)
    assert ok.tolist() == [True, False, True, True]
    ok, _ = PropertyConstraint(path="a", equals="b").check(df)
    assert ok.tolist() == [False, False, True, True]
    ok, lab = PropertyConstraint(path="c", disjoint="c").check(df)
    assert not ok.any()            # a column is never disjoint from itself
    ok, _ = PropertyConstraint(path="a", disjoint="b").check(df)
    assert ok.tolist() == [True, True, False, True]


def test_pair_constraint_missing_other_side_violates():
    from nexus_forge_ray.validation.shapes import PropertyConstraint
    df = pd.DataFrame({"a": [1, 2], "b": [2, None]})
    ok, _ = PropertyConstraint(path="a", less_than="b").check(df)
    assert ok.tolist() == [True, False]   # unprovable comparison -> violation


def test_language_in_and_unique_lang():
    from nexus_forge_ray.validation.shapes import PropertyConstraint
    en = {"@value": "cat", "@language": "en"}
    fr = {"@value": "chat", "@language": "fr"}
    de = {"@value": "katze", "@language": "de"}
    df = pd.DataFrame({"label": [[en, fr], [de], [en], "bare", None]})
    ok, lab = PropertyConstraint(
        path="label", language_in=["en", "fr"]).check(df)
    assert ok.tolist() == [True, False, True, False, True]
    assert lab[1] == "LanguageInConstraint: label"
    df2 = pd.DataFrame({"label": [[en, fr], [en, {"@value": "dog",
                                                  "@language": "en"}], None]})
    ok, lab = PropertyConstraint(path="label", unique_lang=True).check(df2)
    assert ok.tolist() == [True, False, True]
    assert lab[1] == "UniqueLangConstraint: label"


def test_closed_shape_with_ignored(ray_session):
    import ray.data
    from nexus_forge_ray.validation.shapes import (PropertyConstraint, Shape,
                                                   validate_dataset)
    df = pd.DataFrame({
        "type": ["T", "T", "T"],
        "name": ["a", "b", "c"],
        "meta": ["m", "m", "m"],                 # ignored
        "stray": [None, "boom", ""],             # undeclared
    })
    shape = Shape(target_type="T",
                  constraints=[PropertyConstraint(path="name", min_count=1)],
                  closed=True, ignored_properties=["meta"])
    out = validate_dataset(ray.data.from_pandas(df), [shape]).to_pandas()
    assert out["valid"].tolist() == [True, False, True]   # '' is absence
    assert out.loc[1, "violation"] == "ClosedConstraint: stray"


def test_min_max_length_scalar_and_list():
    df = pd.DataFrame({"name": ["ab", "abcd", None, "abcdefgh"]})
    ok, lab = PropertyConstraint(path="name", min_length=3).check(df)
    assert ok.tolist() == [False, True, True, True]   # absent is vacuous
    assert lab[0] == "MinLengthConstraint: name"
    ok, lab = PropertyConstraint(path="name", max_length=4).check(df)
    assert ok.tolist() == [True, True, True, False]
    assert lab[3] == "MaxLengthConstraint: name"
    # list values: EVERY value node must satisfy the bounds
    df2 = pd.DataFrame({"name": [["abc", "x"], ["abc"], None]})
    ok, _ = PropertyConstraint(path="name", min_length=2).check(df2)
    assert ok.tolist() == [False, True, True]
    ok, lab = PropertyConstraint(path="name",
                                 min_length=2, max_length=3).check(df2)
    assert ok.tolist() == [False, True, True]
    assert lab[0] == "MinMaxLengthConstraint: name"


def test_exclusive_range_strict():
    df = pd.DataFrame({"v": [0.0, 0.1, 9.9, 10.0, None]})
    ok, lab = PropertyConstraint(path="v", min_exclusive=0,
                                 max_exclusive=10).check(df)
    # boundaries violate (strict), absent is vacuous
    assert ok.tolist() == [False, True, True, False, True]
    assert lab[0] == "MinMaxExclusiveConstraint: v"


def test_not_constraint():
    df = pd.DataFrame({"name": ["secret-a", "open-b", None]})
    c = PropertyConstraint(path="name",
                           not_of=PropertyConstraint(pattern=r"secret-"))
    ok, lab = c.check(df)
    # conforming to the negated shape violates; absent value is vacuous
    assert ok.tolist() == [False, True, True]
    assert lab[0] == "NotConstraint: name"


def test_qualified_value_shape_counts():
    df = pd.DataFrame({"phones": [
        ["555-1", "444-2"],   # one conforming
        ["444-2"],            # zero conforming
        ["555-1", "555-9"],   # two conforming
        None,                 # absent: zero conforming -> min violated
        "555-solo",           # scalar treated as 1-member list
    ]})
    qmin = PropertyConstraint(
        path="phones", qualified=PropertyConstraint(pattern=r"555-"),
        qualified_min=1)
    ok, lab = qmin.check(df)
    assert ok.tolist() == [True, False, True, False, True]
    assert lab[1] == "QualifiedValueShapeConstraint: phones"
    qmax = PropertyConstraint(
        path="phones", qualified=PropertyConstraint(pattern=r"555-"),
        qualified_max=1)
    ok, _ = qmax.check(df)
    assert ok.tolist() == [True, True, False, True, True]
