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
