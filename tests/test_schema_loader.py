"""Schema directory loader: owl:imports closure, cross-file sh:node refs,
ontology subClassOf collection (reference service.py:430-496 scenarios)."""

import json

import pandas as pd
import pytest

from nexus_forge_ray.validation.loader import SchemaDirectory, as_term
from nexus_forge_ray.validation.shapes import ShapeValidator


@pytest.fixture
def schema_dir(tmp_path):
    (tmp_path / "person.json").write_text(json.dumps({
        "@id": "http://shapes.ex/person",
        "owl:imports": ["http://shapes.ex/address", "https://schema.org/"],
        "shapes": [{
            "@id": "http://shapes.ex/PersonShape",
            "targetClass": "schema:Person",
            "property": [
                {"path": "schema:familyName", "datatype": "xsd:string",
                 "minCount": 1},
                {"path": "schema:address",
                 "class": "schema:PostalAddress",
                 "node": "http://shapes.ex/AddressShape"},
            ]}]}))
    (tmp_path / "address.json").write_text(json.dumps({
        "@id": "http://shapes.ex/address",
        "shapes": [{
            "@id": "http://shapes.ex/AddressShape",
            "targetClass": "schema:PostalAddress",
            "property": [
                {"path": "schema:postalCode", "minInclusive": 10000,
                 "maxInclusive": 99999},
            ]}]}))
    (tmp_path / "schemaorg.json").write_text(json.dumps({
        "@id": "https://schema.org/",
        "owl:imports": "http://shapes.ex/person",   # cycle back, must not loop
        "subClassOf": {"schema:Patient": ["schema:Person"]},
        "shapes": []}))
    return SchemaDirectory(str(tmp_path))


def test_as_term():
    assert as_term("https://schema.org/Person") == "Person"
    assert as_term("xsd:string") == "string"
    assert as_term("http://www.w3.org/ns/shacl#node") == "node"


def test_import_closure_cycle_safe(schema_dir):
    shapes = schema_dir.shapes_for("http://shapes.ex/person")
    targets = {s.target_type for s in shapes}
    assert targets == {"Person", "PostalAddress"}


def test_cross_file_node_reference_resolved(schema_dir):
    shapes = schema_dir.shapes_for("http://shapes.ex/person")
    person = next(s for s in shapes if s.target_type == "Person")
    addr_c = next(c for c in person.constraints if c.path == "address")
    assert addr_c.class_type == "PostalAddress"
    assert addr_c.node_shape is not None
    assert addr_c.node_shape.target_type == "PostalAddress"


def test_subclass_map_feeds_inference(schema_dir):
    shapes = schema_dir.shapes_for("http://shapes.ex/person")
    v = ShapeValidator(shapes, type_col="type",
                       subclass_of=schema_dir.subclass_of)
    out = v(pd.DataFrame([
        {"type": "Patient", "familyName": "Doe"},
        {"type": "Person", "familyName": "Doe",
         "address": {"type": "PostalAddress", "postalCode": 999}},
    ]))
    assert out["valid"].tolist() == [True, False]
    assert out["violation"][1] == "NodeConstraint: address"


def test_unknown_import_raises(tmp_path):
    (tmp_path / "bad.json").write_text(json.dumps({
        "@id": "http://shapes.ex/bad",
        "owl:imports": ["http://nowhere/x"], "shapes": []}))
    d = SchemaDirectory(str(tmp_path))
    with pytest.raises(ValueError, match="not loaded as schema"):
        d.shapes_for("http://shapes.ex/bad")
