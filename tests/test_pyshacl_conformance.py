"""pySHACL conformance cross-check for the vectorized validator.

The reference validates with real pySHACL over the owl:imports closure
(kgforge/specializations/models/rdf/service.py:222-266,408-496). This
module pins the repo's vectorized subset (validation/shapes.py) to pySHACL
verdicts on the same focus nodes WHEN pyshacl is importable.

Environment probe (2026-08-18, this container): `import pyshacl` and
`import rdflib` both fail, and the sandbox has no network/pip — so these
tests SKIP here and the subset stays pinned by the golden fixtures in
test_validation.py. On any host with pyshacl installed they run for real.
"""

import pandas as pd
import pytest

pyshacl = pytest.importorskip("pyshacl")
rdflib = pytest.importorskip("rdflib")

from nexus_forge_ray.validation.shapes import (PropertyConstraint,  # noqa: E402
                                               Shape, ShapeValidator)

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _shapes_graph() -> "rdflib.Graph":
    ttl = f"""
    @prefix sh: <{SH}> .
    @prefix xsd: <{XSD}> .
    @prefix ex: <{EX}> .

    ex:PersonShape a sh:NodeShape ;
      sh:targetClass ex:Person ;
      sh:property [ sh:path ex:givenName ; sh:minCount 1 ;
                    sh:datatype xsd:string ] ;
      sh:property [ sh:path ex:gender ;
                    sh:in ("female" "male") ] ;
      sh:property [ sh:path ex:age ; sh:datatype xsd:integer ;
                    sh:minInclusive 0 ] ;
      sh:property [ sh:path ex:status ; sh:hasValue "active" ;
                    sh:minCount 1 ] ;
      sh:property [ sh:path ex:score ;
                    sh:or ( [ sh:minInclusive 0 ; sh:maxInclusive 10 ]
                            [ sh:in ("legacy") ] ) ] .
    """
    g = rdflib.Graph()
    g.parse(data=ttl, format="turtle")
    return g


REPO_PERSON = Shape(target_type="Person", constraints=[
    PropertyConstraint(path="givenName", min_count=1, datatype="string"),
    PropertyConstraint(path="gender", in_values=["female", "male"]),
    PropertyConstraint(path="age", datatype="integer", min_inclusive=0),
    PropertyConstraint(path="status", has_value="active", min_count=1),
    PropertyConstraint(path="score",
                       any_of=[PropertyConstraint(min_inclusive=0,
                                                  max_inclusive=10),
                               PropertyConstraint(in_values=["legacy"])]),
])

CASES = [
    {"givenName": "Jane", "gender": "female", "age": 30,
     "status": "active", "score": 5},              # conforms
    {"gender": "female", "status": "active"},      # missing givenName
    {"givenName": "J", "gender": "other", "status": "active"},  # bad enum
    {"givenName": "J", "gender": "male", "age": -1, "status": "active"},
    {"givenName": "J", "gender": "male", "status": "retired"},  # hasValue
    {"givenName": "J", "gender": "male", "status": "active",
     "score": 99},                                  # or-shape violation
    {"givenName": "J", "gender": "male", "status": "active",
     "score": "legacy"},                            # or-shape 2nd alt: ok
]


def _data_graph(row: dict) -> "rdflib.Graph":
    g = rdflib.Graph()
    s = rdflib.URIRef(EX + "p1")
    g.add((s, rdflib.RDF.type, rdflib.URIRef(EX + "Person")))
    for k, v in row.items():
        if v is None:
            continue
        lit = rdflib.Literal(v)
        g.add((s, rdflib.URIRef(EX + k), lit))
    return g


@pytest.mark.parametrize("row", CASES)
def test_vectorized_verdict_matches_pyshacl(row):
    conforms, _, _ = pyshacl.validate(_data_graph(row),
                                      shacl_graph=_shapes_graph(),
                                      inference="none")
    v = ShapeValidator([REPO_PERSON], type_col="type")
    out = v(pd.DataFrame([{**row, "type": "Person"}]))
    assert bool(out["valid"][0]) == bool(conforms), \
        f"row {row}: pySHACL={conforms} repo={out['violation'][0]!r}"
