"""KnowledgeGraphForge facade — the reference session surface wired over the
engine (forge.py:140-1002 methods on dicts and Datasets)."""

import json

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.forge import KnowledgeGraphForge


@pytest.fixture
def forge(tmp_path):
    schema_dir = tmp_path / "schemas"
    schema_dir.mkdir()
    (schema_dir / "person.json").write_text(json.dumps({
        "@id": "http://shapes.ex/person",
        "subClassOf": {"Patient": ["Person"]},
        "shapes": [{
            "@id": "http://shapes.ex/PersonShape",
            "targetClass": "Person",
            "property": [
                {"path": "familyName", "datatype": "xsd:string",
                 "minCount": 1},
                {"path": "gender", "in": ["female", "male"]},
            ]}]}))
    return KnowledgeGraphForge({
        "model": {"source": str(schema_dir)},
        "store": {"base": str(tmp_path / "store")},
        "resolvers": {"terms": [{
            "target": "sex",
            "entries": [
                {"id": "obo:male", "type": "Class", "label": "male"},
                {"id": "obo:female", "type": "Class", "label": "female"},
            ]}]},
        "formatters": {"identifier": "https://ex.org/{}/{}"},
        "context": {"schema": "https://schema.org/",
                    "Person": "https://schema.org/Person"},
    })


def test_types_template_paths(forge):
    assert forge.types() == ["Person"]
    t = forge.template("Person")
    assert t == {"id": "", "type": "Person", "familyName": "",
                 "gender": "female"}
    f = forge.paths("Person").familyName == "Doe"
    assert f.path == ("familyName",) and f.value == "Doe"
    # context getters (reference forge.py:973-979): copies, not aliases
    sc, mc = forge.get_store_context(), forge.get_model_context()
    assert sc == forge.context and mc == forge.context
    sc["x"] = "mutated"
    assert "x" not in forge.context


def test_validate_records_and_inference(forge):
    good = {"type": "Person", "familyName": "Doe", "gender": "male"}
    bad = {"type": "Person", "gender": "alien"}
    patient = {"type": "Patient", "familyName": "Doe"}
    out = forge.validate([good, bad, patient])
    assert [r["valid"] for r in out] == [True, False, True]
    assert out[1]["violation"] == "MinCountConstraint: familyName"


def test_validate_dataset(forge):
    ds = ray.data.from_pandas(pd.DataFrame([
        {"type": "Person", "familyName": "A", "gender": "female"},
        {"type": "Person", "familyName": None, "gender": "female"},
    ]))
    out = forge.validate(ds).to_pandas()
    assert out["valid"].tolist() == [True, False]


def test_resolve_scope_rules(forge):
    hit = forge.resolve("male", scope="terms", target="sex")
    assert hit["id"] == "obo:male"
    assert forge.resolve("male") is not None     # scope-less fallback
    with pytest.raises(ValueError, match="Unknown scope"):
        forge.resolve("male", scope="nope")


def test_map_and_format(forge):
    mapping = {"id": "forge.format('identifier', 'persons', x.pid)",
               "type": "Person", "familyName": "x.fam"}
    rec = forge.map({"pid": 7, "fam": "Doe"}, mapping)
    assert rec == {"id": "https://ex.org/persons/7", "type": "Person",
                   "familyName": "Doe"}
    assert forge.format("identifier", "a", 1) == "https://ex.org/a/1"


def test_store_lifecycle(forge):
    r = forge.register({"id": "urn:p1", "type": "Person",
                        "familyName": "Doe"})
    assert r["metadata"]["version"] == 1
    forge.update({"id": "urn:p1", "type": "Person", "familyName": "Smith"})
    forge.tag("urn:p1", 2, "rel")
    assert forge.retrieve("urn:p1", "rel")["data"]["familyName"] == "Smith"
    assert forge.retrieve("urn:p1", 1)["data"]["familyName"] == "Doe"
    frozen = forge.freeze({"ref": {"id": "urn:p1"}})
    assert frozen["ref"]["id"] == "urn:p1?_version=2"
    hits = forge.search({"familyName": "Smith"})
    assert len(hits) == 1 and hits[0]["data"]["id"] == "urn:p1"


def test_attach_download_roundtrip(forge, tmp_path):
    f = tmp_path / "blob.txt"
    f.write_bytes(b"hello")
    res = forge.attach(str(f))
    resource = {"id": "urn:d1", "distribution": res}
    out = forge.download(resource, path=str(tmp_path / "dl"))
    assert open(out[0], "rb").read() == b"hello"


def test_codecs(forge):
    rec = {"id": "urn:p1", "type": "Person", "familyName": "Doe"}
    doc = forge.as_jsonld(rec)
    assert doc["@id"] == "urn:p1" and doc["@context"]["Person"]
    assert forge.from_jsonld(doc) == rec
    df = forge.as_dataframe([rec])
    assert forge.from_dataframe(df) == [rec]


def test_sources_mappings_registry(tmp_path):
    rules = {"type": "Person", "name": "x.first + ' ' + x.last"}
    forge = KnowledgeGraphForge({
        "mappings": {"people-db": {"Person": rules}}})
    assert forge.sources() == ["people-db"]
    assert forge.mappings("people-db") == {"Person": ["DictionaryMapping"]}
    m = forge.mapping("Person", "people-db")
    out = forge.map({"first": "Ada", "last": "Lovelace"}, m)
    assert out["name"] == "Ada Lovelace"
    with pytest.raises(ValueError):
        forge.mappings("nope")
    with pytest.raises(ValueError):
        forge.mapping("Org", "people-db")


def test_as_graph_from_graph_roundtrip(forge):
    rec = {"id": "https://ex.org/p/1", "type": "Person",
           "familyName": "Curie", "age": 66}
    triples = forge.as_graph(rec)
    assert ("https://ex.org/p/1",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "https://schema.org/Person", True, None) in triples
    back = forge.from_graph(triples)
    assert len(back) == 1
    r = back[0]
    assert r["id"] == "https://ex.org/p/1"
    assert r["type"] == "Person"          # compacted via reverse context
    assert r["familyName"] == "Curie"
    assert r["age"] == 66                 # literal revived as int
    # framing by type filters non-matching records out
    assert forge.from_graph(triples, types=["Organization"]) == []


def test_from_json_drops_na(forge):
    recs = forge.from_json([{"a": 1, "b": "N/A"}, {"a": 2, "b": 3}],
                           na="N/A")
    assert recs == [{"a": 1}, {"a": 2, "b": 3}]


def test_elastic_source_projection(forge):
    import pandas as pd
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 2], "b": ["x", "y"], "c": [True, False]}))
    out = forge.elastic({"query": {"term": {"b": "x"}},
                         "_source": ["a", "b"]}, data=ds).to_pandas()
    assert list(out.columns) == ["a", "b"]
    assert out["a"].tolist() == [1]


def test_elastic_source_forms_and_size_without_sort(forge):
    import pandas as pd
    import ray.data
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": list(range(10)), "b": ["x"] * 10}))
    # string form + missing field omitted (ES semantics), not KeyError
    out = forge.elastic({"query": {"term": {"b": "x"}},
                         "_source": "a"}, data=ds).to_pandas()
    assert list(out.columns) == ["a"]
    out2 = forge.elastic({"query": {"match_all": {}},
                          "_source": {"includes": ["a", "nope"]}},
                         data=ds).to_pandas()
    assert list(out2.columns) == ["a"]
    # size without sort: bounded page, not the full result set
    out3 = forge.elastic({"query": {"match_all": {}}, "size": 3},
                         data=ds).to_pandas()
    assert len(out3) == 3
    # _source applies on the sorted page path too
    out4 = forge.elastic({"query": {"match_all": {}},
                          "sort": [{"a": "desc"}], "size": 2,
                          "_source": ["a"]}, data=ds)
    assert list(out4.columns) == ["a"] and out4["a"].tolist() == [9, 8]


def test_sparql_dispatch_inline_prefix_named_ask(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame([("d1", "http://y/m", "x")],
                     columns=["subj", "pred", "obj"])
    q = ('PREFIX a: <http://x/> PREFIX ask: <http://y/> '
         'SELECT ?d WHERE { ?d ask:m "x" }')
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t))
    assert out.to_pandas()["d"].tolist() == ["d1"]


def test_sparql_dispatch_quads_and_update(ray_session):
    t = pd.DataFrame({"subj": ["a", "b"], "pred": ["http://v/p"] * 2,
                      "obj": ["1", "2"]})
    # a triple Dataset + update text -> functional update
    out = KnowledgeGraphForge().sparql(
        'DELETE DATA { <a> <http://v/p> "1" }', ray.data.from_pandas(t))
    assert sorted(out.to_pandas()["subj"]) == ["b"]
    # a Dataset WITH a graph column -> quad engine (GRAPH blocks work)
    q = pd.DataFrame({"graph": ["g1", "g2"], "subj": ["a", "b"],
                      "pred": ["http://v/p"] * 2, "obj": ["1", "2"]})
    got = KnowledgeGraphForge().sparql(
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://v/p> ?o } }",
        ray.data.from_pandas(q)).to_pandas()
    assert sorted(map(tuple, got.values)) == [("g1", "a"), ("g2", "b")]
