"""Triple explode semantics (rdf.py:275-354 equivalents) + framing inverse."""

import pandas as pd

from nexus_forge_ray.kg.triples import (RDF_TYPE, XSD_INT, XSD_STRING,
                                        explode_record, triples_batch)

CTX = {"name": "http://schema.org/name"}


def test_scalar_and_type_triples():
    t = explode_record({"id": "urn:r1", "type": "Person", "name": "Jane",
                        "age": 30}, CTX)
    d = {(s, p): (o, iri, dt) for s, p, o, iri, dt in t}
    assert d[("urn:r1", RDF_TYPE)][0].endswith("Person")
    assert d[("urn:r1", "http://schema.org/name")] == ("Jane", False, XSD_STRING)
    assert d[("urn:r1", "http://example.org/vocab/age")] == ("30", False, XSD_INT)


def test_list_emits_one_triple_per_element():
    t = explode_record({"id": "urn:r1", "tags": ["a", "b"]})
    objs = sorted(o for s, p, o, *_ in t if p.endswith("tags"))
    assert objs == ["a", "b"]


def test_nested_with_id_links_and_recurses():
    t = explode_record({"id": "urn:r1",
                        "agent": {"id": "urn:p1", "name": "J"}}, CTX)
    assert ("urn:r1", "http://example.org/vocab/agent", "urn:p1", True, None) in t
    assert ("urn:p1", "http://schema.org/name", "J", False, XSD_STRING) in t


def test_nested_without_id_gets_skolem():
    t = explode_record({"id": "urn:r1", "address": {"city": "Geneva"}})
    edge = [x for x in t if x[1].endswith("address")][0]
    assert edge[2] == "urn:r1#address0"
    assert ("urn:r1#address0", "http://example.org/vocab/city", "Geneva",
            False, XSD_STRING) in t


def test_iri_object_detection_and_reserved_skipped():
    t = explode_record({"id": "urn:r1", "link": "http://x.org/y",
                        "_internal": "hidden"})
    assert ("urn:r1", "http://example.org/vocab/link", "http://x.org/y",
            True, None) in t
    assert not any("_internal" in p for _, p, *_ in t)


def test_record_without_id_dropped_in_batch():
    df = triples_batch([{"name": "no-id"}, {"id": "urn:ok", "name": "x"}])
    assert set(df["subj"]) == {"urn:ok"}


def test_none_values_skipped():
    t = explode_record({"id": "urn:r1", "p": None})
    assert len(t) == 0


# ---- framing + compaction round-trip (reference from_graph, rdf.py:100-140)

def test_assemble_framing_compaction_roundtrip():
    """explode -> assemble(context, embed) -> explode is a fixpoint: the
    re-exploded triple set equals the original, and the assembled record
    compacts predicates/types back to context terms with revived literals."""
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.triples import (assemble_resources, explode_record,
                                            triples_batch)

    ctx = {"name": "http://schema.org/name",
           "age": "http://schema.org/age",
           "address": "http://schema.org/address",
           "city": "http://schema.org/addressLocality",
           "Person": "http://schema.org/Person",
           "PostalAddress": "http://schema.org/PostalAddress"}
    rec = {"id": "urn:p1", "type": "Person", "name": "Jane", "age": 41,
           "address": {"type": "PostalAddress", "city": "Geneva"}}
    tri = triples_batch([rec], ctx)
    ds = ray.data.from_pandas(tri)
    out = assemble_resources(ds, context=ctx, embed=True).to_pandas()
    assert len(out) == 1  # the skolem child is embedded, not top-level
    got = out["record"][0]
    assert got["type"] == "Person" and got["name"] == "Jane" and got["age"] == 41
    assert got["address"]["type"] == "PostalAddress"
    assert got["address"]["city"] == "Geneva"
    # fixpoint: re-exploding the assembled record yields the same triples
    tri2 = pd.DataFrame(explode_record(got, ctx),
                        columns=tri.columns)
    key = ["subj", "pred", "obj"]
    a = tri[key].sort_values(key).reset_index(drop=True)
    b = tri2[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_assemble_frame_by_type():
    import ray.data
    from nexus_forge_ray.kg.triples import assemble_resources, triples_batch
    ctx = {"Person": "http://schema.org/Person",
           "Org": "http://schema.org/Org"}
    tri = triples_batch([{"id": "urn:p1", "type": "Person", "a": "x"},
                         {"id": "urn:o1", "type": "Org", "a": "y"}], ctx)
    out = assemble_resources(ray.data.from_pandas(tri), context=ctx,
                             types=["Person"]).to_pandas()
    assert out["subj"].tolist() == ["urn:p1"]
