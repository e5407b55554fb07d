"""JSON-LD 1.1 context processing / expand / compact (core/jsonld.py).

Golden cases mirror pyld's behavior for the subset the reference exercises
(kgforge/core/commons/context.py:22-71, conversions/rdf.py:128-138) —
hand-derived from the W3C JSON-LD 1.1 API spec examples, no network."""

import json

import pytest

from nexus_forge_ray.core.jsonld import (Context, ContextResolver, compact,
                                         expand, resolve_iri)

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


# ------------------------------------------------------------ IRI resolution

@pytest.mark.parametrize("base,ref,want", [
    ("http://a/b/c/d", "g", "http://a/b/c/g"),
    ("http://a/b/c/d", "./g", "http://a/b/c/g"),
    ("http://a/b/c/d", "../g", "http://a/b/g"),
    ("http://a/b/c/d", "../../g", "http://a/g"),
    ("http://a/b/c/d", "/g", "http://a/g"),
    ("http://a/b/c/d", "#f", "http://a/b/c/d#f"),
    ("http://a/b/c/d?q=1", "?x=2", "http://a/b/c/d?x=2"),
    ("http://a/b/c/d", "//other/p", "http://other/p"),
    ("http://a/b/c/d", "http://abs/x", "http://abs/x"),
    ("http://a/b/", "g/h", "http://a/b/g/h"),
])
def test_resolve_iri(base, ref, want):
    assert resolve_iri(base, ref) == want


# ------------------------------------------------------- context processing

def test_vocab_and_prefix_and_term():
    ctx = Context.parse({"@vocab": EX, "xsd": XSD,
                         "name": "http://schema.org/name",
                         "date": {"@id": "http://schema.org/d",
                                  "@type": "xsd:date"}})
    assert ctx.expand_iri("plain", vocab=True) == EX + "plain"
    assert ctx.expand_iri("name", vocab=True) == "http://schema.org/name"
    assert ctx.expand_iri("xsd:int", vocab=True) == XSD + "int"
    assert ctx.terms["date"].type == XSD + "date"


def test_recursive_prefix_definition():
    # a term defined via a sibling prefix that appears later in the same dict
    ctx = Context.parse({"foaf": "http://xmlns.com/foaf/0.1/",
                         "name": "foaf:name"})
    assert ctx.terms["name"].iri == "http://xmlns.com/foaf/0.1/name"
    # and one where the prefix is lexically after the use
    ctx2 = Context.parse({"name": "foaf:name",
                          "foaf": "http://xmlns.com/foaf/0.1/"})
    assert ctx2.terms["name"].iri == "http://xmlns.com/foaf/0.1/name"


def test_list_of_contexts_later_wins():
    ctx = Context.parse([{"a": EX + "a1"}, {"a": EX + "a2"}])
    assert ctx.terms["a"].iri == EX + "a2"


def test_null_context_resets():
    ctx = Context.parse([{"@vocab": EX, "a": EX + "a"}, None])
    assert ctx.vocab is None and not ctx.terms


def test_resolver_named_and_file(tmp_path):
    doc = {"@context": {"@vocab": EX, "title": EX + "title"}}
    p = tmp_path / "ctx.json"
    p.write_text(json.dumps(doc))
    res = ContextResolver({"https://ctx.example/v1": doc})
    ctx = Context.parse("https://ctx.example/v1", resolver=res)
    assert ctx.vocab == EX
    ctx2 = Context.parse(f"file://{p}", resolver=res)
    assert ctx2.terms["title"].iri == EX + "title"
    with pytest.raises(ValueError):
        Context.parse("https://unknown.example/ctx", resolver=res)


# ------------------------------------------------------------------- expand

def test_expand_basic_vocab_and_id_base():
    doc = {"@context": {"@vocab": EX, "@base": "http://base.org/docs/"},
           "@id": "item1", "name": "n", "count": 3}
    [out] = expand(doc)
    assert out["@id"] == "http://base.org/docs/item1"
    assert out[EX + "name"] == [{"@value": "n"}]
    assert out[EX + "count"] == [{"@value": 3}]


def test_expand_keyword_alias_and_type():
    doc = {"@context": {"id": "@id", "type": "@type", "@vocab": EX},
           "id": "http://x/1", "type": "Person"}
    [out] = expand(doc)
    assert out["@id"] == "http://x/1"
    assert out["@type"] == [EX + "Person"]


def test_expand_type_coercion_id_and_datatype():
    doc = {"@context": {"knows": {"@id": EX + "knows", "@type": "@id"},
                        "born": {"@id": EX + "born",
                                 "@type": XSD + "date"},
                        "@base": "http://b/"},
           "knows": "p2", "born": "1990-01-01"}
    [out] = expand(doc)
    assert out[EX + "knows"] == [{"@id": "http://b/p2"}]
    assert out[EX + "born"] == [{"@value": "1990-01-01",
                                 "@type": XSD + "date"}]


def test_expand_list_set_containers():
    doc = {"@context": {"tags": {"@id": EX + "t", "@container": "@list"},
                        "alts": {"@id": EX + "a", "@container": "@set"}},
           "tags": ["x", "y"], "alts": "one"}
    [out] = expand(doc)
    assert out[EX + "t"] == [{"@list": [{"@value": "x"}, {"@value": "y"}]}]
    assert out[EX + "a"] == [{"@value": "one"}]


def test_expand_language_map_and_default_language():
    doc = {"@context": {"@language": "en",
                        "label": {"@id": EX + "l",
                                  "@container": "@language"}},
           "label": {"en": "cat", "fr": "chat"}, EX + "note": "hi"}
    [out] = expand(doc)
    assert {"@value": "cat", "@language": "en"} in out[EX + "l"]
    assert {"@value": "chat", "@language": "fr"} in out[EX + "l"]
    assert out[EX + "note"] == [{"@value": "hi", "@language": "en"}]


def test_expand_reverse_term_and_block():
    doc = {"@context": {"parentOf": {"@reverse": EX + "childOf"}},
           "@id": EX + "p", "parentOf": {"@id": EX + "c"},
           "@reverse": {EX + "knows": {"@id": EX + "k"}}}
    [out] = expand(doc)
    assert out["@reverse"][EX + "childOf"] == [{"@id": EX + "c"}]
    assert out["@reverse"][EX + "knows"] == [{"@id": EX + "k"}]


def test_expand_scoped_context():
    doc = {"@context": {"@vocab": EX,
                        "detail": {"@id": EX + "detail",
                                   "@context": {"@vocab": "http://inner/"}}},
           "detail": {"leaf": 1}, "top": 2}
    [out] = expand(doc)
    inner = out[EX + "detail"][0]
    assert inner["http://inner/leaf"] == [{"@value": 1}]
    assert out[EX + "top"] == [{"@value": 2}]


def test_expand_nulled_term_dropped():
    doc = {"@context": {"@vocab": EX, "secret": None},
           "secret": "x", "keep": "y"}
    [out] = expand(doc)
    assert EX + "secret" not in out
    assert out[EX + "keep"] == [{"@value": "y"}]


def test_expand_non_iri_key_without_vocab_dropped():
    [out] = expand({"@id": EX + "1", "plain": "dropped",
                    EX + "kept": "v"})
    assert EX + "kept" in out and "plain" not in out


def test_expand_index_container():
    doc = {"@context": {"post": {"@id": EX + "post",
                                 "@container": "@index"}},
           "post": {"a": {"@id": EX + "p1"}, "b": {"@id": EX + "p2"}}}
    [out] = expand(doc)
    assert {"@id": EX + "p1", "@index": "a"} in out[EX + "post"]


# ------------------------------------------------------------------ compact

CTX_FULL = {
    "@vocab": EX,
    "@base": EX,
    "xsd": XSD,
    "id": "@id",
    "type": "@type",
    "knows": {"@id": EX + "knows", "@type": "@id"},
    "born": {"@id": EX + "born", "@type": XSD + "date"},
    "tags": {"@id": EX + "tag", "@container": "@list"},
    "label": {"@id": EX + "label", "@container": "@language"},
    "parentOf": {"@reverse": EX + "childOf"},
}


def test_compact_golden():
    expanded = [{
        "@id": EX + "p1",
        "@type": [EX + "Person"],
        EX + "knows": [{"@id": EX + "p2"}],
        EX + "born": [{"@value": "1990-01-01", "@type": XSD + "date"}],
        EX + "tag": [{"@list": [{"@value": "a"}, {"@value": "b"}]}],
        EX + "label": [{"@value": "cat", "@language": "en"},
                       {"@value": "chat", "@language": "fr"}],
        "@reverse": {EX + "childOf": [{"@id": EX + "kid"}]},
    }]
    out = compact(expanded, CTX_FULL)
    assert out["id"] == "p1"         # base-relative (@id never uses @vocab)
    assert out["type"] == "Person"
    assert out["knows"] == "p2"
    assert out["born"] == "1990-01-01"
    assert out["tags"] == ["a", "b"]
    assert out["label"] == {"en": "cat", "fr": "chat"}
    assert out["parentOf"] == {"id": "kid"}


def test_compact_curie_fallback():
    out = compact([{XSD + "custom": [{"@value": 1}]}], {"xsd": XSD})
    assert out["xsd:custom"] == 1


def test_compact_keeps_explicit_value_when_type_mismatch():
    out = compact([{EX + "born": [{"@value": "x",
                                   "@type": XSD + "gYear"}]}], CTX_FULL)
    # 'born' coerces xsd:date; a gYear literal can't use the term bare
    v = out.get("born") or out.get("xsd:gYear") or out
    assert isinstance(out[[k for k in out if k != "@context"][0]], dict)


def test_roundtrip_expand_compact():
    doc = {"@context": CTX_FULL, "id": EX + "p1", "type": "Person",
           "knows": "http://other/p9", "born": "1990-01-01",
           "tags": ["a", "b", "a"], "name": "Ada",
           "label": {"en": "cat", "fr": "chat"}}
    out = compact(expand(doc), CTX_FULL)
    assert out["type"] == "Person"
    assert out["tags"] == ["a", "b", "a"]          # list order + dup kept
    assert out["born"] == "1990-01-01"
    assert out["name"] == "Ada"
    assert out["label"] == {"en": "cat", "fr": "chat"}
    # second pass is a fixpoint
    out2 = compact(expand(out), CTX_FULL)
    assert {k: v for k, v in out2.items() if k != "@context"} == \
           {k: v for k, v in out.items() if k != "@context"}


def test_expand_idempotent_on_expanded():
    doc = {"@context": CTX_FULL, "id": EX + "p1", "knows": "http://o/p2"}
    once = expand(doc)
    assert expand(once[0]) == once


def test_nested_node_roundtrip():
    ctx = {"@vocab": EX, "id": "@id",
           "address": {"@id": EX + "addr"}}
    doc = {"@context": ctx, "id": EX + "1",
           "address": {"id": EX + "a1", "city": "Geneva", "zip": 1201}}
    [exp] = expand(doc)
    node = exp[EX + "addr"][0]
    assert node["@id"] == EX + "a1"
    assert node[EX + "city"] == [{"@value": "Geneva"}]
    back = compact([exp], ctx)
    assert back["address"]["city"] == "Geneva"
    assert back["address"]["zip"] == 1201


# ------------------------------------------------------- forge + dataset

def test_forge_jsonld_expand_compact():
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge(context=CTX_FULL)
    doc = {"id": "p1", "type": "Person", "knows": "p2",
           "born": "1990-01-01"}
    [exp] = forge.jsonld_expand(doc)
    assert exp["@id"] == EX + "p1"
    assert exp[EX + "knows"] == [{"@id": EX + "p2"}]
    back = forge.jsonld_compact(forge.jsonld_expand(doc))
    assert back["knows"] == "p2" and back["born"] == "1990-01-01"


def test_forge_string_context_via_documents():
    from nexus_forge_ray.forge import KnowledgeGraphForge
    ctx_doc = {"@context": {"@vocab": EX, "name": EX + "name"}}
    forge = KnowledgeGraphForge(
        context="https://ctx.example/model",
        context_documents={"https://ctx.example/model": ctx_doc})
    assert forge.context["name"] == EX + "name"


def test_jsonld_normalize_dataset(ray_session):
    import ray.data
    from nexus_forge_ray.core.conversions import jsonld_normalize_dataset
    model_ctx = CTX_FULL
    rows = [
        # doc in a foreign context: different term for the same IRI
        {"record": {"@context": {"buddy": {"@id": EX + "knows",
                                           "@type": "@id"},
                                 "@base": EX},
                    "@id": "p1", "buddy": "p2"}},
        # doc already in the model context
        {"record": {"@context": CTX_FULL, "id": "p3", "born": "1990-01-01"}},
    ]
    ds = ray.data.from_items(rows)
    out = jsonld_normalize_dataset(ds, model_ctx).to_pandas()
    recs = {r["id"]: r for r in out["record"]}
    assert recs["p1"]["knows"] == "p2"       # foreign term -> model term
    assert recs["p3"]["born"] == "1990-01-01"


# ------------------------------------------------- @nest + @json (round 4)


def test_nest_flattens_properties():
    from nexus_forge_ray.core.jsonld import expand
    doc = {
        "@context": {"@vocab": "http://v/", "meta": "@nest"},
        "@id": "http://x/1",
        "name": "top",
        "meta": {"score": 5, "tag": "a"},
    }
    out = expand(doc)[0]
    assert out["http://v/score"] == [{"@value": 5}]
    assert out["http://v/tag"] == [{"@value": "a"}]
    assert "meta" not in out and "@nest" not in out


def test_nest_literal_keyword_and_list():
    from nexus_forge_ray.core.jsonld import expand
    doc = {
        "@context": {"@vocab": "http://v/"},
        "@nest": [{"a": 1}, {"a": 2, "b": "x"}],
    }
    out = expand(doc)[0]
    assert out["http://v/a"] == [{"@value": 1}, {"@value": 2}]
    assert out["http://v/b"] == [{"@value": "x"}]


def test_nest_rejects_value_objects():
    import pytest as _pytest

    from nexus_forge_ray.core.jsonld import expand
    doc = {"@context": {"@vocab": "http://v/"},
           "@nest": {"@value": 3}}
    with _pytest.raises(ValueError):
        expand(doc)


def test_json_literal_roundtrip():
    from nexus_forge_ray.core.jsonld import compact, expand
    ctx = {"@vocab": "http://v/",
           "blob": {"@id": "http://v/blob", "@type": "@json"}}
    raw = {"k": [1, {"deep": True}], "s": "txt"}
    doc = {"@context": ctx, "blob": raw}
    out = expand(doc)[0]
    assert out["http://v/blob"] == [{"@value": raw, "@type": "@json"}]
    # compaction restores the raw JSON verbatim under the typed term
    back = compact(out, ctx)
    assert back["blob"] == raw


def test_nest_roundtrip_flat():
    # expand(compact(expand(doc))) is stable: compaction emits the FLAT
    # form, whose re-expansion equals the nested doc's expansion
    from nexus_forge_ray.core.jsonld import compact, expand
    ctx = {"@vocab": "http://v/", "meta": "@nest"}
    doc = {"@context": ctx, "@id": "http://x/1",
           "meta": {"score": 5}, "name": "n"}
    exp1 = expand(doc)
    flat = compact(exp1, ctx)
    assert flat["score"] == 5 and flat["name"] == "n"
    exp2 = expand(flat)
    assert exp1 == exp2
