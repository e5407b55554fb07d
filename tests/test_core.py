"""Reshaping, conversions (JSON-LD / DataFrame / parse_type), filters, PROV."""

import pandas as pd
import pytest

from nexus_forge_ray.core import prov
from nexus_forge_ray.core.conversions import (as_jsonld, dataframe_to_records,
                                              deflatten_record, flatten_record,
                                              from_jsonld, parse_type,
                                              records_to_dataframe)
from nexus_forge_ray.core.filters import (Filter, apply_filters_frame,
                                          filters_from_dict, search)
from nexus_forge_ray.core.reshaping import (collect_values, reshape_record,
                                            reshape_dataset)

REC = {"id": "r1", "type": "Dataset", "name": "n",
       "agent": {"id": "a1", "name": "Jane", "address": {"city": "Geneva"}},
       "distribution": [{"contentUrl": "http://x/1"},
                        {"contentUrl": "http://x/2"}]}


# ----------------------------------------------------------------- reshaping

def test_reshape_keeps_listed_paths():
    out = reshape_record(REC, ["id", "agent.name", "missing.path"])
    assert out == {"id": "r1", "agent": {"name": "Jane"}}


def test_reshape_nested_two_levels():
    out = reshape_record(REC, ["agent.address.city"])
    assert out == {"agent": {"address": {"city": "Geneva"}}}


def test_collect_values_fans_out_lists():
    assert collect_values(REC, "distribution.contentUrl") == \
        ["http://x/1", "http://x/2"]
    assert collect_values(REC, "agent.name") == ["Jane"]
    assert collect_values(REC, "nope.deep") == []


def test_reshape_dataset_flat_projection(sf_dir):
    import ray.data
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    out = reshape_dataset(ds, ["c_custkey", "c_name"])
    assert set(out.schema().names) == {"c_custkey", "c_name"}


# --------------------------------------------------------------- conversions

def test_parse_type_cases():
    assert parse_type("2023-01-15T10:00:00Z") == "datetime"
    assert parse_type("2023-01-15") == "datetime"
    assert parse_type("3.14") == "number"
    assert parse_type(42) == "number"
    assert parse_type(True) == "boolean"
    assert parse_type("false") == "boolean"
    assert parse_type("hello") == "literal"


def test_jsonld_roundtrip_compacted():
    ctx = {"name": "http://schema.org/name"}
    doc = as_jsonld({"id": "r1", "type": "Person", "name": "J"}, ctx)
    assert doc["@id"] == "r1" and doc["@type"] == "Person"
    assert doc["@context"] == ctx
    back = from_jsonld(doc)
    assert back == {"id": "r1", "type": "Person", "name": "J"}


def test_jsonld_expanded_terms_to_iris():
    ctx = {"name": "http://schema.org/name"}
    doc = as_jsonld({"id": "r1", "type": "Person", "name": "J"}, ctx,
                    form="expanded")
    assert doc["http://schema.org/name"] == [{"@value": "J"}]
    assert doc["@type"][0].endswith("Person")


def test_dataframe_flatten_roundtrip():
    recs = [{"id": "1", "agent": {"name": "A", "address": {"city": "X"}}},
            {"id": "2", "agent": {"name": "B"}}]
    df = records_to_dataframe(recs)
    assert "agent.address.city" in df.columns
    back = dataframe_to_records(df)
    assert back[0] == recs[0]
    assert back[1] == {"id": "2", "agent": {"name": "B"}}  # nan dropped


def test_flatten_deflatten_units():
    flat = flatten_record({"a": {"b": {"c": 1}}, "d": 2})
    assert flat == {"a.b.c": 1, "d": 2}
    assert deflatten_record(flat) == {"a": {"b": {"c": 1}}, "d": 2}


# ------------------------------------------------------------------- filters

def test_filters_from_dict_nested():
    fs = filters_from_dict({"agent": {"name": "Jane"}, "type": "Dataset"})
    assert (tuple(fs[0].path), fs[0].operator, fs[0].value) == \
        (("agent", "name"), "__eq__", "Jane")


def test_apply_filters_frame_ops():
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]})
    assert apply_filters_frame(df, [Filter("a", "__gt__", 1)])["a"].tolist() == [2, 3]
    assert apply_filters_frame(df, [Filter("b", "__eq__", "x"),
                                    Filter("a", "__le__", 1)])["a"].tolist() == [1]
    assert apply_filters_frame(df, [Filter("zz", "__eq__", 1)]).empty


def test_search_dataset_with_deprecated_filter():
    import ray.data
    df = pd.DataFrame({"id": ["a", "b", "c"], "v": [1, 2, 3],
                       "deprecated": [False, True, False]})
    ds = ray.data.from_pandas(df)
    out = search(ds, Filter("v", "__ge__", 1)).to_pandas()
    assert out["id"].tolist() == ["a", "c"]  # b dropped: deprecated
    out2 = search(ds, {"v": 2}, include_deprecated=True).to_pandas()
    assert out2["id"].tolist() == ["b"]


# ---------------------------------------------------------------------- PROV

def test_prov_builders():
    r = {"id": "d1", "type": "Dataset"}
    r = prov.add_parts(r, ["p1", "p2"])
    r = prov.add_distribution(r, "http://files/x.parquet", "application/parquet")
    r = prov.add_contribution(r, "agent:1")
    r = prov.add_derivation(r, "src:1", version=3)
    r = prov.add_generation(r, "act:1")
    r = prov.add_invalidation(r, "act:2")
    assert [p["id"] for p in r["hasPart"]] == ["p1", "p2"]
    assert r["distribution"][0]["contentUrl"] == "http://files/x.parquet"
    assert r["derivation"][0]["entity"]["id"] == "src:1?_version=3"
    assert r["generation"][0]["activity"]["id"] == "act:1"
    assert r["contribution"][0]["agent"]["id"] == "agent:1"
    assert r["invalidation"][0]["activity"]["id"] == "act:2"


def test_store_search_with_filters(tmp_path):
    from nexus_forge_ray.store import ParquetStore
    st = ParquetStore(str(tmp_path / "s"))
    st.register({"id": "r1", "type": "Person", "name": "Jane",
                 "address": {"city": "Geneva"}})
    st.register({"id": "r2", "type": "Person", "name": "Joe"})
    st.register({"id": "r3", "type": "Org", "name": "ACME"})
    st.deprecate("r2")
    hits = st.search({"type": "Person"})
    assert [h["data"]["id"] for h in hits] == ["r1"]  # r2 deprecated
    hits = st.search(Filter(("address", "city"), "__eq__", "Geneva"))
    assert [h["data"]["id"] for h in hits] == ["r1"]
    hits = st.search({"type": "Person"}, include_deprecated=True)
    assert {h["data"]["id"] for h in hits} == {"r1", "r2"}


# ---- dynamic class import-by-name (imports.py:22-39, SURVEY §2.10)

def test_import_class_default_and_from_syntax():
    from nexus_forge_ray.core.imports import ConfigurationError, import_class
    from nexus_forge_ray.resolving.dictionary import DictionaryResolver
    assert import_class("DictionaryResolver", "resolvers") is DictionaryResolver
    cls = import_class(
        "OntologyResolver from nexus_forge_ray.resolving.ontology",
        "resolvers")
    from nexus_forge_ray.resolving.ontology import OntologyResolver
    assert cls is OntologyResolver
    import pytest
    with pytest.raises(ConfigurationError, match="module not found"):
        import_class("X from no.such.module", "stores")
    with pytest.raises(ConfigurationError, match="class not found"):
        import_class("Nope", "resolvers")
    with pytest.raises(ConfigurationError, match="incorrect"):
        import_class("bad syntax here!", "models")


def test_deflatten_na_matches_by_equality():
    import numpy as np
    from nexus_forge_ray.core.conversions import (dataframe_to_records,
                                                  records_to_dataframe)
    recs = [{"a": 1}, {"a": 2, "b": {"c": 3}}]
    df = records_to_dataframe(recs, na=-1)
    # the filler comes back as np.float64(-1.0) — equality must drop it
    assert isinstance(df.loc[0, "b.c"], (float, np.floating))
    back = dataframe_to_records(df, na=-1)
    assert back[0] == {"a": 1}
    assert back[1]["b"] == {"c": 3}
    # nested-key collision regression: a kept filler used to crash deflatten
    recs2 = [{"a": 1}, {"a": {"b": 2}}]
    df2 = records_to_dataframe(recs2, na="x" + "y")   # non-interned string
    back2 = dataframe_to_records(df2, na="xy")
    assert back2[0] == {"a": 1} and back2[1] == {"a": {"b": 2}}


def test_merge_contexts_later_wins_consistently():
    from nexus_forge_ray.core.conversions import merge_contexts
    assert merge_contexts("http://a/", "http://b/") == {"@vocab": "http://b/"}
    assert merge_contexts("http://a/", ["http://b/"]) == \
        {"@vocab": "http://b/"}


def test_jsonld_compact_default_ns_type():
    from nexus_forge_ray.core.conversions import as_jsonld, jsonld_compact
    ctx = {"name": "http://schema.org/name"}
    rec = {"id": "urn:x", "type": "Person", "name": "n"}
    expanded = as_jsonld(rec, ctx, "expanded")
    assert jsonld_compact(expanded, ctx) == rec   # documented inverse


def test_jsonld_expand_dataset_keeps_other_columns(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.core.conversions import jsonld_expand_dataset
    ds = ray.data.from_pandas(pd.DataFrame({
        "url": ["u1"], "record": [{"id": "urn:1", "name": "x"}]}))
    out = jsonld_expand_dataset(ds, {"name": "http://schema.org/name"}) \
        .to_pandas()
    assert list(out.columns) == ["url", "record"]
    assert out.loc[0, "url"] == "u1"
