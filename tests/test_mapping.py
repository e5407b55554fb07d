"""Mapping engine semantics vs the reference's golden mapper test
(tests/specializations/mappers/test_mappers.py:27-58)."""

import pandas as pd
import pytest

from nexus_forge_ray.mapping.mapper import (AttrDict, DictionaryMapper,
                                            RuleContext, prune_nas)
from nexus_forge_ray.mapping.rules import Mapping, parse_hjson

HJSON_RULES = """
{
    type: Association
    agent:
    {
        type: Person
        name: f"{x.name}"
    }
    description: x.description
    fixed: a literal value
}
"""

RECORD = {"id": "123", "name": "Jane Doe", "description": "dev"}


def test_parse_hjson_block():
    rules = parse_hjson(HJSON_RULES)
    assert rules["type"] == "Association"
    assert rules["agent"]["name"] == 'f"{x.name}"'
    assert rules["fixed"] == "a literal value"


def test_parse_hjson_inline_and_arrays():
    rules = parse_hjson('{\n a: [\n 1\n 2\n ]\n b: {"k": "v"}\n n: 7\n}')
    assert rules["a"] == [1, 2]
    assert rules["b"] == {"k": "v"}
    assert rules["n"] == 7


def test_map_record_reference_semantics():
    mapper = DictionaryMapper(HJSON_RULES)
    out = mapper.map_record(RECORD)
    # eval'd leaves
    assert out["agent"]["name"] == "Jane Doe"
    assert out["description"] == "dev"
    # non-evaluable leaves stay literal (dictionaries.py:59-62)
    assert out["type"] == "Association"
    assert out["agent"]["type"] == "Person"
    assert out["fixed"] == "a literal value"


def test_missing_field_is_error_row_not_crash():
    mapper = DictionaryMapper({"name": "x.missing_field"})
    df = mapper(pd.DataFrame([RECORD]))
    assert df["_error"][0] is not None and "AttributeError" in df["_error"][0]


def test_forge_format_and_na_dropping():
    forge = RuleContext(formatters={"identifier": "https://kg.example.ch/{}/{}"})
    mapper = DictionaryMapper(
        {"id": 'forge.format("identifier", "persons", x.id)',
         "gone": 'x.maybe if "maybe" in x else ""'},
        forge=forge, nas=("",))
    out = mapper.map_record({"id": "42"})
    assert out["id"] == "https://kg.example.ch/persons/42"
    assert "gone" not in out  # na value dropped (conversions/json.py:27-40)


def test_conditional_type_idiom():
    mapper = DictionaryMapper({"type": "x.type if 'type' in x else ''"})
    assert mapper.map_record({"type": "Person"})["type"] == "Person"
    assert mapper.map_record({"id": "1"})["type"] == ""


def test_attrdict_nested():
    x = AttrDict({"a": {"b": [1, 2]}, "c": "z"})
    assert x.a.b == [1, 2]
    assert "c" in x
    with pytest.raises(AttributeError):
        _ = x.nope


def test_inline_resolve_in_rules():
    kb = [{"id": "E1", "type": "Class", "label": "alpha"}]
    from nexus_forge_ray.resolving.dictionary import DictionaryResolver
    from nexus_forge_ray.resolving.strategies import ResolvingStrategy
    resolver = DictionaryResolver(kb)

    def inline(text, **kw):
        r = resolver.resolve(text, ResolvingStrategy.EXACT_MATCH)
        return r["id"] if r else None

    mapper = DictionaryMapper({"entity": 'forge.resolve(x.term)'},
                              forge=RuleContext(resolver=inline))
    assert mapper.map_record({"term": "alpha"})["entity"] == "E1"
