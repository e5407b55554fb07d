"""Property-based tests (hypothesis) — invariants the reference's example-based
suite never checks (SURVEY §5: no property tests upstream)."""

import json

import hypothesis.strategies as st
import numpy as np
import pandas as pd
from hypothesis import given, settings

from nexus_forge_ray.core.conversions import (deflatten_record, flatten_record,
                                              from_jsonld, as_jsonld)
from nexus_forge_ray.kg.canonicalize import union_find_local
from nexus_forge_ray.mapping.rules import parse_hjson
from nexus_forge_ray.ops.dedup import MinHasher

# scalars that survive JSON round-trips exactly
scalars = st.one_of(st.integers(-10**6, 10**6), st.booleans(),
                    st.text(alphabet="abc XY.:", max_size=8))
keys = st.text(alphabet="abcdef_", min_size=1, max_size=6)
nested = st.recursive(
    st.dictionaries(keys, scalars, max_size=3),
    lambda inner: st.dictionaries(keys, st.one_of(scalars, inner), max_size=3),
    max_leaves=8)


@given(nested)
@settings(max_examples=60, deadline=None)
def test_flatten_deflatten_roundtrip(rec):
    # keys at different nesting levels may collide after dotting; skip those
    flat = flatten_record(rec)
    back = deflatten_record(flat)
    # deflatten inverts flatten whenever no empty-dict values existed
    def drop_empty(d):
        return {k: drop_empty(v) for k, v in d.items()
                if not (isinstance(v, dict) and not drop_empty(v))} \
            if isinstance(d, dict) else d
    assert back == drop_empty(rec)


@given(st.dictionaries(keys, scalars, min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_parse_hjson_accepts_json(d):
    text = json.dumps(d, indent=1)
    assert parse_hjson(text) == d


@given(st.dictionaries(keys, scalars, min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_jsonld_compact_roundtrip(rec):
    rec = {"id": "urn:x", **rec}
    doc = as_jsonld(rec, {"k": "http://x/k"})
    assert from_jsonld(doc) == rec


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=40))
@settings(max_examples=60, deadline=None)
def test_union_find_components_are_consistent(edges):
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    comp = union_find_local(df)
    # representative is reachable + minimal: comp[comp[x]] == comp[x] <= x
    for x, c in comp.items():
        assert c <= x
        assert comp.get(c, c) == c
    # endpoints of every edge share a component
    for a, b in edges:
        assert comp.get(a, a) == comp.get(b, b)


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_minhash_batch_independence(texts):
    """A doc's signature must not depend on its batch neighbors."""
    mh = MinHasher(num_perm=16)
    full = mh.signatures(texts)
    for i, t in enumerate(texts):
        solo = mh.signatures([t])[0]
        assert (full[i] == solo).all()


@given(st.text(alphabet="abcd efg", min_size=0, max_size=60))
@settings(max_examples=40, deadline=None)
def test_minhash_identical_docs_identical_sigs(t):
    mh = MinHasher(num_perm=16)
    sigs = mh.signatures([t, t, "zzz unrelated words here"])
    assert (sigs[0] == sigs[1]).all()


@given(st.dictionaries(keys, scalars, min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_jsonld_expand_compact_inverse(rec):
    """as_jsonld(expanded) then jsonld_compact is the identity for records
    whose keys are context terms or default-ns locals (M8: reverse
    compaction of IRIs back to compact terms)."""
    from nexus_forge_ray.core.conversions import jsonld_compact
    ctx = {"k": "http://x/k", "Person": "http://x/Person"}
    rec = {"id": "urn:x", "type": "Person", **rec}
    expanded = as_jsonld(rec, ctx, "expanded")
    assert jsonld_compact(expanded, ctx) == rec
