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


url_chars = st.text(
    alphabet="abcXYZ019/:?#&.=-_~", min_size=0, max_size=40)


@given(st.sampled_from(["http://", "https://", "HTTPS://", "ftp://"]),
       st.text(alphabet="aB9.-", min_size=1, max_size=20), url_chars)
@settings(max_examples=60, deadline=None)
def test_url_normalization_idempotent(scheme, host, tail):
    """normalize(normalize(u)) == normalize(u) for arbitrary URL-ish input
    — the rule chain must be a projection (safe to re-run on already-clean
    crawls)."""
    from nexus_forge_ray.ops.text import normalize_url_series
    s = pd.Series([scheme + host + tail])
    once = normalize_url_series(s)
    twice = normalize_url_series(once)
    assert once.tolist() == twice.tolist()
    # the authority never keeps uppercase
    auth = once.str.extract(r"^([a-zA-Z][\w+.-]*://[^/?#]*)",
                            expand=False).fillna("")
    assert auth.str.lower().tolist() == auth.tolist()


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=60, unique=True),
       st.sampled_from([{"train": 80, "valid": 10, "test": 10},
                        {"a": 50, "b": 50}, {"x": 100}]))
@settings(max_examples=30, deadline=None)
def test_split_assignment_exhaustive_and_key_pure(ids, splits):
    """Every key lands in exactly one split, independent of neighbors
    (the assignment is a pure function of the key)."""
    from nexus_forge_ray.ops.splits import _compile
    from nexus_forge_ray.utils import md5_u64
    bounds = _compile(splits, 100)
    h = md5_u64(pd.Series(ids).astype(str)) % np.uint64(100)

    def label(hv):
        for name, hi in bounds:
            if hv < hi:
                return name
    labels = [label(x) for x in h]
    assert all(l in splits for l in labels)
    # neighbor independence: single-element hash equals batch hash
    for i in (0, len(ids) - 1):
        solo = md5_u64(pd.Series([ids[i]]).astype(str)) % np.uint64(100)
        assert solo[0] == h[i]


@given(st.lists(st.tuples(st.integers(0, 20), st.text("abc", max_size=3)),
                min_size=0, max_size=25))
@settings(max_examples=25, deadline=None)
def test_ntriples_line_roundtrip(rows):
    """serialize -> parse is lossless for literal objects (W3C escaping)."""
    from nexus_forge_ray.sources.ntriples import parse_lines, serialize_batch
    df = pd.DataFrame({
        "subj": [f"http://ex/{k}" for k, _ in rows],
        "pred": ["http://v/p"] * len(rows),
        "obj": [v + '"\n\t\\' for _, v in rows],
        "obj_is_iri": [False] * len(rows),
        "obj_datatype": [None] * len(rows),
    })
    lines = serialize_batch(df)
    back = parse_lines(lines)
    assert back["obj"].tolist() == df["obj"].tolist()
    assert back["subj"].tolist() == df["subj"].tolist()
