"""Property test: the grouped-path compiler vs a brute-force reference.

Random small digraphs + random path ASTs; `compile_path_edges` (distributed:
bucketed joins, unions, iterated-doubling closure) must produce exactly the
pair set a naive set-algebra evaluator computes. Closure semantics mirror
`kg.closure.transitive_closure`: `+` excludes zero-length self pairs unless
they lie on a cycle reached by a path of length >= 1 through DISTINCT
endpoints — i.e. the closure of the relation without the (a, a) identity
(the doubling join drops a == b pairs, matching the engine; the reference
below composes relations the same way).
"""

import hypothesis.strategies as st
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings

from nexus_forge_ray.kg.bgp import compile_path_edges

PREDS = ["p", "q", "r"]
NODES = list("abcde")


def ref_atom(edges, pred):
    return {(s, o) for s, p, o in edges if p == pred}


def ref_eval(ast, edges, all_nodes):
    kind = ast[0]
    if kind == "atom":
        return ref_atom(edges, ast[1])
    if kind == "neg":
        return {(s, o) for s, p, o in edges if p not in ast[1]}
    if kind == "inv":
        return {(o, s) for s, o in ref_eval(ast[1], edges, all_nodes)}
    if kind == "seq":
        cur = ref_eval(ast[1][0], edges, all_nodes)
        for part in ast[1][1:]:
            nxt = ref_eval(part, edges, all_nodes)
            cur = {(a, c) for a, b in cur for b2, c in nxt if b == b2}
        return cur
    if kind == "alt":
        out = set()
        for part in ast[1]:
            out |= ref_eval(part, edges, all_nodes)
        return out
    if kind in ("plus", "star", "opt"):
        base = ref_eval(ast[1], edges, all_nodes)
        if kind == "opt":
            return base | {(n, n) for n in all_nodes}
        # transitive closure via doubling, dropping a==b pairs exactly as
        # kg.closure.transitive_closure does
        paths = set(base)
        while True:
            new = {(a, c) for a, b in paths for b2, c in paths
                   if b == b2 and a != c}
            merged = paths | new
            if merged == paths:
                break
            paths = merged
        if kind == "star":
            return paths | {(n, n) for n in all_nodes}
        return paths


def serialize(ast) -> str:
    kind = ast[0]
    if kind == "atom":
        return f"<{ast[1]}>"
    if kind == "neg":
        return "!(" + "|".join(f"<{a}>" for a in ast[1]) + ")"
    if kind == "inv":
        return "^(" + serialize(ast[1]) + ")"
    if kind == "seq":
        return "(" + "/".join(serialize(p) for p in ast[1]) + ")"
    if kind == "alt":
        return "(" + "|".join(serialize(p) for p in ast[1]) + ")"
    return "(" + serialize(ast[1]) + ")" + \
        {"plus": "+", "star": "*", "opt": "?"}[kind]


atoms = st.sampled_from(PREDS).map(lambda p: ("atom", p))
paths = st.recursive(
    atoms,
    lambda inner: st.one_of(
        st.tuples(st.just("inv"), inner),
        st.tuples(st.just("plus"), inner),
        st.tuples(st.just("opt"), inner),
        st.lists(inner, min_size=2, max_size=3).map(lambda l: ("seq", l)),
        st.lists(inner, min_size=2, max_size=3).map(lambda l: ("alt", l)),
    ),
    max_leaves=5)

edge_sets = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(PREDS),
              st.sampled_from(NODES)),
    min_size=1, max_size=10, unique=True)


@pytest.mark.usefixtures("ray_session")
@given(edges=edge_sets, ast=paths)
@settings(max_examples=25, deadline=None)
def test_path_compiler_matches_reference(edges, ast):
    tdf = pd.DataFrame(edges, columns=["subj", "pred", "obj"])
    ds = ray.data.from_pandas(tdf)
    expr = serialize(ast)
    got_df = compile_path_edges(ds, expr, num_buckets=2).to_pandas()
    got = set(map(tuple, got_df.drop_duplicates().to_numpy())) \
        if len(got_df) else set()
    all_nodes = set(tdf["subj"]) | set(tdf["obj"])
    want = ref_eval(ast, edges, all_nodes)
    # alt/seq keep duplicates in the engine (bag semantics); compare sets
    assert got == want, f"{expr}: {sorted(got)} != {sorted(want)}"
