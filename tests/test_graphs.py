"""Named-graph (quad) SPARQL subset: matcher, join planner, parser."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.graphs import (match_quad, quad_select,
                                       sparql_select_quads)

from .helpers import to_pandas

V = "http://example.org/vocab/"
G = "http://example.org/graph/"


@pytest.fixture
def quads(ray_session):
    rows = pd.DataFrame([
        # g1: d1 mentions e1, lang en; d2 mentions e2
        (G + "g1", "d1", V + "mentions", "e1"),
        (G + "g1", "d1", V + "lang", "en"),
        (G + "g1", "d2", V + "mentions", "e2"),
        # g2: d3 mentions e1, lang fr; ALSO re-asserts d1->e1 (cross-graph dup)
        (G + "g2", "d3", V + "mentions", "e1"),
        (G + "g2", "d3", V + "lang", "fr"),
        (G + "g2", "d1", V + "mentions", "e1"),
    ], columns=["graph", "subj", "pred", "obj"])
    return ray.data.from_pandas(rows).repartition(2)


def test_constant_graph_scan(quads):
    got = to_pandas(match_quad(quads, (G + "g2", "?d", V + "mentions", "?e")))
    assert sorted(map(tuple, got[["d", "e"]].values)) == [
        ("d1", "e1"), ("d3", "e1")]


def test_graph_variable_binds(quads):
    q = f"""SELECT ?g ?d WHERE {{ GRAPH ?g {{ ?d <{V}lang> ?l }} }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [(G + "g1", "d1"),
                                              (G + "g2", "d3")]


def test_within_graph_join(quads):
    # the lang pattern must join in the SAME graph: d1's mention re-asserted
    # in g2 must NOT pair with d1's lang tag from g1
    q = f"""PREFIX v: <{V}>
    SELECT ?g ?d ?e WHERE {{ GRAPH ?g {{ ?d v:mentions ?e .
                                         ?d v:lang "en" }} }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [(G + "g1", "d1", "e1")]


def test_default_graph_is_union_set_semantic(quads):
    # d1->e1 asserted in g1 AND g2 is ONE triple in the union default graph
    q = f"""PREFIX v: <{V}>
    SELECT ?d ?e WHERE {{ ?d v:mentions ?e }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [
        ("d1", "e1"), ("d2", "e2"), ("d3", "e1")]


def test_mixed_default_and_graph_block(quads):
    q = f"""PREFIX v: <{V}>
    SELECT ?g ?d WHERE {{ ?d v:mentions "e1" .
                          GRAPH ?g {{ ?d v:lang ?l }} }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [(G + "g1", "d1"),
                                              (G + "g2", "d3")]


def test_prefixed_graph_name_and_limit(quads):
    q = f"""PREFIX v: <{V}>
    PREFIX g: <{G}>
    SELECT ?d ?e WHERE {{ GRAPH g:g1 {{ ?d v:mentions ?e }} }} LIMIT 1"""
    assert len(to_pandas(sparql_select_quads(quads, q))) == 1


def test_distinct(quads):
    q = f"""PREFIX v: <{V}>
    SELECT DISTINCT ?e WHERE {{ GRAPH ?g {{ ?d v:mentions ?e }} }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(got["e"]) == ["e1", "e2"]


def test_repeated_variable_in_pattern(quads, ray_session):
    rows = pd.DataFrame([(G + "g1", "x", V + "self", "x"),
                         (G + "g1", "x", V + "self", "y")],
                        columns=["graph", "subj", "pred", "obj"])
    ds = ray.data.from_pandas(rows)
    got = to_pandas(match_quad(ds, ("?g", "?n", V + "self", "?n")))
    assert got["n"].tolist() == ["x"]


def test_unsupported_clauses_raise(quads):
    with pytest.raises(ValueError, match="filter"):
        sparql_select_quads(
            quads, "SELECT ?d WHERE { ?d ?p ?o . FILTER(?o > 3) }")
    with pytest.raises(ValueError, match="cross join"):
        quad_select(quads, [(None, [("?a", V + "lang", "?b")]),
                            (None, [("?c", V + "mentions", "?d")])],
                    ["?a", "?c"])
    with pytest.raises(ValueError, match="bad graph term"):
        sparql_select_quads(
            quads, "SELECT ?d WHERE { GRAPH unknown:g { ?d ?p ?o } }")


def test_from_restricts_default_graph(quads):
    q = f"""PREFIX v: <{V}>
    SELECT ?d ?e FROM <{G}g1> WHERE {{ ?d v:mentions ?e }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    # g2's d3->e1 (and the g2 re-assertion of d1->e1) are outside FROM
    assert sorted(map(tuple, got.values)) == [("d1", "e1"), ("d2", "e2")]


def test_from_named_restricts_graph_patterns(quads):
    q = f"""PREFIX v: <{V}>
    SELECT ?g ?d FROM NAMED <{G}g2> WHERE {{ GRAPH ?g {{ ?d v:lang ?l }} }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [(G + "g2", "d3")]


def test_dataset_clause_replaces_whole_dataset(quads):
    # SPARQL 13.2: ANY dataset clause replaces the implicit dataset — FROM
    # alone leaves the named-graph set EMPTY (GRAPH matches nothing), FROM
    # NAMED alone leaves the default graph EMPTY (bare patterns match
    # nothing)
    q = f"""PREFIX v: <{V}>
    SELECT ?g ?d FROM <{G}g1> WHERE {{ GRAPH ?g {{ ?d v:lang ?l }} }}"""
    assert len(to_pandas(sparql_select_quads(quads, q))) == 0
    q = f"""PREFIX v: <{V}>
    SELECT ?d ?e FROM NAMED <{G}g1> WHERE {{ ?d v:mentions ?e }}"""
    assert len(to_pandas(sparql_select_quads(quads, q))) == 0


def test_from_clause_scoped_to_dataset_position(quads):
    # 'from' tokens inside the WHERE block (a ?from variable) must not be
    # eaten by the dataset-clause scan
    q = f"""SELECT ?from WHERE {{ ?from <{V}lang> "fr" }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert got["from"].tolist() == ["d3"]
    # prefixed graph names work in dataset clauses
    q = f"""PREFIX v: <{V}>
    PREFIX g: <{G}>
    SELECT ?d ?e FROM g:g1 WHERE {{ ?d v:mentions ?e }}"""
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(map(tuple, got.values)) == [("d1", "e1"), ("d2", "e2")]


def test_group_by_over_graph_variable(quads):
    q = f"""PREFIX v: <{V}>
    SELECT ?g (COUNT(*) AS ?n) WHERE {{ GRAPH ?g {{ ?d v:mentions ?e }} }}
    GROUP BY ?g"""
    got = to_pandas(sparql_select_quads(quads, q))
    got = got.sort_values("g").reset_index(drop=True)
    assert got["g"].tolist() == [G + "g1", G + "g2"]
    assert got["n"].tolist() == [2, 2]


def test_group_by_validation(quads):
    with pytest.raises(ValueError, match="must exactly match"):
        sparql_select_quads(
            quads, "SELECT ?d (COUNT(*) AS ?n) WHERE { GRAPH ?g "
                   "{ ?d ?p ?o } } GROUP BY ?g")
    with pytest.raises(ValueError, match="requires at least one aggregate"):
        sparql_select_quads(
            quads, "SELECT ?g WHERE { GRAPH ?g { ?d ?p ?o } } GROUP BY ?g")


def test_iri_containing_keyword_not_rejected(quads):
    # 'subgraph'/'union' inside an IRI must not trip the keyword scan
    q = f"""SELECT ?d ?o WHERE {{ ?d <{V}subgraph_union_filter> ?o }}"""
    assert len(to_pandas(sparql_select_quads(quads, q))) == 0


def test_constant_pattern_is_existence_filter(quads):
    # present constant quad: no constraint on the other pattern
    q = f"""SELECT ?d WHERE {{ GRAPH <{G}g1> {{ <d1> <{V}lang> "en" }} .
                               GRAPH <{G}g2> {{ ?d <{V}lang> ?l }} }}"""
    # NB <d1> parses as an IRI token; the fixture stores bare 'd1'
    q = q.replace("<d1>", '"d1"')
    got = to_pandas(sparql_select_quads(quads, q))
    assert sorted(got["d"]) == ["d3"]
    # absent constant quad: the whole result empties
    q2 = f"""SELECT ?d WHERE {{ GRAPH <{G}g1> {{ "d9" <{V}lang> "xx" }} .
                                GRAPH <{G}g2> {{ ?d <{V}lang> ?l }} }}"""
    assert len(to_pandas(sparql_select_quads(quads, q2))) == 0


def test_unsupported_select_items_raise(quads):
    with pytest.raises(ValueError, match="unsupported SELECT item"):
        sparql_select_quads(
            quads, "SELECT (COUNT(DISTINCT ?d) AS ?n) WHERE { GRAPH ?g "
                   "{ ?d ?p ?o } } GROUP BY ?g")
    with pytest.raises(ValueError, match="unsupported SELECT item"):
        sparql_select_quads(
            quads, "SELECT COUNT(?d) WHERE { GRAPH ?g { ?d ?p ?o } }")


def test_select_projects_in_written_order(quads):
    q = ("SELECT (COUNT(?d) AS ?n) ?g WHERE { GRAPH ?g { ?d ?p ?o } } "
         "GROUP BY ?g")
    got = to_pandas(sparql_select_quads(quads, q))
    assert list(got.columns) == ["n", "g"]
