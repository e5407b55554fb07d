"""SPARQL 1.1 Update: functional graph updates over the triple table."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.update import sparql_update


@pytest.fixture()
def graph():
    return ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b", "c", "c"],
        "pred": ["http://v/old", "http://v/keep", "http://v/old",
                 "http://v/x", "http://v/x"],
        "obj": ["1", "2", "3", "4", "4"],   # duplicate row: set semantics
    }))


def _rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["subj", "pred", "obj"]].values.tolist()))


def test_insert_data_dedupes(graph):
    out = sparql_update(
        graph, 'PREFIX v: <http://v/> INSERT DATA '
               '{ <d> v:new "9" . <a> v:keep "2" }')
    rows = _rows(out)
    assert ("d", "http://v/new", "9") in rows
    # existing duplicate collapsed + re-inserted row not duplicated
    assert rows.count(("a", "http://v/keep", "2")) == 1
    assert rows.count(("c", "http://v/x", "4")) == 1
    assert len(rows) == 5


def test_delete_data(graph):
    out = sparql_update(
        graph, 'PREFIX v: <http://v/> DELETE DATA { <c> v:x "4" }')
    rows = _rows(out)
    assert all(s != "c" for s, _, _ in rows)
    assert len(rows) == 3


def test_delete_where(graph):
    out = sparql_update(
        graph, 'PREFIX v: <http://v/> DELETE WHERE { ?s v:old ?o }')
    assert sorted({p for _, p, _ in _rows(out)}) == \
        ["http://v/keep", "http://v/x"]


def test_delete_insert_where_rename(graph):
    out = sparql_update(
        graph, 'PREFIX v: <http://v/> DELETE { ?s v:old ?o } '
               'INSERT { ?s v:new ?o } WHERE { ?s v:old ?o }')
    rows = _rows(out)
    assert ("a", "http://v/new", "1") in rows and \
           ("b", "http://v/new", "3") in rows
    assert all(p != "http://v/old" for _, p, _ in rows)


def test_insert_where_with_filter(graph):
    out = sparql_update(
        graph, 'PREFIX v: <http://v/> INSERT { ?s v:flag "hi" } '
               'WHERE { ?s v:old ?o . FILTER(?o > "1") }')
    rows = _rows(out)
    assert ("b", "http://v/flag", "hi") in rows      # obj "3" > "1"
    assert ("a", "http://v/flag", "hi") not in rows  # obj "1" fails filter


def test_constant_templates_rejected(graph):
    with pytest.raises(ValueError):
        sparql_update(graph, 'INSERT DATA { ?s <http://v/p> "x" }')
    with pytest.raises(ValueError):
        sparql_update(graph, 'PREFIX v: <http://v/> '
                             'INSERT { <k> v:p "x" } WHERE { ?s v:old ?o }')


def test_update_matches_duckdb_oracle(graph):
    """DELETE/INSERT rename vs the set-algebra SQL it is equivalent to."""
    import duckdb
    out = pd.DataFrame(_rows(sparql_update(
        graph, 'PREFIX v: <http://v/> DELETE { ?s v:old ?o } '
               'INSERT { ?s v:new ?o } WHERE { ?s v:old ?o }')),
        columns=["subj", "pred", "obj"])
    base = graph.to_pandas()
    want = duckdb.sql("""
        SELECT DISTINCT subj, pred, obj FROM (
            SELECT subj, pred, obj FROM base WHERE pred <> 'http://v/old'
            UNION ALL
            SELECT subj, 'http://v/new' AS pred, obj FROM base
            WHERE pred = 'http://v/old')
        ORDER BY subj, pred, obj
    """).df()
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)


def test_upsert_subjects_replaces_wholesale(graph):
    from nexus_forge_ray.kg.update import upsert_subjects
    delta = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "e"],
        "pred": ["http://v/fresh", "http://v/fresh"],
        "obj": ["10", "11"],
    }))
    rows = _rows(upsert_subjects(graph, delta))
    # ALL of a's old triples are gone (old facts drop wholesale)
    assert not any(r[0] == "a" and r[1] != "http://v/fresh" for r in rows)
    assert ("a", "http://v/fresh", "10") in rows
    assert ("e", "http://v/fresh", "11") in rows     # brand-new subject
    assert ("b", "http://v/old", "3") in rows        # untouched subject
    assert rows.count(("c", "http://v/x", "4")) == 2  # bag semantics kept


@pytest.fixture()
def qgraph():
    return ray.data.from_pandas(pd.DataFrame({
        "graph": ["g1", "g1", "g2", "g2"],
        "subj": ["a", "a", "a", "b"],
        "pred": ["http://v/lang", "http://v/m", "http://v/lang",
                 "http://v/m"],
        "obj": ["en", "x", "fr", "y"],
    }))


def _qrows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["graph", "subj", "pred", "obj"]]
                      .values.tolist()))


def test_quads_drop_graph(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    rows = _qrows(sparql_update_quads(qgraph, "DROP GRAPH <g1>"))
    assert rows == [("g2", "a", "http://v/lang", "fr"),
                    ("g2", "b", "http://v/m", "y")]


def test_quads_add_and_move(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    added = _qrows(sparql_update_quads(qgraph, "ADD <g1> TO <g2>"))
    # g2 keeps its own triples AND gains g1's; g1 unchanged
    assert ("g2", "a", "http://v/m", "x") in added
    assert ("g2", "a", "http://v/lang", "fr") in added
    assert ("g1", "a", "http://v/m", "x") in added
    moved = _qrows(sparql_update_quads(qgraph, "MOVE <g1> TO <g2>"))
    # g2 REPLACED by g1's content; g1 gone
    assert not any(r[0] == "g1" for r in moved)
    assert sorted(r for r in moved) == [
        ("g2", "a", "http://v/lang", "en"), ("g2", "a", "http://v/m", "x")]


def test_quads_with_scoped_update(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    q = """PREFIX v: <http://v/>
    WITH <g1> DELETE { ?d v:lang ?l } INSERT { ?d v:language ?l }
    WHERE { ?d v:lang ?l }"""
    rows = _qrows(sparql_update_quads(qgraph, q))
    assert ("g1", "a", "http://v/language", "en") in rows
    assert ("g1", "a", "http://v/lang", "en") not in rows
    # the other graph's lang triple is untouched
    assert ("g2", "a", "http://v/lang", "fr") in rows


def test_quads_bad_form_raises(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    with pytest.raises(ValueError, match="unsupported quad update"):
        sparql_update_quads(qgraph, "RENAME <g1> TO <g2>")


def test_quads_same_graph_add_copy_move_are_noops(qgraph):
    # SPARQL 1.1 Update 3.2.5-3.2.7: same source and destination is a no-op
    from nexus_forge_ray.kg.update import sparql_update_quads
    before = _qrows(qgraph)
    for op in ("ADD", "COPY", "MOVE"):
        assert _qrows(sparql_update_quads(qgraph, f"{op} <g1> TO <g1>")) \
            == before


def test_quads_add_keeps_untouched_graph_bags(ray_session):
    # dedup is scoped to the destination slice: graph g3's duplicate rows
    # (bag semantics) must pass through ADD verbatim, like DROP/WITH
    from nexus_forge_ray.kg.update import sparql_update_quads
    qs = ray.data.from_pandas(pd.DataFrame({
        "graph": ["g1", "g2", "g3", "g3"],
        "subj": ["a", "a", "z", "z"],
        "pred": ["http://v/m"] * 4,
        "obj": ["x", "y", "dup", "dup"],
    }))
    rows = _qrows(sparql_update_quads(qs, "ADD <g1> TO <g2>"))
    assert rows.count(("g3", "z", "http://v/m", "dup")) == 2
    assert ("g2", "a", "http://v/m", "x") in rows


def test_forge_sparql_dispatches_quad_updates(qgraph):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    rows = _qrows(forge.sparql("DROP GRAPH <g1>", qgraph))
    assert rows and all(r[0] == "g2" for r in rows)
    q = """PREFIX v: <http://v/>
    WITH <g1> DELETE { ?d v:lang ?l } INSERT { ?d v:language ?l }
    WHERE { ?d v:lang ?l }"""
    rows = _qrows(forge.sparql(q, qgraph))
    assert ("g1", "a", "http://v/language", "en") in rows
    assert ("g2", "a", "http://v/lang", "fr") in rows


def test_quads_clear_all(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    assert sparql_update_quads(qgraph, "CLEAR ALL").count() == 0
    assert sparql_update_quads(qgraph, "DROP NAMED").count() == 0


def test_quads_insert_delete_data_graph_blocks(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    out = sparql_update_quads(
        qgraph, 'PREFIX v: <http://v/> INSERT DATA { '
                'GRAPH <g3> { <n> v:m "z" } '
                'GRAPH <g1> { <a> v:m "x" } }')  # re-assert existing: set
    rows = _qrows(out)
    assert ("g3", "n", "http://v/m", "z") in rows
    assert rows.count(("g1", "a", "http://v/m", "x")) == 1
    assert len(rows) == 5
    out = sparql_update_quads(
        qgraph, 'PREFIX v: <http://v/> DELETE DATA { '
                'GRAPH <g2> { <a> v:lang "fr" } }')
    rows = _qrows(out)
    assert ("g2", "a", "http://v/lang", "fr") not in rows
    assert len(rows) == 3
    # the same triple in the OTHER graph must survive a targeted delete
    assert ("g1", "a", "http://v/lang", "en") in rows


def test_quads_data_without_graph_block_raises(qgraph):
    from nexus_forge_ray.kg.update import sparql_update_quads
    with pytest.raises(ValueError, match="GRAPH"):
        sparql_update_quads(
            qgraph, 'PREFIX v: <http://v/> INSERT DATA { <n> v:m "z" }')


def test_forge_full_triple_engine_over_default_graph(qgraph):
    # a GRAPH-free query on a quad dataset gets the FULL bgp surface
    # (FILTER here) over the set-semantic default-graph union
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    q = """PREFIX v: <http://v/>
    SELECT ?d ?l WHERE { ?d v:lang ?l . FILTER(?l = "fr") }"""
    df = forge.sparql(q, qgraph).to_pandas()
    assert sorted(map(tuple, df[["d", "l"]].values)) == [("a", "fr")]
    # ... and aggregates
    q = """PREFIX v: <http://v/>
    SELECT (COUNT(*) AS ?n) WHERE { ?d v:lang ?l }"""
    df = forge.sparql(q, qgraph).to_pandas()
    assert df["n"].tolist() == [2]


def test_quads_insert_data_keeps_untouched_graph_bags(ray_session):
    # INSERT DATA dedupes only the TOUCHED graphs' slices: g3's duplicate
    # rows pass through verbatim, like ADD/COPY/MOVE/DROP/WITH
    from nexus_forge_ray.kg.update import sparql_update_quads
    qs = ray.data.from_pandas(pd.DataFrame({
        "graph": ["g1", "g3", "g3"],
        "subj": ["a", "z", "z"],
        "pred": ["http://v/m"] * 3,
        "obj": ["x", "dup", "dup"],
    }))
    rows = _qrows(sparql_update_quads(
        qs, 'INSERT DATA { GRAPH <g2> { <n> <http://v/m> "v" } }'))
    assert rows.count(("g3", "z", "http://v/m", "dup")) == 2
    assert ("g2", "n", "http://v/m", "v") in rows


def test_forge_dispatch_ignores_keyword_shaped_variables(graph, qgraph):
    # ?delete / ?insert variables and quoted literals must not steer the
    # dispatch into the update or quad engines
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    out = forge.sparql(
        "SELECT ?delete WHERE { ?delete <http://v/old> ?o }",
        graph).to_pandas()
    assert sorted(out["delete"]) == ["a", "b"]
    # single-quoted literal containing 'from'/'graph' words on a quad
    # table still routes to the full default-graph triple engine
    out = forge.sparql(
        "SELECT ?d WHERE { ?d <http://v/lang> 'fr' . "
        "FILTER(?d != 'graph from nowhere') }", qgraph).to_pandas()
    assert out["d"].tolist() == ["a"]
