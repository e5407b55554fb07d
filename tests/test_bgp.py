"""SPARQL basic-graph-pattern executor: joins, repeated vars, guards."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.bgp import bgp_select, match_pattern

TRIPLES = pd.DataFrame({
    "subj": ["d1", "d1", "d2", "d2", "d3", "x"],
    "pred": ["mentions", "lang", "mentions", "lang", "lang", "loop"],
    "obj":  ["e1",       "en",   "e2",       "fr",   "en",   "x"],
})


def _ds():
    return ray.data.from_pandas(TRIPLES)


def test_two_pattern_join(ray_session):
    out = bgp_select(_ds(), [("?d", "mentions", "?e"),
                             ("?d", "lang", "en")], ["?d", "?e"]).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [("d1", "e1")]


def test_repeated_variable_is_equality(ray_session):
    out = match_pattern(_ds(), ("?x", "loop", "?x")).to_pandas()
    assert out["x"].tolist() == ["x"]


def test_cross_join_rejected(ray_session):
    with pytest.raises(ValueError, match="cross join"):
        bgp_select(_ds(), [("?a", "mentions", "?b"),
                           ("?c", "lang", "?d")], ["?a"]).to_pandas()


def test_three_pattern_chain(ray_session):
    # docs that mention something AND are in some lang; select the lang
    out = bgp_select(_ds(), [("?d", "mentions", "?e"),
                             ("?d", "lang", "?l")], ["?d", "?l"]).to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [("d1", "en"), ("d2", "fr")]


def test_parse_sparql_full_form():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """PREFIX v: <http://example.org/vocab/>
    SELECT ?d ?e WHERE {
      ?d v:mentions ?e .
      ?d a <http://example.org/Type.v2> .
      ?d v:lang "en"
    } LIMIT 7"""
    p = parse_sparql(q)
    assert p.select == ["?d", "?e"] and p.limit == 7
    assert not p.distinct and not p.filters and not p.order_by
    assert p.patterns[0] == ("?d", "http://example.org/vocab/mentions", "?e")
    assert p.patterns[1] == ("?d",
                             "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                             "http://example.org/Type.v2")
    assert p.patterns[2] == ("?d", "http://example.org/vocab/lang", "en")


def test_parse_sparql_filter_order_distinct():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT DISTINCT ?d ?v WHERE {
      ?d score ?v .
      FILTER(?v >= 10) .
      FILTER regex(?d, "^doc") .
      FILTER(?d != "doc9")
    } ORDER BY DESC(?v) ?d LIMIT 3"""
    p = parse_sparql(q)
    assert p.distinct and p.limit == 3
    assert p.filters == [("v", "ge", 10.0, False), ("d", "ne", "doc9", False)]
    assert p.regex_filters == [("d", "^doc")]
    assert p.order_by == [("v", True), ("d", False)]


def test_sparql_filter_order_limit_end_to_end(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": [f"doc{i}" for i in range(6)] + ["x1"],
        "pred": ["score"] * 6 + ["score"],
        "obj":  ["5", "40", "30", "20", "10", "40", "99"],
    })
    out = KnowledgeGraphForge().sparql(
        """SELECT DISTINCT ?d ?v WHERE {
             ?d score ?v . FILTER(?v >= 10) . FILTER regex(?d, "^doc")
           } ORDER BY DESC(?v) ?d LIMIT 3""",
        ray.data.from_pandas(t).repartition(3)).to_pandas()
    # numeric compare keeps 40,30,20,10,40; order by value desc then subj
    assert list(map(tuple, out.to_numpy())) == \
        [("doc1", "40"), ("doc5", "40"), ("doc2", "30")]


def test_sparql_select_end_to_end(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    out = forge.sparql(
        'SELECT ?d ?e WHERE { ?d mentions ?e . ?d lang "en" }',
        _ds()).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [("d1", "e1")]


def test_parse_sparql_rejects_unsupported():
    from nexus_forge_ray.kg.bgp import parse_sparql
    with pytest.raises(ValueError):
        parse_sparql("ASK { ?s ?p ?o }")
    with pytest.raises(ValueError):
        parse_sparql("SELECT * WHERE { ?s ?p ?o }")


def test_elastic_dsl_search(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "en", "fr", "en"],
        "n_chars": [5, 100, 100, 100],
        "source": ["a", "b", "a", "src3"],
    })
    q = {"query": {"bool": {
        "must": [{"term": {"lang": "en"}},
                 {"range": {"n_chars": {"gte": 10}}}],
        "must_not": [{"term": {"source": "src3"}}]}}}
    out = KnowledgeGraphForge().elastic(q, ray.data.from_pandas(docs)) \
        .to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_elastic_dsl_should_disjunction(ray_session):
    from nexus_forge_ray.core.filters import filters_from_elastic, search
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "lang": ["en", "fr", "de", "en"],
                         "n": [1, 50, 2, 3]})
    ds = ray.data.from_pandas(docs)
    # bare should: enforced disjunction
    f = filters_from_elastic({"bool": {"should": [
        {"term": {"lang": "fr"}}, {"range": {"n": {"lte": 1}}}]}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 2]
    # should next to must without minimum_should_match: score-only, ignored
    f = filters_from_elastic({"bool": {
        "must": [{"term": {"lang": "en"}}],
        "should": [{"term": {"n": 1}}]}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 4]
    # minimum_should_match=1 makes it filter alongside must
    f = filters_from_elastic({"bool": {
        "must": [{"term": {"lang": "en"}}],
        "should": [{"term": {"n": 1}}],
        "minimum_should_match": 1}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1]


def test_sparql_optional_left_join(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    out = KnowledgeGraphForge().sparql(
        """SELECT ?d ?l ?e WHERE {
             ?d lang ?l .
             OPTIONAL { ?d mentions ?e }
           }""", _ds()).to_pandas()
    rows = {(r.d, r.l, None if pd.isna(r.e) else r.e)
            for r in out.itertuples()}
    # d3 has a lang but no mentions -> survives with e unbound
    assert rows == {("d1", "en", "e1"), ("d2", "fr", "e2"),
                    ("d3", "en", None)}


def test_sparql_optional_requires_shared_var(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    with pytest.raises(ValueError, match="shares no variable"):
        sparql_select(_ds(),
                      "SELECT ?d WHERE { ?d lang ?l . "
                      "OPTIONAL { ?x mentions ?y } }").to_pandas()


def test_elastic_dsl_exists_prefix_wildcard(ray_session):
    from nexus_forge_ray.core.filters import filters_from_elastic, search
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "tag": ["alpha", "beta", None, "alphabet"],
                         "site": ["a.example.com", "b.example.org",
                                  "c.example.com", None]})
    ds = ray.data.from_pandas(docs)

    f = filters_from_elastic({"query": {"exists": {"field": "tag"}}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 2, 4]

    f = filters_from_elastic({"bool": {"must_not": [
        {"exists": {"field": "tag"}}]}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [3]

    f = filters_from_elastic({"prefix": {"tag": "alpha"}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 4]

    f = filters_from_elastic({"wildcard": {"site": "*.example.com"}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 3]

    f = filters_from_elastic({"regexp": {"tag": "alpha(bet)?"}})
    assert search(ds, *f).to_pandas()["doc_id"].tolist() == [1, 4]


def test_sparql_union_branches(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    out = KnowledgeGraphForge().sparql(
        """SELECT ?d WHERE {
             { ?d lang "fr" } UNION { ?d mentions "e1" }
           }""", _ds()).to_pandas()
    assert sorted(out["d"].tolist()) == ["d1", "d2"]


def test_sparql_union_branch_must_bind(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    with pytest.raises(ValueError, match="does not bind"):
        sparql_select(_ds(),
                      'SELECT ?d ?e WHERE { { ?d lang "fr" } UNION '
                      '{ ?d mentions ?e } }').to_pandas()


def test_sparql_group_by_count(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    q = "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p"
    out = sparql_select(_ds(), q).to_pandas().sort_values("p")
    assert dict(zip(out["p"], out["n"])) == {
        "lang": 3, "loop": 1, "mentions": 2}


def test_sparql_global_aggregates(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    scores = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "b", "c"], "pred": ["score"] * 3,
        "obj": ["1.0", "3.0", "oops"],
    }))
    q = ("SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?s) (AVG(?v) AS ?a) "
         "(MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE { ?x <score> ?v }")
    out = sparql_select(scores, q).to_pandas()
    # 'oops' is non-numeric: contributes to COUNT(*) only
    assert out["n"].iloc[0] == 3
    assert out["s"].iloc[0] == 4.0 and out["a"].iloc[0] == 2.0
    assert out["lo"].iloc[0] == 1.0 and out["hi"].iloc[0] == 3.0


def test_sparql_values_inline_binding(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    q = 'SELECT ?d ?l WHERE { ?d <lang> ?l . VALUES ?l { "en" } }'
    out = sparql_select(_ds(), q).to_pandas()
    assert sorted(out["d"]) == ["d1", "d3"]
    assert set(out["l"]) == {"en"}


def test_sparql_group_by_rejects_unaggregated_select():
    from nexus_forge_ray.kg.bgp import parse_sparql
    with pytest.raises(ValueError, match="GROUP BY"):
        parse_sparql(
            "SELECT ?s ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p")
    with pytest.raises(ValueError, match="COUNT accepts"):
        parse_sparql("SELECT (SUM(*) AS ?n) WHERE { ?s ?p ?o }")


def test_sparql_group_by_order_by_alias(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    q = ("SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
         "GROUP BY ?p ORDER BY DESC(?n) LIMIT 1")
    out = sparql_select(_ds(), q).to_pandas()
    assert out["p"].tolist() == ["lang"] and out["n"].tolist() == [3]


def test_elastic_date_histogram_cardinality(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    rows = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:55",
                              "2024-01-01 11:10", "2024-01-01 11:20"]),
        "user": [1, 1, 2, 3],
        "v": [1.0, 2.0, 3.0, 4.0],
    })
    body = {"aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"total": {"sum": {"field": "v"}},
                 "users": {"cardinality": {"field": "user"}}}}}}
    out = KnowledgeGraphForge().elastic(body, data=ray.data.from_pandas(rows))
    assert out["key"].tolist() == pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 11:00"]).tolist()
    assert out["doc_count"].tolist() == [2, 2]
    assert out["total"].tolist() == [3.0, 7.0]
    assert out["users"].tolist() == [1, 2]  # user 1 deduped in hour 10


def test_sparql_sequence_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["d1", "d2", "e1", "e2"],
        "pred": ["m", "m", "type", "type"],
        "obj": ["e1", "e2", "T1", "T2"],
    }))
    q = "PREFIX : <> SELECT ?d ?t WHERE { ?d :m/:type ?t }"
    out = sparql_select(t, q).to_pandas().sort_values("d")
    assert list(map(tuple, out.to_numpy())) == [("d1", "T1"), ("d2", "T2")]


def test_sparql_inverse_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    q = "PREFIX : <> SELECT ?e ?d WHERE { ?e ^:mentions ?d }"
    out = sparql_select(_ds(), q).to_pandas().sort_values("e")
    assert list(map(tuple, out.to_numpy())) == [("e1", "d1"), ("e2", "d2")]


def test_not_exists_and_minus_anti_join(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "spark"), ("d1", "m", "table"),
         ("d2", "m", "spark"), ("d3", "m", "spark"), ("d3", "m", "sort")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = 'SELECT ?d WHERE { ?d <m> "spark" . ' \
        'FILTER NOT EXISTS { ?d <m> "table" } }'
    out = sparql_select(trip, q).to_pandas()
    assert sorted(out["d"]) == ["d2", "d3"]
    # MINUS compiles to the same anti-join in this subset
    q2 = 'SELECT ?d WHERE { ?d <m> "spark" . MINUS { ?d <m> "sort" } }'
    out2 = sparql_select(trip, q2).to_pandas()
    assert sorted(out2["d"]) == ["d1", "d2"]


def test_not_exists_multi_shared_vars(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "x"), ("d2", "m", "x"), ("d2", "m", "y"),
         ("d1", "bad", "x")],
        columns=["subj", "pred", "obj"])
    q = 'SELECT ?d ?e WHERE { ?d <m> ?e . ' \
        'FILTER NOT EXISTS { ?d <bad> ?e } }'
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    pairs = sorted(zip(out["d"], out["e"]))
    assert pairs == [("d2", "x"), ("d2", "y")]


def test_exists_semi_join(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "spark"), ("d1", "m", "table"),
         ("d2", "m", "spark"), ("d3", "m", "table"),
         ("d3", "m", "sort"), ("d3", "m", "spark")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = 'SELECT ?d WHERE { ?d <m> "spark" . ' \
        'FILTER EXISTS { ?d <m> "table" } }'
    out = sparql_select(trip, q).to_pandas()
    # duplicates in the EXISTS sub-bindings (d3 has two other mentions)
    # must not multiply rows
    assert sorted(out["d"]) == ["d1", "d3"]


def test_exists_and_not_exists_compose(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "a"), ("d1", "m", "b"),
         ("d2", "m", "a"), ("d2", "m", "c"),
         ("d3", "m", "a")],
        columns=["subj", "pred", "obj"])
    q = 'SELECT ?d WHERE { ?d <m> "a" . ' \
        'FILTER EXISTS { ?d <m> "b" } ' \
        'FILTER NOT EXISTS { ?d <m> "c" } }'
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    assert sorted(out["d"]) == ["d1"]


def _construct_fixture():
    import pandas as pd
    import ray.data
    t = pd.DataFrame(
        [("d1", "m", "spark"), ("d1", "lang", "en"),
         ("d2", "m", "spark"), ("d2", "lang", "fr"),
         ("d3", "m", "sort"), ("d3", "lang", "en"),
         ("d3", "m", "sort")],          # duplicate triple
        columns=["subj", "pred", "obj"])
    return ray.data.from_pandas(t)


def test_construct_emits_template_triples(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_construct
    q = '''CONSTRUCT { ?d <hasTopic> ?e . ?e <topicOf> ?d }
           WHERE { ?d <m> ?e . ?d <lang> "en" }'''
    out = sparql_construct(_construct_fixture(), q).to_pandas()
    rows = sorted(map(tuple, out[["subj", "pred", "obj"]].to_numpy()))
    # d3's duplicate (m, sort) binding collapses: graph set semantics
    assert rows == [("d1", "hasTopic", "spark"), ("d3", "hasTopic", "sort"),
                    ("sort", "topicOf", "d3"), ("spark", "topicOf", "d1")]


def test_construct_constant_template_terms(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_construct
    q = '''PREFIX v: <http://v/>
           CONSTRUCT { ?d a v:Doc } WHERE { ?d <lang> "en" }'''
    out = sparql_construct(_construct_fixture(), q).to_pandas()
    assert sorted(out["subj"]) == ["d1", "d3"]
    assert set(out["pred"]) == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"}
    assert set(out["obj"]) == {"http://v/Doc"}


def test_ask(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_ask
    ds = _construct_fixture()
    assert sparql_ask(ds, 'ASK { ?d <m> "spark" . ?d <lang> "en" }')
    assert not sparql_ask(ds, 'ASK { ?d <m> "spark" . ?d <lang> "de" }')


def test_forge_sparql_dispatch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    ds = _construct_fixture()
    assert forge.sparql('ASK { ?d <m> "sort" }', ds) is True
    tri = forge.sparql(
        'CONSTRUCT { ?d <t> ?e } WHERE { ?d <m> ?e }', ds).to_pandas()
    assert len(tri) == 3
    sel = forge.sparql('SELECT ?d WHERE { ?d <lang> "fr" }', ds).to_pandas()
    assert list(sel["d"]) == ["d2"]


def test_planner_reorders_worst_first_query(ray_session):
    from nexus_forge_ray.kg.bgp import plan_patterns, sparql_select
    # all-variable pattern first: unplanned this binds the whole table
    # before filtering; the planner starts from the constant-object pattern
    q = 'SELECT ?d ?e WHERE { ?d ?p ?e . ?d <lang> "en" . ?d <m> ?e }'
    out = sparql_select(_construct_fixture(), q).to_pandas()
    pairs = sorted(set(zip(out["d"], out["e"])))
    assert ("d1", "spark") in pairs and ("d3", "sort") in pairs
    assert all(d in ("d1", "d3") for d, _ in pairs)
    ordered = plan_patterns([("?d", "?p", "?e"), ("?d", "<lang>", "en"),
                             ("?d", "m", "?e")])
    assert ordered[0][1] == "<lang>"      # 2 constants wins
    assert ordered[-1] == ("?d", "?p", "?e")


def test_planner_keeps_disconnected_error(ray_session):
    import pytest as _pytest

    from nexus_forge_ray.kg.bgp import sparql_select
    q = 'SELECT ?d ?x WHERE { ?d <m> "spark" . ?x <other> "y" }'
    with _pytest.raises(ValueError, match="cross join"):
        sparql_select(_construct_fixture(), q).to_pandas()


def test_describe_constant_iri(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_describe
    out = sparql_describe(_construct_fixture(),
                          'DESCRIBE <d1>').to_pandas()
    assert sorted(zip(out["pred"], out["obj"])) == \
        [("lang", "en"), ("m", "spark")]
    assert set(out["subj"]) == {"d1"}


def test_describe_variable_with_where(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_describe
    q = 'DESCRIBE ?d WHERE { ?d <m> "spark" . ?d <lang> "en" }'
    out = sparql_describe(_construct_fixture(), q).to_pandas()
    assert set(out["subj"]) == {"d1"}
    assert len(out) == 2


def test_describe_mixed_targets_and_dispatch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    forge = KnowledgeGraphForge()
    q = 'DESCRIBE <d2> ?x WHERE { ?x <m> "sort" }'
    out = forge.sparql(q, _construct_fixture()).to_pandas()
    assert set(out["subj"]) == {"d2", "d3"}


def test_group_concat_and_offset(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "spark"), ("d1", "m", "table"), ("d2", "m", "sort"),
         ("d1", "m", "algo"), ("d2", "m", "merge"), ("d3", "m", "x")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d (GROUP_CONCAT(?e ; SEPARATOR=",") AS ?es) '
         'WHERE { ?d <m> ?e } GROUP BY ?d')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    assert out["es"].tolist() == ["algo,spark,table", "merge,sort", "x"]
    # default separator is a single space
    q2 = 'SELECT ?d (GROUP_CONCAT(?e) AS ?es) WHERE { ?d <m> ?e } GROUP BY ?d'
    out2 = sparql_select(trip, q2).to_pandas().sort_values("d")
    assert out2["es"].tolist() == ["algo spark table", "merge sort", "x"]
    # OFFSET pages (needs ORDER BY + LIMIT)
    q3 = 'SELECT ?e WHERE { ?d <m> ?e } ORDER BY ?e LIMIT 2 OFFSET 2'
    out3 = sparql_select(trip, q3).to_pandas()
    assert out3["e"].tolist() == ["sort", "spark"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ORDER BY"):
        sparql_select(trip, 'SELECT ?e WHERE { ?d <m> ?e } OFFSET 1')


def test_bind_expressions(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "spark"), ("d2", "m", "go")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d ?k ?n WHERE { ?d <m> ?e . '
         'BIND(CONCAT(?d, "-", ?e) AS ?k) BIND(STRLEN(?e) AS ?n) }')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    assert out["k"].tolist() == ["d1-spark", "d2-go"]
    assert out["n"].tolist() == [5, 2]
    # ucase + filter over a bound variable
    q2 = ('SELECT ?u WHERE { ?d <m> ?e . BIND(UCASE(?e) AS ?u) '
          'FILTER(?u = "GO") }')
    out2 = sparql_select(trip, q2).to_pandas()
    assert out2["u"].tolist() == ["GO"]


def test_bind_arithmetic(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("a", "v", "10"), ("b", "v", "4")],
        columns=["subj", "pred", "obj"])
    q = ('SELECT ?s ?half WHERE { ?s <v> ?x . BIND(?x / 2 AS ?half) }')
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas() \
        .sort_values("s")
    assert out["half"].tolist() == [5.0, 2.0]


def test_bind_string_functions(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "en-US"), ("d2", "m", "fr")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d ?s ?b ?a ?r WHERE { ?d <m> ?e . '
         'BIND(SUBSTR(?e, 1, 2) AS ?s) '
         'BIND(STRBEFORE(?e, "-") AS ?b) '
         'BIND(STRAFTER(?e, "-") AS ?a) '
         'BIND(REPLACE(?e, "([a-z]+)-?.*", "$1!") AS ?r) }')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    assert out["s"].tolist() == ["en", "fr"]
    # STRBEFORE/STRAFTER return "" when the needle is absent (17.4.3)
    assert out["b"].tolist() == ["en", ""]
    assert out["a"].tolist() == ["US", ""]
    assert out["r"].tolist() == ["en!", "fr!"]


def test_bind_numeric_and_conditional(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("a", "v", "2.5"), ("b", "v", "-1.5"), ("c", "v", "3.5")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?s ?ab ?rd ?cl ?fl ?tag WHERE { ?s <v> ?x . '
         'BIND(ABS(?x) AS ?ab) BIND(ROUND(?x) AS ?rd) '
         'BIND(CEIL(?x) AS ?cl) BIND(FLOOR(?x) AS ?fl) '
         'BIND(IF(?x > 0, "pos", "neg") AS ?tag) }')
    out = sparql_select(trip, q).to_pandas().sort_values("s")
    assert out["ab"].tolist() == [2.5, 1.5, 3.5]
    # fn:round resolves ties toward +inf: -1.5 -> -1, 2.5 -> 3
    assert out["rd"].tolist() == [3.0, -1.0, 4.0]
    assert out["cl"].tolist() == [3.0, -1.0, 4.0]
    assert out["fl"].tolist() == [2.0, -2.0, 3.0]
    assert out["tag"].tolist() == ["pos", "neg", "pos"]


def test_bind_coalesce_over_optional(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "name", "Ada"), ("d1", "kind", "person"),
         ("d2", "kind", "org")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d ?label WHERE { ?d <kind> ?k . '
         'OPTIONAL { ?d <name> ?n } '
         'BIND(COALESCE(?n, "unnamed") AS ?label) }')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    assert out["label"].tolist() == ["Ada", "unnamed"]


def test_sample_aggregate(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "x"), ("d1", "m", "a"), ("d2", "m", "q")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d (SAMPLE(?e) AS ?one) WHERE { ?d <m> ?e } '
         'GROUP BY ?d')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    # the deterministic pick is the codepoint-min group value
    assert out["one"].tolist() == ["a", "q"]


def test_bind_bad_expressions_raise(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame([("a", "v", "1")], columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    with pytest.raises(ValueError, match="takes 2..3 args"):
        sparql_select(trip, 'SELECT ?s ?y WHERE { ?s <v> ?x . '
                            'BIND(SUBSTR(?x) AS ?y) }')
    with pytest.raises(ValueError, match="first argument must be"):
        sparql_select(trip, 'SELECT ?s ?y WHERE { ?s <v> ?x . '
                            'BIND(STRLEN("lit") AS ?y) }')
    with pytest.raises(ValueError, match="IF condition"):
        sparql_select(trip, 'SELECT ?s ?y WHERE { ?s <v> ?x . '
                            'BIND(IF(?x, "a", "b") AS ?y) }')


def test_construct_describe_with_dotted_iris(ray_session):
    """Full dotted IRIs must survive statement splitting (the WHERE parser
    tokenizes before splitting on '.'; the template parser must too)."""
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_construct, sparql_describe
    t = pd.DataFrame(
        [("http://example.org/d1", "http://example.org/vocab/m", "x"),
         ("http://example.org/d2", "http://example.org/vocab/m", "y")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    out = sparql_describe(trip,
                          "DESCRIBE <http://example.org/d1>").to_pandas()
    assert set(out["subj"]) == {"http://example.org/d1"}
    q = ("CONSTRUCT { ?d <http://example.org/vocab/topic> ?e . "
         "?e <http://example.org/vocab/of> ?d } "
         "WHERE { ?d <http://example.org/vocab/m> ?e }")
    tri = sparql_construct(trip, q).to_pandas()
    assert len(tri) == 4
    assert set(tri["pred"]) == {"http://example.org/vocab/topic",
                                "http://example.org/vocab/of"}
    from nexus_forge_ray.kg.bgp import sparql_ask
    assert sparql_ask(trip, 'ASK { ?d <http://example.org/vocab/m> "x" }')


def test_sparql_dispatch_ignores_keywords_in_iris(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame([("d1", "http://ex/ask#m", "x")],
                     columns=["subj", "pred", "obj"])
    q = ("PREFIX a: <http://ex/ask#>\n"
         "SELECT ?d WHERE { ?d a:m \"x\" }")
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t))
    assert out.to_pandas()["d"].tolist() == ["d1"]


def test_filter_bound_over_optional(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "x"), ("d2", "m", "y"), ("d1", "lang", "en")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d WHERE { ?d <m> ?e . OPTIONAL { ?d <lang> ?l } '
         'FILTER(bound(?l)) }')
    assert sparql_select(trip, q).to_pandas()["d"].tolist() == ["d1"]
    q2 = ('SELECT ?d WHERE { ?d <m> ?e . OPTIONAL { ?d <lang> ?l } '
          'FILTER(!bound(?l)) }')
    assert sparql_select(trip, q2).to_pandas()["d"].tolist() == ["d2"]


def test_bound_on_never_bound_variable(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame([("d1", "m", "x")], columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    # bound() on a variable no pattern binds: false (SPARQL), not KeyError
    q = 'SELECT ?d WHERE { ?d <m> ?e . FILTER(!bound(?zz)) }'
    assert sparql_select(trip, q).to_pandas()["d"].tolist() == ["d1"]
    q2 = 'SELECT ?d WHERE { ?d <m> ?e . FILTER(bound(?zz)) }'
    assert len(sparql_select(trip, q2).to_pandas()) == 0


def test_having_filters_groups(ray_session):
    import pandas as pd
    import pytest as _pytest
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "a"), ("d1", "m", "b"), ("d1", "m", "c"),
         ("d2", "m", "a"), ("d3", "m", "b"), ("d3", "m", "c")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d (COUNT(?e) AS ?n) WHERE { ?d <m> ?e } '
         'GROUP BY ?d HAVING(?n >= 2) ORDER BY ?d')
    out = sparql_select(trip, q).to_pandas()
    assert list(zip(out["d"], out["n"])) == [("d1", 3), ("d3", 2)]
    with _pytest.raises(ValueError, match="HAVING"):
        sparql_select(trip, 'SELECT ?d WHERE { ?d <m> ?e } HAVING(?n > 1)')


def test_count_distinct_aggregate(ray_session):
    import pandas as pd
    import pytest as _pytest
    import ray.data

    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "a"), ("d1", "m", "a"), ("d1", "m", "b"),
         ("d2", "m", "a"), ("d2", "m", "a")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d (COUNT(DISTINCT ?e) AS ?u) (COUNT(?e) AS ?n) '
         'WHERE { ?d <m> ?e } GROUP BY ?d ORDER BY ?d')
    out = sparql_select(trip, q).to_pandas()
    assert list(zip(out["d"], out["u"], out["n"])) == \
        [("d1", 2, 3), ("d2", 1, 2)]
    # count_distinct alone, no GROUP BY (global scalar)
    q2 = 'SELECT (COUNT(DISTINCT ?e) AS ?u) WHERE { ?d <m> ?e }'
    out2 = sparql_select(trip, q2).to_pandas()
    assert out2["u"].tolist() == [2]
    with _pytest.raises(ValueError, match="DISTINCT"):
        sparql_select(trip, 'SELECT (SUM(DISTINCT ?e) AS ?s) '
                            'WHERE { ?d <m> ?e }')


def test_union_branch_scoped_filter(ray_session):
    # a FILTER written INSIDE a UNION branch applies to that branch only
    # (SPARQL group scoping) — previously it was hoisted to global scope
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "score", "5"), ("d2", "score", "1"),
         ("d3", "tag", "keep"), ("d4", "tag", "drop")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d WHERE { '
         '{ ?d <score> ?s . FILTER(?s >= 3) } UNION '
         '{ ?d <tag> "keep" } }')
    out = sparql_select(trip, q).to_pandas()
    assert sorted(out["d"]) == ["d1", "d3"]


def test_union_branch_scoped_values_and_bind(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "lang", "en"), ("d2", "lang", "fr"), ("d3", "lang", "de"),
         ("d4", "kind", "doc")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    # VALUES inside branch 1 restricts branch 1 only; BIND inside branch 2
    # materializes a selected alias for branch 2 (null in branch 1)
    q = ('SELECT ?d ?k WHERE { '
         '{ ?d <lang> ?l . VALUES ?l { "en" "fr" } } UNION '
         '{ ?d <kind> ?x . BIND(UCASE(?x) AS ?k) } }')
    out = sparql_select(trip, q).to_pandas().sort_values("d")
    assert out["d"].tolist() == ["d1", "d2", "d4"]
    assert out["k"].tolist()[:2] == [None, None] or \
        pd.isna(out["k"].tolist()[:2]).all()
    assert out["k"].tolist()[2] == "DOC"


def test_union_global_filter_applies_to_all_branches(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "a", "2"), ("d2", "a", "9"),
         ("d3", "b", "4"), ("d4", "b", "0")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?d ?v WHERE { '
         '{ ?d <a> ?v } UNION { ?d <b> ?v } FILTER(?v > 1) }')
    out = sparql_select(trip, q).to_pandas()
    assert sorted(out["d"]) == ["d1", "d2", "d3"]


def test_sparql_zero_or_more_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("a", "next", "b"), ("b", "next", "c"), ("x", "other", "y")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = "PREFIX : <> SELECT ?n WHERE { <a> :next* ?n }"
    out = sparql_select(trip, q).to_pandas()
    # zero-length (a itself) plus the transitive successors
    assert sorted(out["n"]) == ["a", "b", "c"]


def test_sparql_alternative_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "title", "t1"), ("d2", "label", "t2"), ("d3", "other", "t3")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = "PREFIX : <> SELECT ?d ?v WHERE { ?d :title|:label ?v }"
    out = sparql_select(trip, q).to_pandas()
    assert sorted(out["d"]) == ["d1", "d2"]
    # parenthesized alternation with a + modifier closes over BOTH slices
    t2 = pd.DataFrame(
        [("a", "p", "b"), ("b", "q", "c")], columns=["subj", "pred", "obj"])
    q2 = "PREFIX : <> SELECT ?n WHERE { <a> (:p|:q)+ ?n }"
    out2 = sparql_select(ray.data.from_pandas(t2), q2).to_pandas()
    assert sorted(out2["n"]) == ["b", "c"]


def test_sparql_bracketed_iri_plus_path(ray_session):
    # ADVICE round 2: '<http://ex/p>+' used to keep its angle brackets and
    # silently match nothing
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("a", "http://ex/p", "b"), ("b", "http://ex/p", "c")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    out = sparql_select(
        trip, "SELECT ?n WHERE { <a> <http://ex/p>+ ?n }").to_pandas()
    assert sorted(out["n"]) == ["b", "c"]


def test_empty_ungrouped_aggregate_yields_one_row(ray_session):
    # SPARQL: SELECT (COUNT(*) AS ?n) over no matches returns ONE row, n=0
    from nexus_forge_ray.kg.bgp import sparql_select
    q = ('SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?s) '
         'WHERE { ?x <nosuchpred> ?v }')
    out = sparql_select(_ds(), q).to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 0
    assert pd.isna(out["s"].iloc[0])


def test_group_by_keeps_null_optional_keys(ray_session):
    # a GROUP BY variable bound only via OPTIONAL keeps its unbound group
    # (pandas dropna default would silently drop those rows)
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame(
        [("d1", "m", "x"), ("d2", "m", "y"), ("d3", "m", "z"),
         ("d1", "lang", "en"), ("d2", "lang", "en")],
        columns=["subj", "pred", "obj"])
    trip = ray.data.from_pandas(t)
    q = ('SELECT ?l (COUNT(?d) AS ?n) WHERE { ?d <m> ?e . '
         'OPTIONAL { ?d <lang> ?l } } GROUP BY ?l')
    out = sparql_select(trip, q).to_pandas()
    by = {(None if pd.isna(k) else k): v for k, v in zip(out["l"], out["n"])}
    assert by == {"en": 2, None: 1}


def test_subquery_aggregate_join(ray_session):
    """Nested { SELECT (MAX ...) GROUP BY } joins back on the shared var —
    the classic 'row matching its group max' shape (SPARQL 11.2.4)."""
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame({
        "subj": ["p1", "p2", "p3", "p1", "p2", "p3"],
        "pred": ["cat", "cat", "cat", "score", "score", "score"],
        "obj":  ["a",   "a",   "b",   "1",    "3",     "2"],
    })
    q = """
    SELECT ?p ?c ?s WHERE {
      ?p <cat> ?c .
      ?p <score> ?s .
      { SELECT ?c (MAX(?s2) AS ?best) WHERE {
          ?x <cat> ?c . ?x <score> ?s2 . } GROUP BY ?c }
      FILTER(?s = ?best)
    }
    """
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    got = sorted(map(tuple, out[["p", "c", "s"]].to_numpy()))
    assert got == [("p2", "a", "3"), ("p3", "b", "2")]


def test_subquery_shares_no_var_raises(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    q = """SELECT ?p WHERE { ?p <cat> ?c .
           { SELECT ?z (COUNT(*) AS ?n) WHERE { ?z <x> ?y } GROUP BY ?z } }"""
    with pytest.raises(ValueError, match="shares no"):
        sparql_select(_ds(), q).to_pandas()


def test_subquery_in_union_parses_branch_scoped():
    # (formerly rejected) a subquery inside a UNION branch now parses:
    # it attaches to ITS branch, not the global scope
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      { ?d <a> ?x . { SELECT ?x WHERE { ?x <b> ?c } } }
      UNION { ?d <c> ?x } }"""
    p = parse_sparql(q)
    assert p.subqueries == []                      # nothing global
    assert len(p.union_clauses) == 2
    assert len(p.union_clauses[0][7]) == 1         # branch 1 carries it
    assert "SELECT" in p.union_clauses[0][7][0].upper()
    assert p.union_clauses[1][7] == []


def test_negated_property_set(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame({
        "subj": ["d1", "d1", "d2", "d3"],
        "pred": ["mentions", "lang", "lang", "cites"],
        "obj":  ["e1", "en", "fr", "d1"]})
    q = "SELECT ?d ?x WHERE { ?d !(<lang>|<cites>) ?x }"
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [("d1", "e1")]
    q2 = "SELECT ?d ?x WHERE { ?d !<lang> ?x }"
    out2 = sparql_select(ray.data.from_pandas(t), q2).to_pandas()
    assert sorted(map(tuple, out2.to_numpy())) == [("d1", "e1"), ("d3", "d1")]


def test_negated_path_with_modifier_rejected():
    from nexus_forge_ray.kg.bgp import parse_sparql
    with pytest.raises(ValueError, match="negated property set"):
        parse_sparql("SELECT ?a ?b WHERE { ?a !(<x>)+ ?b }")


def test_zero_or_one_path(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame({
        "subj": ["a", "b"],
        "pred": ["next", "next"],
        "obj":  ["b", "c"]})
    q = "SELECT ?x ?y WHERE { ?x <next>? ?y }"
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    # direct edges + zero-length identity on every term (a, b, c)
    assert got == [("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
                   ("c", "c")]


def test_filter_in_and_string_functions(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d4"],
        "pred": ["lang"] * 4,
        "obj":  ["en", "fr", "de", "en-GB"]})
    ds = ray.data.from_pandas(t)
    q = 'SELECT ?d WHERE { ?d <lang> ?l . FILTER(?l IN ("en", "de")) }'
    assert sorted(sparql_select(ds, q).to_pandas()["d"]) == ["d1", "d3"]
    q = 'SELECT ?d WHERE { ?d <lang> ?l . FILTER(?l NOT IN ("en", "de")) }'
    assert sorted(sparql_select(ds, q).to_pandas()["d"]) == ["d2", "d4"]
    q = 'SELECT ?d WHERE { ?d <lang> ?l . FILTER(STRSTARTS(?l, "en")) }'
    assert sorted(sparql_select(ds, q).to_pandas()["d"]) == ["d1", "d4"]
    q = 'SELECT ?d WHERE { ?d <lang> ?l . FILTER(STRENDS(?l, "B")) }'
    assert sorted(sparql_select(ds, q).to_pandas()["d"]) == ["d4"]
    q = 'SELECT ?d WHERE { ?d <lang> ?l . FILTER(!CONTAINS(?l, "e")) }'
    assert sorted(sparql_select(ds, q).to_pandas()["d"]) == ["d2"]


def test_filter_in_numeric(ray_session):
    from nexus_forge_ray.kg.bgp import sparql_select
    t = pd.DataFrame({"subj": ["a", "b", "c"], "pred": ["n"] * 3,
                      "obj": ["1", "2", "3"]})
    q = "SELECT ?s WHERE { ?s <n> ?v . FILTER(?v IN (1, 3)) }"
    out = sparql_select(ray.data.from_pandas(t), q).to_pandas()
    assert sorted(out["s"]) == ["a", "c"]


def test_min_max_over_string_literals(ray_session):
    # SPARQL MIN/MAX over non-numeric literals compare by codepoint; groups
    # with numeric literals keep numeric comparison ("10" < "9" numerically)
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b", "b"],
        "pred": ["http://v/p"] * 4,
        "obj": ["zebra", "apple", "10", "9"],
    }))
    q = """PREFIX v: <http://v/>
    SELECT ?s (MIN(?o) AS ?lo) (MAX(?o) AS ?hi)
    WHERE { ?s v:p ?o } GROUP BY ?s"""
    got = sparql_select(t, q).to_pandas().sort_values("s")
    assert got.set_index("s")["lo"].astype(str).to_dict() == \
        {"a": "apple", "b": "9.0"}
    assert got.set_index("s")["hi"].astype(str).to_dict() == \
        {"a": "zebra", "b": "10.0"}


def test_filter_logical_and_or_precedence(ray_session):
    # || binds loosest: A && B || C parses as (A && B) || C
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b", "b", "c", "c", "d", "d"],
        "pred": ["http://v/l", "http://v/n"] * 4,
        "obj": ["en", "5", "en", "1", "fr", "9", "de", "5"],
    }))
    base = """PREFIX v: <http://v/>
    SELECT ?s WHERE {{ ?s v:l ?l . ?s v:n ?n . FILTER({expr}) }}"""

    def run(expr):
        out = sparql_select(t, base.format(expr=expr)).to_pandas()
        return sorted(out["s"])

    # (l="en" && n>2) || l="fr": a (en,5) yes; b (en,1) no; c (fr) yes
    assert run('?l = "en" && ?n > 2 || ?l = "fr"') == ["a", "c"]
    # explicit parens, other grouping: en && (n>2 || l="fr") -> only a
    assert run('?l = "en" && (?n > 2 || ?l = "fr")') == ["a"]
    # pure conjunction still flattens
    assert run('?l = "en" && ?n > 2') == ["a"]
    # disjunction of conjunction groups
    assert run('(?l = "en" && ?n > 2) || (?l = "de" && ?n = 5)') \
        == ["a", "d"]
    # regex atom inside a compound expression
    assert run('regex(?l, "^e") && ?n < 2') == ["b"]


def test_filter_logical_with_bound_and_in(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "b", "b", "c"],
        "pred": ["http://v/l", "http://v/l", "http://v/m", "http://v/l"],
        "obj": ["en", "fr", "x", "de"],
    }))
    q = """PREFIX v: <http://v/>
    SELECT ?s WHERE { ?s v:l ?l . OPTIONAL { ?s v:m ?m }
                      FILTER(bound(?m) || ?l IN ("en")) }"""
    out = sparql_select(t, q).to_pandas()
    assert sorted(out["s"]) == ["a", "b"]


def test_filter_inside_optional_unbinds_not_drops(ray_session):
    # SPARQL 8.3: a FILTER local to OPTIONAL constrains the optional side;
    # base rows failing the optional match survive with unbound vars
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.bgp import sparql_select
    t = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b", "b", "c"],
        "pred": ["http://v/l", "http://v/m", "http://v/l", "http://v/m",
                 "http://v/l"],
        "obj": ["en", "5", "fr", "1", "de"],
    }))
    q = """PREFIX v: <http://v/>
    SELECT ?s ?m WHERE { ?s v:l ?l .
                         OPTIONAL { ?s v:m ?m . FILTER(?m > 2) } }"""
    out = sparql_select(t, q).to_pandas().sort_values("s")
    got = {r.s: r.m for r in out.itertuples()}
    assert set(got) == {"a", "b", "c"}          # nobody dropped
    assert got["a"] == "5"                       # match kept
    assert pd.isna(got["b"]) and pd.isna(got["c"])   # filtered -> unbound


def test_filter_inside_optional_rejects_outer_vars(ray_session):
    import pandas as pd
    import pytest
    import ray.data
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?s WHERE { ?s <http://v/l> ?l .
           OPTIONAL { ?s <http://v/m> ?m . FILTER(?l = "en") } }"""
    with pytest.raises(ValueError, match="group's own variables"):
        parse_sparql(q)


# --------------------------------------------- grouped property paths


GROUP_TRIPLES = pd.DataFrame({
    "subj": ["a", "b", "c", "d", "x"],
    "pred": ["http://v/p1", "http://v/p2", "http://v/p1", "http://v/p2",
             "http://v/p3"],
    "obj":  ["b", "c", "d", "e", "y"],
})


def _sparql(q):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    return KnowledgeGraphForge().sparql(
        q, ray.data.from_pandas(GROUP_TRIPLES)).to_pandas()


def _pairs(df):
    return sorted(map(tuple, df.to_numpy()))


def test_grouped_sequence_plus(ray_session):
    # (p1/p2)+ over the chain a-p1->b-p2->c-p1->d-p2->e
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE { ?s (v:p1/v:p2)+ ?o }""")
    assert _pairs(out) == [("a", "c"), ("a", "e"), ("c", "e")]


def test_grouped_alt_of_sequences(ray_session):
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE { ?s (v:p1/v:p2)|v:p3 ?o }""")
    assert _pairs(out) == [("a", "c"), ("c", "e"), ("x", "y")]


def test_grouped_inverse_sequence_plus(ray_session):
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE { ?s (^v:p2/^v:p1)+ ?o }""")
    assert _pairs(out) == [("c", "a"), ("e", "a"), ("e", "c")]


def test_grouped_path_joins_plain_pattern(ray_session):
    # grouped path composes with an ordinary pattern through a shared var
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o ?n WHERE { ?s (v:p1/v:p2)+ ?o . ?o v:p1 ?n }""")
    assert _pairs(out) == [("a", "c", "d")]


def test_paren_alt_then_sequence(ray_session):
    # (p1|p3)/p2 — a paren alternation composed into a top-level sequence
    # must route to the grouped-path compiler (ADVICE r4 false-negative)
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE { ?s (v:p1|v:p3)/v:p2 ?o }""")
    assert _pairs(out) == [("a", "c"), ("c", "e")]


def test_grouped_alt_inside_sequence(ray_session):
    # p1/(p2|p3): b reachable from a via p1 then p2 -> c
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE { ?s v:p1/(v:p2|v:p3) ?o }""")
    assert _pairs(out) == [("a", "c"), ("c", "e")]


def test_path_parser_units():
    from nexus_forge_ray.kg.bgp import is_complex_path, parse_path
    assert is_complex_path("(<p1>/<p2>)+")
    assert is_complex_path("(<p1>/<p2>)|<p3>")
    assert not is_complex_path("<p1>/<p2>")        # plain seq: old path
    assert not is_complex_path("(<p1>|<p2>)*")     # flat alt: old path
    assert not is_complex_path("?v")
    # paren alternation composed into a top-level sequence needs the
    # grouped compiler (ADVICE r4: the simple expander split IRIs on '/')
    assert is_complex_path("(<http://v/p1>|<http://v/p3>)/<http://v/p2>")
    assert is_complex_path("<http://v/p1>/(<http://v/p2>|<http://v/p3>)")
    ast = parse_path("(<p1>/<p2>)+")
    assert ast == ("plus", ("seq", [("atom", "p1"), ("atom", "p2")]))
    ast2 = parse_path("^<p1>*")
    assert ast2 == ("inv", ("star", ("atom", "p1")))
    ast3 = parse_path("!(<p1>|<p2>)/<p3>")
    assert ast3 == ("seq", [("neg", ["p1", "p2"]), ("atom", "p3")])


def test_grouped_path_inside_optional(ray_session):
    # grouped path in an OPTIONAL group: base rows survive with unbound ?o
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s ?o WHERE {
          ?s v:p3 ?y . OPTIONAL { ?s (v:p1/v:p2)+ ?o } }""")
    # only x has p3; x has no (p1/p2)+ successor -> one row, o unbound
    assert len(out) == 1
    assert out.iloc[0]["s"] == "x"
    assert pd.isna(out.iloc[0]["o"])


def test_grouped_path_inside_exists(ray_session):
    out = _sparql("""PREFIX v: <http://v/>
        SELECT ?s WHERE {
          ?s v:p1 ?m . FILTER EXISTS { ?s (v:p1/v:p2)+ ?e } }""")
    # a and c have p1 edges; both reach something via (p1/p2)+
    assert sorted(out["s"]) == ["a", "c"]


def test_optional_inside_union_branch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d3", "d3"],
        "pred": ["lang", "lang", "mentions", "cites", "mentions"],
        "obj":  ["en",  "fr",  "e1",       "d1",     "e3"],
    })
    q = """SELECT ?d ?e WHERE {
      { ?d lang ?l . OPTIONAL { ?d mentions ?e } }
      UNION
      { ?d cites ?x . OPTIONAL { ?d mentions ?e } }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.e) else r.e) for r in out.itertuples()}
    # branch 1: d1 (mentions e1), d2 (unbound); branch 2: d3 (mentions e3)
    assert rows == {("d1", "e1"), ("d2", None), ("d3", "e3")}


def test_optional_in_union_with_branch_filter(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d2"],
        "pred": ["lang", "lang", "score", "score"],
        "obj":  ["en",  "fr",  "5",     "50"],
    })
    q = """SELECT ?d ?s WHERE {
      { ?d lang "en" . OPTIONAL { ?d score ?s } FILTER(?s >= 1) }
      UNION
      { ?d lang "fr" . OPTIONAL { ?d score ?s } FILTER(?s >= 10) }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = sorted(map(tuple, out.to_numpy()))
    # branch filters SEE the optional binding (applied after the join)
    assert rows == [("d1", "5"), ("d2", "50")]


def test_not_exists_inside_union_branch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d3", "d3"],
        "pred": ["lang", "lang", "mentions", "cites", "mentions"],
        "obj":  ["en",  "fr",  "e1",       "d1",     "e3"],
    })
    q = """SELECT ?d WHERE {
      { ?d lang ?l . FILTER NOT EXISTS { ?d mentions ?e } }
      UNION
      { ?d cites ?x . FILTER EXISTS { ?d mentions ?e } }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    # branch 1: langs minus mentioners -> d2; branch 2: citers with
    # mentions -> d3
    assert sorted(out["d"]) == ["d2", "d3"]


def test_minus_inside_union_branch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d1"],
        "pred": ["lang", "lang", "lang", "mentions"],
        "obj":  ["en",  "fr",  "en",   "e1"],
    })
    q = """SELECT ?d WHERE {
      { ?d lang "en" . MINUS { ?d mentions ?e } }
      UNION
      { ?d lang "fr" }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(out["d"]) == ["d2", "d3"]


def test_global_optional_beside_union(ray_session):
    # a global-scope OPTIONAL beside a UNION chain left-joins the UNIONED
    # solutions (SPARQL algebra: the union is one group graph pattern)
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d1", "d3"],
        "pred": ["lang", "lang", "cites", "mentions", "mentions"],
        "obj":  ["en",  "fr",  "d1",    "e1",        "e3"],
    })
    q = """SELECT ?d ?e WHERE {
      { ?d lang "en" } UNION { ?d cites ?x }
      OPTIONAL { ?d mentions ?e }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.e) else r.e) for r in out.itertuples()}
    # branch 1 -> d1 (mentions e1); branch 2 -> d3 (mentions e3)
    assert rows == {("d1", "e1"), ("d3", "e3")}


def test_global_minus_beside_union(ray_session):
    # a global MINUS filters rows coming out of EITHER branch
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d1", "d3"],
        "pred": ["lang", "lang", "cites", "mentions", "mentions"],
        "obj":  ["en",  "en",  "d1",    "e1",        "e3"],
    })
    q = """SELECT ?d WHERE {
      { ?d lang "en" } UNION { ?d cites ?x }
      MINUS { ?d mentions ?e }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    # branches yield d1, d2, d3; d1 and d3 have mentions -> only d2
    assert sorted(out["d"]) == ["d2"]


def test_global_exists_beside_union(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d1", "d3"],
        "pred": ["lang", "lang", "cites", "mentions", "mentions"],
        "obj":  ["en",  "en",  "d1",    "e1",        "e3"],
    })
    q = """SELECT ?d WHERE {
      { ?d lang "en" } UNION { ?d cites ?x }
      FILTER EXISTS { ?d mentions ?e }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(out["d"]) == ["d1", "d3"]


def test_global_optional_with_branch_clauses(ray_session):
    # global OPTIONAL composes with branch-scoped FILTERs
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d3", "d2"],
        "pred": ["score", "score", "score", "mentions"],
        "obj":  ["5",   "50",  "7",    "e2"],
    })
    q = """SELECT ?d ?e WHERE {
      { ?d score ?s . FILTER(?s > 10) } UNION { ?d score "7" }
      OPTIONAL { ?d mentions ?e }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.e) else r.e) for r in out.itertuples()}
    assert rows == {("d2", "e2"), ("d3", None)}


def test_subquery_inside_union_branch(ray_session):
    # { SELECT ... GROUP BY } nested in one UNION branch: the aggregate
    # joins that branch's solutions BEFORE the union (branch scoping)
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d1", "d1", "d2", "d2", "d3", "d1", "d2"],
        "pred": ["mentions"] * 6 + ["lang", "lang"],
        "obj":  ["e1", "e2", "e3", "e1", "e2", "e9", "en", "fr"],
    })
    q = """SELECT ?d ?n WHERE {
      { ?d lang "en" .
        { SELECT ?d (COUNT(?e) AS ?n) WHERE { ?d mentions ?e }
          GROUP BY ?d } }
      UNION
      { ?d lang "fr" .
        { SELECT ?d (COUNT(?e) AS ?n) WHERE { ?d mentions ?e }
          GROUP BY ?d } }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, int(r.n)) for r in out.itertuples()}
    assert rows == {("d1", 3), ("d2", 2)}


def test_subquery_in_one_branch_only(ray_session):
    # a branch without the subquery leaves the subquery's aggregate alias
    # unbound in its rows
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d1", "d2", "d1", "d2"],
        "pred": ["mentions", "mentions", "mentions", "lang", "lang"],
        "obj":  ["e1", "e2", "e3", "en", "fr"],
    })
    q = """SELECT ?d ?n WHERE {
      { ?d lang "en" .
        { SELECT ?d (COUNT(?e) AS ?n) WHERE { ?d mentions ?e }
          GROUP BY ?d } }
      UNION
      { ?d lang "fr" }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.n) else int(r.n))
            for r in out.itertuples()}
    assert rows == {("d1", 2), ("d2", None)}


def test_bare_nested_group_inlines(ray_session):
    # a pattern-only nested { } group joins with its siblings (SPARQL
    # group join) — both at top level and spanning multiple patterns
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d2", "d3"],
        "pred": ["lang", "lang", "mentions", "mentions", "mentions"],
        "obj":  ["en",  "fr",  "e1",       "e2",       "e3"],
    })
    q = """SELECT ?d ?e WHERE {
      { ?d lang "en" } ?d mentions ?e
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [("d1", "e1")]


def test_bare_nested_group_inside_union_branch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d2", "d3"],
        "pred": ["lang", "lang", "mentions", "mentions", "cites"],
        "obj":  ["en",  "fr",  "e1",       "e2",       "d1"],
    })
    q = """SELECT ?d ?e WHERE {
      { { ?d lang "en" } ?d mentions ?e }
      UNION
      { ?d cites ?x . { ?d cites ?e } }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [("d1", "e1"), ("d3", "d1")]


def test_nested_union_inside_branch_rejected():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      { { ?d <a> ?x } UNION { ?d <b> ?x } }
      UNION { ?d <c> ?x } }"""
    with pytest.raises(ValueError, match="nested inside a UNION"):
        parse_sparql(q)


def test_subquery_in_optional_clear_error():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      ?d <p> ?x .
      OPTIONAL { ?d <q> ?y . { SELECT ?d WHERE { ?d <r> ?z } } } }"""
    with pytest.raises(ValueError, match="subquery inside OPTIONAL"):
        parse_sparql(q)


def test_subquery_in_exists_clear_error():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      ?d <p> ?x .
      FILTER NOT EXISTS { { SELECT ?d WHERE { ?d <r> ?z } } } }"""
    with pytest.raises(ValueError, match="subquery inside EXISTS"):
        parse_sparql(q)


def test_subquery_in_optional_inside_union_branch_rejected():
    # review finding r5: the guard must hold inside UNION branches too —
    # previously the subquery silently became a required branch join
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      { ?d <p> ?x .
        OPTIONAL { ?d <q> ?y . { SELECT ?d WHERE { ?d <r> ?z } } } }
      UNION { ?d <s> ?x } }"""
    with pytest.raises(ValueError, match="subquery inside OPTIONAL"):
        parse_sparql(q)


def test_triple_then_bare_group_inlines(ray_session):
    # review finding r5: SPARQL allows a triple pattern directly followed
    # by a group with NO dot separator
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1"],
        "pred": ["mentions", "mentions", "lang"],
        "obj":  ["e1", "e2", "en"],
    })
    q = """SELECT ?d ?e WHERE { ?d mentions ?e { ?d lang "en" } }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [("d1", "e1")]


def test_bare_group_iri_with_keyword_segment(ray_session):
    # review finding r5: 'graph' inside an IRI must not trip the keyword
    # probe
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["s1", "s1"],
        "pred": ["p", "q"],
        "obj":  ["http://example.org/graph/g1", "o1"],
    })
    q = """SELECT ?s ?o WHERE {
      { ?s <p> <http://example.org/graph/g1> } ?s <q> ?o }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [("s1", "o1")]


def test_bind_inside_optional(ray_session):
    # BIND inside OPTIONAL computes on the optional side; its alias stays
    # unbound when the optional match fails (SPARQL 8.3)
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1"],
        "pred": ["lang", "lang", "mentions"],
        "obj":  ["en",  "fr",  "e1"],
    })
    q = """SELECT ?d ?u WHERE {
      ?d lang ?l .
      OPTIONAL { ?d mentions ?e . BIND(UCASE(?e) AS ?u) }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.u) else r.u) for r in out.itertuples()}
    assert rows == {("d1", "E1"), ("d2", None)}


def test_values_inside_optional(ray_session):
    # VALUES inside OPTIONAL constrains the optional side pre-join
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d2"],
        "pred": ["lang", "lang", "mentions", "mentions"],
        "obj":  ["en",  "fr",  "e1",       "e2"],
    })
    q = """SELECT ?d ?e WHERE {
      ?d lang ?l .
      OPTIONAL { ?d mentions ?e VALUES ?e { "e1" } }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.e) else r.e) for r in out.itertuples()}
    # d1's mention survives the VALUES cut; d2's e2 fails it -> unbound
    assert rows == {("d1", "e1"), ("d2", None)}


def test_bind_inside_optional_in_union_branch(ray_session):
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d2", "d1", "d2"],
        "pred": ["lang", "cites", "mentions", "mentions"],
        "obj":  ["en",  "d1",   "e1",        "e2"],
    })
    q = """SELECT ?d ?u WHERE {
      { ?d lang ?l . OPTIONAL { ?d mentions ?e . BIND(UCASE(?e) AS ?u) } }
      UNION
      { ?d cites ?x }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    rows = {(r.d, None if pd.isna(r.u) else r.u) for r in out.itertuples()}
    assert rows == {("d1", "E1"), ("d2", None)}


def test_bind_in_optional_reads_only_group_vars():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      ?d <p> ?x . OPTIONAL { ?d <q> ?y . BIND(UCASE(?x) AS ?u) } }"""
    with pytest.raises(ValueError, match="BIND inside OPTIONAL"):
        parse_sparql(q)


def test_chained_bind_inside_optional(ray_session):
    # review finding r5b: a later BIND may read an earlier alias
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d1"],
        "pred": ["lang", "mentions"],
        "obj":  ["en",  "e1"],
    })
    q = """SELECT ?d ?n WHERE {
      ?d lang ?l .
      OPTIONAL { ?d mentions ?e .
                 BIND(UCASE(?e) AS ?u) BIND(STRLEN(?u) AS ?n) }
    }"""
    out = KnowledgeGraphForge().sparql(q, ray.data.from_pandas(t)) \
        .to_pandas()
    assert out["d"].tolist() == ["d1"]
    assert int(out["n"].iloc[0]) == 2


def test_optional_bind_alias_collision_rejected(ray_session):
    # review finding r5b: an alias shadowing an OUTER-bound var must fail
    # loudly instead of silently nulling the outer binding
    from nexus_forge_ray.forge import KnowledgeGraphForge
    t = pd.DataFrame({
        "subj": ["d1", "d1"],
        "pred": ["lang", "mentions"],
        "obj":  ["en",  "e1"],
    })
    q = """SELECT ?d ?l WHERE {
      ?d lang ?l .
      OPTIONAL { ?d mentions ?e . BIND(UCASE(?e) AS ?l) }
    }"""
    with pytest.raises(ValueError, match="collides with a variable"):
        KnowledgeGraphForge().sparql(
            q, ray.data.from_pandas(t)).to_pandas()


def test_optional_bind_rebinding_group_var_rejected():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?d WHERE {
      ?d <p> ?x . OPTIONAL { ?d <q> ?e . BIND(UCASE(?e) AS ?e) } }"""
    with pytest.raises(ValueError, match="re-binds in-scope"):
        parse_sparql(q)


def test_nested_optional_inside_optional_clear_error():
    from nexus_forge_ray.kg.bgp import parse_sparql
    q = """SELECT ?a WHERE {
      ?a <p> ?b .
      OPTIONAL { ?b <q> ?c OPTIONAL { ?c <r> ?d } } }"""
    with pytest.raises(ValueError, match="nested OPTIONAL"):
        parse_sparql(q)


def test_global_groups_distribute_over_union(ray_session):
    # algebraic identity (bag semantics): LeftJoin(Union(A,B), C) ==
    # Union(LeftJoin(A,C), LeftJoin(B,C)), and likewise for MINUS — the
    # engine's global-scope path must agree with the branch-scoped
    # rewrite on randomized graphs
    import numpy as np

    from nexus_forge_ray.forge import KnowledgeGraphForge
    rng = np.random.default_rng(42)
    subs = [f"d{i}" for i in range(8)]
    objs = [f"e{i}" for i in range(4)]
    for trial in range(4):
        rows = []
        for s in subs:
            if rng.random() < 0.6:
                rows.append((s, "lang", rng.choice(["en", "fr"])))
            if rng.random() < 0.5:
                rows.append((s, "cites", rng.choice(subs)))
            for _ in range(rng.integers(0, 3)):
                rows.append((s, "mentions", rng.choice(objs)))
            if rng.random() < 0.4:
                rows.append((s, "flag", "x"))
        t = pd.DataFrame(rows, columns=["subj", "pred", "obj"]) \
            .drop_duplicates()
        q_global = """SELECT ?d ?e WHERE {
          { ?d lang "en" } UNION { ?d cites ?x }
          OPTIONAL { ?d mentions ?e }
          MINUS { ?d flag ?f }
        }"""
        q_scoped = """SELECT ?d ?e WHERE {
          { ?d lang "en" . OPTIONAL { ?d mentions ?e }
            MINUS { ?d flag ?f } }
          UNION
          { ?d cites ?x . OPTIONAL { ?d mentions ?e }
            MINUS { ?d flag ?f } }
        }"""
        f = KnowledgeGraphForge()
        a = f.sparql(q_global, ray.data.from_pandas(t)).to_pandas()
        b = f.sparql(q_scoped, ray.data.from_pandas(t)).to_pandas()

        def canon(df):
            return sorted((r.d, None if pd.isna(r.e) else r.e)
                          for r in df.itertuples())
        assert canon(a) == canon(b), f"trial {trial} diverged"
