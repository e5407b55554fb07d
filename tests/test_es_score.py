"""ES `_score` relevance ranking (core/filters.py elastic_score_page)."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.forge import KnowledgeGraphForge

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5],
    "source": ["src1", "src2", "src1", "src2", "src2"],
    "n_chars": [500, 450, 100, 100, 90],
    "text": ["alpha vector stream", "vector", "plain words",
             "stream stream", "nothing here"],
})


def _score_page(body):
    return KnowledgeGraphForge().elastic(
        body, data=ray.data.from_pandas(DOCS).repartition(2))


def test_boosted_should_scores(ray_session):
    body = {"query": {"bool": {"should": [
        {"term": {"source": {"value": "src1", "boost": 2.0}}},
        {"range": {"n_chars": {"gte": 400, "boost": 1.5}}},
        {"match": {"text": {"query": "vector stream", "boost": 0.5}}},
    ]}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    # doc1: 2 + 1.5 + 0.5*2 = 4.5 ; doc2: 1.5 + 0.5 = 2.0 ; doc3: 2.0 ;
    # doc4: 0.5 ; doc5: no should matches -> excluded
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["_score"].tolist() == [4.5, 2.0, 2.0, 0.5]


def test_must_filters_without_scoring(ray_session):
    body = {"query": {"bool": {
        "must": [{"range": {"n_chars": {"gte": 400}}}],
        "should": [{"term": {"source": {"value": "src1", "boost": 3.0}}}],
    }},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    # must keeps docs 1,2; doc2 scores 0 but stays (filter context)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["_score"].tolist() == [3.0, 0.0]


def test_size_cut_respects_tiebreak(ray_session):
    body = {"query": {"bool": {"should": [
        {"range": {"n_chars": {"gte": 0, "boost": 1.0}}}]}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 3}
    out = _score_page(body)
    # all five tie at 1.0 — the page takes the three smallest doc_ids
    assert out["doc_id"].tolist() == [1, 2, 3]


def test_script_score_cosine(ray_session):
    emb = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [0.6, 0.8], [1.0, 0.0], [-1.0, 0.0]],
    })
    body = {"query": {"script_score": {
        "query": {"range": {"vec_id": {"gte": 1}}},
        "script": {
            "source": "cosineSimilarity(params.qv, 'embedding') + 1.0",
            "params": {"qv": [1.0, 0.0]}}}},
        "sort": ["_score", {"vec_id": "asc"}], "size": 3}
    out = KnowledgeGraphForge().elastic(
        body, data=ray.data.from_pandas(emb).repartition(2))
    assert out["vec_id"].tolist() == [2, 1, 3]
    np.testing.assert_allclose(out["_score"].to_numpy(), [2.0, 1.6, 0.0])


def test_constant_score_clause(ray_session):
    body = {"query": {"bool": {"should": [
        {"constant_score": {
            "filter": {"term": {"source": "src1"}}, "boost": 7.0}},
    ]}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    assert out["doc_id"].tolist() == [1, 3]
    assert out["_score"].tolist() == [7.0, 7.0]


def test_terms_clause_membership(ray_session):
    from nexus_forge_ray.core.filters import filters_from_elastic, search
    ds = ray.data.from_pandas(DOCS)
    f = filters_from_elastic({"query": {"terms": {"source": ["src1"]}}})
    assert sorted(search(ds, *f).to_pandas()["doc_id"]) == [1, 3]
    f = filters_from_elastic({"query": {"bool": {"must_not": [
        {"terms": {"source": ["src1"]}}]}}})
    assert sorted(search(ds, *f).to_pandas()["doc_id"]) == [2, 4, 5]
    # terms as a scored should clause: constant score per clause
    body = {"query": {"bool": {"should": [
        {"terms": {"source": ["src1", "nope"]}}]}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    assert out["doc_id"].tolist() == [1, 3]
    assert out["_score"].tolist() == [1.0, 1.0]


def test_score_sort_object_form(ray_session):
    # ES object form {"_score": {"order": "desc"}} routes to the scorer too
    body = {"query": {"bool": {"should": [
        {"term": {"source": {"value": "src1", "boost": 2.0}}}]}},
        "sort": [{"_score": {"order": "desc"}}, {"doc_id": "asc"}],
        "size": 10}
    out = _score_page(body)
    assert out["doc_id"].tolist() == [1, 3]


def test_terms_clause_tolerates_boost_keys(ray_session):
    # ES allows sibling option keys next to the field entry (ADVICE r4)
    from nexus_forge_ray.core.filters import filters_from_elastic, search
    ds = ray.data.from_pandas(DOCS)
    f = filters_from_elastic({"query": {"terms": {
        "source": ["src1"], "boost": 1.0, "_name": "named"}}})
    assert sorted(search(ds, *f).to_pandas()["doc_id"]) == [1, 3]


def test_empty_query_is_match_all(ray_session):
    # ES: a missing/empty query is match_all with _score 1.0 (ADVICE r4)
    for body in (
        {"sort": ["_score", {"doc_id": "asc"}], "size": 10},
        {"query": {}, "sort": ["_score", {"doc_id": "asc"}], "size": 10},
        {"query": {"match_all": {}}, "sort": ["_score", {"doc_id": "asc"}],
         "size": 10},
    ):
        out = _score_page(body)
        assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
        assert out["_score"].tolist() == [1.0] * 5


def test_bm25_match_scoring(ray_session):
    # "similarity": "bm25" ranks match clauses by the Lucene formula
    # instead of constant-per-term. Hand-computed over DOCS:
    # N=5, dl=(3,1,2,2,2), avgdl=2; df(vector)=df(stream)=2
    body = {"query": {"bool": {"should": [
        {"match": {"text": {"query": "vector stream"}}}]}},
        "similarity": "bm25",
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    idf = np.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def s(tf, dl, nterms=1):
        return nterms * idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2))
    exp = {1: s(1, 3) * 2, 2: s(1, 1), 4: s(2, 2)}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert out["doc_id"].tolist() == [k for k, _ in want]
    np.testing.assert_allclose(out["_score"].to_numpy(),
                               [v for _, v in want], rtol=1e-12)


def test_bm25_repeated_token_tf(ray_session):
    # adjacent repeats must all count (lookahead boundary): doc4 has
    # tf(stream)=2, not 1
    body = {"query": {"bool": {"should": [
        {"match": {"text": {"query": "stream"}}}]}},
        "similarity": "bm25",
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    # df(stream)=2 (docs 1 and 4); doc4 (tf=2, dl=2) outranks doc1 (tf=1, dl=3)
    assert out["doc_id"].tolist() == [4, 1]


def test_bm25_multi_match(ray_session):
    # multi_match expands to per-field match scorers; with similarity bm25
    # each field scores BM25 against its own corpus stats and boosts apply
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "title": ["vector db", "plain", "vector store"],
        "body": ["a vector", "vector vector here", "nothing"],
    })
    body = {"query": {"bool": {"should": [
        {"multi_match": {"query": "vector",
                         "fields": ["title^2", "body"]}}]}},
        "similarity": "bm25",
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = KnowledgeGraphForge().elastic(
        body, data=ray.data.from_pandas(docs).repartition(2))
    # title: N=3 df=2 avgdl=5/3; body: N=3 df=2 avgdl=2
    idf = np.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)

    def bm(tf, dl, avgdl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    exp = {1: 2 * bm(1, 2, 5 / 3) + bm(1, 2, 2.0),
           2: bm(2, 3, 2.0),
           3: 2 * bm(1, 2, 5 / 3)}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert out["doc_id"].tolist() == [k for k, _ in want]
    np.testing.assert_allclose(out["_score"].to_numpy(),
                               [v for _, v in want], rtol=1e-12)


def test_minimum_should_match_scoring(ray_session):
    # msm=2: only docs matching >= 2 SHOULD CLAUSES survive (a multi-term
    # match is one clause no matter how many of its terms hit)
    body = {"query": {"bool": {
        "should": [
            {"term": {"source": "src1"}},
            {"range": {"n_chars": {"gte": 400}}},
            {"match": {"text": {"query": "vector stream"}}},
        ],
        "minimum_should_match": 2}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    # doc1: src1+range+match(2 terms) = 3 clauses, score 1+1+2=4
    # doc2: range+match = 2 clauses, score 1+1=2
    # doc3: src1 only (1 clause) -> gated out; doc4: match only -> out
    assert out["doc_id"].tolist() == [1, 2]
    assert out["_score"].tolist() == [4.0, 2.0]


def test_minimum_should_match_beside_must(ray_session):
    # per ES, an explicit msm >= 1 gates even when must/filter is present
    body = {"query": {"bool": {
        "must": [{"range": {"n_chars": {"gte": 90}}}],
        "should": [{"term": {"source": "src1"}},
                   {"match": {"text": {"query": "stream"}}}],
        "minimum_should_match": 1}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}
    out = _score_page(body)
    # all docs pass must; src1 -> 1,3; stream -> 1,4 ; docs 2,5 match no
    # should clause and msm=1 gates them out
    assert out["doc_id"].tolist() == [1, 3, 4]


def test_minimum_should_match_string_forms(ray_session):
    # ES value forms: "2", "50%", negative int; combinators fail loudly
    base = {"query": {"bool": {
        "should": [
            {"term": {"source": "src1"}},
            {"range": {"n_chars": {"gte": 400}}},
            {"match": {"text": {"query": "stream"}}},
        ]}},
        "sort": ["_score", {"doc_id": "asc"}], "size": 10}

    def with_msm(m):
        import copy
        b = copy.deepcopy(base)
        b["query"]["bool"]["minimum_should_match"] = m
        return _score_page(b)

    # "2" == 2: doc1 matches 3 clauses, doc2 two (range+... src2,450,
    # 'vector' no stream) -> doc2 matches range only = 1 -> out;
    # doc4 matches match only = 1 -> out; doc3 matches src1 only -> out
    assert with_msm("2")["doc_id"].tolist() == [1]
    # "50%" of 3 clauses -> floor(1.5) = 1
    assert with_msm("50%")["doc_id"].tolist() == with_msm(1)["doc_id"].tolist()
    # -1 -> 3-1 = 2
    assert with_msm(-1)["doc_id"].tolist() == [1]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="minimum_should_match"):
        with_msm("2<75%")
