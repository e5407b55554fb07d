"""KG queries vs DuckDB oracles + rows-only sanity."""

import pytest

from nexus_forge_ray.pipelines import kg_queries
from nexus_forge_ray.pipelines.oracles import ORACLES

from .helpers import assert_frames_match, to_pandas

ORACLE_CASES = [
                "kg_graph_from", "kg_mentions", "kg_triples", "kg_resolve_exact",
                "kg_validate_customers", "kg_actions_summary", "kg_resolve_fuzzy",
                "kg_entity_popularity", "kg_triples_typed",
                "kg_bgp_filter", "kg_degree_dist", "kg_bgp_optional",
                "kg_pagerank", "kg_bgp_union", "kg_bgp_groupby",
                "kg_bgp_values", "kg_cooccur", "kg_triangles", "kg_kcore",
                "kg_communities", "kg_reachable", "kg_bgp_notexists",
                "kg_bgp_exists", "kg_bgp_construct", "kg_bgp_describe",
                "kg_bgp_groupconcat", "kg_bgp_bind", "kg_inlinks",
                "kg_bgp_having", "kg_bgp_count_distinct", "kg_bgp_star",
                "kg_bgp_alt", "kg_bgp_union_scoped", "kg_validate_logical",
                "kg_update", "kg_quads", "kg_graph_named", "kg_graph_var",
                "kg_graph_mixed", "kg_upsert_recrawl", "kg_graph_drop",
                "kg_graph_with_update", "kg_validate_strings",
                "kg_shortest_paths", "kg_bgp_filter_logic",
                "kg_bgp_optional_filter", "kg_pagerank_personalized",
                "kg_pagerank_weighted", "kg_random_walks",
                "kg_link_prediction",
                "kg_validate_sparql", "kg_hits", "kg_entity_jaccard",
                "kg_sameas_rewrite", "kg_infer_types",
                "kg_negative_samples"]


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_kg_query_matches_oracle(name, duck, sf_dir):
    got = kg_queries.QUERIES[name](sf_dir)
    want = duck.sql(ORACLES[name]).df()
    assert_frames_match(got, want)


def test_kg_components_rows(sf_dir):
    out = to_pandas(kg_queries.kg_components(sf_dir))
    # every component representative is the min doc_id of its members
    mins = out.groupby("component")["doc_id"].min()
    assert all(comp == m for comp, m in mins.items())


def test_kg_assemble_rows(sf_dir):
    out = to_pandas(kg_queries.kg_assemble(sf_dir))
    assert (out["n_props"] >= 1).all()
    assert out["subj"].str.startswith("http://example.org/doc/").all()


def test_pagerank_mass_and_order(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.pagerank import pagerank
    # star: hub -> a, b, c; plus chain a -> b. b should outrank a and c.
    edges = pd.DataFrame({"src": ["hub", "hub", "hub", "a"],
                          "dst": ["a", "b", "c", "b"]})
    pr = pagerank(ray.data.from_pandas(edges).repartition(2),
                  iters=4).to_pandas().set_index("node")["rank"]
    assert abs(pr.sum() - 1.0) < 1e-9          # mass conserved
    assert pr["b"] > pr["a"] > pr["c"] or pr["b"] > pr["c"]
    assert pr["b"] == pr.max()


def test_pagerank_personalized_seed_bias(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.pagerank import pagerank
    # a 3-cycle: uniform PageRank is symmetric (all equal); seeding on
    # 'a' must break the tie in a's favor, and unknown seeds must raise
    edges = pd.DataFrame({"src": ["a", "b", "c"], "dst": ["b", "c", "a"]})
    ds = ray.data.from_pandas(edges)
    # near-stationary (the cycle oscillates through early iterations):
    # r(a) = 0.15 + 0.85^3 r(a) -> a > b > c
    pr = pagerank(ds, iters=25, seeds=["a"]).to_pandas() \
        .set_index("node")["rank"]
    assert pr["a"] > pr["b"] > pr["c"]
    assert abs(pr.sum() - 1.0) < 1e-9
    with pytest.raises(ValueError, match="seed"):
        pagerank(ray.data.from_pandas(edges), seeds=["zz"])


def test_hits_star_graph(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.hits import hits
    # hub -> {a, b, c}; d -> a. hub is the best hub, a the best authority
    edges = pd.DataFrame({"src": ["hub", "hub", "hub", "d"],
                          "dst": ["a", "b", "c", "a"]})
    out = hits(ray.data.from_pandas(edges), iters=3).to_pandas() \
        .set_index("node")
    assert out["hub"].idxmax() == "hub"
    assert out["auth"].idxmax() == "a"
    # pure authorities carry no hub mass; L2 norms are 1
    assert out.loc["b", "hub"] == 0.0
    assert abs((out["auth"] ** 2).sum() - 1.0) < 1e-9
    assert abs((out["hub"] ** 2).sum() - 1.0) < 1e-9


def test_pagerank_empty_edges(ray_session):
    import pandas as pd
    import ray.data
    from nexus_forge_ray.kg.pagerank import pagerank
    edges = pd.DataFrame({"src": pd.Series(dtype=object),
                          "dst": pd.Series(dtype=object)})
    assert pagerank(ray.data.from_pandas(edges)).count() == 0
