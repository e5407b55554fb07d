"""Connected components: distributed min-label propagation vs local union-find."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.kg.canonicalize import (connected_components,
                                             union_find_local)


def test_union_find_local_basic():
    edges = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    comp = union_find_local(edges)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


@pytest.mark.parametrize("edges", [
    [(1, 2), (2, 3), (10, 11)],
    [(5, 4), (4, 3), (3, 2), (2, 1)],          # chain needs propagation depth
    [(1, 9), (9, 2), (2, 8), (7, 7)],
])
def test_distributed_matches_local(edges):
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    ds = ray.data.from_pandas(df)
    got = connected_components(ds, num_buckets=4).to_pandas()
    want = union_find_local(df)
    got_map = dict(zip(got["node"], got["component"]))
    for node, comp in want.items():
        assert got_map[node] == comp, (node, got_map, want)


def test_distributed_components_long_chains_fullrange_ids():
    """Regression: (1) graph contraction must converge on long-diameter
    graphs (plain min-label propagation capped at N rounds silently
    under-merged chains); (2) full-range int64 ids must survive the unwind's
    left joins exactly (NaN fill used to coerce int64 -> float64, zeroing
    low bits of every id above 2^53 — matched rows included)."""
    import numpy as np
    rng = np.random.default_rng(7)
    n = 1500
    ids = rng.integers(-2**62, 2**62, size=n).astype(np.int64)
    edges = pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    keep = rng.random(n - 1) >= 0.02       # ~30 chains, diameter ~50
    edges = edges[keep].reset_index(drop=True)
    got = connected_components(ray.data.from_pandas(edges),
                               num_buckets=8).to_pandas()
    got_map = dict(zip(got["node"], got["component"]))
    want = union_find_local(edges)
    assert len(got) == len(want)
    mism = [k for k in want if got_map.get(k) != want[k]]
    assert not mism, f"{len(mism)} mismatched nodes, e.g. {mism[:3]}"


def test_canonical_map_finds_exact_dups(sf_dir):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma delta epsilon zeta",
                 "alpha beta gamma delta epsilon zeta",
                 "one two three four five six seven",
                 "totally different content here now ok"],
    })
    from nexus_forge_ray.kg.canonicalize import canonical_map
    out = canonical_map(ray.data.from_pandas(docs), threshold=0.9).to_pandas()
    m = dict(zip(out["doc_id"], out["component"]))
    assert m.get(1) == 1 and m.get(2) == 1
    assert m.get(3, 3) == 3 and m.get(4, 4) == 4


def test_components_from_compact_distributed_fallback(sf_dir):
    """Force the rep-edge overflow path (rep_edge_limit=0): the distributed
    min-label propagation + bucketed member join must produce the same
    components as the bounded local union-find path."""
    from nexus_forge_ray.kg.fused import PageFeatures
    from nexus_forge_ray.kg import kb as KB
    from nexus_forge_ray.kg.canonicalize import components_from_compact
    from nexus_forge_ray.pipelines.kg_pipeline import (CONTEXT, PAGE_MAPPING,
                                                       _add_page_keys)
    from nexus_forge_ray.sources.pages import extract_text, synth_pages
    pages = extract_text(synth_pages(sf_dir, replicate=3))
    pages = pages.map_batches(_add_page_keys, batch_format="pandas")
    feats = pages.map_batches(
        PageFeatures(PAGE_MAPPING, CONTEXT, KB.DEFAULT_KB, KB.KB_TERMS,
                     num_perm=64, num_bands=8),
        batch_format="pandas", batch_size=None).materialize()
    sig_rows = feats.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["page_nid", "sig_hash"]
                          + [f"b{i}" for i in range(8)]],
        batch_format="pandas")
    local = components_from_compact(sig_rows, id_col="page_nid",
                                    num_bands=8).to_pandas()
    dist = components_from_compact(sig_rows, id_col="page_nid", num_bands=8,
                                   rep_edge_limit=0).to_pandas()
    lm = dict(zip(local["page_nid"], local["component"]))
    dm = dict(zip(dist["page_nid"], dist["component"]))
    assert lm == dm and len(lm) > 0
