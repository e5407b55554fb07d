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
