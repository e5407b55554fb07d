"""Transitive closure / reachability over a (src, dst) edge Dataset.

The SPARQL `p+` path and ontology subsumption (rdfs:subClassOf closure —
the reference materializes it when loading schema dirs, see
/root/reference/kgforge/specializations/models/rdf/service.py owl:imports
handling) both reduce to directed reachability. Expressed scale-first as
iterated-doubling: after k rounds every path of length <= 2^k is present,
so diameter-D graphs converge in ceil(log2 D) rounds — each round ONE
bucketed hash join (paths ⋈ edges on the midpoint) plus ONE bucketed
distinct. Convergence is detected from the path count (a driver scalar).

At web scale the closure of a dense graph is quadratic — callers bound it
(`max_rounds`, or closing only a filtered predicate slice like a class
hierarchy, which is how this is meant to be used).
"""

from __future__ import annotations

import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import distinct_rows
from nexus_forge_ray.ops.joins import partitioned_join


def transitive_closure(edges: ray.data.Dataset, *, src: str = "src",
                       dst: str = "dst", max_rounds: int = 10,
                       num_buckets: int = 16) -> ray.data.Dataset:
    """All (src, dst) pairs connected by a directed path (path-doubling)."""
    paths = distinct_rows(edges, [src, dst], num_buckets=num_buckets,
                          keep_cols=[]).materialize()
    n = paths.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        # join paths(a -> m) with paths(m -> b): rename so the bucketed
        # join key is the midpoint on both sides
        lhs = paths.map_batches(
            lambda df: df.rename(columns={src: "__a", dst: "__m"}),
            batch_format="pandas")
        rhs = paths.map_batches(
            lambda df: df.rename(columns={src: "__m", dst: "__b"}),
            batch_format="pandas")
        new = partitioned_join(lhs, rhs, on="__m",
                               num_buckets=num_buckets,
                               lcols=["__a", "__m"], rcols=["__m", "__b"])
        new = new.map_batches(
            lambda df: df[df["__a"] != df["__b"]].rename(
                columns={"__a": src, "__b": dst})[[src, dst]],
            batch_format="pandas")
        # the sort shuffle behind distinct emits one output block per INPUT
        # block, and the union triples the input count each round (paths +
        # lhs + rhs) — without this repartition the block count grows 3^k
        # and per-round scheduling dominates (measured: 12→36→108→324
        # blocks, 1.8→17 s/round on a 475-edge graph)
        paths = distinct_rows(paths.union(new), [src, dst],
                              num_buckets=num_buckets,
                              keep_cols=[]) \
            .repartition(num_buckets).materialize()
        n2 = paths.count()
        if n2 == n:        # fixpoint
            break
        n = n2
    return paths


def reachable_from(edges: ray.data.Dataset, roots: list, *,
                   src: str = "src", dst: str = "dst",
                   max_rounds: int = 10,
                   num_buckets: int = 16) -> pd.DataFrame:
    """Nodes reachable from `roots` (frontier BFS — each round joins the
    frontier against the edge table; the frontier is the only state that
    moves, so this is the cheap variant when you need one closure cone,
    e.g. all subclasses of a single class)."""
    edges = edges.materialize()
    seen: set = set(roots)
    frontier = list(roots)
    for _ in range(max_rounds):
        if not frontier:
            break
        froz = frozenset(frontier)
        nxt = edges.map_batches(
            lambda df, fz=froz: pd.DataFrame(
                {"n": df.loc[df[src].isin(fz), dst].unique()}),
            batch_format="pandas").to_pandas()
        frontier = [x for x in pd.unique(nxt["n"]) if x not in seen] \
            if len(nxt) else []
        seen.update(frontier)
    return pd.DataFrame({"node": sorted(seen)})


def bfs_distances(edges: ray.data.Dataset, roots: list, *,
                  src: str = "src", dst: str = "dst",
                  max_rounds: int = 10,
                  num_buckets: int = 16) -> ray.data.Dataset:
    """Hop distance from `roots` to every reachable node (multi-source BFS).

    Scale-first twin of `reachable_from`: the visited set and the frontier
    are Datasets, never driver state — each round is ONE bucketed hash join
    (frontier ⋈ edges on the source endpoint) plus ONE bucketed distinct and
    ONE bucketed anti-join against the visited set, so a 10^9-node cone
    never ships node ids through the driver (the only driver scalar is the
    new-frontier count used for fixpoint detection). Returns (node, dist)
    with dist = minimum hop count (BFS order guarantees minimality).
    """
    from nexus_forge_ray.ops.joins import (partitioned_anti_join,
                                           partitioned_join)

    edges = edges.materialize()
    visited = ray.data.from_pandas(pd.DataFrame({
        "node": pd.Series(sorted(set(roots)), dtype=object),
        "dist": 0})).materialize()
    frontier = visited
    for r in range(1, max_rounds + 1):
        f = frontier.map_batches(
            lambda df: pd.DataFrame({src: df["node"]}),
            batch_format="pandas")
        nxt = partitioned_join(f, edges, on=src,
                               num_buckets=num_buckets,
                               lcols=[src], rcols=[src, dst])
        cand = distinct_rows(
            nxt.map_batches(lambda df: pd.DataFrame({"node": df[dst]}),
                            batch_format="pandas"),
            ["node"], num_buckets=num_buckets, keep_cols=[])
        new = partitioned_anti_join(cand, visited, on="node",
                                    num_buckets=num_buckets) \
            .map_batches(lambda df, rr=r: df.assign(dist=rr),
                         batch_format="pandas").materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited
