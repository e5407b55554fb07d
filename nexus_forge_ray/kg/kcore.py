"""k-core decomposition over an undirected (e1, e2) edge Dataset.

The KG-health rollup after canonicalization: the k-core is the maximal
subgraph where every node keeps degree >= k — the standard way to find the
dense backbone of a co-occurrence / citation graph and prune noise nodes.

Iterative peeling, expressed scale-first: each round is ONE bucketed degree
count (explode both endpoints, partial counts per batch) and ONE broadcast
semi filter of the edge list against the surviving node set... with the
node set itself never exceeding the vertex table. Convergence (no edge
removed) is detected from the edge count, a driver scalar. Peeling rounds
are bounded by the graph's degeneracy ordering depth — small for power-law
web graphs (the dense core stabilizes in a handful of rounds).

The surviving-node filter broadcasts the DROPPED node set when it is the
smaller side (usually tiny per round); if a round drops more nodes than
`broadcast_cap` the filter falls back to two bucketed semi joins.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_join


def _degrees(edges: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    ends = edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": pd.concat([df["e1"], df["e2"]], ignore_index=True)}),
        batch_format="pandas")
    return hash_groupby_agg(ends, "node", {"deg": ("node", "count")},
                            num_buckets=num_buckets)


def kcore(edges: ray.data.Dataset, k: int, *, max_rounds: int = 10,
          num_buckets: int = 8,
          broadcast_cap: int = 5_000_000) -> pd.DataFrame:
    """Nodes of the k-core with their core-subgraph degree:
    (node, deg) — deg measured in the surviving subgraph."""
    edges = edges.map_batches(lambda df: df[["e1", "e2"]],
                              batch_format="pandas").materialize()
    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = _degrees(edges, num_buckets)
        dropped = deg.map_batches(
            lambda df: df.loc[df["deg"] < k, ["node"]],
            batch_format="pandas")
        n_dropped = dropped.count()
        if n_dropped == 0:
            break
        if n_dropped <= broadcast_cap:
            drop_set = frozenset(dropped.to_pandas()["node"])
            edges = edges.map_batches(
                lambda df, dz=drop_set: df[~df["e1"].isin(dz)
                                           & ~df["e2"].isin(dz)],
                batch_format="pandas").materialize()
        else:                                   # scale path: two semi joins
            keep = deg.map_batches(
                lambda df: df.loc[df["deg"] >= k, ["node"]],
                batch_format="pandas")
            for col in ("e1", "e2"):
                edges = partitioned_join(
                    edges,
                    keep.map_batches(
                        lambda df, c=col: df.rename(columns={"node": c}),
                        batch_format="pandas"),
                    on=col, num_buckets=num_buckets,
                    lcols=["e1", "e2"], rcols=[col])
            edges = edges.materialize()
        n2 = edges.count()
        if n2 == n_edges:
            break
        n_edges = n2
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype=object),
                             "deg": pd.Series(dtype="int64")})
    out = _degrees(edges, num_buckets).to_pandas()
    out["deg"] = out["deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)
