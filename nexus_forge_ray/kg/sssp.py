"""Distributed single-source(s) shortest paths with positive edge weights.

Bellman-Ford with the delta/frontier optimization, as Ray Data exchanges:
per round, only nodes whose distance IMPROVED last round relax their
out-edges — one bucketed join (frontier ⋈ edges on the source endpoint),
one bucketed min-by destination, one bucketed outer-merge against the
running distance table to detect improvements. The distance table and the
frontier are Datasets end-to-end; the only driver scalar per round is the
improved-node count used for fixpoint detection. Positive weights make
every improvement monotone, so the fixpoint is the true shortest-path
distance; rounds are bounded by the longest shortest-path hop count.

Complements `kg.closure.bfs_distances` (unweighted hops) — same exchange
shape with a weight accumulator instead of a level counter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_join


def sssp(edges: ray.data.Dataset, sources: list, *,
         src: str = "src", dst: str = "dst", weight: str = "w",
         max_rounds: int = 30, num_buckets: int = 16,
         dist_dtype: str = "int64",
         exact: bool = True) -> ray.data.Dataset:
    """(node, dist) for every node reachable from `sources`; dist is the
    minimum total edge weight (weights must be positive). Source nodes get
    dist 0. The outer merge pads with NaN, so the final cast restores the
    caller-declared dtype (`dist_dtype`: int64 for integer weights — exact
    — or float64).

    With exact=False the result is the HOP-BOUNDED cheapest cost: after
    round r the frontier invariant gives dist(v) = min cost over paths of
    at most r edges, so running exactly `max_rounds` rounds without the
    convergence requirement answers "cheapest within H hops" (the bounded
    search a KG serves interactively, and the shape a bounded recursive
    SQL oracle can check)."""
    edges = edges.map_batches(
        lambda df, s=src, d=dst, w=weight: pd.DataFrame(
            {"src": df[s], "dst": df[d], "w": df[w]}),
        batch_format="pandas").materialize()
    dist = ray.data.from_pandas(pd.DataFrame({
        "node": pd.Series(sorted(set(sources)), dtype=object),
        "dist": np.int64(0)})).materialize()
    frontier = dist
    for _ in range(max_rounds):
        relax = partitioned_join(
            frontier.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas"),
            edges, on="src", num_buckets=num_buckets,
            lcols=["src", "dist"], rcols=["src", "dst", "w"]
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"],
                                     "dist": df["dist"] + df["w"]}),
            batch_format="pandas")
        # best candidate per node this round, then outer-merge with the
        # running table: a row improves when it is new or strictly smaller
        cand = hash_groupby_agg(relax, "node", {"dist": ("dist", "min")},
                                num_buckets=num_buckets)
        merged = partitioned_join(
            dist.map_batches(
                lambda df: df.rename(columns={"dist": "__old"}),
                batch_format="pandas"),
            cand.map_batches(
                lambda df: df.rename(columns={"dist": "__new"}),
                batch_format="pandas"),
            on="node", how="outer", num_buckets=num_buckets,
            lcols=["node", "__old"], rcols=["node", "__new"])

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            old = pd.to_numeric(df["__old"], errors="coerce")
            new = pd.to_numeric(df["__new"], errors="coerce")
            best = np.where(old.isna(), new,
                            np.where(new.isna(), old, np.minimum(old, new)))
            return pd.DataFrame({
                "node": df["node"],
                "dist": best,
                "__improved": old.isna() | (new.notna() & (new < old))})

        merged = merged.map_batches(pick, batch_format="pandas") \
            .repartition(num_buckets).materialize()
        frontier = merged.map_batches(
            lambda df: df.loc[df["__improved"], ["node", "dist"]],
            batch_format="pandas").repartition(num_buckets).materialize()
        dist = merged.map_batches(
            lambda df: df[["node", "dist"]],
            batch_format="pandas").repartition(num_buckets).materialize()
        if frontier.count() == 0:
            break
    else:
        if exact:
            raise RuntimeError(
                f"sssp did not converge in {max_rounds} rounds "
                "(longest shortest path exceeds the round budget)")
    def cast(df: pd.DataFrame, t: str = dist_dtype) -> pd.DataFrame:
        d = pd.to_numeric(df["dist"])
        if np.issubdtype(np.dtype(t), np.integer) \
                and not np.equal(np.mod(d.to_numpy(dtype="float64"), 1),
                                 0).all():
            raise ValueError(
                "sssp: non-integral distances with an integer dist_dtype "
                "(float edge weights?) — pass dist_dtype='float64'")
        return df.assign(dist=d.astype(t))

    return dist.map_batches(cast, batch_format="pandas")
