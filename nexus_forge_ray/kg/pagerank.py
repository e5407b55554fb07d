"""Fixed-iteration PageRank over a (src, dst) edge Dataset.

The reference exposes graph analytics only through SPARQL endpoints; this is
the Ray-Data-native equivalent of the rollups a KG-health pipeline runs on
the constructed graph. Iterative structure, expressed scale-first:

- the out-degree-annotated edge table is built ONCE (a single windowed
  exchange) and materialized — it is loop-invariant and reused every
  iteration; the node table with its dangling flag likewise costs one
  exchange (max(hasout) over the tagged src/dst union);
- each iteration is one bucketed join (ranks onto edge sources), one
  vectorized per-edge contribution, and one bucketed sum by destination —
  the rank table itself never leaves the cluster;
- the only driver scalars are N (node count) and the per-iteration dangling
  mass (one double from a distributed sum), mirroring how distributed
  PageRank handles sinks.

rank_new(n) = (1-d)/N + d * (sum_{e: src->n} rank(src)/outdeg(src) + DM/N)
where DM is the total rank mass on nodes with no out-edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_agg_join, partitioned_join


def pagerank(edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 3,
             num_buckets: int = 16,
             seeds: list | None = None,
             weight: str | None = None) -> ray.data.Dataset:
    """Ranks after `iters` power iterations; returns (node, rank).

    Nodes are the vertices touched by at least one edge (isolated records
    carry no rank mass to move). Deterministic for a fixed input.

    With `seeds`, runs PERSONALIZED PageRank: the teleport distribution is
    uniform over the seed nodes instead of all nodes —
    rank_new(n) = ((1-d) + d*DM) * p(n) + d * contrib(n), with p(n) = 1/|S|
    on seeds and 0 elsewhere (dangling mass also redistributes by p). The
    seed set ships in task closures (bounded: topic/entity seeds, never a
    corpus); seeds absent from the graph raise.

    With `weight` (an edge column of POSITIVE weights), runs WEIGHTED
    PageRank: a source's rank splits proportionally to edge weight —
    contrib(e) = rank(src) * w(e) / sum_w(src) — with the same exchange
    shape (the loop-invariant annotation becomes the weight sum instead of
    the out-degree count)."""
    # the edge table feeds node extraction AND the degree annotation —
    # materialize once so a lazy upstream pipeline (e.g. mention detection)
    # doesn't re-execute per consumer
    edges = edges.materialize()
    # loop-invariant degree-annotated edges in ONE exchange: outd is the
    # window-function shape (count OVER (PARTITION BY src)), not a separate
    # groupby + join
    from nexus_forge_ray.ops.agg import attach_group_stat
    # repartition before materializing: the sort shuffle emits one block per
    # INPUT block (128+ tiny blocks here), and per-block overhead would
    # dominate every iteration's exchange that re-reads these tables
    if weight is None:
        edeg = attach_group_stat(
            edges.map_batches(lambda df: df[[src, dst]],
                              batch_format="pandas"),
            src, dst, "size", "outd", num_buckets=num_buckets) \
            .repartition(num_buckets).materialize()
    else:
        edeg = attach_group_stat(
            edges.map_batches(
                lambda df: df[[src, dst, weight]].assign(
                    **{weight: df[weight].astype("float64")}),
                batch_format="pandas"),
            src, weight, "sum", "outd", num_buckets=num_buckets) \
            .repartition(num_buckets).materialize()
    # nodes + the loop-invariant dangling flag in ONE exchange: a node is
    # dangling iff it never appears as an edge source, so max(hasout) over
    # the tagged src/dst union decides it without a join
    srcs = edges.map_batches(
        lambda df: pd.DataFrame({"node": df[src],
                                 "__hasout": np.ones(len(df), dtype="int8")}),
        batch_format="pandas")
    dsts = edges.map_batches(
        lambda df: pd.DataFrame({"node": df[dst],
                                 "__hasout": np.zeros(len(df), dtype="int8")}),
        batch_format="pandas")
    nodes = hash_groupby_agg(srcs.union(dsts), "node",
                             {"__hasout": ("__hasout", "max")},
                             num_buckets=num_buckets) \
        .map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"],
                "dangling": df["__hasout"].to_numpy() == 0}),
            batch_format="pandas").repartition(num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "rank": pd.Series(dtype="float64")}),
            batch_format="pandas")

    sset: frozenset | None = None
    if seeds is not None:
        sset = frozenset(seeds)
        k = int(nodes.map_batches(
            lambda df, fz=sset: pd.DataFrame(
                {"k": [int(df["node"].isin(fz).sum())]}),
            batch_format="pandas").sum("k") or 0)
        if k == 0:
            raise ValueError("no personalization seed appears in the graph")

        def pvec(df: pd.DataFrame) -> np.ndarray:
            return np.where(df["node"].isin(sset), 1.0 / k, 0.0)

        ranks = nodes.map_batches(
            lambda df: df.assign(rank=pvec(df)),
            batch_format="pandas").materialize()
    else:
        ranks = nodes.map_batches(
            lambda df: df.assign(rank=1.0 / n), batch_format="pandas") \
            .materialize()

    for _ in range(iters):
        dm = (ranks.map_batches(
            lambda df: pd.DataFrame(
                {"r": [float(df.loc[df["dangling"], "rank"].sum())]}),
            batch_format="pandas").sum("r") or 0.0)
        rsrc = ranks.map_batches(
            lambda df: df[["node", "rank"]].rename(columns={"node": src}),
            batch_format="pandas")
        contrib = partitioned_join(edeg, rsrc, on=src,
                                   num_buckets=num_buckets,
                                   lcols=[src, dst, "outd"] +
                                         ([weight] if weight else []),
                                   rcols=[src, "rank"])
        # per-edge contribution + map-side combine, so the second shuffle
        # moves one row per (batch, node)
        def edge_contrib(df: pd.DataFrame) -> pd.DataFrame:
            r = df["rank"].astype("float64")
            if weight is not None:
                # (r * w) / outd — same association order as the SQL
                # oracle, keeping the floats bit-identical
                r = r * df[weight].astype("float64")
            return pd.DataFrame({"node": df[dst],
                                 "s": r / df["outd"].astype("float64")}) \
                .groupby("node", as_index=False)["s"].sum()

        contrib = contrib.map_batches(edge_contrib, batch_format="pandas")
        # aggregate contributions AND re-attach every node (keeping
        # zero-in-degree nodes + the dangling flag) in ONE bucketed shuffle
        joined = partitioned_agg_join(
            contrib, nodes, on="node", aggs={"s": ("s", "sum")},
            num_buckets=num_buckets, how="right",
            lcols=["node", "s"], rcols=["node", "dangling"])
        if sset is not None:
            jump = (1.0 - damping) + damping * dm   # mass teleporting by p

            def refresh(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "node": df["node"],
                    "dangling": df["dangling"].astype(bool),
                    "rank": jump * pvec(df) + damping
                    * pd.to_numeric(df["s"], errors="coerce")
                        .fillna(0.0).to_numpy()})
        else:
            base = (1.0 - damping) / n + damping * dm / n

            def refresh(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "node": df["node"],
                    "dangling": df["dangling"].astype(bool),
                    "rank": base + damping
                    * pd.to_numeric(df["s"], errors="coerce")
                        .fillna(0.0).to_numpy()})
        # repartition before materializing: the union+groupby chain breeds
        # blocks each iteration (the sort shuffle emits one block per input
        # block), and per-block overhead would otherwise grow the wall time
        # superlinearly with iteration count
        ranks = joined.map_batches(refresh, batch_format="pandas") \
            .repartition(num_buckets).materialize()
    return ranks.map_batches(lambda df: df[["node", "rank"]],
                             batch_format="pandas")
