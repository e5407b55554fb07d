"""Fixed-iteration HITS (hubs & authorities) over a (src, dst) edge Dataset.

Kleinberg's HITS fits the doc->entity mention graph natively: documents act
as hubs (they point at many entities), entities as authorities (they are
pointed at by many documents). Same scale discipline as `kg.pagerank`:

- the edge table materializes once and is loop-invariant;
- each iteration is TWO bucketed joins + TWO bucketed sums (auth from
  hubs over in-edges, then hubs from auths over out-edges);
- the only driver scalars are the two L2 norms per iteration (one double
  each from a distributed sum of squares) — score tables never leave the
  cluster.

auth_i(n) = sum_{e: s->n} hub_{i-1}(s) / ||.||_2
hub_i(n)  = sum_{e: n->d} auth_i(d)    / ||.||_2
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_agg_join, partitioned_join


def _propagate(edges: ray.data.Dataset, scores: ray.data.Dataset,
               join_on: str, sum_to: str,
               num_buckets: int) -> ray.data.Dataset:
    """One HITS half-step: attach `scores` (node, x) to the edge endpoint
    `join_on`, sum x by the opposite endpoint `sum_to` — ONE bucketed join
    + ONE bucketed sum with a map-side combine."""
    keyed = scores.map_batches(
        lambda df, c=join_on: df.rename(columns={"node": c}),
        batch_format="pandas")
    contrib = partitioned_join(edges, keyed, on=join_on,
                               num_buckets=num_buckets,
                               lcols=[join_on, sum_to],
                               rcols=[join_on, "x"])
    partial = contrib.map_batches(
        lambda df, c=sum_to: df.rename(columns={c: "node"})
        .groupby("node", as_index=False)["x"].sum(),
        batch_format="pandas")
    return hash_groupby_agg(partial, "node", {"x": ("x", "sum")},
                            num_buckets=num_buckets)


def _l2_normalize(scores: ray.data.Dataset) -> ray.data.Dataset:
    ss = scores.map_batches(
        lambda df: pd.DataFrame(
            {"s": [float(np.square(df["x"].to_numpy(dtype=np.float64))
                         .sum())]}),
        batch_format="pandas").sum("s") or 0.0
    z = math.sqrt(ss)
    if z == 0.0:
        return scores
    return scores.map_batches(lambda df, zz=z: df.assign(x=df["x"] / zz),
                              batch_format="pandas")


def hits(edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst",
         iters: int = 2, num_buckets: int = 16) -> ray.data.Dataset:
    """(node, hub, auth) after `iters` mutual-reinforcement rounds, both
    score vectors L2-normalized per round; nodes with no score keep 0."""
    from nexus_forge_ray.ops.agg import distinct_rows
    edges = edges.materialize()
    nodes = distinct_rows(
        edges.map_batches(
            lambda df: pd.DataFrame(
                {"node": pd.concat([df[src], df[dst]], ignore_index=True)}),
            batch_format="pandas"),
        ["node"], num_buckets=num_buckets, keep_cols=[]) \
        .repartition(num_buckets).materialize()
    hub = nodes.map_batches(lambda df: df.assign(x=1.0),
                            batch_format="pandas").materialize()
    auth = None
    for _ in range(iters):
        auth = _l2_normalize(
            _propagate(edges, hub, src, dst, num_buckets)).materialize()
        hub = _l2_normalize(
            _propagate(edges, auth, dst, src, num_buckets)).materialize()
    # re-attach every node; missing side scores are 0 (e.g. pure
    # authorities have no hub mass) — one bucketed join per side
    out = partitioned_agg_join(
        hub.map_batches(lambda df: df.rename(columns={"x": "hub"}),
                        batch_format="pandas"),
        nodes, on="node", aggs={"hub": ("hub", "sum")},
        num_buckets=num_buckets, how="right",
        lcols=["node", "hub"], rcols=["node"])
    out = partitioned_agg_join(
        auth.map_batches(lambda df: df.rename(columns={"x": "auth"}),
                         batch_format="pandas"),
        out, on="node", aggs={"auth": ("auth", "sum")},
        num_buckets=num_buckets, how="right",
        lcols=["node", "auth"], rcols=["node", "hub"])
    return out.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"],
            "hub": pd.to_numeric(df["hub"], errors="coerce")
            .fillna(0.0).astype("float64"),
            "auth": pd.to_numeric(df["auth"], errors="coerce")
            .fillna(0.0).astype("float64")}),
        batch_format="pandas")
