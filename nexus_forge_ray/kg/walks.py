"""Deterministic random-walk sampling over a (src, dst) edge Dataset.

Walk corpora feed KG-embedding trainers (DeepWalk / node2vec style): each
start node emits one walk of `length` steps; at step t the walker at node v
moves to the out-neighbor u minimizing a cross-engine-reproducible hash of
(walk_id, t, u) — a fixed pseudo-random choice with no RNG state, so walks
are byte-identical across reruns, engines and cluster sizes (the property
a resumable pipeline needs; true multinomial sampling would make every
retry a different corpus). Walks stop early at sink nodes.

Scale shape: one bucketed hash join per step (frontier ⋈ edges on the
source endpoint) followed by a bucketed min-by per walk — the frontier is
ONE row per live walk, the candidate table one row per (live walk,
out-edge); nothing is driver-side, and the emitted (walk_id, step, node)
rows stream into the result union. Hash basis is md5_u64 == DuckDB's
md5_number_lower, so a step unrolls to a SQL window per step for oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.joins import partitioned_join
from nexus_forge_ray.ops.agg import distinct_rows, min_by_rows
from nexus_forge_ray.utils import md5_u64


def random_walks(edges: ray.data.Dataset, *,
                 src: str = "src", dst: str = "dst",
                 length: int = 3, starts: ray.data.Dataset | None = None,
                 num_buckets: int = 16) -> ray.data.Dataset:
    """(walk_id, step, node) rows; walk_id is the start node, step 0 is the
    start itself. Next hop = out-neighbor minimizing
    md5(walk_id || ':' || step || ':' || neighbor), ties (never in
    practice) broken by neighbor order."""
    edges = edges.map_batches(
        lambda df, s=src, d=dst: pd.DataFrame({"src": df[s],
                                               "dst": df[d]}),
        batch_format="pandas").materialize()
    if starts is None:
        starts = distinct_rows(
            edges.map_batches(
                lambda df: pd.DataFrame({"node": df["src"]}),
                batch_format="pandas"),
            "node", num_buckets=num_buckets, keep_cols=[])
    frontier = starts.map_batches(
        lambda df: pd.DataFrame({"walk_id": df["node"], "node": df["node"],
                                 "step": np.int64(0)}),
        batch_format="pandas").repartition(num_buckets).materialize()
    parts = [frontier]
    for step in range(1, length + 1):
        cand = partitioned_join(
            frontier.map_batches(
                lambda df: pd.DataFrame({"walk_id": df["walk_id"],
                                         "src": df["node"]}),
                batch_format="pandas"),
            edges, on="src", num_buckets=num_buckets,
            lcols=["walk_id", "src"], rcols=["src", "dst"])

        def pick_key(df: pd.DataFrame, t: int = step) -> pd.DataFrame:
            basis = (df["walk_id"].astype(str) + f":{t}:"
                     + df["dst"].astype(str))
            return pd.DataFrame({
                "walk_id": df["walk_id"],
                "node": df["dst"],
                "step": np.int64(t),
                "__h": md5_u64(basis),
            })

        # composite (hash, node) order: the numeric hash stays numeric
        # (no per-row string building on the per-edge hot path); the node
        # column breaks the astronomically unlikely hash tie, matching the
        # oracle's ORDER BY md5, dst
        nxt = min_by_rows(cand.map_batches(pick_key, batch_format="pandas"),
                          "walk_id", ["__h", "node"],
                          num_buckets=num_buckets)
        frontier = nxt.map_batches(
            lambda df: df[["walk_id", "node", "step"]],
            batch_format="pandas").repartition(num_buckets).materialize()
        parts.append(frontier)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda df: df[["walk_id", "step", "node"]], batch_format="pandas")
