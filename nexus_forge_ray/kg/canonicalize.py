"""Canonicalization: connected components over candidate near-duplicate pairs.

Not present in the reference (it resolves each mention independently); this is
the scalable replacement demanded by the north rule: MinHash-LSH blocking
(ops.dedup.minhash_candidate_pairs) produces candidate edges; distributed
min-label propagation computes connected components; every member maps to the
component's minimum id (the canonical representative).

Scale properties:
- each iteration = one bucketed hash join (labels onto edge endpoints) + one
  groupby(min); iterations ~ component diameter (near-dup clusters are tiny).
- convergence detected via the monotone total-label sum (labels only ever
  decrease), one tiny aggregate per round — no driver-side label table.
- head-entity skew: the join/groupby keys are node ids, pre-bucketed by hash;
  a giant component stays distributed because we only ship (node, label) pairs.

For candidate sets that are provably small (blocking output ≪ corpus) the
driver-side union-find `union_find_local` is also provided and used by tests
as the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from ray.data.aggregate import Min, Sum

from nexus_forge_ray.utils import stable_hash_u64


def union_find_local(edges: pd.DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b") -> dict:
    """Driver-side union-find (path compression) — oracle + small-case path."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges[id_a], edges[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def connected_components(edges: ray.data.Dataset, *, id_a: str = "id_a",
                         id_b: str = "id_b", max_iters: int = 25,
                         num_buckets: int = 32) -> ray.data.Dataset:
    """Distributed min-label propagation. Returns (node, component).

    edges: undirected candidate pairs. Every node's label converges to the
    minimum node id reachable from it.
    """
    # symmetrize: (src, dst) both directions; labels start as self
    def sym(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[id_a].to_numpy()
        b = batch[id_b].to_numpy()
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    # materialize: the candidate-edge set is small (blocking output ≪ corpus)
    # and is re-read every propagation round — without this, each round would
    # re-execute the whole upstream blocking pipeline (lazy recompute).
    sym_edges = edges.map_batches(sym, batch_format="pandas").materialize()

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["src"], "label": batch["src"]})

    labels = sym_edges.map_batches(init_labels, batch_format="pandas") \
        .groupby("node").aggregate(Min("label", alias_name="label"))

    prev_sum = None
    for _ in range(max_iters):
        # ship each node's current label to its neighbors (bucketed join),
        # then take the min over {own label} ∪ {neighbor labels}
        lab = labels.map_batches(
            lambda df: df.rename(columns={"node": "src"}), batch_format="pandas")
        from nexus_forge_ray.ops.joins import partitioned_join
        msgs = partitioned_join(sym_edges, lab, on="src",
                                num_buckets=num_buckets)
        prop = msgs.map_batches(
            lambda df: df[["dst", "label"]].rename(columns={"dst": "node"}),
            batch_format="pandas")
        combined = prop.union(labels)
        labels = combined.groupby("node").aggregate(Min("label", alias_name="label"))
        labels = labels.materialize()  # small: one row per node in the edge set
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "component"}),
        batch_format="pandas")


def canonical_map(docs: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.7,
                  num_perm: int = 64, num_bands: int = 16,
                  concurrency: int = 2) -> ray.data.Dataset:
    """Full canonicalization: MinHash blocking -> Jaccard verify -> components.
    Returns (doc_id, component) for every doc in a near-dup cluster; docs not
    listed are their own canonical representative.
    """
    from nexus_forge_ray.ops.dedup import (jaccard_verify_pairs,
                                           minhash_candidate_pairs)
    pairs = minhash_candidate_pairs(docs, num_perm=num_perm,
                                    num_bands=num_bands, text_col=text_col,
                                    id_col=id_col, concurrency=concurrency)
    verified = jaccard_verify_pairs(pairs, docs, threshold=threshold,
                                    text_col=text_col, id_col=id_col)
    comp = connected_components(verified)
    return comp.map_batches(
        lambda df: df.rename(columns={"node": id_col}), batch_format="pandas")
