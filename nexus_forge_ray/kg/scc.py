"""Distributed strongly connected components over a directed edge Dataset.

Algorithm: (forward-min, backward-min) label-pair refinement — the
coloring/FW-BW family from the parallel-SCC literature (Orzan's coloring;
Hong/Rodia/Olukotun's FW-BW-Trim; Slota/Rajamanickam/Madduri's Multistep),
re-expressed as Ray Data exchanges:

  repeat until every node is assigned:
    f(v) = min node id u with a directed path u ->* v   (forward min-reach)
    b(v) = min node id u with a directed path v ->* u   (backward min-reach)
    v is DONE when f(v) == b(v) == m: m reaches v and v reaches m, so
      v is in SCC(m); m is the minimum member, so the label is canonical.
    otherwise v survives with class key (f(v), b(v)); both labels are
      SCC-invariant, so an SCC never straddles two classes — restrict the
      edge set to endpoints in the SAME class and repeat.

Per-round progress is guaranteed: a surviving class (a, b) with a != b
cannot contain node a itself (a sits in class (a, .) with f(a) == a only
when nothing smaller reaches it, in which case a's own class is (a, b(a))
and assignment or a split follows), so the restriction strictly shrinks
every class's reachable set each round. Chains and rho-shaped tails — the
worst case for single-label coloring, which removes one root per round —
finish in TWO rounds here (f orders the chain, b is the identity on it,
so every class is a singleton and self-assigns next round). Empirically
rounds stay in the low single digits on web-ish graphs (the bench fixture
converges in 4).

Scale notes (the partitioning assumptions this op relies on):
- each min-reach fixpoint iteration is one edge-hop (labels join edges on
  the source endpoint) plus one pointer-jump (labels join labels on the
  label value — path doubling, so iterations ~ O(log diameter), not
  O(diameter)), then a bucketed min-groupby; every exchange ships
  (node, label) pairs only — O(V + E) bytes per iteration, never pairs
  of reachability tuples;
- fixpoint detection is a single scalar checksum (wrap-around sum of the
  label hashes) — monotone labels make a checksum tie a true fixpoint up
  to negligible hash-collision odds; no driver-side label sets;
- class restriction is two bucketed joins of the edge table against the
  surviving labels — O(E) per round;
- all state lives in materialized Datasets between rounds, so the loop is
  resumable from any round boundary.

Isolated nodes (touched by no edge) never enter the computation — they are
trivially their own SCCs; callers who track them should union them in, as
`kg_queries.kg_scc` does via the node table's left join semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_join
from nexus_forge_ray.utils import stable_hash_u64


def _checksum(labels: ray.data.Dataset) -> int:
    """Wrap-around uint64 sum of label hashes — equal checksums on a
    monotonically decreasing label table mean a true fixpoint."""
    part = labels.map_batches(
        lambda df: pd.DataFrame({"h": [int(
            stable_hash_u64(df["label"]).sum(dtype=np.uint64))]}),
        batch_format="pandas").to_pandas()
    return int(np.array(part["h"], dtype=np.uint64).sum(dtype=np.uint64))


def min_reach_labels(nodes: ray.data.Dataset, edges: ray.data.Dataset, *,
                     num_buckets: int = 16,
                     max_iters: int = 40) -> ray.data.Dataset:
    """label(v) = min node id that reaches v along `edges` (v included).

    `nodes` is a (node) Dataset, `edges` a materialized (src, dst) Dataset.
    Each iteration does one edge-hop and one pointer-jump (path doubling),
    so convergence takes O(log longest-path) iterations.
    """
    labels = nodes.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "label": df["node"]}),
        batch_format="pandas").materialize()
    prev = _checksum(labels)
    for _ in range(max_iters):
        hop = partitioned_join(
            edges,
            labels.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas"),
            on="src", num_buckets=num_buckets,
            lcols=["src", "dst"], rcols=["src", "label"]
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"],
                                     "label": df["label"]}),
            batch_format="pandas")
        lhs = labels.map_batches(
            lambda df: df.rename(columns={"label": "__m"}),
            batch_format="pandas")
        rhs = labels.map_batches(
            lambda df: df.rename(columns={"node": "__m",
                                          "label": "__l2"}),
            batch_format="pandas")
        jump = partitioned_join(
            lhs, rhs, on="__m", num_buckets=num_buckets,
            lcols=["node", "__m"], rcols=["__m", "__l2"]
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "label": df["__l2"]}),
            batch_format="pandas")
        labels = hash_groupby_agg(
            labels.union(hop).union(jump), "node",
            {"label": ("label", "min")}, num_buckets=num_buckets
        ).repartition(num_buckets).materialize()
        cur = _checksum(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"min_reach_labels did not converge in {max_iters} iterations "
        "(graph diameter exceeds 2^iters along min-label paths)")


def strongly_connected_components(
        edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst",
        num_buckets: int = 16, max_rounds: int = 12,
        max_iters: int = 40) -> ray.data.Dataset:
    """(node, scc) for every node touched by an edge; `scc` is the minimum
    member id of the node's strongly connected component."""
    edges = distinct_rows(
        edges.map_batches(
            lambda df, s=src, d=dst: pd.DataFrame(
                {"src": df[s], "dst": df[d]}),
            batch_format="pandas"),
        ["src", "dst"], num_buckets=num_buckets, keep_cols=[]) \
        .repartition(num_buckets).materialize()
    nodes = distinct_rows(
        edges.map_batches(
            lambda df: pd.DataFrame(
                {"node": pd.concat([df["src"], df["dst"]],
                                   ignore_index=True)}),
            batch_format="pandas"),
        "node", num_buckets=num_buckets, keep_cols=[]) \
        .repartition(num_buckets).materialize()

    assigned: list[ray.data.Dataset] = []
    for _ in range(max_rounds):
        fwd = min_reach_labels(nodes, edges, num_buckets=num_buckets,
                               max_iters=max_iters)
        # materialize: the backward fixpoint consumes `rev` once per
        # iteration — left lazy, the O(E) swap would re-execute every time
        rev = edges.map_batches(
            lambda df: pd.DataFrame({"src": df["dst"], "dst": df["src"]}),
            batch_format="pandas").materialize()
        bwd = min_reach_labels(nodes, rev, num_buckets=num_buckets,
                               max_iters=max_iters)
        pair = partitioned_join(
            fwd.map_batches(
                lambda df: df.rename(columns={"label": "__f"}),
                batch_format="pandas"),
            bwd.map_batches(
                lambda df: df.rename(columns={"label": "__b"}),
                batch_format="pandas"),
            on="node", num_buckets=num_buckets,
            lcols=["node", "__f"], rcols=["node", "__b"]).materialize()
        done = pair.map_batches(
            lambda df: df.loc[df["__f"] == df["__b"],
                              ["node", "__f"]].rename(
                                  columns={"__f": "scc"}),
            batch_format="pandas").materialize()
        assigned.append(done)
        rest = pair.map_batches(
            lambda df: df[df["__f"] != df["__b"]],
            batch_format="pandas").materialize()
        if rest.count() == 0:
            out = assigned[0]
            for part in assigned[1:]:
                out = out.union(part)
            return out
        nodes = rest.map_batches(
            lambda df: df[["node"]], batch_format="pandas").materialize()
        # keep only edges internal to a surviving (f, b) class: SCC edges
        # always survive (members share the pair), cross-class edges are
        # dead weight for every later round
        e1 = partitioned_join(
            edges.map_batches(
                lambda df: df.rename(columns={"src": "node"}),
                batch_format="pandas"),
            rest, on="node", num_buckets=num_buckets,
            lcols=["node", "dst"], rcols=["node", "__f", "__b"]
        ).map_batches(
            lambda df: df.rename(columns={"node": "src"}),
            batch_format="pandas")
        e2 = partitioned_join(
            e1.map_batches(
                lambda df: df.rename(columns={"dst": "node", "__f": "__fs",
                                              "__b": "__bs"}),
                batch_format="pandas"),
            rest, on="node", num_buckets=num_buckets,
            lcols=["src", "node", "__fs", "__bs"],
            rcols=["node", "__f", "__b"])
        edges = e2.map_batches(
            lambda df: df.loc[(df["__fs"] == df["__f"])
                              & (df["__bs"] == df["__b"]),
                              ["src", "node"]].rename(
                                  columns={"node": "dst"}),
            batch_format="pandas").repartition(num_buckets).materialize()
    raise RuntimeError(
        f"strongly_connected_components did not converge in {max_rounds} "
        "rounds (adversarial class-nesting depth; raise max_rounds)")
