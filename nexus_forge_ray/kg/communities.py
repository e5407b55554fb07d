"""Synchronous label-propagation community detection over a weighted
undirected edge Dataset.

The reference exposes graph analytics only through SPARQL endpoints; the
community rollup is the standard KG-health companion to components /
PageRank (`kg/canonicalize.py`, `kg/pagerank.py`). Deterministic variant so
a fixed number of rounds is exactly reproducible by unrolled SQL:

- every node starts labeled with itself;
- each round every node adopts the neighbor label with the highest incident
  weight sum, ties broken by the lexicographically smallest label;
- rounds are synchronous (all nodes update from the previous round's
  labels), the shape that distributes: one bucketed join (labels onto edge
  sources), one bucketed (node, label) weight sum, one grouped argmax —
  the exchanges move message rows, never the corpus, and the label table
  is the only loop state.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import (distinct_rows, grouped_topk,
                                     hash_groupby_agg)
from nexus_forge_ray.ops.joins import partitioned_join


def label_propagation(edges: ray.data.Dataset, *, src: str = "src",
                      dst: str = "dst", weight: str | None = None,
                      rounds: int = 2,
                      num_buckets: int = 16) -> ray.data.Dataset:
    """(node, label) after `rounds` synchronous updates."""
    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight] if weight is not None else 1
        return pd.concat([
            pd.DataFrame({"node": df[src], "__dst": df[dst], "__w": w}),
            pd.DataFrame({"node": df[dst], "__dst": df[src], "__w": w}),
        ], ignore_index=True)

    und = edges.map_batches(undirect, batch_format="pandas").materialize()
    labels = distinct_rows(
        und.map_batches(lambda df: df[["node"]], batch_format="pandas"),
        "node", num_buckets=num_buckets) \
        .map_batches(lambda df: df.assign(label=df["node"]),
                     batch_format="pandas")

    for _ in range(rounds):
        msgs = partitioned_join(und, labels, on="node",
                                num_buckets=num_buckets,
                                lcols=["node", "__dst", "__w"],
                                rcols=["node", "label"])
        counts = hash_groupby_agg(
            msgs.map_batches(
                lambda df: pd.DataFrame({"node": df["__dst"],
                                         "label": df["label"],
                                         "__w": df["__w"]}),
                batch_format="pandas"),
            ["node", "label"], {"tw": ("__w", "sum")},
            num_buckets=num_buckets)
        labels = grouped_topk(counts, "node", "tw", 1, ascending=False,
                              tiebreak=["label"],
                              num_buckets=num_buckets) \
            .map_batches(lambda df: df[["node", "label"]],
                         batch_format="pandas") \
            .repartition(num_buckets).materialize()  # bound per-round blocks
        # every node has >= 1 incident edge in the undirected expansion,
        # so the winner table covers all nodes — no keep-old fallback needed
    return labels
