"""Maximal independent set via Luby's algorithm, deterministic variant.

Luby (1986) with md5 priorities instead of RNG state: in round r every
alive node draws priority p(v) = md5(v || ':' || r) (cross-engine
reproducible — DuckDB's md5_number_lower); v joins the MIS when its
(p, node) pair is strictly smaller than every alive neighbor's; selected
nodes and their neighbors leave the alive set. Expected O(log n) rounds;
deterministic for a fixed input, so resumable and oracle-checkable.

MIS is the classic building block for parallel graph coloring /
scheduling conflict-free update batches (e.g. applying KG merges whose
conflict graph must not co-schedule adjacent merges).

Scale shape per round: priorities are recomputed map-side (never stored
across rounds), ONE bucketed join attaches each endpoint's priority to the
edge table, a bucketed min per node finds the best neighbor priority, and
selection is a vectorized compare; removals are two bucketed semi/anti
joins. All state is (node) / (src, dst) Datasets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
from nexus_forge_ray.ops.joins import (partitioned_anti_join,
                                       partitioned_join)
from nexus_forge_ray.utils import md5_u64


def _prio(nodes: pd.Series, rnd: int) -> np.ndarray:
    return md5_u64(nodes.astype(str) + f":{rnd}")


def _prio_hex(nodes: pd.Series, rnd: int) -> np.ndarray:
    """Priority as a fixed-width (16-char) lowercase hex string: lexicographic
    order on the string equals numeric order on the uint64, AND the value
    survives a null-padded left join exactly (a uint64 column with nulls
    converts to float64 in pandas, collapsing values above 2^53 — the hex
    string carries all 64 bits through the shuffle)."""
    return np.char.mod("%016x", _prio(nodes, rnd))


def maximal_independent_set(edges: ray.data.Dataset, *,
                            src: str = "src", dst: str = "dst",
                            max_rounds: int = 20,
                            num_buckets: int = 16) -> ray.data.Dataset:
    """(node, round) for every MIS member; undirected input expected as
    one row per edge in either orientation (self-loops are dropped: a
    self-looped node can never enter an independent set with itself and
    Luby treats it as its own neighbor — excluded by the distinct +
    src != dst filter)."""
    und = distinct_rows(
        edges.map_batches(
            lambda df, s=src, d=dst: pd.concat([
                pd.DataFrame({"src": df[s], "dst": df[d]}),
                pd.DataFrame({"src": df[d], "dst": df[s]})],
                ignore_index=True),
            batch_format="pandas"),
        ["src", "dst"], num_buckets=num_buckets, keep_cols=[]) \
        .map_batches(lambda df: df[df["src"] != df["dst"]],
                     batch_format="pandas") \
        .repartition(num_buckets).materialize()
    alive_nodes = distinct_rows(
        und.map_batches(lambda df: pd.DataFrame({"node": df["src"]}),
                        batch_format="pandas"),
        "node", num_buckets=num_buckets, keep_cols=[]) \
        .repartition(num_buckets).materialize()
    alive_edges = und
    chosen: list[ray.data.Dataset] = []
    for rnd in range(1, max_rounds + 1):
        if alive_nodes.count() == 0:
            break
        # best (min) neighbor priority per node: priorities are pure
        # functions of (node, round), so they attach map-side on the edge
        # table — no node-table join needed
        # ties: a 64-bit md5 collision between two alive neighbors is
        # ~2^-64 — the strict < makes BOTH lose such a tie (still a valid
        # independent choice, just deferring both to a later round), so
        # correctness never depends on tie order
        nbr_best = hash_groupby_agg(
            alive_edges.map_batches(
                lambda df, r=rnd: pd.DataFrame({
                    "node": df["src"],
                    "__np": _prio_hex(df["dst"], r)}),
                batch_format="pandas"),
            "node", {"__np": ("__np", "min")},
            num_buckets=num_buckets)
        joined = partitioned_join(
            alive_nodes, nbr_best, on="node", how="left",
            num_buckets=num_buckets,
            lcols=["node"], rcols=["node", "__np"])

        def select(df: pd.DataFrame, r: int = rnd) -> pd.DataFrame:
            p = _prio_hex(df["node"], r)
            # priorities travel as fixed-width hex strings: lexicographic
            # < on them is exact uint64 <, and the left join's null padding
            # (object dtype) never routes them through float64
            isna = df["__np"].isna().to_numpy()
            win = isna.copy()
            if (~isna).any():
                nb = df.loc[~isna, "__np"].to_numpy().astype("U16")
                win[~isna] = p[~isna] < nb
            return pd.DataFrame({"node": df.loc[win, "node"],
                                 "round": np.int64(r)})

        sel = joined.map_batches(select, batch_format="pandas") \
            .repartition(num_buckets).materialize()
        chosen.append(sel)
        # drop selected nodes and all their neighbors from the alive set
        sel_keys = sel.map_batches(
            lambda df: df[["node"]], batch_format="pandas")
        nbrs = partitioned_join(
            alive_edges.map_batches(
                lambda df: df.rename(columns={"src": "node"}),
                batch_format="pandas"),
            sel_keys, on="node", num_buckets=num_buckets,
            lcols=["node", "dst"], rcols=["node"]
        ).map_batches(lambda df: pd.DataFrame({"node": df["dst"]}),
                      batch_format="pandas")
        dead = distinct_rows(sel_keys.union(nbrs), "node",
                             num_buckets=num_buckets, keep_cols=[])
        # explicit lcols: round-end intermediates can be EMPTY datasets
        # (whole graph resolved this round) whose schema() is None
        alive_nodes = partitioned_anti_join(
            alive_nodes, dead, on="node", num_buckets=num_buckets,
            lcols=["node"]) \
            .repartition(num_buckets).materialize()
        e1 = partitioned_anti_join(
            alive_edges.map_batches(
                lambda df: df.rename(columns={"src": "node"}),
                batch_format="pandas"),
            dead, on="node", num_buckets=num_buckets,
            lcols=["node", "dst"])
        alive_edges = partitioned_anti_join(
            e1.map_batches(
                lambda df: df.rename(columns={"node": "src",
                                              "dst": "node"}),
                batch_format="pandas"),
            dead, on="node", num_buckets=num_buckets,
            lcols=["src", "node"]
        ).map_batches(lambda df: df.rename(columns={"node": "dst"}),
                      batch_format="pandas") \
            .repartition(num_buckets).materialize()
    else:
        if alive_nodes.count() > 0:
            raise RuntimeError(
                f"maximal_independent_set did not finish in {max_rounds} "
                "rounds")
    if not chosen:
        # empty edge set / self-loops only: no alive nodes, empty MIS
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series([], dtype=object),
             "round": pd.Series([], dtype=np.int64)}))
    out = chosen[0]
    for part in chosen[1:]:
        out = out.union(part)
    return out
