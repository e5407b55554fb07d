"""Graph-level entailment operators: owl:sameAs canonicalization and RDFS
domain/range/subClassOf type inference.

Reference semantics anchor: nexus-forge resolves aliases onto canonical KB
ids (kgforge/core/archetypes/resolver.py — every resolve returns the KB's
canonical identifier) and validates with RDFS inference
(kgforge/specializations/models/rdf_model.py validate(inference="rdfs")).
Here both become DISTRIBUTED graph transforms over (subj, pred, obj)
Datasets instead of per-resource calls.

Scale notes:
- sameAs components run on the sameAs EDGE set only (tiny vs the triple
  table) via graph contraction (<= log2(n) levels); the canonical map stays
  a Dataset end-to-end and rewrites subj/obj with two bucketed LEFT joins —
  the map is never collected or broadcast (alias clusters of head entities
  are exactly the skewed case a broadcast would bake in).
- RDFS schema (domain/range/subClassOf) is CONFIG, kilobytes by nature; its
  reflexive-transitive subclass closure is computed once driver-side and the
  type emission is a single map-side pass over triples + one distinct.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sameas_canonicalize(triples: ray.data.Dataset, sameas: ray.data.Dataset,
                        *, a_col: str = "a", b_col: str = "b",
                        num_buckets: int = 32) -> ray.data.Dataset:
    """Rewrite every subject/object through owl:sameAs equivalence classes.

    The canonical id of each class is its LEXICOGRAPHICALLY SMALLEST member
    (deterministic, order-free). Components come from graph contraction over
    the sameAs edges (kg/canonicalize.connected_components — min-of-closed-
    neighborhood + quotient relabel, <= log2(n) levels on any topology, so
    long alias chains entail no long propagation). The rewrite is two
    bucketed LEFT joins (subj, then obj) + one bucketed distinct: merged
    duplicates collapse under RDF set semantics.
    """
    from nexus_forge_ray.kg.canonicalize import connected_components
    from nexus_forge_ray.ops.agg import distinct_rows
    from nexus_forge_ray.ops.joins import partitioned_join

    comps = connected_components(sameas, id_a=a_col, id_b=b_col,
                                 num_buckets=num_buckets)
    # component label IS the min member — the canonical id
    smap = comps.map_batches(
        lambda df: df.rename(columns={"component": "__canon"}),
        batch_format="pandas")

    def rewrite(col: str):
        key = smap.map_batches(
            lambda df, c=col: df.rename(columns={"node": c}),
            batch_format="pandas")
        return key

    t1 = partitioned_join(triples, rewrite("subj"), on="subj", how="left",
                          lcols=["subj", "pred", "obj"],
                          rcols=["subj", "__canon"], num_buckets=num_buckets)

    def apply_subj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"subj": df["__canon"].where(
            df["__canon"].notna(), df["subj"]),
            "pred": df["pred"], "obj": df["obj"]})

    t1 = t1.map_batches(apply_subj, batch_format="pandas")
    t2 = partitioned_join(t1, rewrite("obj"), on="obj", how="left",
                          lcols=["subj", "pred", "obj"],
                          rcols=["obj", "__canon"], num_buckets=num_buckets)

    def apply_obj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"subj": df["subj"], "pred": df["pred"],
                             "obj": df["__canon"].where(
                                 df["__canon"].notna(), df["obj"])})

    merged = t2.map_batches(apply_obj, batch_format="pandas")
    return distinct_rows(merged, ["subj", "pred", "obj"],
                         num_buckets=num_buckets)


def subclass_closure(subclass_edges: list[tuple[str, str]]
                     ) -> dict[str, list[str]]:
    """Reflexive-transitive rdfs:subClassOf closure of a SCHEMA-sized edge
    list — config, not data, so plain Python is the right altitude. Output
    lists are sorted for determinism."""
    supers: dict[str, set[str]] = {}
    nodes = {c for e in subclass_edges for c in e}
    for c in nodes:
        supers[c] = {c}
    changed = True
    while changed:
        changed = False
        for c, p in subclass_edges:
            new = supers[c] | supers.get(p, {p})
            if new != supers[c]:
                supers[c] = new
                changed = True
    return {c: sorted(s) for c, s in supers.items()}


def rdfs_infer_types(triples: ray.data.Dataset, *,
                     domain: dict[str, str], range_: dict[str, str],
                     subclass_edges: list[tuple[str, str]],
                     num_buckets: int = 32) -> ray.data.Dataset:
    """RDFS entailment of rdf:type facts: rules rdfs2 (domain), rdfs3
    (range) and rdfs9/11 (subClassOf propagation, reflexive-transitive).

    One vectorized map-side pass emits (node, type) per triple from the
    broadcast-by-closure schema maps, pre-expanded through the subclass
    closure (so no per-type join); one bucketed distinct dedupes. Returns
    (node, type) rows.
    """
    from nexus_forge_ray.ops.agg import distinct_rows

    closure = subclass_closure(subclass_edges)

    def expand(mapping: dict[str, str]) -> dict[str, list[str]]:
        """pred -> closure-expanded type list, precomputed once."""
        return {p: closure.get(cls, [cls]) for p, cls in mapping.items()}

    dom_t = expand(domain)
    rng_t = expand(range_)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        # loop over SCHEMA entries (kilobytes), vectorized over the rows
        nodes, types = [], []
        for node_col, t_map in (("subj", dom_t), ("obj", rng_t)):
            preds = df["pred"]
            for p, ts in t_map.items():
                vals = df.loc[preds == p, node_col].to_numpy()
                if len(vals) == 0:
                    continue
                nodes.append(np.repeat(vals, len(ts)))
                types.append(np.tile(np.asarray(ts, dtype=object), len(vals)))
        if not nodes:
            return pd.DataFrame({"node": pd.Series(dtype=object),
                                 "type": pd.Series(dtype=object)})
        out = pd.DataFrame({"node": np.concatenate(nodes),
                            "type": np.concatenate(types)})
        return out.drop_duplicates()  # map-side pre-dedup shrinks the shuffle

    emitted = triples.map_batches(emit, batch_format="pandas")
    return distinct_rows(emitted, ["node", "type"], num_buckets=num_buckets)
