"""Negative sampling for KG-embedding training (TransE / DistMult style):
for every positive triple (s, p, o), emit a corrupted (s, p, o') with o'
drawn deterministically from the entity vocabulary, o' != o.

Reference semantics anchor: the reference's resolvers score mention
candidates against the KB entity inventory
(kgforge/specializations/resolvers/demo_resolver.py); link-prediction
training needs the same inventory re-used as a negative pool. Here the pool
is built and sampled fully distributed.

Determinism (and hence SQL-oracle reproducibility) comes from the md5 hash
basis: draw index = md5(s|o) mod V, stepping one slot forward when the draw
lands on the true object — the classic "corrupt the tail" sampler with a
fixed pseudo-random source instead of an RNG.

Scale design: the vocabulary index is (bucket, rank-within-bucket) + bucket
offsets — ONE bucketed row_number shuffle over the (much smaller than
triples) entity set; only the NUM_BUCKETS bucket counts ever reach the
driver. Draws resolve via two bucketed hash joins on the index (the draw
and its +1 fallback); triples and vocabulary never broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from nexus_forge_ray.utils import md5_u64


def negative_samples(triples: ray.data.Dataset, *,
                     subj_col: str = "subj", pred_col: str = "pred",
                     obj_col: str = "obj",
                     num_buckets: int = 32) -> ray.data.Dataset:
    """(subj, pred, obj) -> (subj, pred, obj, neg_obj) with a deterministic
    corrupted object per positive triple. Empty or single-entity vocabularies
    yield an empty result (no valid corruption exists)."""
    from nexus_forge_ray.ops.agg import (distinct_rows, grouped_row_number,
                                         hash_groupby_agg)
    from nexus_forge_ray.ops.joins import partitioned_join

    ents = distinct_rows(triples.select_columns([obj_col]), [obj_col],
                         num_buckets=num_buckets).materialize()

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__ebkt"] = (md5_u64(df[obj_col])
                        % np.uint64(num_buckets)).astype("int64")
        return df

    eb = ents.map_batches(add_bkt, batch_format="pandas").materialize()
    # bucket counts: NUM_BUCKETS ints — the only driver-side state
    counts = hash_groupby_agg(eb, "__ebkt", {"c": (obj_col, "count")},
                              num_buckets=num_buckets).to_pandas()
    counts = counts.sort_values("__ebkt")
    total = int(counts["c"].sum())
    if total < 2:
        return ray.data.from_pandas(pd.DataFrame(
            {subj_col: pd.Series(dtype=object),
             pred_col: pd.Series(dtype=object),
             obj_col: pd.Series(dtype=object),
             "neg_obj": pd.Series(dtype=object)}))
    offs = dict(zip(counts["__ebkt"].astype(int),
                    np.concatenate([[0], np.cumsum(
                        counts["c"].to_numpy())[:-1]]).astype(np.int64)))
    offs_ref = ray.put(offs)

    ranked = grouped_row_number(eb, "__ebkt", [obj_col], out="__rn",
                                num_buckets=num_buckets)

    def to_index(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)
        base = df["__ebkt"].map(off).to_numpy(dtype=np.int64)
        return pd.DataFrame({"idx": base + df["__rn"].to_numpy() - 1,
                             "ent": df[obj_col].to_numpy()})

    ents_idx = ranked.map_batches(to_index,
                                  batch_format="pandas").materialize()

    def draw(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[subj_col].astype(str) + "|" + df[obj_col].astype(str))
        i1 = (h % np.uint64(total)).astype("int64")
        return pd.DataFrame({subj_col: df[subj_col], pred_col: df[pred_col],
                             obj_col: df[obj_col], "i1": i1,
                             "i2": (i1 + 1) % total})

    td = triples.map_batches(draw, batch_format="pandas")
    e1 = ents_idx.map_batches(
        lambda df: df.rename(columns={"idx": "i1", "ent": "__n1"}),
        batch_format="pandas")
    e2 = ents_idx.map_batches(
        lambda df: df.rename(columns={"idx": "i2", "ent": "__n2"}),
        batch_format="pandas")
    j1 = partitioned_join(td, e1, on="i1", num_buckets=num_buckets,
                          lcols=[subj_col, pred_col, obj_col, "i1", "i2"],
                          rcols=["i1", "__n1"])
    j2 = partitioned_join(j1, e2, on="i2", num_buckets=num_buckets,
                          lcols=[subj_col, pred_col, obj_col, "i1", "i2",
                                 "__n1"],
                          rcols=["i2", "__n2"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        neg = df["__n1"].where(df["__n1"] != df[obj_col], df["__n2"])
        return pd.DataFrame({subj_col: df[subj_col], pred_col: df[pred_col],
                             obj_col: df[obj_col], "neg_obj": neg})

    return j2.map_batches(pick, batch_format="pandas")
