"""Fused per-page feature extraction — the flagship's single-pass hot stage.

Ray Data fuses consecutive map_batches into one task pipeline, but a fan-out
(three branches reading the same pages) forces a checkpoint of the full page
text through the object store. `PageFeatures` restores the single pass by
emitting everything downstream needs as ONE tagged union of compact rows:

    kind=0  signature row: (page_nid, sig_hash, b0..b7)   ~80 B/page
    kind=1  triple row:    (page_nid, subj, pred, obj, obj_is_iri,
                            obj_datatype)                  ~150 B/triple

The text (~600 B/page) never enters the object store; mention detection,
entity resolution (broadcast KB), DictionaryMapping and MinHash banding all
run inside the same task over the same in-memory batch. State (compiled
rules, regex, KB index, permutations) is built once per worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.kg.triples import explode_record
from nexus_forge_ray.mapping.mapper import DictionaryMapper, RuleContext
from nexus_forge_ray.ops.dedup import _BAND_MIX, MinHasher
from nexus_forge_ray.resolving.dictionary import DictionaryResolver

FEATURE_COLUMNS = ["kind", "page_nid", "sig_hash",
                   "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
                   "subj", "pred", "obj", "obj_is_iri", "obj_datatype"]


def _empty_features() -> pd.DataFrame:
    return pd.DataFrame({
        "kind": pd.Series(dtype="int8"),
        "page_nid": pd.Series(dtype="int64"),
        "sig_hash": pd.Series(dtype="uint64"),
        **{f"b{i}": pd.Series(dtype="uint64") for i in range(8)},
        "subj": pd.Series(dtype=object), "pred": pd.Series(dtype=object),
        "obj": pd.Series(dtype=object),
        "obj_is_iri": pd.Series(dtype=bool),
        "obj_datatype": pd.Series(dtype=object),
    })


class PageFeatures:
    """Terminal fused stage: validated pages -> signature rows + triple rows."""

    def __init__(self, mapping: dict, context: dict, kb_entries: list[dict],
                 kb_terms: list[str], num_perm: int = 64, num_bands: int = 8):
        self.mapper = DictionaryMapper(mapping, forge=RuleContext(),
                                       nas=(None, ""))
        self.context = dict(context)
        self.resolver = DictionaryResolver(kb_entries)
        self.terms = frozenset(kb_terms)
        self.hasher = MinHasher(num_perm=num_perm)
        self.num_bands = num_bands
        self.rows_per_band = max(1, num_perm // num_bands)

    def _signature_rows(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.hasher.signatures(batch["text"].tolist())  # (n, num_perm)
        n = len(batch)
        out = {"kind": np.zeros(n, dtype=np.int8),
               "page_nid": batch["page_nid"].to_numpy()}
        # full-signature hash (tier-1 exact collapse)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(sigs.shape[1]):
            h ^= (sigs[:, j] + np.uint64(j * 1315423911)) \
                * _BAND_MIX[j % len(_BAND_MIX)]
        out["sig_hash"] = h
        # per-band hashes (tier-2 LSH over representatives)
        for b in range(self.num_bands):
            chunk = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            bh = np.full(n, np.uint64(b) * np.uint64(0x9E3779B97F4A7C15),
                         dtype=np.uint64)
            for j in range(chunk.shape[1]):
                bh ^= (chunk[:, j] + np.uint64(j + 1)) \
                    * _BAND_MIX[j % len(_BAND_MIX)]
            out[f"b{b}"] = bh
        df = pd.DataFrame(out)
        df["subj"] = None
        df["pred"] = None
        df["obj"] = None
        df["obj_is_iri"] = False
        df["obj_datatype"] = None
        return df[FEATURE_COLUMNS]

    def _triple_rows(self, batch: pd.DataFrame) -> pd.DataFrame:
        subjs, preds, objs, iris, dts, nids = [], [], [], [], [], []
        # document triples via the mapping engine (compiled rules)
        for rec, nid in zip(batch.to_dict("records"),
                            batch["page_nid"].to_numpy()):
            mapped = self.mapper.map_record(rec)
            for s, p, o, is_iri, dt in explode_record(mapped, self.context):
                subjs.append(s); preds.append(p); objs.append(o)
                iris.append(is_iri); dts.append(dt); nids.append(nid)
        # mention triples: vectorized token match + broadcast-KB resolve
        s2 = batch[["page_nid", "page_iri", "text"]].copy()
        s2["token"] = s2["text"].str.split(" ")
        ex = s2[["page_nid", "page_iri", "token"]].explode("token")
        hits = ex[ex["token"].isin(self.terms)].drop_duplicates(
            subset=["page_nid", "token"])
        # resolve each UNIQUE mention once per batch, then a vectorized map
        lut = {}
        for tok in pd.unique(hits["token"]):
            r = self.resolver.resolve(tok)
            if isinstance(r, list):
                r = r[0] if r else None
            if r is not None:
                lut[tok] = r["id"]
        resolved = hits[hits["token"].isin(lut)]
        subjs.extend(resolved["page_iri"].tolist())
        preds.extend([KB.PRED_MENTIONS] * len(resolved))
        objs.extend(resolved["token"].map(lut).tolist())
        iris.extend([True] * len(resolved))
        dts.extend([None] * len(resolved))
        nids.extend(resolved["page_nid"].tolist())
        n = len(subjs)
        df = pd.DataFrame({
            "kind": np.ones(n, dtype=np.int8),
            "page_nid": np.asarray(nids, dtype=np.int64),
            "sig_hash": np.zeros(n, dtype=np.uint64),
            **{f"b{i}": np.zeros(n, dtype=np.uint64) for i in range(8)},
            "subj": subjs, "pred": preds, "obj": objs,
            "obj_is_iri": np.asarray(iris, dtype=bool),
            "obj_datatype": dts,
        })
        return df[FEATURE_COLUMNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return _empty_features()
        return pd.concat([self._signature_rows(batch),
                          self._triple_rows(batch)], ignore_index=True)
