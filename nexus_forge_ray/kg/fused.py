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
import pyarrow as pa

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.kg.triples import explode_record
from nexus_forge_ray.mapping.mapper import DictionaryMapper, RuleContext
from nexus_forge_ray.ops.dedup import _BAND_MIX, MinHasher
from nexus_forge_ray.resolving.dictionary import DictionaryResolver

FEATURE_COLUMNS = ["kind", "page_nid", "sig_hash",
                   "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
                   "subj", "pred", "obj", "obj_is_iri", "obj_datatype"]

# Arrow schema of the feature union: numeric columns are fixed-width
# (zero-copy from the numpy kernels), strings are large_string so a block
# never risks 32-bit offset overflow at web scale.
FEATURE_SCHEMA = pa.schema([
    ("kind", pa.int8()), ("page_nid", pa.int64()),
    ("sig_hash", pa.uint64()),
    *[(f"b{i}", pa.uint64()) for i in range(8)],
    ("subj", pa.large_string()), ("pred", pa.large_string()),
    ("obj", pa.large_string()), ("obj_is_iri", pa.bool_()),
    ("obj_datatype", pa.large_string()),
])


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

    def _signature_arrays(self, batch: pd.DataFrame,
                          tok_lists=None) -> dict[str, np.ndarray]:
        """Numeric signature columns (kind/page_nid/sig_hash/b0..b7) as raw
        numpy — shared by the pandas and Arrow output paths."""
        sigs = self.hasher.signatures(batch["text"].tolist(), tok_lists)
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
            bh = np.full(n, (b * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF,
                         dtype=np.uint64)
            for j in range(chunk.shape[1]):
                bh ^= (chunk[:, j] + np.uint64(j + 1)) \
                    * _BAND_MIX[j % len(_BAND_MIX)]
            out[f"b{b}"] = bh
        return out

    def _signature_rows(self, batch: pd.DataFrame,
                        tok_lists=None) -> pd.DataFrame:
        df = pd.DataFrame(self._signature_arrays(batch, tok_lists))
        # "" placeholders (not None): object columns holding None make every
        # downstream pandas concat run per-value NA checks (profiled hotspot)
        df["subj"] = ""
        df["pred"] = ""
        df["obj"] = ""
        df["obj_is_iri"] = False
        df["obj_datatype"] = ""
        return df[FEATURE_COLUMNS]

    def _doc_triples_vectorized(self, batch: pd.DataFrame, plan: dict):
        """Simple flat mapping -> columnar triple arrays (no per-record eval).
        Mirrors explode_record for flat records: id key -> subject; type key ->
        rdf:type IRI; other keys -> literal/IRI objects by value shape."""
        from nexus_forge_ray.kg.triples import RDF_TYPE, _literal, expand_term
        n = len(batch)
        if "id" in plan and plan["id"][0] == "col":
            subj = batch[plan["id"][1]].astype(str)
        else:
            subj = pd.Series([plan.get("id", ("lit", ""))[1]] * n)
        out = []
        nids = batch["page_nid"].to_numpy()
        for key, (kind, val) in plan.items():
            if key == "id":
                continue
            if key == "type":
                vals = batch[val].astype(str) if kind == "col" \
                    else pd.Series([val] * n)
                obj = vals.map(lambda t: expand_term(
                    str(t), self.context, "http://example.org/vocab/"))
                out.append(pd.DataFrame({
                    "subj": subj, "pred": RDF_TYPE, "obj": obj,
                    "obj_is_iri": True, "obj_datatype": "",
                    "page_nid": nids}))
                continue
            pred = expand_term(key, self.context, "http://example.org/vocab/")
            vals = batch[val] if kind == "col" else pd.Series([val] * n,
                                                              index=batch.index)
            if vals.dtype == object:  # string column: vectorized literal rules
                sv = vals.astype(str)
                is_iri = sv.str.startswith(
                    ("http://", "https://", "urn:")).to_numpy()
                from nexus_forge_ray.kg.triples import XSD_STRING
                keep_mask = vals.notna().to_numpy()
                out.append(pd.DataFrame({
                    "subj": subj.to_numpy()[keep_mask],
                    "pred": pred,
                    "obj": sv.to_numpy()[keep_mask],
                    "obj_is_iri": is_iri[keep_mask],
                    "obj_datatype": np.where(is_iri[keep_mask], "",
                                             XSD_STRING),
                    "page_nid": nids[keep_mask]}))
                continue
            lit = [(None if v is None else _literal(v)) for v in vals]
            keep = [i for i, x in enumerate(lit) if x is not None]
            out.append(pd.DataFrame({
                "subj": subj.iloc[keep].to_numpy(),
                "pred": pred,
                "obj": [lit[i][0] for i in keep],
                "obj_is_iri": [lit[i][1] for i in keep],
                "obj_datatype": [lit[i][2] or "" for i in keep],
                "page_nid": nids[keep]}))
        return out

    def _triple_frames(self, batch: pd.DataFrame,
                       tok_lists=None) -> list[pd.DataFrame]:
        """Raw triple frames (subj/pred/obj/obj_is_iri/obj_datatype/
        page_nid) — the union-padding happens per output path."""
        subjs, preds, objs, iris, dts, nids = [], [], [], [], [], []
        plan = self.mapper.compiled.simple_plan()
        vec_frames = None
        if plan is not None:
            vec_frames = self._doc_triples_vectorized(batch, plan)
        else:
            # document triples via the mapping engine (per-record eval path)
            for rec, nid in zip(batch.to_dict("records"),
                                batch["page_nid"].to_numpy()):
                mapped = self.mapper.map_record(rec)
                for s, p, o, is_iri, dt in explode_record(mapped, self.context):
                    subjs.append(s); preds.append(p); objs.append(o)
                    iris.append(is_iri); dts.append(dt or ""); nids.append(nid)
        # mention triples: vectorized token match + broadcast-KB resolve
        s2 = batch[["page_nid", "page_iri"]].copy()
        s2["token"] = tok_lists if tok_lists is not None \
            else batch["text"].str.split()
        ex = s2.explode("token")
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
        frames = []
        if vec_frames:
            frames.extend(vec_frames)
        if subjs:
            frames.append(pd.DataFrame({
                "subj": subjs, "pred": preds, "obj": objs,
                "obj_is_iri": np.asarray(iris, dtype=bool),
                "obj_datatype": dts,
                "page_nid": np.asarray(nids, dtype=np.int64)}))
        return frames

    def _triple_rows(self, batch: pd.DataFrame,
                     tok_lists=None) -> pd.DataFrame:
        frames = self._triple_frames(batch, tok_lists)
        if not frames:
            return _empty_features()
        df = pd.concat(frames, ignore_index=True)
        n = len(df)
        df["kind"] = np.ones(n, dtype=np.int8)
        df["sig_hash"] = np.zeros(n, dtype=np.uint64)
        for i in range(8):
            df[f"b{i}"] = np.zeros(n, dtype=np.uint64)
        return df[FEATURE_COLUMNS]

    def __call__(self, batch: "pd.DataFrame | pa.Table"):
        if isinstance(batch, pa.Table):
            return self._call_arrow(batch)
        if not len(batch):
            return _empty_features()
        tok_lists = batch["text"].str.split()  # tokenize ONCE per batch
        return pd.concat([self._signature_rows(batch, tok_lists),
                          self._triple_rows(batch, tok_lists)],
                         ignore_index=True)

    def _call_arrow(self, batch: pa.Table) -> pa.Table:
        """Arrow I/O wrapper: the feature rows leave the task as ONE Arrow
        table (fixed-width numerics zero-copy from numpy, strings packed
        into large_string buffers), so the materialized feature checkpoint
        is Arrow blocks — not pickled pandas object columns — in the
        object store. Internals stay the vectorized pandas/numpy kernels:
        tokenization + SipHash need Python strings exactly once either
        way, and that conversion happens here, on just the columns the
        fused pass reads."""
        if not len(batch):
            return FEATURE_SCHEMA.empty_table()
        df = pd.DataFrame({
            "page_nid": batch.column("page_nid").to_numpy(
                zero_copy_only=False)})
        for c in batch.column_names:
            if c != "page_nid":
                df[c] = batch.column(c).to_pandas()
        tok_lists = df["text"].str.split()

        # signature rows: numerics zero-copy from numpy, string padding as
        # typed nulls (free — no buffers, and downstream only reads the
        # numeric SIG_COLS of kind=0 rows)
        sig = self._signature_arrays(df, tok_lists)
        n_sig = len(df)
        LS = pa.large_string()
        sig_cols = [pa.array(sig["kind"]), pa.array(sig["page_nid"]),
                    pa.array(sig["sig_hash"])] \
            + [pa.array(sig[f"b{i}"]) for i in range(8)] \
            + [pa.nulls(n_sig, LS), pa.nulls(n_sig, LS),
               pa.nulls(n_sig, LS),
               pa.array(np.zeros(n_sig, dtype=bool)),
               pa.nulls(n_sig, LS)]
        sig_t = pa.Table.from_arrays(sig_cols, schema=FEATURE_SCHEMA)

        # triple rows: per-column concatenation straight into Arrow arrays
        # (skips the pandas union concat and its per-value NA checks —
        # profiled at ~20% of the stage)
        frames = self._triple_frames(df, tok_lists)
        if frames:
            def col(name, dtype=None):
                parts = [f[name].to_numpy(dtype=dtype) if dtype is not None
                         else f[name].to_numpy() for f in frames]
                return np.concatenate(parts) if len(parts) > 1 else parts[0]
            n_tri = sum(len(f) for f in frames)
            tri_cols = [
                pa.array(np.ones(n_tri, dtype=np.int8)),
                pa.array(col("page_nid", np.int64)),
                pa.array(np.zeros(n_tri, dtype=np.uint64))] \
                + [pa.array(np.zeros(n_tri, dtype=np.uint64))
                   for _ in range(8)] \
                + [pa.array(col("subj"), type=LS),
                   pa.array(col("pred"), type=LS),
                   pa.array(col("obj"), type=LS),
                   pa.array(col("obj_is_iri", bool)),
                   pa.array(col("obj_datatype"), type=LS)]
            tri_t = pa.Table.from_arrays(tri_cols, schema=FEATURE_SCHEMA)
            return pa.concat_tables([sig_t, tri_t])
        return sig_t
