"""The flagship KG-construction pipeline (north rule):

    pages (Parquet / synthesized)                      stateless read
      -> extract_text                                  map_batches, byte-identical
      -> validate (shape check on page resources)      actor pool
      -> mention detection                             actor pool / vectorized
      -> entity resolution (dictionary KB)             actor pool
      -> DictionaryMapping -> page resources           map_batches (compiled rules)
      -> triple explode                                flat_map shape
      -> canonicalization (MinHash-LSH + components)   blocked shuffle
      -> sort(subj, pred) -> partitioned Parquet       + lineage manifests

All stages stream; the only materialized artifacts are the (small) near-dup
component map and per-shard counters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.kg.canonicalize import canonical_map
from nexus_forge_ray.kg.mentions import detect_mentions
from nexus_forge_ray.kg.triples import explode_dataset, sort_and_write
from nexus_forge_ray.mapping.mapper import RuleContext
from nexus_forge_ray.resolving.dictionary import resolve_dataset
from nexus_forge_ray.sources.pages import extract_text, synth_pages
from nexus_forge_ray.utils import stable_hash_u64
from nexus_forge_ray.validation.shapes import (PropertyConstraint, Shape,
                                               validate_dataset)

PAGE_SHAPE = Shape(target_type="Document", constraints=[
    PropertyConstraint(path="url", min_count=1, datatype="string",
                       pattern=r"https?://"),
    PropertyConstraint(path="text", min_count=1, datatype="string"),
    PropertyConstraint(path="lang", min_count=1,
                       in_values=["en", "es", "fr", "de", "zh", "und"]),
])

PAGE_MAPPING = {
    "id": 'x.page_iri',
    "type": "Document",
    "label": 'x.url',
    "inLanguage": 'x.lang',
}

CONTEXT = {
    "label": "http://www.w3.org/2000/01/rdf-schema#label",
    "inLanguage": "http://example.org/vocab/lang",
    "Document": KB.DOC_TYPE_IRI,
}


def _add_page_keys(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.copy()
    nid = (stable_hash_u64(batch["url"]) >> np.uint64(1)).astype("int64")
    batch["page_nid"] = nid
    batch["page_iri"] = KB.DOC_BASE + pd.Series(nid, index=batch.index).astype(str)
    batch["rtype"] = "Document"
    return batch


def flagship(sf_dir: str, *, replicate: int = 1, out_dir: str | None = None,
             concurrency: int | None = None, canonicalize: bool = True,
             ) -> ray.data.Dataset | str:
    """Run the full DAG. Returns the triple Dataset, or the output dir when
    out_dir is given (sorted partitioned Parquet written)."""
    pages = extract_text(synth_pages(sf_dir, replicate=replicate))
    pages = pages.map_batches(_add_page_keys, batch_format="pandas")

    validated = validate_dataset(pages, [PAGE_SHAPE], type_col="rtype",
                                 concurrency=concurrency)
    valid_pages = validated.map_batches(
        lambda df: df[df["valid"]], batch_format="pandas")

    # --- document triples via the mapping engine (compiled rule tree) --------
    from nexus_forge_ray.mapping.mapper import map_dataset
    mapped = map_dataset(valid_pages, PAGE_MAPPING, forge=RuleContext(),
                         nas=(None, ""), concurrency=concurrency)
    doc_triples = explode_dataset(mapped, record_col="mapped", context=CONTEXT)

    # --- mention detection + entity resolution -------------------------------
    mentions = detect_mentions(valid_pages, KB.KB_TERMS, id_col="page_iri",
                               text_col="text")
    resolved = resolve_dataset(mentions, KB.DEFAULT_KB, mention_col="mention",
                               strategy="EXACT_MATCH", concurrency=concurrency)

    def mention_triples(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch.dropna(subset=["entity_id"])
        return pd.DataFrame({
            "subj": hit["page_iri"], "pred": KB.PRED_MENTIONS,
            "obj": hit["entity_id"],
            "obj_is_iri": True, "obj_datatype": None,
        })

    m_triples = resolved.map_batches(mention_triples, batch_format="pandas")
    triples = doc_triples.union(m_triples)

    # --- canonicalization: near-dup pages share one canonical subject --------
    if canonicalize:
        comp = canonical_map(valid_pages, text_col="text", id_col="page_nid",
                             threshold=0.9, concurrency=concurrency)
        comp_df = comp.to_pandas()  # near-dup members only: small by design
        remap = {KB.DOC_BASE + str(nid): KB.DOC_BASE + str(c)
                 for nid, c in zip(comp_df["page_nid"], comp_df["component"])
                 if nid != c}
        if remap:
            remap_ref = ray.put(remap)

            def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
                m = ray.get(remap_ref)
                batch = batch.copy()
                batch["subj"] = batch["subj"].map(lambda s: m.get(s, s))
                mask = batch["obj_is_iri"].astype(bool)
                batch.loc[mask, "obj"] = batch.loc[mask, "obj"].map(
                    lambda s: m.get(s, s))
                return batch

            triples = triples.map_batches(rewrite, batch_format="pandas")
            # canonical merge can duplicate triples -> distinct
            triples = triples.groupby(["subj", "pred", "obj"]).map_groups(
                lambda g: g.head(1), batch_format="pandas")

    if out_dir:
        return sort_and_write(triples, out_dir)
    return triples


def flagship_counters(sf_dir: str, **kw) -> dict:
    """Lineage counters for the run (Actions-summary shape)."""
    ds = flagship(sf_dir, **kw)
    n = ds.count()
    return {"triples": n}
