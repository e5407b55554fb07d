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
             shard: tuple[int, int] | None = None,
             ) -> ray.data.Dataset | str:
    """Run the full DAG. Returns the triple Dataset, or the output dir when
    out_dir is given (sorted partitioned Parquet written).

    shard=(n, i) restricts the run to documents with doc_id % n == i — the
    unit of resumable execution (pipelines.sharded).
    """
    pages = extract_text(synth_pages(sf_dir, replicate=replicate, shard=shard))
    pages = pages.map_batches(_add_page_keys, batch_format="pandas")

    validated = validate_dataset(pages, [PAGE_SHAPE], type_col="rtype",
                                 concurrency=concurrency)
    valid_pages = validated.map_batches(
        lambda df: df[df["valid"]].drop(
            columns=["html", "warc_ts", "valid", "violation"]),
        batch_format="pandas")
    # The cleaned page set feeds several downstream branches (canonicalization,
    # doc triples, mention detection); without a checkpoint each branch would
    # lazily re-execute synth+extract+validate. Materialize once — html is
    # dropped first so the pinned working set is text-sized; the object store
    # spills to disk if it outgrows memory. At beyond-RAM scale substitute a
    # Parquet checkpoint (write once, read per branch).
    valid_pages = valid_pages.materialize()

    # --- canonicalization FIRST: near-dup pages collapse to one canonical
    # representative BEFORE any triple generation (dedup-then-process). This
    # replaces a post-hoc subject rewrite + global triple distinct (two full
    # shuffles over the triple set) with one broadcast filter over pages.
    if canonicalize:
        # 8 bands × 8 rows over 64 perms: P(candidate | j) = 1-(1-j^8)^8 —
        # steep S-curve with midpoint ≈ 0.74, >0.98 at j=0.9, <0.03 at j=0.5;
        # the band structure itself enforces the near-dup threshold (no
        # verification pass, no extra shuffle)
        comp = canonical_map(valid_pages, text_col="text", id_col="page_nid",
                             threshold=0.9, concurrency=concurrency,
                             num_perm=64, num_bands=8, verify="none")
        comp_df = comp.to_pandas()  # near-dup members only: small by design
        dup_nids = comp_df.loc[comp_df["page_nid"] != comp_df["component"],
                               "page_nid"].to_numpy()
        if len(dup_nids):
            dup_ref = ray.put(np.sort(dup_nids))

            def drop_dups(batch: pd.DataFrame) -> pd.DataFrame:
                dups = ray.get(dup_ref)  # sorted; membership via searchsorted
                v = batch["page_nid"].to_numpy()
                pos = np.minimum(np.searchsorted(dups, v), len(dups) - 1)
                return batch[dups[pos] != v]

            # lazy: the filter re-runs per consuming branch over the already-
            # materialized page checkpoint — cheaper than another barrier
            valid_pages = valid_pages.map_batches(drop_dups,
                                                  batch_format="pandas")

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

    if out_dir:
        return sort_and_write(triples, out_dir)
    return triples


def flagship_counters(sf_dir: str, **kw) -> dict:
    """Lineage counters for the run (Actions-summary shape)."""
    ds = flagship(sf_dir, **kw)
    n = ds.count()
    return {"triples": n}
