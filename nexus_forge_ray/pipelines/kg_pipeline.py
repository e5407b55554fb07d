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
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.kg.triples import sort_and_write
from nexus_forge_ray.sources.pages import extract_text, synth_pages
from nexus_forge_ray.utils import stable_hash_u64
from nexus_forge_ray.validation.shapes import PropertyConstraint, Shape

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


def _add_page_keys_arrow(batch: pa.Table) -> pa.Table:
    """Arrow twin of `_add_page_keys`: the url SipHash still runs through
    pandas (the one deliberate conversion — it must equal the pandas path
    bit-for-bit), everything else is pc kernels; html/text columns pass
    through zero-copy."""
    nid = (stable_hash_u64(batch.column("url").to_pandas())
           >> np.uint64(1)).astype("int64")
    nid_arr = pa.array(nid)
    iri = pc.binary_join_element_wise(
        pa.scalar(KB.DOC_BASE, type=pa.large_string()),
        pc.cast(nid_arr, pa.large_string()),
        pa.scalar("", type=pa.large_string()))
    return (batch.append_column("page_nid", nid_arr)
                 .append_column("page_iri", iri))


_LANG_SET = pa.array(["en", "es", "fr", "de", "zh", "und"])


def _validate_pages_arrow(batch: pa.Table) -> pa.Table:
    """PAGE_SHAPE as one vectorized Arrow mask (same verdicts as
    `validate_dataset(..., [PAGE_SHAPE])`, asserted in tests): url present
    + matches ^https?://, text present, lang present + in the enum. Emits
    the surviving rows directly (the flagship drops invalid rows anyway),
    with html/warc_ts already projected away."""
    url, text, lang = (batch.column("url"), batch.column("text"),
                       batch.column("lang"))
    ok = pc.and_(
        pc.and_(pc.is_valid(url),
                pc.match_substring_regex(url, "^(?:https?://)")),
        pc.and_(pc.is_valid(text),
                pc.and_(pc.is_valid(lang), pc.is_in(lang,
                                                    value_set=_LANG_SET))))
    cols = [c for c in batch.column_names if c not in ("html", "warc_ts")]
    return batch.select(cols).filter(pc.fill_null(ok, False))


def _dup_key_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Non-representative members of each component -> key rows to drop."""
    if "page_nid" not in df.columns:  # fully-empty block loses column names
        return pd.DataFrame({"page_nid": pd.Series(dtype="int64")})
    return df.loc[df["page_nid"] != df["component"], ["page_nid"]]


def drop_dup_triples(triples: ray.data.Dataset, dup_keys: ray.data.Dataset,
                     *, broadcast_limit: int = 50_000_000,
                     num_buckets: int = 32) -> ray.data.Dataset:
    """Drop triples of non-representative pages. Bounded hybrid plan:

    - dup count <= broadcast_limit (50M int64 ids = ~400 MB): sorted-array
      broadcast probe — ONE `ray.put` array, plasma-shared zero-copy by
      every worker on a node, no extra all-to-all. Measured at 10M pages:
      the alternative bucketed anti-join shuffles the FULL pre-dedup triple
      table (127M wide rows, ~15.5 GB buffered per union branch) through a
      sort exchange, and a single node's object store backpressures it to
      one concurrent task — the broadcast probe replaces that with a
      map-side searchsorted filter.
    - above the limit (10^11-page corpora where even ids outgrow a node):
      bucketed anti-join — the key set never touches the driver, both sides
      shuffle once by hash(page_nid). On a multi-node cluster the exchange
      is bandwidth-bound but fully distributed; project columns before it
      where possible.
    """
    from nexus_forge_ray.ops.joins import partitioned_anti_join
    dup_keys = dup_keys.materialize()  # small: one row per duplicate page
    n_dup = dup_keys.count()
    if n_dup == 0:
        return triples
    if n_dup > broadcast_limit:
        return partitioned_anti_join(
            triples, dup_keys, on="page_nid", num_buckets=num_buckets,
            lcols=["page_nid", "subj", "pred", "obj", "obj_is_iri",
                   "obj_datatype"])
    dup_nids = np.sort(dup_keys.to_pandas()["page_nid"].to_numpy())
    dup_ref = ray.put(dup_nids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)  # sorted; membership via searchsorted
        v = batch.column("page_nid").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(dups, v), len(dups) - 1)
        return batch.filter(pa.array(dups[pos] != v))

    return triples.map_batches(drop_dups, batch_format="pyarrow")


def flagship(sf_dir: str, *, replicate: int = 1, out_dir: str | None = None,
             concurrency: int | None = None, canonicalize: bool = True,
             shard: tuple[int, int] | None = None,
             write_sigs: bool = False,
             dup_broadcast_limit: int = 50_000_000,
             ) -> ray.data.Dataset | str:
    """Run the full DAG. Returns the triple Dataset, or the output dir when
    out_dir is given (sorted partitioned Parquet written).

    shard=(n, i) restricts the run to documents with doc_id % n == i — the
    unit of resumable execution (pipelines.sharded).
    """
    pages = extract_text(synth_pages(sf_dir, replicate=replicate, shard=shard))
    pages = pages.map_batches(_add_page_keys_arrow, batch_format="pyarrow")

    # PAGE_SHAPE as a vectorized Arrow mask (same verdicts as the generic
    # ShapeValidator — asserted in tests/test_pages.py); the generic pandas
    # validator remains the path for arbitrary shapes
    valid_pages = pages.map_batches(_validate_pages_arrow,
                                    batch_format="pyarrow")

    # ONE fused pass: synth -> extract -> validate -> mention-detect ->
    # resolve -> map -> triple-explode -> MinHash banding, all inside a single
    # fused task chain (Ray fuses the lazy map_batches). The only checkpoint
    # is the compact tagged feature union (~80 B/page signature rows + triple
    # rows) -- page text never enters the object store.
    from nexus_forge_ray.kg.fused import PageFeatures
    # batch_size=None: one batch per block — full blocks amortize per-call
    # overhead without cross-block bundling (which would collapse parallelism)
    feats = valid_pages.map_batches(
        PageFeatures(PAGE_MAPPING, CONTEXT, KB.DEFAULT_KB, KB.KB_TERMS,
                     num_perm=64, num_bands=8),
        batch_format="pyarrow", batch_size=None)
    feats = feats.materialize()

    TRIPLE_COLS = ["page_nid", "subj", "pred", "obj", "obj_is_iri",
                   "obj_datatype"]
    SIG_COLS = ["page_nid", "sig_hash"] + [f"b{i}" for i in range(8)]

    # kind-splits are zero-copy Arrow filter+project — no pandas frames
    triples = feats.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
                   .select(TRIPLE_COLS),
        batch_format="pyarrow")

    if write_sigs and out_dir:
        # persist compact signature rows alongside the shard output so a
        # later GLOBAL canonicalization phase can merge near-dups that cross
        # shard boundaries (pipelines.sharded.global_canonicalize)
        feats.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0))
                       .select(SIG_COLS),
            batch_format="pyarrow").write_parquet(f"{out_dir}/_sigs")

    # --- canonicalization: near-dup pages collapse to one representative
    # (dedup-then-process): two-tier components over the compact signature
    # rows (8 bands x 8 rows over 64 perms: P(candidate|j) = 1-(1-j^8)^8,
    # steep S-curve, >0.98 at j=0.9, <0.03 at j=0.5), then a broadcast dup
    # filter over the triple rows.
    if canonicalize:
        from nexus_forge_ray.kg.canonicalize import components_from_compact
        sig_rows = feats.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0))
                       .select(SIG_COLS),
            batch_format="pyarrow")
        # bound the block count entering the tier exchanges: feats carries
        # one-plus blocks per fused task (a 100-task run feeds 100+ tiny
        # sig blocks) and the exchange cost grows with block count, not
        # rows (measured: 128 seed blocks tripled the components wall).
        # One cheap all-to-all of ~80 B/page rows restores a fixed width;
        # skipped at small widths where it would only add an exchange.
        if feats.num_blocks() > 96:
            sig_rows = sig_rows.repartition(64)
        comp = components_from_compact(sig_rows, id_col="page_nid",
                                       num_bands=8)
        dup_keys = comp.map_batches(_dup_key_rows, batch_format="pandas")
        triples = drop_dup_triples(triples, dup_keys,
                                   broadcast_limit=dup_broadcast_limit)

    triples = triples.drop_columns(["page_nid"])
    if out_dir:
        return sort_and_write(triples, out_dir)
    return triples


def flagship_counters(sf_dir: str, **kw) -> dict:
    """Lineage counters for the run (Actions-summary shape)."""
    ds = flagship(sf_dir, **kw)
    n = ds.count()
    return {"triples": n}
