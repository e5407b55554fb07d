"""Triple P/R vs an INDEPENDENT reimplementation of the reference semantics.

The north rule requires emitted triples to match the reference pipeline's at
P/R >= 0.95. The expected set here is computed by a separate, pure-pandas
oracle that reimplements the semantics directly (mapping rules -> doc
triples; token-in-KB mention detection -> mention triples; exact-duplicate
collapse to the min-nid page) without any engine code paths.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.utils import stable_hash_u64


def expected_triples(sf_dir: str) -> set[tuple]:
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pandas()
    # page synthesis invariants (sources/pages.py): url/nid per (doc, replica=0)
    u = stable_hash_u64(pd.Series(docs["doc_id"].to_numpy() * 1000003)) \
        / np.float64(2 ** 64)
    host = (50 * u ** 3).astype(np.int64)
    urls = [f"https://host{h}.example.com/doc/{d}r0"
            for h, d in zip(host, docs["doc_id"])]
    nids = (stable_hash_u64(pd.Series(urls)) >> np.uint64(1)).astype("int64")
    docs = docs.assign(url=urls, nid=nids)

    # exact-duplicate collapse: identical text -> keep the min-nid page
    keep = docs.sort_values("nid").drop_duplicates(subset=["text"])
    iri = KB.DOC_BASE + keep["nid"].astype(str)

    expected: set[tuple] = set()
    label_iri = "http://www.w3.org/2000/01/rdf-schema#label"
    type_iri = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    for s, url, lang, text in zip(iri, keep["url"], keep["lang"], keep["text"]):
        expected.add((s, type_iri, KB.DOC_TYPE_IRI))
        expected.add((s, label_iri, url))
        expected.add((s, KB.PRED_LANG, lang))
        for tok in set(text.split()):
            if tok in KB.KB_TERMS:
                expected.add((s, KB.PRED_MENTIONS, KB.BASE_IRI + tok))
    return expected


def test_flagship_triples_precision_recall(sf_dir):
    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    got_df = flagship(sf_dir).to_pandas()
    got = set(zip(got_df["subj"], got_df["pred"], got_df["obj"]))
    want = expected_triples(sf_dir)
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    print(f"\ntriple precision={precision:.4f} recall={recall:.4f} "
          f"(got={len(got)}, expected={len(want)})")
    assert precision >= 0.95, (precision, sorted(got - want)[:5])
    assert recall >= 0.95, (recall, sorted(want - got)[:5])
