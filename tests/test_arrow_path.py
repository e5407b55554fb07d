"""Arrow-native flagship chain: byte parity with the pandas twins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from nexus_forge_ray.kg import kb as KB
from nexus_forge_ray.sources.pages import (extract_text_batch,
                                           extract_text_batch_arrow,
                                           synth_pages_batch,
                                           synth_pages_batch_arrow)

DOCS = pd.DataFrame({
    "doc_id": [0, 7, 19, 123456],
    "text": ["alpha beta gamma", "spark join vector", "x", "one two"],
    "lang": ["en", "fr", "en", "zh"],
})


def test_synth_arrow_matches_pandas():
    for replica in (0, 3):
        want = synth_pages_batch(DOCS, replica)
        got = synth_pages_batch_arrow(pa.Table.from_pandas(DOCS),
                                      replica).to_pandas()
        assert got["url"].tolist() == want["url"].tolist()
        assert got["html"].tolist() == want["html"].tolist()
        assert got["text"].tolist() == want["text"].tolist()
        assert got["lang"].tolist() == want["lang"].tolist()
        # timestamps equal to the microsecond (arrow path is us-resolution)
        assert (pd.to_datetime(got["warc_ts"]).astype("datetime64[us]")
                == want["warc_ts"].astype("datetime64[us]")).all()


def test_extract_arrow_matches_pandas():
    pages = synth_pages_batch(DOCS).drop(columns=["text"])
    want = extract_text_batch(pages)["text"].tolist()
    got = extract_text_batch_arrow(
        pa.Table.from_pandas(pages)).to_pandas()["text"].tolist()
    assert got == want


def test_extract_arrow_multi_p_fallback():
    # 0 and 2+ <p> blocks take the general concat-all path, byte-identical
    pages = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "html": [b"<html><p>a b</p><p>c</p></html>",
                 b"<html>no paragraphs</html>",
                 b"<html><p>only</p></html>"],
    })
    want = extract_text_batch(pages)["text"].tolist()
    got = extract_text_batch_arrow(
        pa.Table.from_pandas(pages)).to_pandas()["text"].tolist()
    assert got == want == ["a bc", "", "only"]


def test_validate_arrow_matches_shape_validator(ray_session):
    from nexus_forge_ray.pipelines.kg_pipeline import (PAGE_SHAPE,
                                                       _add_page_keys,
                                                       _validate_pages_arrow)
    from nexus_forge_ray.validation.shapes import validate_dataset
    pages = synth_pages_batch(DOCS)
    bad = pages.copy()
    bad.loc[1, "url"] = "ftp://not-http"        # pattern violation
    bad.loc[2, "lang"] = "xx"                   # enum violation
    keyed = _add_page_keys(bad)
    ds = ray.data.from_pandas(keyed)
    want = validate_dataset(ds, [PAGE_SHAPE], type_col="rtype").to_pandas()
    want_urls = sorted(want.loc[want["valid"], "url"])
    got = ds.map_batches(_validate_pages_arrow,
                         batch_format="pyarrow").to_pandas()
    assert sorted(got["url"]) == want_urls
    assert "html" not in got.columns and "warc_ts" not in got.columns


def test_page_features_arrow_matches_pandas(ray_session):
    from nexus_forge_ray.kg.fused import FEATURE_SCHEMA, PageFeatures
    from nexus_forge_ray.pipelines.kg_pipeline import (CONTEXT, PAGE_MAPPING,
                                                       _add_page_keys)
    pages = _add_page_keys(synth_pages_batch(DOCS))
    pages["text"] = DOCS["text"]
    cols = ["url", "text", "lang", "page_nid", "page_iri"]
    stage = PageFeatures(PAGE_MAPPING, CONTEXT, KB.DEFAULT_KB, KB.KB_TERMS,
                         num_perm=64, num_bands=8)
    want = stage(pages[cols])
    got_t = stage(pa.Table.from_pandas(pages[cols]))
    assert isinstance(got_t, pa.Table)
    assert got_t.schema.equals(FEATURE_SCHEMA)
    got = got_t.to_pandas()
    assert len(got) == len(want)
    for c in ("kind", "page_nid", "sig_hash", "b0", "b7", "subj", "pred",
              "obj", "obj_is_iri"):
        assert got[c].fillna("").astype(str).tolist() == \
            want[c].fillna("").astype(str).tolist(), c


def test_flagship_arrow_end_to_end(ray_session, sf_dir):
    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    out = flagship(sf_dir).to_pandas()
    assert len(out) > 0
    assert sorted(out.columns) == sorted(
        ["subj", "pred", "obj", "obj_is_iri", "obj_datatype"])
    assert out["subj"].str.startswith(KB.DOC_BASE).any()
