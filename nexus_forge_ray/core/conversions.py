"""Record codecs: JSON-LD compact/expand, DataFrame flatten/deflatten, literal
type sniffing.

Reference semantics:
- as_jsonld/from_jsonld (kgforge/core/conversions/rdf.py:61-97,489-527):
  compacted form uses context terms (`id`/`type` aliases of `@id`/`@type`);
  expanded form rewrites every term to its IRI; from_jsonld strips `@`-keys.
- as/from_dataframe (kgforge/core/conversions/dataframe.py:25-108): nested
  dicts flatten to dotted columns; `na` replaces missing; deflatten inverts.
- _parse_type (kgforge/core/commons/parser.py:19-44): classify a literal as
  datetime (ISO-8601 regex) / number / boolean / literal.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.kg.triples import RDF_TYPE, expand_term

_ISO_DT = re.compile(
    r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?)?$")
_NUM = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def parse_type(value: Any) -> str:
    """datetime / number / boolean / literal (parser.py:19-44)."""
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float, np.number)):
        return "number"
    s = str(value)
    if s.lower() in ("true", "false"):
        return "boolean"
    if _ISO_DT.match(s):
        return "datetime"
    if _NUM.match(s):
        return "number"
    return "literal"


def merge_contexts(*contexts) -> dict:
    """Union of JSON-LD contexts without duplicates (rdf.py:533-591): later
    term definitions win — consistently, including bare-string contexts
    (a later vocab IRI replaces an earlier one, exactly as it would when
    list-wrapped); string/list context entries merge in order."""
    out: dict = {}
    for ctx in contexts:
        if ctx is None:
            continue
        if isinstance(ctx, str):
            out["@vocab"] = ctx
        elif isinstance(ctx, list):
            merged = merge_contexts(*ctx)
            out.update(merged)
        else:
            out.update(ctx)
    return out


def rewrite_uri(uri: str, base: str, new_base: str) -> str:
    """URI rewriting (bluebrain_nexus.py:1249-1301 semantics, simplified):
    swap a base prefix, preserving the remainder verbatim."""
    if uri.startswith(base):
        return new_base.rstrip("/") + "/" + uri[len(base):].lstrip("/")
    return uri


def as_term(iri: str) -> str:
    """IRI -> local name (kgforge/specializations/models/rdf/utils.py:17-28):
    the fragment after '#' or the last path segment."""
    if "#" in iri:
        return iri.rsplit("#", 1)[1]
    return iri.rstrip("/").rsplit("/", 1)[-1]


# ------------------------------------------------------------------ JSON-LD

def as_jsonld(record: dict, context: dict[str, str],
              form: str = "compacted",
              default_ns: str = "http://example.org/vocab/") -> dict:
    """Record -> JSON-LD. compacted: @id/@type + @context; expanded: every
    property key becomes its IRI, literal values wrapped as {"@value": v}."""
    if form == "compacted":
        out: dict = {"@context": dict(context)}
        for k, v in record.items():
            if k in ("id", "@id"):
                out["@id"] = v
            elif k in ("type", "@type"):
                out["@type"] = v
            else:
                out[k] = v
        return out
    out = {}
    for k, v in record.items():
        if k in ("id", "@id"):
            out["@id"] = v
        elif k in ("type", "@type"):
            out["@type"] = [expand_term(str(t), context, default_ns)
                            for t in (v if isinstance(v, list) else [v])]
        else:
            iri = expand_term(k, context, default_ns)
            vals = v if isinstance(v, list) else [v]
            out[iri] = [
                as_jsonld(x, context, "expanded", default_ns)
                if isinstance(x, dict) else {"@value": x}
                for x in vals
            ]
    return out


def jsonld_compact(doc: dict, context: dict[str, str],
                   default_ns: str = "http://example.org/vocab/") -> dict:
    """EXPANDED JSON-LD -> compacted record: the reverse term map shortens
    predicate IRIs and @type values back to context terms (the reference's
    jsonld.compact call, rdf.py:128-138); default-namespace IRIs compact to
    their local name; @value wrappers unwrap; nested nodes compact
    recursively. Inverse of as_jsonld(..., form="expanded")."""
    from nexus_forge_ray.kg.triples import _reverse_context
    rev = _reverse_context(context)

    def compact_key(iri: str) -> str:
        if iri in rev:
            return rev[iri]
        if iri.startswith(default_ns):
            return iri[len(default_ns):]
        return iri

    def go(d: dict) -> dict:
        out: dict = {}
        for k, v in d.items():
            if k == "@context":
                continue
            if k == "@id":
                out["id"] = v
            elif k == "@type":
                # same shortening as property keys: context term first,
                # then the default-namespace local name (so the documented
                # inverse of as_jsonld holds for types outside the context)
                ts = [compact_key(str(t)) for t in
                      (v if isinstance(v, list) else [v])]
                out["type"] = ts[0] if len(ts) == 1 else ts
            else:
                key = compact_key(k)
                vals = v if isinstance(v, list) else [v]
                cv = [go(x) if isinstance(x, dict) and "@value" not in x
                      else (x.get("@value") if isinstance(x, dict) else x)
                      for x in vals]
                out[key] = cv[0] if len(cv) == 1 else cv
        return out

    return go(doc)


def from_jsonld(doc: dict) -> dict:
    """JSON-LD -> plain record: strip @context, @id/@type -> id/type, unwrap
    @value wrappers (rdf.py:489-527 semantics)."""
    out: dict = {}
    for k, v in doc.items():
        if k == "@context":
            continue
        if k == "@id":
            out["id"] = v
        elif k == "@type":
            out["type"] = v[0] if isinstance(v, list) and len(v) == 1 else v
        else:
            key = k
            if isinstance(v, list):
                vals = [from_jsonld(x) if isinstance(x, dict) and "@value" not in x
                        else (x.get("@value") if isinstance(x, dict) else x)
                        for x in v]
                out[key] = vals[0] if len(vals) == 1 else vals
            elif isinstance(v, dict):
                out[key] = v.get("@value") if "@value" in v else from_jsonld(v)
            else:
                out[key] = v
    return out


# ---------------------------------------------------------------- DataFrame

def flatten_record(record: dict, prefix: str = "", sep: str = ".") -> dict:
    """Nested dict -> dotted flat dict (dataframe.py:38-48)."""
    out: dict = {}
    for k, v in record.items():
        key = f"{prefix}{sep}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_record(v, key, sep))
        else:
            out[key] = v
    return out


def deflatten_record(flat: dict, sep: str = ".", na=None) -> dict:
    """Dotted flat dict -> nested dict, dropping na values
    (dataframe.py:69-108). The na sentinel matches by EQUALITY (an arrow /
    parquet round trip returns np.float64(-1.0) for a -1 filler, and
    strings lose interning — identity would keep every filler); None and
    float NaN always drop (a record has no null fields, it omits them)."""
    out: dict = {}
    for k, v in flat.items():
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if na is not None and not isinstance(v, (dict, list, np.ndarray)):
            try:
                if bool(v == na):
                    continue
            except (TypeError, ValueError):
                pass
        parts = k.split(sep)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def records_to_dataframe(records: list[dict], na=None) -> pd.DataFrame:
    rows = [flatten_record(r) for r in records]
    df = pd.DataFrame(rows)
    if na is not None:
        df = df.fillna(na)
    return df


def dataframe_to_records(df: pd.DataFrame, na=None) -> list[dict]:
    return [deflatten_record(row, na=na) for row in df.to_dict("records")]


class JsonLdNormalizer:
    """Actor-pool stage: full JSON-LD 1.1 expand→compact per record against
    a model context — context processed ONCE per actor in __init__ (term
    maps + inverse index), per-batch work is pure dict transforms. Use for
    heterogeneous crawled JSON-LD (per-doc @context) normalized to one
    model context, the reference's compact-on-retrieve path (rdf.py:128)."""

    def __init__(self, context, documents: dict | None = None,
                 record_col: str = "record"):
        from nexus_forge_ray.core import jsonld as ld
        self._ld = ld
        self.resolver = ld.ContextResolver(documents or {})
        self.ctx = ld.Context.parse(context, resolver=self.resolver)
        self.record_col = record_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ld, ctx = self._ld, self.ctx
        out = []
        for rec in batch[self.record_col]:
            doc = rec if isinstance(rec, dict) else {}
            body = {k: v for k, v in doc.items() if k != "@context"}
            local = (ld.Context.parse(doc["@context"], parent=ctx)
                     if "@context" in doc else ctx)
            expanded = ld.expand(body, local)
            # compaction runs against the ONE pre-parsed model context —
            # per-record Context.parse of the model context was the hot
            # path's dominant cost on heterogeneous corpora
            compacted = ld.compact(expanded, ctx)
            compacted.pop("@context", None)
            out.append(compacted)
        batch = batch.copy()
        batch[self.record_col] = out
        return batch


def jsonld_normalize_dataset(ds: ray.data.Dataset, context, *,
                             documents: dict | None = None,
                             record_col: str = "record",
                             concurrency: int | tuple | None = None,
                             ) -> ray.data.Dataset:
    """Normalize per-record JSON-LD to one model context (see
    JsonLdNormalizer). Actor pool so context processing amortizes."""
    return ds.map_batches(
        JsonLdNormalizer, fn_constructor_args=(context, documents, record_col),
        batch_format="pandas", concurrency=concurrency or (1, 8))


def jsonld_expand_dataset(ds: ray.data.Dataset, context: dict[str, str], *,
                          record_col: str = "record",
                          default_ns: str = "http://example.org/vocab/",
                          ) -> ray.data.Dataset:
    """Batch JSON-LD expansion — broadcast context in the task closure."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        docs = [as_jsonld(r if isinstance(r, dict) else {}, context,
                          "expanded", default_ns)
                for r in batch[record_col]]
        batch = batch.copy()          # provenance columns ride along
        batch[record_col] = docs
        return batch

    return ds.map_batches(fn, batch_format="pandas")
