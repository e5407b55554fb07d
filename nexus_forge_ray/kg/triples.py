"""Triple extraction + materialization.

`explode_record` reimplements the semantics of Resource→RDF serialization
(kgforge/core/conversions/rdf.py:275-354): each property of a (possibly
nested) record becomes a (subj, pred, obj) triple; nested records with ids
link via the id; nested records without ids get deterministic skolem ids
(`{subj}#{path}` — the reference avoids blank nodes, rdf.py:300-320); lists
emit one triple per element. Term→IRI expansion via a JSON-LD-style context
dict (compact term -> IRI; kgforge/core/conversions/rdf.py:199-272).

Materialization: `sort_and_write` = global sort by (subj, pred) + partitioned
Parquet, per north_rule.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import ray.data

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def expand_term(term: str, context: dict[str, str], default_ns: str) -> str:
    if term in ("id", "@id"):
        return "@id"
    if term in ("type", "@type"):
        return RDF_TYPE
    if term in context:
        return context[term]
    if ":" in term or term.startswith("http"):
        return term
    return default_ns + term


def _literal(value: Any) -> tuple[str, bool, str | None]:
    if isinstance(value, bool):
        return ("true" if value else "false", False, XSD_BOOL)
    if isinstance(value, int):
        return (str(value), False, XSD_INT)
    if isinstance(value, float):
        return (repr(value), False, XSD_DOUBLE)
    s = str(value)
    if s.startswith("http://") or s.startswith("https://") or s.startswith("urn:"):
        return (s, True, None)
    return (s, False, XSD_STRING)


def explode_record(record: dict, context: dict[str, str] | None = None,
                   default_ns: str = "http://example.org/vocab/",
                   subj: str | None = None) -> list[tuple]:
    """record -> [(subj, pred, obj, obj_is_iri, obj_datatype)]."""
    context = context or {}
    subj = subj or record.get("id") or record.get("@id")
    if subj is None:
        raise ValueError("record has no id and no subject provided")
    triples: list[tuple] = []
    for key, value in record.items():
        if key in ("id", "@id") or key.startswith("_"):
            continue
        if key in ("type", "@type"):
            for t in (value if isinstance(value, list) else [value]):
                obj = expand_term(str(t), context, default_ns)
                triples.append((subj, RDF_TYPE, obj, True, None))
            continue
        pred = expand_term(key, context, default_ns)
        values = value if isinstance(value, list) else [value]
        for i, v in enumerate(values):
            if isinstance(v, dict):
                child = v.get("id") or v.get("@id") or f"{subj}#{key}{i}"
                triples.append((subj, pred, child, True, None))
                triples.extend(explode_record(v, context, default_ns, subj=child))
            elif v is None:
                continue
            else:
                obj, is_iri, dt = _literal(v)
                triples.append((subj, pred, obj, is_iri, dt))
    return triples


def triples_batch(records: list[dict], context=None,
                  default_ns: str = "http://example.org/vocab/") -> pd.DataFrame:
    rows = []
    for rec in records:
        try:
            rows.extend(explode_record(rec, context, default_ns))
        except ValueError:
            continue  # bad record => dropped with error accounted upstream
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "obj_is_iri",
                                       "obj_datatype"]) if rows else \
        pd.DataFrame({"subj": pd.Series(dtype=str), "pred": pd.Series(dtype=str),
                      "obj": pd.Series(dtype=str),
                      "obj_is_iri": pd.Series(dtype=bool),
                      "obj_datatype": pd.Series(dtype=str)})


def explode_dataset(ds: ray.data.Dataset, *, record_col: str | None = None,
                    context: dict | None = None,
                    default_ns: str = "http://example.org/vocab/",
                    ) -> ray.data.Dataset:
    """Dataset of records (struct col or whole-row) -> triple rows (flat_map)."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if record_col is not None:
            records = [r for r in batch[record_col] if isinstance(r, dict)]
        else:
            records = batch.to_dict("records")
        return triples_batch(records, context, default_ns)

    return ds.map_batches(fn, batch_format="pandas")


def _reverse_context(context: dict | None) -> dict[str, str]:
    """IRI -> compact term (context values may be str or {'@id': iri})."""
    rev: dict[str, str] = {}
    for term, spec in (context or {}).items():
        iri = spec.get("@id") if isinstance(spec, dict) else spec
        if isinstance(iri, str):
            rev.setdefault(iri, term)
    return rev


def _revive(val: str, dt: str | None):
    """Literal revival from (lexical form, datatype) — inverse of _literal."""
    if dt == XSD_INT:
        try:
            return int(val)
        except (TypeError, ValueError):
            return val
    if dt == XSD_DOUBLE:
        try:
            return float(val)
        except (TypeError, ValueError):
            return val
    if dt == XSD_BOOL:
        return val == "true"
    return val


def assemble_resources(triples_ds: ray.data.Dataset, *,
                       context: dict | None = None,
                       types: list[str] | None = None,
                       embed: bool = True,
                       default_ns: str = "http://example.org/vocab/",
                       ) -> ray.data.Dataset:
    """Inverse of explode — JSON-LD framing + compaction (the reference's
    from_graph, rdf.py:100-140): group triples by subject, compact predicate
    IRIs and type values against the reverse context (rdf:type -> 'type'),
    revive literals from obj_datatype, embed nested fragment-skolem children
    into their parent (@embed: true), and optionally keep only top-level
    records of the given (compacted) types (framing by @type).

    Partitioning assumption (documented): embedded children carry the
    parent's IRI plus a '#' fragment (explode_record's skolem scheme,
    rdf.py:300-320 avoids blank nodes the same way), so bucketing by the
    IRI root co-locates every node of a document in ONE shuffle.
    Cross-document embedding would need an iterative join — unsupported.
    """
    from nexus_forge_ray.utils import stable_hash_u64
    rev = _reverse_context(context)

    def compact(pred: str) -> str:
        """Reverse-context term, else strip the default namespace —
        the exact inverse of explode_record's expand_term."""
        if pred in rev:
            return rev[pred]
        if default_ns and pred.startswith(default_ns):
            return pred[len(default_ns):]
        return pred

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        root = df["subj"].str.split("#", n=1).str[0]
        df["__bkt"] = (stable_hash_u64(root) % np.uint64(32)).astype("int32")
        return df

    def build(group: pd.DataFrame) -> pd.DataFrame:
        has_dt = "obj_datatype" in group.columns
        recs: dict[str, dict] = {}
        for subj, g in group.groupby("subj", sort=False):
            rec: dict[str, Any] = {"id": subj}
            for pred, sub in g.groupby("pred", sort=False):
                if has_dt:
                    vals = [_revive(v, dt or None)
                            for v, dt in zip(sub["obj"], sub["obj_datatype"])]
                else:
                    vals = sub["obj"].tolist()
                if pred == RDF_TYPE:
                    vals = [compact(str(v)) for v in vals]
                    rec["type"] = vals[0] if len(vals) == 1 else sorted(vals)
                    continue
                key = compact(pred)
                rec[key] = vals[0] if len(vals) == 1 else \
                    sorted(vals, key=str)
            recs[subj] = rec

        embedded: set[str] = set()
        if embed:
            for subj, rec in recs.items():
                for key, val in list(rec.items()):
                    if key in ("id", "type"):
                        continue
                    vals = val if isinstance(val, list) else [val]
                    new = []
                    for v in vals:
                        if (isinstance(v, str) and "#" in v and v != subj
                                and v in recs):
                            new.append(recs[v])   # by reference: deep nesting
                            embedded.add(v)       # composes automatically
                        else:
                            new.append(v)
                    rec[key] = new if isinstance(val, list) else new[0]

        subjects, records = [], []
        for subj, rec in recs.items():
            if subj in embedded:
                continue
            if types is not None:
                t = rec.get("type", [])
                tl = t if isinstance(t, list) else [t]
                if not any(x in types for x in tl):
                    continue
            subjects.append(subj)
            records.append(rec)
        return pd.DataFrame({"subj": subjects, "record": records})

    return triples_ds.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(build, batch_format="pandas")


def sort_and_write(triples_ds: ray.data.Dataset, out_dir: str,
                   num_partitions: int | None = None) -> str:
    """Deterministic materialization: global sort by (subj, pred) ->
    partitioned Parquet directory (many part files, resumable layout)."""
    out = triples_ds.sort(["subj", "pred"])
    if num_partitions:
        out = out.repartition(num_partitions)
    out.write_parquet(out_dir)
    return out_dir
