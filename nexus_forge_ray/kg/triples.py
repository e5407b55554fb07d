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


def assemble_resources(triples_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Inverse of explode (framing, rdf.py:100-140): groupby(subj) -> one
    record per subject with predicates as keys (lists for multi-valued)."""
    from nexus_forge_ray.utils import stable_hash_u64

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["subj"]) % np.uint64(32)).astype("int32")
        return df

    def build(group: pd.DataFrame) -> pd.DataFrame:
        subjects, records = [], []
        for subj, g in group.groupby("subj", sort=False):
            rec: dict[str, Any] = {"id": subj}
            for pred, sub in g.groupby("pred", sort=False):
                vals = sub["obj"].tolist()
                rec[pred] = vals[0] if len(vals) == 1 else sorted(vals)
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
