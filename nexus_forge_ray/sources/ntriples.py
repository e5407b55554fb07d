"""N-Triples interchange: serialize the triple table to `.nt` and back.

The reference moves graphs through rdflib (`kgforge/core/conversions/
rdf.py:43-58` as_graph/from_graph serializations); this engine's native
graph layout is the flat (subj, pred, obj, obj_is_iri, obj_datatype)
Parquet table, and N-Triples is the line-oriented RDF format that maps
onto it 1:1 — so export/import are embarrassingly parallel:

- writing is one vectorized map per batch (string assembly + W3C string
  escaping) into partitioned text files (one file per block — resumable,
  never one giant file);
- reading is a regex line parser per batch (N-Triples is line-delimited,
  so blocks never split a statement).

Literals keep their datatype IRI (`"5"^^<...integer>`); IRIs wrap in
angle brackets. Blank nodes are not emitted (the engine skolemizes
fragments instead, kg/triples.py explode_record) but `_:b` subjects parse
through as opaque tokens for interoperability.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_ESC_RE = re.compile(r'[\\"\n\r\t]')
_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}
_UNESC_RE = re.compile(r'\\[\\"nrt]')

_LINE_RE = re.compile(
    r'^\s*(<[^>]*>|_:\S+)\s+'           # subject: IRI or blank node
    r'<([^>]*)>\s+'                     # predicate IRI
    r'(<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>)?)'   # object
    r'\s*\.\s*$')
# literal object: lexical form + optional datatype — anchoring the split on
# the CLOSING QUOTE ('"^^<'), never on a '^^<' inside the lexical form
_LIT_RE = re.compile(r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)?$')


def _escape(s: pd.Series) -> pd.Series:
    return s.astype(str).map(
        lambda v: _ESC_RE.sub(lambda m: _ESC[m.group(0)], v))


def _unescape(v: str) -> str:
    return _UNESC_RE.sub(lambda m: _UNESC[m.group(0)], v)


def serialize_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Triple rows -> one N-Triples line per row (column `line`)."""
    subj = "<" + df["subj"].astype(str) + ">"
    pred = "<" + df["pred"].astype(str) + ">"
    is_iri = df["obj_is_iri"].astype(bool).to_numpy() \
        if "obj_is_iri" in df.columns else np.ones(len(df), dtype=bool)
    lit = '"' + _escape(df["obj"]) + '"'
    if "obj_datatype" in df.columns:
        dt = df["obj_datatype"]
        has_dt = dt.notna() & (dt.astype(str) != "")
        lit = lit.where(~has_dt, lit + "^^<" + dt.astype(str) + ">")
    obj = ("<" + df["obj"].astype(str) + ">").where(is_iri, lit)
    return pd.DataFrame({"line": subj + " " + pred + " " + obj + " ."})


def write_ntriples(triples: ray.data.Dataset, out_dir: str) -> str:
    """Partitioned `.nt` export — one text file per block under out_dir.

    Lines go through the CSV writer with quoting disabled and a tab
    delimiter: after W3C escaping a statement can contain no raw tab,
    newline or CR (all three are escaped in literals and illegal in
    IRIs), so the single column round-trips byte-exactly."""
    import hashlib
    import os
    os.makedirs(out_dir, exist_ok=True)

    def sink(df: pd.DataFrame) -> pd.DataFrame:
        # CSV/JSON sinks re-quote structural characters, so statements are
        # written verbatim by the task itself: content-addressed name
        # (idempotent rerun overwrites the same file; byte-identical blocks
        # merge, a no-op under graph set semantics) + atomic rename so a
        # killed run never leaves a torn file.
        if not len(df):
            return pd.DataFrame({"path": [], "rows": []})
        blob = ("\n".join(serialize_batch(df)["line"]) + "\n").encode()
        name = hashlib.md5(blob).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}.nt")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [len(df)]})

    # consume the manifest rows to drive the write (tiny: one row per block)
    triples.map_batches(sink, batch_format="pandas").materialize()
    return out_dir


def parse_lines(df: pd.DataFrame, col: str = "line") -> pd.DataFrame:
    """N-Triples lines -> triple rows (bad/comment/empty lines dropped)."""
    subjs, preds, objs, iris, dts = [], [], [], [], []
    for line in df[col].astype(str):
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        m = _LINE_RE.match(line)
        if not m:
            continue
        s, p, o = m.group(1), m.group(2), m.group(3)
        # parse the object FIRST: a failed literal parse must drop the
        # whole line, never leave subj/pred appended without an object
        # (misaligned columns would kill the entire batch)
        if o.startswith("<"):
            obj, is_iri, dt = o[1:-1], True, None
        else:
            lm = _LIT_RE.match(o)
            if not lm:
                continue
            obj, is_iri, dt = _unescape(lm.group(1)), False, lm.group(2)
        subjs.append(s[1:-1] if s.startswith("<") else s)
        preds.append(p)
        objs.append(obj)
        iris.append(is_iri)
        dts.append(dt)
    return pd.DataFrame({"subj": subjs, "pred": preds, "obj": objs,
                         "obj_is_iri": pd.Series(iris, dtype=bool),
                         "obj_datatype": pd.Series(dts, dtype=object)})


def read_ntriples(path: str) -> ray.data.Dataset:
    """Partitioned `.nt` directory/file -> triple Dataset (line-parallel)."""
    lines = ray.data.read_text(path)
    return lines.map_batches(lambda df: parse_lines(df, "text"),
                             batch_format="pandas")
