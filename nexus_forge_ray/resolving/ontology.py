"""OntologyResolver — the reference's ontology-term resolution semantics
(kgforge/specializations/resolvers/ontology_resolver.py:27-140 +
kgforge/core/archetypes/resolver.py:208-252) re-expressed over an in-memory
KB with a vectorized batch stage.

Faithful behaviors:
- match is a UNION over the four label properties
  ['label', 'notation', 'prefLabel', 'altLabel'] (ontology_resolver.py:47,
  query UNION at :118-123): an entity is a hit when ANY property matches.
- strategy semantics (_build_resolving_query, resolver.py:217-230):
  EXACT_MATCH          -> exact string equality, limit 1
  EXACT_CASE_INSENSITIVE_MATCH -> anchored case-insensitive match with
                          punctuation escaped (escape_punctuation,
                          resolver.py:181-188), limit 1
  BEST_MATCH           -> case-insensitive regex CONTAINMENT (the text is a
                          regex, resolver.py:226-233), limit 1
  ALL_MATCHES          -> same containment, caller's limit
- deprecated entries are excluded (first_filters, resolver.py:213).
- type filter defaults to "Class" (ontology_resolver.py:44-45).
- emitted fields mirror expected_fields (ontology_resolver.py:136-138):
  id, type, label, prefLabel, altLabel, notation, definition, subClassOf,
  isDefinedBy — present ones only.
- documented deviation: the reference's SPARQL result order is
  store-dependent; we emit KB (file) order, matching DictionaryResolver's
  deterministic tie-break.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data

from nexus_forge_ray.resolving.strategies import ResolvingStrategy

RESOLVE_PROPERTIES = ["label", "notation", "prefLabel", "altLabel"]
EXPECTED_FIELDS = RESOLVE_PROPERTIES + ["type", "definition", "subClassOf",
                                        "isDefinedBy"]
_PUNCTUATION = "-()\"#/@;:<>{}`+=~|.!?,"


def escape_punctuation(text: str) -> str:
    """resolver.py:181-188 — escape regex-active punctuation for the anchored
    case-insensitive exact match."""
    if not isinstance(text, str):
        raise TypeError("Only accepting strings.")
    for p in _PUNCTUATION:
        if p in text:
            text = text.replace(p, "\\" + p)
    return text


class OntologyResolver:
    """In-memory KB ontology resolver with the four-property UNION match."""

    def __init__(self, entries: list[dict]):
        self.entries = list(entries)
        # per-entry list of (property values) present among RESOLVE_PROPERTIES
        self.prop_values: list[list[str]] = [
            [str(e[p]) for p in RESOLVE_PROPERTIES
             if p in e and e[p] is not None]
            for e in self.entries
        ]

    def _emit(self, e: dict) -> dict:
        out = {"id": e.get("id")}
        for f in EXPECTED_FIELDS:
            if f in e and e[f] is not None:
                out[f] = e[f]
        return out

    def resolve(self, text: str, *, type: str | None = None,
                strategy=ResolvingStrategy.BEST_MATCH,
                limit: int | None = 10):
        """Returns one dict (limit-1 strategies) or a list of dicts, or None."""
        if type is None:
            type = "Class"  # ontology_resolver.py:44-45
        if strategy == ResolvingStrategy.EXACT_MATCH:
            pred = lambda vals: any(v == text for v in vals)  # noqa: E731
            limit = 1
        elif strategy == ResolvingStrategy.EXACT_CASE_INSENSITIVE_MATCH:
            rx = re.compile("^" + escape_punctuation(text) + "$", re.IGNORECASE)
            pred = lambda vals: any(rx.search(v) for v in vals)  # noqa: E731
            limit = 1
        else:
            rx = re.compile(text, re.IGNORECASE)  # text IS a regex here
            pred = lambda vals: any(rx.search(v) for v in vals)  # noqa: E731
            if strategy == ResolvingStrategy.BEST_MATCH:
                limit = 1

        hits = []
        for e, vals in zip(self.entries, self.prop_values):
            if e.get("deprecated") is True:
                continue
            etypes = e.get("type", "Class")
            etypes = etypes if isinstance(etypes, list) else [etypes]
            if type not in etypes:
                continue
            if pred(vals):
                hits.append(self._emit(e))
                if limit is not None and len(hits) >= limit:
                    break
        if not hits:
            return None
        if strategy in (ResolvingStrategy.EXACT_MATCH,
                        ResolvingStrategy.EXACT_CASE_INSENSITIVE_MATCH,
                        ResolvingStrategy.BEST_MATCH):
            return hits[0]
        return hits


class OntologyResolverActor:
    """map_batches stage: resolve a mention column against the ontology KB,
    emitting the ontology fields as columns ('' where absent)."""

    OUT_FIELDS = ["entity_id", "entity_label", "entity_definition",
                  "entity_subClassOf"]

    def __init__(self, entries: list[dict], mention_col: str = "mention",
                 strategy: str = "EXACT_CASE_INSENSITIVE_MATCH",
                 type: str | None = None):
        self.resolver = OntologyResolver(entries)
        self.mention_col = mention_col
        self.strategy = ResolvingStrategy[strategy]
        self.type = type

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        uniq = pd.unique(batch[self.mention_col])
        lut: dict[str, tuple] = {}
        for m in uniq:
            r = self.resolver.resolve(str(m), strategy=self.strategy,
                                      type=self.type)
            if isinstance(r, list):
                r = r[0] if r else None
            if r is None:
                lut[m] = ("", "", "", "")
            else:
                sup = r.get("subClassOf", "")
                if isinstance(sup, list):
                    sup = "|".join(str(s) for s in sup)
                lut[m] = (r.get("id", ""), str(r.get("label", "")),
                          str(r.get("definition", "")), str(sup))
        batch = batch.copy()
        mapped = batch[self.mention_col].map(lut)
        for i, col in enumerate(self.OUT_FIELDS):
            batch[col] = mapped.map(lambda t, i=i: t[i])
        return batch


def resolve_ontology_dataset(ds: ray.data.Dataset, entries: list[dict], *,
                             mention_col: str = "mention",
                             strategy: str = "EXACT_CASE_INSENSITIVE_MATCH",
                             type: str | None = None,
                             concurrency: int | None = None) -> ray.data.Dataset:
    kw = dict(entries=entries, mention_col=mention_col, strategy=strategy,
              type=type)
    if concurrency is None:
        return ds.map_batches(OntologyResolverActor(**kw),
                              batch_format="pandas")
    return ds.map_batches(OntologyResolverActor, fn_constructor_kwargs=kw,
                          batch_format="pandas", concurrency=concurrency)
