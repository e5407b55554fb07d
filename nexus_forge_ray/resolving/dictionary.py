"""Dictionary entity resolver — DemoResolver semantics as an actor-pool stage.

Reference behavior (kgforge/specializations/resolvers/demo_resolver.py:39-79):
- KB = per-target list of entries; resolve_with_properties defaults to
  ["label", "acronym"] (demo_resolver.py:51).
- optional type filter (entries whose `type` != filter are skipped).
- EXACT_MATCH: first entry (KB order) where text == entry[p] for any p.
- EXACT_CASE_INSENSITIVE_MATCH: same with lower() on both sides.
- BEST_MATCH / ALL_MATCHES (fuzzy): entries where text.lower() is a substring
  of entry[p].lower() for any p; score = len(first-present-resolve-property
  value) - len(text)  (demo_resolver.py:68-79, _dist at :109-110), ascending.
- Deviation (documented): the reference breaks score ties by KB file order;
  we break ties by (score, kb_index) which IS its file order — identical
  results, but stated explicitly because our execution is parallel.

The engine form: build the index ONCE per actor in __init__ (hash maps for the
exact paths, property lists for the fuzzy scan), resolve a whole batch of
mentions per __call__ with dedup of repeated mention strings (the reference's
own batching trick, entity_linking_sklearn_service.py:43-45).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import ray.data

from nexus_forge_ray.resolving.strategies import ResolvingStrategy

DEFAULT_RESOLVE_PROPERTIES = ["label", "acronym"]


class DictionaryResolver:
    """In-memory KB index with the four resolving strategies."""

    def __init__(self, entries: list[dict], resolve_with_properties=None):
        self.entries = list(entries)
        self.props = list(resolve_with_properties or DEFAULT_RESOLVE_PROPERTIES)
        # exact index: value -> first kb index; ci index: value.lower() -> idx
        self.exact: dict[str, int] = {}
        self.ci: dict[str, int] = {}
        # fuzzy scan list: (lowered prop values, score_basis, idx)
        self.fuzzy: list[tuple[list[str], str, int]] = []
        for i, e in enumerate(self.entries):
            vals = [str(e[p]) for p in self.props if p in e and e[p] is not None]
            for v in vals:
                self.exact.setdefault(v, i)
                self.ci.setdefault(v.lower(), i)
            if vals:
                self.fuzzy.append(([v.lower() for v in vals], vals[0], i))

    def resolve(self, text: str, strategy=ResolvingStrategy.BEST_MATCH,
                type: str | None = None, limit: int | None = None,
                threshold: float | None = None) -> Any:
        if not text:
            return None
        type_ok = (lambda i: self.entries[i].get("type") == type) if type \
            else (lambda i: True)
        if strategy == ResolvingStrategy.EXACT_MATCH:
            i = self.exact.get(str(text))
            if i is None or not type_ok(i):
                # fall back to scan honoring type filter (index ignores type)
                i = next((j for _, _, j in self.fuzzy
                          if type_ok(j) and any(str(text) == str(self.entries[j].get(p))
                                                for p in self.props
                                                if p in self.entries[j])), None)
                if i is None:
                    return None
            return dict(self.entries[i])
        if strategy == ResolvingStrategy.EXACT_CASE_INSENSITIVE_MATCH:
            i = self.ci.get(str(text).lower())
            if i is None or not type_ok(i):
                i = next((j for _, _, j in self.fuzzy
                          if type_ok(j) and any(str(text).lower() == str(self.entries[j].get(p)).lower()
                                                for p in self.props
                                                if p in self.entries[j])), None)
                if i is None:
                    return None
            return dict(self.entries[i])
        # fuzzy: substring containment, length-difference score, ascending
        t = str(text).lower()
        results = [(len(basis) - len(str(text)), i)
                   for lowered, basis, i in self.fuzzy
                   if type_ok(i) and any(t in v for v in lowered)]
        if not results:
            return None
        results.sort(key=lambda s: (s[0], s[1]))  # score, then KB order
        if threshold is not None:
            results = [r for r in results if r[0] <= threshold]
            if not results:
                return None
        if strategy == ResolvingStrategy.BEST_MATCH:
            return dict(self.entries[results[0][1]])
        out = [dict(self.entries[i]) for _, i in results]
        return out[:limit] if limit else out

    def resolve_with_score(self, text: str, limit: int | None = None):
        """Fuzzy candidates with explicit scores (candidate-row emission)."""
        t = str(text).lower()
        results = [(len(basis) - len(str(text)), i)
                   for lowered, basis, i in self.fuzzy if t and any(t in v for v in lowered)]
        results.sort(key=lambda s: (s[0], s[1]))
        if limit:
            results = results[:limit]
        return [{**self.entries[i], "score": score} for score, i in results]


class ResolverActor:
    """map_batches actor: resolve a mention column against the KB.

    Emits `entity_id` (resolved KB id or null) and `entity_score`. Repeated
    mention strings inside a batch are resolved once (dict cache per call).
    """

    def __init__(self, entries: list[dict], mention_col: str = "mention",
                 strategy: str = "EXACT_MATCH",
                 resolve_with_properties=None, type: str | None = None):
        self.resolver = DictionaryResolver(entries, resolve_with_properties)
        self.mention_col = mention_col
        self.strategy = ResolvingStrategy[strategy]
        self.type = type

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        uniq = pd.unique(batch[self.mention_col])
        hits: dict[str, tuple] = {}
        for m in uniq:
            r = self.resolver.resolve(m, self.strategy, type=self.type)
            if isinstance(r, list):
                r = r[0] if r else None
            if r is None:
                hits[m] = (None, None)
            else:
                # score basis = first PRESENT resolve property (the reference's
                # _dist, demo_resolver.py:109-110) — NOT props[0]-with-fallback
                basis = next(
                    (str(r[p]) for p in self.resolver.props
                     if p in r and r[p] is not None),
                    str(r.get("label", "")),
                )
                hits[m] = (r.get("id"), float(len(basis) - len(str(m))))
        batch = batch.copy()
        batch["entity_id"] = batch[self.mention_col].map(lambda m: hits[m][0])
        batch["entity_score"] = batch[self.mention_col].map(lambda m: hits[m][1])
        return batch


def resolve_dataset(ds: ray.data.Dataset, entries: list[dict], *,
                    mention_col: str = "mention", strategy: str = "EXACT_MATCH",
                    concurrency: int | None = None, **kw) -> ray.data.Dataset:
    """Task mode (default): the KB index is built once on the driver and
    cloudpickled into stateless tasks — right for broadcast-small KBs (no CPU
    reservation, no actor-pool starvation). Pass `concurrency` for an actor
    pool when the KB is big enough that per-task deserialization matters."""
    if concurrency is None:
        inst = ResolverActor(entries=entries, mention_col=mention_col,
                             strategy=strategy, **kw)
        return ds.map_batches(inst, batch_format="pandas")
    return ds.map_batches(
        ResolverActor,
        fn_constructor_kwargs=dict(entries=entries, mention_col=mention_col,
                                   strategy=strategy, **kw),
        batch_format="pandas", concurrency=concurrency,
    )
