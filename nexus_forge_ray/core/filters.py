"""Search filters — the reference's Filter/FilterOperator predicates.

Reference semantics (kgforge/core/wrappings/paths.py:21-52, 108-121;
kgforge/specializations/stores/demo_store.py:155-159, 299-301):
- a Filter is (path: list[str], operator, value) with operator one of
  __eq__/__ne__/__lt__/__le__/__gt__/__ge__;
- `forge.search(...)` conjunction of filters; dict form {"a": {"b": v}}
  becomes Filter(["a","b"], "__eq__", v);
- stores append `deprecated == False` unless asked otherwise
  (bluebrain_nexus.py:947-959).

Engine form: filters compile to ONE vectorized pandas mask per batch
(flat columns use dotted names after flattening).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from typing import Any

import pandas as pd
import ray.data

OPERATORS = {
    "__eq__": operator.eq, "__ne__": operator.ne,
    "__lt__": operator.lt, "__le__": operator.le,
    "__gt__": operator.gt, "__ge__": operator.ge,
    # multi-value membership (ES terms clause): one vectorized isin
    "__in__": lambda col, v: col.isin(v),
    "__not_in__": lambda col, v: ~col.isin(v),
    # string/presence predicates (ES exists / prefix / wildcard / regexp)
    "__exists__": lambda col, _v: col.notna(),
    "__missing__": lambda col, _v: col.isna(),
    "__prefix__": lambda col, v: col.astype("string").str.startswith(v),
    "__regex__": lambda col, v: col.astype("string").str.contains(
        v, regex=True, na=False),
}


@dataclass(frozen=True)
class Filter:
    path: list[str] | tuple[str, ...] | str
    operator: str
    value: Any

    def column(self) -> str:
        if isinstance(self.path, str):
            return self.path
        return ".".join(self.path)


@dataclass(frozen=True)
class AnyOf:
    """Disjunction of conjunctive branches (ES bool.should): a row passes
    when at least one branch's filters all pass. Vectorized as an OR of
    per-branch masks — still one pass over each batch."""
    branches: tuple[tuple, ...]   # each branch: tuple of Filter/AnyOf


def filters_from_dict(d: dict, prefix: tuple = ()) -> list[Filter]:
    """{"a": {"b": v}} -> [Filter(("a","b"), "__eq__", v)] (paths.py:108-121)."""
    out: list[Filter] = []
    for k, v in d.items():
        if isinstance(v, dict):
            out.extend(filters_from_dict(v, prefix + (k,)))
        else:
            out.append(Filter(prefix + (k,), "__eq__", v))
    return out


def _mask_of(df: pd.DataFrame, f: "Filter | AnyOf") -> pd.Series:
    if isinstance(f, AnyOf):
        m = pd.Series(False, index=df.index)
        for branch in f.branches:
            bm = pd.Series(True, index=df.index)
            for sub in branch:
                bm &= _mask_of(df, sub)
            m |= bm
        return m
    col = f.column()
    if col not in df.columns:
        return pd.Series(False, index=df.index)
    return OPERATORS[f.operator](df[col], f.value).fillna(False)


def apply_filters_frame(df: pd.DataFrame,
                        filters: list["Filter | AnyOf"]) -> pd.DataFrame:
    mask = pd.Series(True, index=df.index)
    for f in filters:
        mask &= _mask_of(df, f)
    return df[mask.fillna(False)]


def search(ds: ray.data.Dataset, *filters: Filter | dict,
           include_deprecated: bool = False) -> ray.data.Dataset:
    """forge.search over a Dataset: conjunction of Filters as one vectorized
    mask per batch; rows with deprecated == True are excluded by default when
    the column exists (the reference's implicit deprecated filter)."""
    flist: list[Filter] = []
    for f in filters:
        if isinstance(f, dict):
            flist.extend(filters_from_dict(f))
        else:
            flist.append(f)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = apply_filters_frame(batch, flist)
        if not include_deprecated and "deprecated" in out.columns:
            out = out[~out["deprecated"].astype(bool)]
        return out

    return ds.map_batches(fn, batch_format="pandas")


def filters_from_elastic(query: dict) -> list[Filter]:
    """Translate the Elasticsearch-DSL subset the reference's ES store
    accepts (bool/term/range/match_all; must_not over terms) into native
    Filters — query text never leaves the process, the DSL compiles to the
    same vectorized mask as `forge.search`.

    Supported: {"query": ...} wrapper; bool.must / bool.filter (AND);
    bool.must_not over term clauses (__ne__); term {"f": v} or
    {"f": {"value": v}}; terms {"f": [v1, v2, ...]} (vectorized isin,
    negatable); range gt/gte/lt/lte; match (scalar short form =
    term equality, the keyword-field behavior; object form with a
    multi-token query or an explicit `operator` = analyzed any/all-token
    matching); match_phrase (consecutive analyzed tokens); match_all;
    exists (negatable
    under must_not); prefix; wildcard (*/? translated to an anchored
    regex); regexp (anchored, per ES); bool.should (disjunction) compiled
    to an `AnyOf` mask — enforced when it is the only clause group or
    when `minimum_should_match` >= 1, score-only (ignored) next to
    must/filter, matching ES defaults.
    """
    _RANGE_OPS = {"gt": "__gt__", "gte": "__ge__",
                  "lt": "__lt__", "lte": "__le__"}

    def clause(c: dict, negate: bool = False) -> list[Filter]:
        if len(c) != 1:
            raise ValueError(f"one clause type per object, got {list(c)}")
        kind, body = next(iter(c.items()))
        if kind == "match_all":
            return []
        if kind == "bool":
            if negate:
                raise ValueError("nested bool under must_not unsupported")
            out: list = []
            for sub in list(body.get("must", [])) + list(body.get("filter", [])):
                out.extend(clause(sub))
            for sub in body.get("must_not", []):
                out.extend(clause(sub, negate=True))
            should = body.get("should") or []
            msm = int(body.get("minimum_should_match", 0))
            if should and (not out or msm >= 1):
                out.append(AnyOf(tuple(tuple(clause(s)) for s in should)))
            return out
        if kind == "match_phrase":
            # analyzed phrase: the query tokens must appear consecutively
            # (whitespace-tokenized field, no positions index — a
            # token-boundary regex is the vectorized equivalent)
            if negate:
                raise ValueError("match_phrase under must_not unsupported")
            import re as _re
            (field, v), = body.items()
            if isinstance(v, dict):
                v = v.get("query")
            toks = str(v).split()
            if not toks:
                return []
            pat = (r"(?:^|\s)" + r"\s+".join(_re.escape(t) for t in toks)
                   + r"(?:\s|$)")
            return [Filter(field, "__regex__", pat)]
        if kind == "terms":
            # multi-value membership: {"terms": {"f": [v1, v2, ...]}} —
            # one vectorized isin mask; negatable under must_not. ES allows
            # sibling option keys (boost, _name) next to the field entry.
            entries = [(f, v) for f, v in body.items()
                       if f not in ("boost", "_name")]
            if len(entries) != 1:
                raise ValueError(f"terms clause needs one field: {body}")
            field, vals = entries[0]
            return [Filter(field, "__not_in__" if negate else "__in__",
                           tuple(vals))]
        if kind in ("term", "match"):
            (field, v), = body.items()
            if kind == "match" and isinstance(v, dict) and (
                    "operator" in v or len(str(v.get("query", "")).split()) > 1):
                # analyzed match (object form): any/all of the query's
                # whitespace tokens must occur with token boundaries —
                # OR is ES's default operator
                if negate:
                    raise ValueError("analyzed match under must_not "
                                     "unsupported")
                import re as _re
                toks = str(v.get("query", "")).split()
                conj = str(v.get("operator", "or")).lower() == "and"
                fs = [Filter(field, "__regex__",
                             r"(?:^|\s)" + _re.escape(t) + r"(?:\s|$)")
                      for t in toks]
                if not fs:
                    return []
                if conj:
                    return fs
                return [AnyOf(tuple((f,) for f in fs))]
            if isinstance(v, dict):
                v = v.get("value", v.get("query"))
            return [Filter(field, "__ne__" if negate else "__eq__", v)]
        if kind == "exists":
            return [Filter(body["field"],
                           "__missing__" if negate else "__exists__", None)]
        if kind in ("prefix", "wildcard", "regexp"):
            if negate:
                raise ValueError(f"{kind} under must_not unsupported")
            (field, v), = body.items()
            if isinstance(v, dict):
                v = v.get("value")
            if kind == "prefix":
                return [Filter(field, "__prefix__", v)]
            if kind == "wildcard":
                import re as _re
                pat = "".join(".*" if ch == "*" else "." if ch == "?"
                              else _re.escape(ch) for ch in v)
                return [Filter(field, "__regex__", f"^(?:{pat})$")]
            return [Filter(field, "__regex__", f"^(?:{v})$")]  # regexp
        if kind == "range":
            if negate:
                raise ValueError("range under must_not unsupported")
            (field, bounds), = body.items()
            return [Filter(field, _RANGE_OPS[op], v)
                    for op, v in bounds.items() if op in _RANGE_OPS]
        raise ValueError(f"unsupported ES clause: {kind}")

    return clause(query.get("query", query))


_METRIC_HOWS = {"sum": "sum", "min": "min", "max": "max", "avg": None,
                "cardinality": None}

_CALENDAR_FLOORS = {"minute": "min", "hour": "h", "day": "D", "week": "W"}


def elastic_search_page(ds: ray.data.Dataset, body: dict,
                        **search_kw) -> pd.DataFrame:
    """ES search-body pagination: `query` + `sort` + `from`/`size` — one
    sorted page of hits. The sort must totally order ties (add a unique
    tiebreak column, as real ES setups do with _id) for a deterministic
    page. Distributed shape: filter mask, then a partial top-(from+size)
    per block with a driver merge of <= k x blocks rows — the corpus never
    sorts globally for a bounded page. `search_kw` forwards to `search`
    (same deprecated-row default as the unpaginated path)."""
    from nexus_forge_ray.ops.agg import global_topk
    if body.get("query"):
        ds = search(ds, *filters_from_elastic(body["query"]), **search_kw)
    sort_list = body.get("sort") or []
    if not sort_list:
        raise ValueError("paginated search needs an explicit sort "
                         "(deterministic pages)")
    cols, asc = [], []
    for entry in sort_list:
        (col, spec), = entry.items()
        order = spec.get("order") if isinstance(spec, dict) else spec
        cols.append(col)
        asc.append((order or "asc").lower() == "asc")
    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))
    page = global_topk(ds, cols, frm + size, ascending=asc)
    return page.iloc[frm:frm + size].reset_index(drop=True)


def _is_score_sort(sort_list) -> bool:
    """True when the body's first sort entry is the _score pseudo-field
    (ES accepts both the bare string and the object form)."""
    if not sort_list:
        return False
    first = sort_list[0]
    return first == "_score" or (isinstance(first, dict)
                                 and "_score" in first)


def elastic_score_page(ds: ray.data.Dataset, body: dict,
                       **search_kw) -> pd.DataFrame:
    """ES `_score`-ranked hits: `sort: ["_score", ...]` (or the object
    form) returns the top `size` documents by relevance score.

    Scoring model (constant-score-per-clause by default — the
    SQL-expressible subset, so every score is oracle-checkable):
    - each `bool.should` clause contributes its `boost` (default 1.0)
      when it matches — `constant_score` clauses likewise;
    - an analyzed `match` clause contributes boost × (number of its query
      terms present with token boundaries) — per-term constant scoring;
      with `"similarity": "bm25"` in the body, match clauses instead rank
      by true BM25 (Lucene idf, k1=1.2 b=0.75 — still SQL-expressible,
      see the q_es_bm25 oracle) with corpus stats from one extra
      O(terms)-rows-per-block pass;
    - `script_score` with a `cosineSimilarity(params.<p>, '<field>')
      [+ c]` script scores by actual dense-vector cosine (numpy per
      batch against the broadcast query vector) — the reference builds
      exactly this script for vector similarity search
      (kgforge/core/commons/es_query_builder.py:78-84,171-179);
    - `must` / `filter` clauses filter without scoring (filter context);
      with no must/filter present, at least one should clause must match
      (ES bool semantics).

    Distributed shape: masks and cosines are vectorized per batch, the
    page comes from a per-block partial top-k + driver merge of
    <= k × blocks rows (`ops.agg.global_topk`) — never a global sort.
    Secondary sort entries after `_score` are the tiebreak (pass one for
    deterministic pages, as real ES setups do with _id).
    """
    import re as _re

    import numpy as np

    from nexus_forge_ray.ops.agg import global_topk

    q = body.get("query") or {}
    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))

    # tiebreak columns after the leading _score entry
    tie_cols, tie_asc = [], []
    for entry in (body.get("sort") or [])[1:]:
        if isinstance(entry, str):
            tie_cols.append(entry)
            tie_asc.append(True)
        else:
            (col, spec), = entry.items()
            order = spec.get("order") if isinstance(spec, dict) else spec
            tie_cols.append(col)
            tie_asc.append((order or "asc").lower() == "asc")

    def _prune(out: pd.DataFrame) -> pd.DataFrame:
        """Per-block partial top-k in the SAME total order as the global
        merge (score desc, then the tiebreak columns) — nlargest on score
        alone could cut boundary ties that win on tiebreak."""
        if len(out) <= frm + size:
            return out
        return out.sort_values(["_score"] + tie_cols,
                               ascending=[False] + tie_asc,
                               kind="mergesort").head(frm + size)

    if "script_score" in q:
        spec = q["script_score"]
        inner = spec.get("query") or {"match_all": {}}
        script = spec.get("script") or {}
        m = _re.search(
            r"cosineSimilarity\(\s*params\.(\w+)\s*,\s*'(\w+)'\s*\)"
            r"(?:\s*\+\s*([0-9.]+))?", str(script.get("source", "")))
        if not m:
            raise ValueError("only cosineSimilarity script_score scripts "
                             "are supported")
        pname, field, const = m.group(1), m.group(2), m.group(3)
        qv = np.asarray((script.get("params") or {})[pname],
                        dtype=np.float64)
        qn = qv / np.linalg.norm(qv)
        add = float(const) if const else 0.0
        filts = filters_from_elastic({"query": inner})

        def score_batch(df: pd.DataFrame) -> pd.DataFrame:
            out = apply_filters_frame(df, filts)
            if not len(out):
                return out.assign(_score=np.float64())
            mat = np.stack(out[field].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            out = out.assign(_score=(mat @ qn) / norms + add)
            return _prune(out)
    else:
        # a bare top-level scoring clause ranks like a one-clause should
        b = q.get("bool") or (
            {"should": [q]} if q and "bool" not in q else {})
        must: list = []
        for sub in list(b.get("must", [])) + list(b.get("filter", [])):
            must.extend(filters_from_elastic({"query": sub}))
        for sub in b.get("must_not", []):
            must.extend(filters_from_elastic(
                {"query": {"bool": {"must_not": [sub]}}}))
        should = b.get("should") or []
        need_should = not (b.get("must") or b.get("filter"))

        def compile_should(c: dict):
            """-> (boost, token_patterns|None, filters) — a match clause
            scores per matched token, everything else per clause.
            multi_match expands to one scorer per field (field^boost
            syntax, ES most_fields semantics: per-field scores add)."""
            kind, cbody = next(iter(c.items()))
            if kind == "constant_score":
                boost = float(cbody.get("boost", 1.0))
                return (boost, None,
                        filters_from_elastic({"query": cbody["filter"]}))
            if kind == "match":
                (field, v), = cbody.items()
                if isinstance(v, dict) and "query" in v:
                    boost = float(v.get("boost", 1.0))
                    toks = str(v["query"]).split()
                    # lookahead boundary so adjacent occurrences ("a a a")
                    # all count when tf matters (bm25 similarity)
                    pats = [r"(?:^|\s)" + _re.escape(t) + r"(?=\s|$)"
                            for t in toks]
                    return (boost, (field, toks, pats), [])
            boost = 1.0
            (field, v), = cbody.items() if kind != "match_all" \
                else ((None, None),)
            if isinstance(v, dict) and "boost" in v:
                boost = float(v["boost"])
            return (boost, None, filters_from_elastic({"query": c}))

        def expand_clause(c: dict) -> list:
            """multi_match -> one match scorer per field (most_fields:
            per-field scores sum; `f^2` boosts the field)."""
            kind, cbody = next(iter(c.items()))
            if kind != "multi_match":
                return [compile_should(c)]
            qtext = str(cbody.get("query", ""))
            out = []
            for f in cbody.get("fields", []):
                field, _, fb = str(f).partition("^")
                boost = float(fb) if fb else 1.0
                out.append(compile_should(
                    {"match": {field: {"query": qtext, "boost": boost}}}))
            return out

        # clause index rides along so minimum_should_match counts CLAUSES
        # (a multi_match expands to several scorers but is one clause)
        scorers = [(ci, *s) for ci, c in enumerate(should)
                   for s in expand_clause(c)]
        if need_should and not scorers:
            # ES semantics: an empty/absent query is match_all — every doc
            # matches with _score 1.0, no should-gate
            need_should = False
            scorers = [(0, 1.0, None, [])]
        n_clauses = max(1, len(should))
        # ES bool gating: with no must/filter at least ONE should clause
        # must match; an explicit minimum_should_match raises that floor
        # (and applies even next to must/filter, per ES). ES value forms:
        # int, negative int (total minus), "N%" (percent of clauses,
        # rounded down), "-N%" (total minus percent); combinator forms
        # ("2<75%") fail loudly.
        raw_msm = b.get("minimum_should_match", 0)
        s_msm = str(raw_msm).strip()
        try:
            if s_msm.endswith("%"):
                p = int(s_msm[:-1])
                part = (abs(p) * len(should)) // 100
                msm = part if p >= 0 else len(should) - part
            else:
                v = int(s_msm)
                msm = v if v >= 0 else len(should) + v
        except ValueError:
            raise ValueError("unsupported minimum_should_match form: "
                             f"{raw_msm!r} (int, -int, N% and -N% are "
                             "supported)") from None
        msm = max(0, min(msm, len(should)))
        min_match = msm if msm > 0 else (1 if need_should else 0)

        # similarity "bm25": match clauses rank by true BM25 (Lucene idf,
        # k1=1.2 b=0.75 — the formula corpus.doc_bm25 proves distributed
        # AND SQL-expressible) instead of the constant-score-per-term
        # default. Corpus stats come from ONE extra pass over the full
        # dataset: per block a tiny (field, term) partial frame — df
        # counts, doc-length sum, row count — summed on the driver
        # (O(blocks × terms) rows, never documents). Real ES keeps these
        # same stats in the index; the reference submits bodies to ES and
        # gets BM25 implicitly (es_query_builder.py builds match clauses).
        bm25: dict[tuple[str, str], float] = {}
        bm25_avgdl: dict[str, float] = {}
        K1, B = 1.2, 0.75
        if str(body.get("similarity", "")).lower() == "bm25":
            field_terms: dict[str, list[tuple[str, str]]] = {}
            for _, _, ms, _ in scorers:
                if ms is not None:
                    f, toks, pats = ms
                    cur = field_terms.setdefault(f, [])
                    cur.extend((t, p) for t, p in zip(toks, pats)
                               if (t, p) not in cur)

            def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
                rows = []
                for f, tps in field_terms.items():
                    col = df[f].astype("string")
                    dl = col.str.split().str.len().fillna(0)
                    rows.append((f, "\tdl", float(dl.sum())))
                    rows.append((f, "\tn", float(len(df))))
                    for t, p in tps:
                        rows.append((f, t, float(
                            col.str.contains(p, regex=True, na=False)
                            .sum())))
                return pd.DataFrame(rows, columns=["f", "t", "v"])

            if field_terms:
                st = ds.map_batches(stat_partial, batch_format="pandas") \
                    .to_pandas().groupby(["f", "t"])["v"].sum()
                for f, tps in field_terms.items():
                    n = float(st.get((f, "\tn"), 0.0)) or 1.0
                    bm25_avgdl[f] = float(st.get((f, "\tdl"), 0.0)) / n
                    for t, _ in tps:
                        dfreq = float(st.get((f, t), 0.0))
                        bm25[(f, t)] = float(
                            np.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0))

        def score_batch(df: pd.DataFrame) -> pd.DataFrame:
            out = apply_filters_frame(df, must)
            if not len(out):
                return out.assign(_score=np.float64())
            score = np.zeros(len(out))
            clause_hit = np.zeros((n_clauses, len(out)), dtype=bool)
            for ci, boost, match_spec, filts in scorers:
                if match_spec is not None:
                    field, toks, pats = match_spec
                    col = out[field].astype("string")
                    hits = np.zeros(len(out))
                    if bm25:
                        dl = col.str.split().str.len().fillna(0) \
                            .to_numpy(dtype=np.float64)
                        denom = K1 * (1.0 - B
                                      + B * dl / (bm25_avgdl[field] or 1.0))
                        any_hit = np.zeros(len(out), dtype=bool)
                        for t, pat in zip(toks, pats):
                            tf = col.str.count(pat).fillna(0) \
                                .to_numpy(dtype=np.float64)
                            hits += bm25[(field, t)] * tf * (K1 + 1.0) \
                                / (tf + denom)
                            any_hit |= tf > 0
                        score += boost * hits
                        clause_hit[ci] |= any_hit
                        continue
                    for pat in pats:
                        tm = col.str.contains(pat, regex=True, na=False) \
                            .to_numpy()
                        hits += tm
                    score += boost * hits
                    clause_hit[ci] |= hits > 0
                else:
                    m = pd.Series(True, index=out.index)
                    for f in filts:
                        m &= _mask_of(out, f)
                    mv = m.fillna(False).to_numpy()
                    score += boost * mv
                    clause_hit[ci] |= mv
            out = out.assign(_score=score)
            if min_match:
                out = out[clause_hit.sum(axis=0) >= min_match]
            return _prune(out)

    scored = ds.map_batches(score_batch, batch_format="pandas")
    page = global_topk(scored, ["_score"] + tie_cols, frm + size,
                       ascending=[False] + tie_asc)
    page = page.iloc[frm:frm + size].reset_index(drop=True)
    src = body.get("_source")
    if src:
        cols = ([src] if isinstance(src, str)
                else list(src.get("includes") or []) if isinstance(src, dict)
                else list(src))
        page = page[[c for c in cols + ["_score"] if c in page.columns]]
    return page


def elastic_terms_agg(ds: ray.data.Dataset, body: dict) -> pd.DataFrame:
    """Run the ES-DSL `aggs` subset natively: one named `terms` or
    `date_histogram` bucket aggregation (with optional avg/sum/min/max/
    cardinality metric sub-aggs), over the rows selected by the body's
    `query` section.

    Semantics mirror Elasticsearch: `terms` buckets ordered by doc_count
    desc (key asc tiebreak) with `size` buckets returned (default 10);
    `date_histogram` buckets (calendar_interval minute/hour/day/week, or
    fixed_interval pandas offsets like "30min") ordered by key ascending,
    all buckets returned. `cardinality` is an exact distinct count here
    (the engine's HLL sketch in ops.sketches is the approximate scale
    path ES actually uses; exact keeps the oracle checkable).

    Scale shape: the filter is a vectorized mask; bucket counts/partials
    come from `hash_groupby_agg` (pre-aggregated before the shuffle);
    cardinality sub-aggs dedup (bucket, value) pairs map-side before one
    bucketed distinct + count; the final size-k cut is a partial-topk
    merge — the driver only ever sees aggregated bucket rows, never
    documents.
    """
    from nexus_forge_ray.ops.agg import (distinct_rows, global_topk,
                                         hash_groupby_agg)

    aggs = body.get("aggs") or body.get("aggregations") or {}
    if len(aggs) != 1:
        raise ValueError("exactly one top-level agg supported")
    (_, spec), = aggs.items()
    if "terms" in spec:
        field = spec["terms"]["field"]
        size = int(spec["terms"].get("size", 10))
        key_of = None
    elif "date_histogram" in spec:
        h = spec["date_histogram"]
        field, size = h["field"], None
        if "calendar_interval" in h:
            freq = _CALENDAR_FLOORS.get(h["calendar_interval"])
            if freq is None:
                raise ValueError("calendar_interval must be one of "
                                 f"{sorted(_CALENDAR_FLOORS)}")
        else:
            freq = h["fixed_interval"]

        def key_of(col: pd.Series) -> pd.Series:
            return pd.to_datetime(col).dt.floor(freq)
    elif "range" in spec:
        # ES `range` buckets: from inclusive, to exclusive, ranges may
        # overlap (each is an independent mask), EVERY range is returned
        # (empty ones with doc_count 0). Implemented by exploding each row
        # into its matching range keys map-side, then the same bucketed
        # count/metric plan as the other bucket kinds.
        r = spec["range"]
        field, size = r["field"], None
        key_of = None
        rng_keys, rng_los, rng_his = [], [], []
        for rg in r["ranges"]:
            lo, hi = rg.get("from"), rg.get("to")
            rng_keys.append(rg.get("key") or
                            f"{'*' if lo is None else format(lo, 'g')}-"
                            f"{'*' if hi is None else format(hi, 'g')}")
            rng_los.append(lo)
            rng_his.append(hi)
    else:
        raise ValueError("only `terms` / `date_histogram` / `range` bucket "
                         "aggregations supported")
    ranges = rng_keys if "range" in spec else None

    metrics: dict[str, tuple[str, str]] = {}   # out_name -> (field, kind)
    stats_specs: dict[str, str] = {}           # out_name -> field
    pct_specs: dict[str, tuple[str, list[float]]] = {}
    top_hits = None                            # (size, sort list, _source)
    for name, sub in (spec.get("aggs") or {}).items():
        (kind, mspec), = sub.items()
        if kind == "top_hits":
            if len(spec.get("aggs") or {}) != 1:
                raise ValueError("top_hits must be the only sub-agg")
            top_hits = (int(mspec.get("size", 3)),
                        mspec.get("sort") or [],
                        mspec.get("_source"))
        elif kind == "stats":
            # ES stats = {count,min,max,avg,sum} in one agg — all
            # re-aggregable, so they ride the same bucketed exchange
            stats_specs[name] = mspec["field"]
        elif kind == "percentiles":
            # exact percentiles (quantile_cont semantics) via the grouped-
            # percentiles exchange; ES's t-digest approximation is the
            # at-scale substitute, exact keeps the oracle checkable
            pct_specs[name] = (mspec["field"],
                               [float(p) for p in
                                mspec.get("percents",
                                          [1, 5, 25, 50, 75, 95, 99])])
        elif kind in _METRIC_HOWS:
            metrics[name] = (mspec["field"], kind)
        else:
            raise ValueError(f"unsupported metric agg: {kind}")

    if "query" in body:
        ds = search(ds, *filters_from_elastic(body["query"]),
                    include_deprecated=True)

    if key_of is not None:
        src = field

        def bucketed(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__key"] = key_of(df[src])
            return df
        ds = ds.map_batches(bucketed, batch_format="pandas")
        field = "__key"
    elif ranges is not None:
        src = field

        def explode(df: pd.DataFrame) -> pd.DataFrame:
            v = pd.to_numeric(df[src], errors="coerce")
            parts = []
            for k, lo, hi in zip(rng_keys, rng_los, rng_his):
                m = v.notna()
                if lo is not None:
                    m &= v >= lo
                if hi is not None:
                    m &= v < hi
                sub = df[m].copy()
                sub["__key"] = k
                parts.append(sub)
            return pd.concat(parts, ignore_index=True)
        ds = ds.map_batches(explode, batch_format="pandas")
        field = "__key"

    if top_hits is not None:
        # ES top_hits: the k best documents per bucket — grouped_topk's
        # map-side per-batch cut means the shuffle moves at most
        # k x buckets rows, never the hit documents themselves
        from nexus_forge_ray.ops.agg import grouped_topk
        k, sort_list, source = top_hits
        if not sort_list:
            raise ValueError("top_hits needs an explicit sort "
                             "(deterministic results)")
        def sort_of(entry):
            (col, spec_), = entry.items()
            order = spec_.get("order") if isinstance(spec_, dict) else spec_
            return col, (order or "asc").lower() == "asc"
        first_col, first_asc = sort_of(sort_list[0])
        tiebreak = []
        for entry in sort_list[1:]:
            col, asc_ = sort_of(entry)
            if not asc_:
                raise ValueError("only the primary top_hits sort may be "
                                 "descending in this subset")
            tiebreak.append(col)
        hits = grouped_topk(ds, field, first_col, k, ascending=first_asc,
                            tiebreak=tiebreak).to_pandas()
        by = [field, first_col] + tiebreak
        asc = [True, first_asc] + [True] * len(tiebreak)
        hits = hits.sort_values(by, ascending=asc, kind="mergesort") \
            .reset_index(drop=True)
        hits["rank"] = hits.groupby(field, sort=False).cumcount() + 1
        cols = [field, "rank"] + [c for c in (source or hits.columns)
                                  if c not in (field, "rank", "__key")]
        return hits[cols].rename(columns={field: "key"}) \
            .reset_index(drop=True)

    plan: dict[str, tuple[str, str]] = {"doc_count": (field, "count")}
    for name, (mfield, kind) in metrics.items():
        if kind == "avg":
            # ES avg divides by the count of docs that HAVE the field
            # (non-null), not doc_count — same basis as the stats sub-agg
            plan[f"__sum_{name}"] = (mfield, "sum")
            plan[f"__n_{name}"] = (mfield, "count_nonnull")
        elif kind != "cardinality":
            plan[name] = (mfield, kind)
    for name, mfield in stats_specs.items():
        # ES stats.count counts docs WITH the field (non-null), not rows
        plan[f"{name}_count"] = (mfield, "count_nonnull")
        plan[f"{name}_sum"] = (mfield, "sum")
        plan[f"{name}_min"] = (mfield, "min")
        plan[f"{name}_max"] = (mfield, "max")
    if pct_specs:
        ds = ds.materialize()   # consumed by the grouped agg AND per-
        # percentile exchanges; don't re-run the upstream filter per consumer
    grouped = hash_groupby_agg(ds, field, plan, num_buckets=16)

    if size is not None:
        out = global_topk(grouped, ["doc_count", field], size,
                          ascending=[False, True])
    else:
        out = grouped.to_pandas().sort_values(field).reset_index(drop=True)
    out = out.rename(columns={field: "key"})
    if ranges is not None:       # every range appears, in the given order
        out = out.set_index("key").reindex(ranges).reset_index()
        out["doc_count"] = out["doc_count"].fillna(0)
    out["doc_count"] = out["doc_count"].astype("int64")
    for name, (mfield, kind) in metrics.items():
        if kind == "avg":
            n = out.pop(f"__n_{name}")
            out[name] = (out.pop(f"__sum_{name}") / n).where(n > 0)
        elif kind == "cardinality":
            pairs = distinct_rows(ds, [field, mfield], num_buckets=16,
                                  keep_cols=[])
            card = hash_groupby_agg(pairs, field,
                                    {name: (mfield, "count")},
                                    num_buckets=8).to_pandas() \
                .rename(columns={field: "key"})
            card[name] = card[name].astype("int64")
            out = out.merge(card, on="key", how="left")
            out[name] = out[name].fillna(0).astype("int64")
    cols = ["key", "doc_count"] + list(metrics)
    for name in stats_specs:
        # empty buckets (range reindex) have NaN partials: ES returns
        # count=0, sum=0.0, min/max/avg null
        out[f"{name}_count"] = out[f"{name}_count"].fillna(0) \
            .astype("int64")
        out[f"{name}_sum"] = out[f"{name}_sum"].fillna(0.0)
        out[f"{name}_avg"] = (out[f"{name}_sum"] / out[f"{name}_count"]) \
            .where(out[f"{name}_count"] > 0)
        cols += [f"{name}_count", f"{name}_min", f"{name}_max",
                 f"{name}_avg", f"{name}_sum"]
    for name, (mfield, percents) in pct_specs.items():
        from nexus_forge_ray.ops.agg import grouped_percentiles
        ps = {f"{name}_p{format(p, 'g')}": p for p in percents}
        pct = grouped_percentiles(ds, field, mfield, ps,
                                  num_buckets=16).to_pandas() \
            .rename(columns={field: "key"})
        out = out.merge(pct, on="key", how="left")
        cols += list(ps)
    return out[cols].reset_index(drop=True)
