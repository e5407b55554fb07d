"""Named graphs (RDF datasets) over a quad table — SPARQL GRAPH patterns.

Reference semantics: nexus-forge keeps each schema file in its own named
graph inside an rdflib Dataset
(/root/reference/kgforge/specializations/models/rdf/service.py:157-175) and
forwards arbitrary SPARQL — GRAPH patterns included — to the store endpoint
(/root/reference/kgforge/specializations/stores/sparql_store.py:157-179).
Ray-Data-first substitution: the RDF dataset is ONE quad Dataset
(graph, subj, pred, obj); a GRAPH block's graph term is simply a fourth
pattern position — a constant graph is a vectorized ``==`` filter pushed to
the scan, a graph VARIABLE binds like any other variable and joins through
the bucketed exchanges. The default graph is the UNION of the named graphs
(the common endpoint configuration): default-graph patterns match over
distinct (subj, pred, obj) — the same triple asserted in two graphs is one
triple in the union.

Scale: one pass over the quad table per pattern (constant positions filter
at the scan), bucketed hash joins on shared variables only; the quad table
itself is never shuffled. The web-KG construction convention here is one
named graph per SOURCE (crawl feed / host), so per-source slices are
constant-graph scans with zero exchange.

Grammar (subset): PREFIX header; ``SELECT [DISTINCT] (?v | (FUNC(?v|*)
AS ?alias))... [FROM <g>]* [FROM NAMED <g>]* WHERE { body }
[GROUP BY ?v...] [LIMIT n]``; body = bare triple patterns (default
graph) and/or ``GRAPH (?var | <iri> | pfx:name) { triple patterns }``
blocks. FROM restricts the default graph to the listed graphs' union,
FROM NAMED restricts what GRAPH patterns may match; aggregates
(COUNT/SUM/MIN/MAX/AVG) reuse the triple engine's partial-agg shuffle.
FILTER / OPTIONAL / UNION / property paths inside the quad surface
raise — GRAPH-free queries get the full `kg.bgp.sparql_select` surface
via forge.sparql's default-graph projection.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data

_QCOLS = ("graph", "subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_quad(ds: ray.data.Dataset,
               pattern: tuple[str | None, str, str, str]) -> ray.data.Dataset:
    """Bindings of one quad pattern (graph, subj, pred, obj) — rows =
    matches, columns = variables. graph=None matches a 3-column triple view
    (default-graph block). Constant positions are vectorized == filters at
    the scan; a variable repeated within the pattern is an equality filter.
    """
    cols = _QCOLS if pattern[0] is not None else _QCOLS[1:]
    terms = pattern if pattern[0] is not None else pattern[1:]
    var_cols: dict[str, list[str]] = {}
    for col, term in zip(cols, terms):
        if _is_var(term):
            var_cols.setdefault(term[1:], []).append(col)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.Series(True, index=batch.index)
        for col, term in zip(cols, terms):
            if not _is_var(term):
                m &= batch[col] == term
        for cs in var_cols.values():
            for extra in cs[1:]:
                m &= batch[cs[0]] == batch[extra]
        out = batch[m]
        return pd.DataFrame({v: out[cs[0]].to_numpy()
                             for v, cs in var_cols.items()})

    return ds.map_batches(project, batch_format="pandas")


def default_graph_view(quads: ray.data.Dataset, *,
                       num_buckets: int = 16) -> ray.data.Dataset:
    """The RDF dataset's default graph as a (subj, pred, obj) triple
    Dataset: the set-semantic union of the named graphs. GRAPH-free,
    FROM-free queries over a quad table run the FULL triple engine
    (kg.bgp — FILTER/OPTIONAL/paths/aggregates) over this view; the quad
    engine handles GRAPH patterns and dataset clauses (its own restrict()
    implements the 13.2 replacement semantics)."""
    from nexus_forge_ray.ops.agg import distinct_rows
    return distinct_rows(
        quads.map_batches(lambda df: df[["subj", "pred", "obj"]],
                          batch_format="pandas"),
        ["subj", "pred", "obj"], num_buckets=num_buckets, keep_cols=[])


def quad_select(quads: ray.data.Dataset,
                blocks: list[tuple[str | None, list[tuple[str, str, str]]]],
                select: list[str], *, num_buckets: int = 16,
                distinct: bool = False,
                limit: int | None = None,
                from_graphs: list[str] | None = None,
                named_graphs: list[str] | None = None,
                group_by: list[str] | None = None,
                aggregates: list[tuple[str, str, str]] | None = None) \
        -> ray.data.Dataset:
    """Conjunctive quad query. ``blocks`` is a list of
    (graph_term | None, [triple patterns]); graph_term None = default graph
    (union of named graphs, set-semantic). Patterns join left-to-right on
    shared variables, most-constant-first within the caller's block order.
    ``from_graphs`` restricts the default graph to those graphs' union;
    ``named_graphs`` restricts what GRAPH patterns may match (SPARQL 13.2
    dataset clauses) — both are vectorized isin scans. Dataset clauses
    REPLACE the whole dataset (13.2): when either list is given, the other
    defaults to the EMPTY set (``[]``) — pass None for "no clause" (the
    implicit all-graphs dataset). A variable-free pattern acts as an
    existence filter: present -> no constraint, absent -> empty result.
    """
    from nexus_forge_ray.ops.agg import distinct_rows
    from nexus_forge_ray.ops.joins import partitioned_join

    if from_graphs is not None or named_graphs is not None:
        from_graphs = from_graphs or []
        named_graphs = named_graphs or []

    quads = quads.materialize()  # scanned once per pattern

    def restrict(gs: list[str]) -> ray.data.Dataset:
        return quads.map_batches(
            lambda df, gs=frozenset(gs): df[df["graph"].isin(gs)],
            batch_format="pandas")

    named_view = restrict(named_graphs) if named_graphs is not None else quads
    jobs: list[tuple[ray.data.Dataset, tuple]] = []
    default_view: ray.data.Dataset | None = None
    for gterm, pats in blocks:
        if gterm is None:
            if default_view is None:
                src = restrict(from_graphs) if from_graphs is not None \
                    else quads
                default_view = distinct_rows(
                    src.map_batches(
                        lambda df: df[["subj", "pred", "obj"]],
                        batch_format="pandas"),
                    ["subj", "pred", "obj"], num_buckets=num_buckets,
                    keep_cols=[]).materialize()
            jobs += [(default_view, (None,) + tuple(p)) for p in pats]
        else:
            jobs += [(named_view, (gterm,) + tuple(p)) for p in pats]
    if not jobs:
        raise ValueError("empty quad pattern list")

    def pat_vars(job) -> list[str]:
        return list(dict.fromkeys(
            t[1:] for t in job[1] if _is_var(t)))

    def consts(job) -> int:
        return sum(0 if (t is None or _is_var(t)) else 1 for t in job[1])

    # a variable-free pattern is an EXISTENCE filter (SPARQL: a constant
    # pattern either keeps every solution or empties the result); probe it
    # with a limit(1) scan — match_quad would project it to zero columns
    const_jobs = [j for j in jobs if not pat_vars(j)]
    jobs = [j for j in jobs if pat_vars(j)]
    exists = True
    for src, pattern in const_jobs:
        cols = _QCOLS if pattern[0] is not None else _QCOLS[1:]
        terms = pattern if pattern[0] is not None else pattern[1:]

        def hit(df: pd.DataFrame, cols=cols, terms=terms) -> pd.DataFrame:
            mask = pd.Series(True, index=df.index)
            for c, t in zip(cols, terms):
                mask &= df[c] == t
            return df[mask]

        if src.map_batches(hit, batch_format="pandas") \
                .limit(1).count() == 0:
            exists = False
            break

    all_vars = list(dict.fromkeys(v for j in jobs for v in pat_vars(j)))
    cur: ray.data.Dataset | None = None
    have: list[str] = []
    if not exists:
        # one failed existence check empties the whole solution set
        cur = ray.data.from_pandas(pd.DataFrame(
            {v: pd.Series(dtype=object) for v in all_vars or ["__one"]}))
        have = all_vars
        jobs = []
    elif not jobs:
        # every pattern was a satisfied existence check: ONE empty solution
        # (selected vars project unbound, COUNT(*) sees one row)
        cur = ray.data.from_pandas(pd.DataFrame({"__one": [1]}))

    # greedy connectivity-preserving order, most constants first
    ordered: list = []
    if jobs:
        ordered = [max(jobs, key=consts)]
        jobs.remove(ordered[0])
        bound = set(pat_vars(ordered[0]))
        while jobs:
            linked = [j for j in jobs if bound & set(pat_vars(j))]
            nxt = max(linked, key=consts) if linked else jobs[0]
            ordered.append(nxt)
            jobs.remove(nxt)
            bound |= set(pat_vars(nxt))

    for job in ordered:
        nxt = match_quad(job[0], job[1])
        pv = pat_vars(job)
        if cur is None:
            cur, have = nxt, pv
            continue
        shared = [v for v in have if v in pv]
        if not shared:
            raise ValueError(f"quad pattern {job[1]} shares no variable "
                             f"with {have}; cross joins are not supported")
        cur = partitioned_join(cur, nxt, on=shared[0],
                               extra_keys=shared[1:],
                               num_buckets=num_buckets,
                               lcols=have, rcols=pv)
        have = list(dict.fromkeys(have + pv))
    if aggregates:
        # reuse the triple engine's grouped-aggregation machinery (per-batch
        # partials, one bucketed shuffle of one row per (batch, group))
        from nexus_forge_ray.kg.bgp import ParsedQuery, _aggregate_groups
        cur = _aggregate_groups(cur, ParsedQuery(
            select=select, patterns=[], limit=None,
            group_by=group_by or [], aggregates=aggregates))
    sel = [v.lstrip("?") for v in select]
    out = cur.map_batches(lambda df: df.reindex(columns=sel),
                          batch_format="pandas")
    if distinct:
        out = distinct_rows(out, sel, num_buckets=num_buckets, keep_cols=[])
    if limit is not None:
        out = out.limit(limit)
    return out


def sparql_select_quads(quads: ray.data.Dataset, query: str,
                        **kw) -> ray.data.Dataset:
    """Parse + execute the GRAPH-subset SELECT grammar over a quad Dataset.

    Variables project in SELECT order; ``SELECT *`` is rejected (name your
    columns — driver-oracle comparisons are by name).
    """
    from nexus_forge_ray.kg.bgp import (_template_patterns, graph_term,
                                        split_prefixes)

    prefixes, body, _ = split_prefixes(query)
    # FROM / FROM NAMED dataset clauses (SPARQL 13.2) live ONLY between the
    # SELECT list and WHERE — scoping the scan there keeps 'from' tokens
    # inside patterns/literals (a ?from variable, a "... from <x>" literal)
    # untouched. FROM graphs form the default graph (union of the listed
    # graphs only); FROM NAMED restricts which graphs GRAPH patterns may
    # match; per 13.2 EITHER clause replaces the whole dataset, so the
    # unlisted side becomes the empty set. Both are one vectorized isin
    # filter over the quad table — no exchange.
    m = re.match(r"(?is)^\s*select\s+(distinct\s+)?(.+?)"
                 r"((?:from\s+(?:named\s+)?(?:<[^>]*>|\w*:\S+)\s*)*)"
                 r"where\s*\{(.*)\}\s*"
                 r"(?:group\s+by\s+((?:\?\w+\s*)+))?"
                 r"(?:limit\s+(\d+))?\s*$", body)
    if not m:
        raise ValueError("unsupported quad query form")
    distinct = bool(m.group(1))
    # walk the SELECT list in WRITTEN order: every item must be a ?var or a
    # supported (FUNC(?v|*) AS ?alias) aggregate — anything else (e.g.
    # COUNT(DISTINCT ?x), an unaliased COUNT) raises instead of silently
    # running as a plain variable select; projection keeps the written order
    agg_re = re.compile(r"(?is)^\(\s*(count|sum|min|max|avg)\s*\("
                        r"\s*(\*|\?\w+)\s*\)\s+as\s+\?(\w+)\s*\)$")
    item_re = re.compile(r"\((?:[^()]|\([^()]*\))*\)|\S+")
    select: list[str] = []
    plain: list[str] = []
    aggregates: list[tuple[str, str, str]] = []
    for tok in item_re.findall(m.group(2).strip()):
        am = agg_re.match(tok)
        if am:
            f, v, a = am.groups()
            aggregates.append((f.lower(), v if v == "*" else v[1:], a))
            select.append("?" + a)
        elif _is_var(tok) and re.fullmatch(r"\?\w+", tok):
            select.append(tok)
            plain.append(tok)
        else:
            raise ValueError(f"unsupported SELECT item {tok!r} (expected "
                             "?var or (COUNT|SUM|MIN|MAX|AVG(?v|*) AS ?a))")
    if not select:
        raise ValueError(f"SELECT must list ?vars / aggregate aliases, "
                         f"got {m.group(2)!r}")
    group_by = re.findall(r"\?(\w+)", m.group(5) or "")
    if aggregates:
        if sorted(v[1:] for v in plain) != sorted(group_by):
            raise ValueError("non-aggregated SELECT variables must exactly "
                             "match the GROUP BY variables")
        if any(v == "*" and f != "count" for f, v, _ in aggregates):
            raise ValueError("only COUNT accepts *")
    elif group_by:
        raise ValueError("GROUP BY requires at least one aggregate "
                         "in the SELECT clause")
    from_graphs: list[str] = []
    named_graphs: list[str] = []
    for named, g in re.findall(r"(?i)\bfrom\s+(named\s+)?(<[^>]*>|\S+)",
                               m.group(3)):
        (named_graphs if named else from_graphs).append(
            graph_term(g, prefixes))
    has_dataset_clause = bool(from_graphs or named_graphs)
    where = m.group(4)
    limit = int(m.group(6)) if m.group(6) else None

    def gterm(tok: str) -> str:
        return graph_term(tok, prefixes, allow_var=True)

    blocks: list[tuple[str | None, list[tuple[str, str, str]]]] = []

    def grab(mm: re.Match) -> str:
        blocks.append((gterm(mm.group(1)),
                       _template_patterns(mm.group(2), prefixes)))
        return " "

    rest = re.sub(r"(?is)\bgraph\s+(\S+)\s*\{([^{}]*)\}", grab, where)
    # keyword scan runs over the body with IRIs and literals blanked out,
    # so <http://ex/subgraph> or a "... union ..." literal cannot
    # false-trigger (same discipline as forge.sparql's dispatcher)
    scrubbed = re.sub(r'<[^>]*>|"[^"]*"|\'[^\']*\'', " ", rest)
    for kwd in ("filter", "optional", "union", "graph"):
        if re.search(r"(?i)\b" + kwd + r"\b", scrubbed):
            raise ValueError(
                f"{kwd!r} is not supported in the quad subset (use "
                "kg.bgp.sparql_select on a triple projection)")
    if "{" in scrubbed or "}" in scrubbed:
        raise ValueError(
            "nested groups are not supported in the quad subset (use "
            "kg.bgp.sparql_select on a triple projection)")
    if rest.strip():
        blocks.append((None, _template_patterns(rest, prefixes)))
    return quad_select(
        quads, blocks, select, distinct=distinct, limit=limit,
        from_graphs=from_graphs if has_dataset_clause else None,
        named_graphs=named_graphs if has_dataset_clause else None,
        group_by=group_by, aggregates=aggregates, **kw)
