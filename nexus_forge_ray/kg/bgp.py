"""SPARQL basic-graph-pattern matching over the triple Dataset.

The reference exposes graph queries through SPARQL endpoints
(`/root/reference/kgforge/core/archetypes/store.py` sparql(); query text
built in `kgforge/core/commons/sparql_query_builder.py`). Ray-Data-first
substitution: each triple pattern is a vectorized filter + projection of the
triple table, and shared variables between patterns become bucketed hash
joins (`ops.joins.partitioned_join`) — the query planner is the pattern
order the caller supplies (put the most selective pattern first; each join
shuffles only the surviving bindings, never the full triple table).

Terms starting with '?' are variables; anything else matches literally.
"""

from __future__ import annotations

import pandas as pd
import ray.data

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(triples: ray.data.Dataset,
                  pattern: tuple[str, str, str]) -> ray.data.Dataset:
    """Bindings of one triple pattern: rows = matches, columns = variables.

    A variable repeated within the pattern (e.g. (?x, p, ?x)) becomes an
    equality filter. Constant positions are vectorized == filters pushed to
    the scan — no shuffle.
    """
    var_cols: dict[str, list[str]] = {}
    for col, term in zip(_COLS, pattern):
        if _is_var(term):
            var_cols.setdefault(term[1:], []).append(col)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.Series(True, index=batch.index)
        for col, term in zip(_COLS, pattern):
            if not _is_var(term):
                m &= batch[col] == term
        for cols in var_cols.values():
            for extra in cols[1:]:
                m &= batch[cols[0]] == batch[extra]
        out = batch[m]
        return pd.DataFrame({v: out[cols[0]].to_numpy()
                             for v, cols in var_cols.items()})

    return triples.map_batches(project, batch_format="pandas")


def bgp_select(triples: ray.data.Dataset,
               patterns: list[tuple[str, str, str]],
               select: list[str], *,
               num_buckets: int = 16) -> ray.data.Dataset:
    """SELECT ?vars WHERE { patterns } — conjunctive triple-pattern query.

    Patterns join left-to-right on their shared variables. Duplicate rows
    are kept (SPARQL SELECT semantics without DISTINCT); wrap with
    `ops.agg.distinct_rows` for SELECT DISTINCT. Patterns with no variable
    shared with the accumulated bindings would be a cross join and are
    rejected — reorder the patterns instead.
    """
    from nexus_forge_ray.ops.joins import partitioned_join

    triples = triples.materialize()  # scanned once per pattern
    sel = [v.lstrip("?") for v in select]
    bound: list[str] = []
    cur: ray.data.Dataset | None = None
    for pat in patterns:
        pat_vars = [t[1:] for t in pat if _is_var(t)]
        nxt = match_pattern(triples, pat)
        if cur is None:
            cur, bound = nxt, list(dict.fromkeys(pat_vars))
            continue
        shared = [v for v in bound if v in pat_vars]
        if not shared:
            raise ValueError(f"pattern {pat} shares no variable with "
                             f"{bound}; reorder patterns (cross joins "
                             "are not supported)")
        cur = partitioned_join(cur, nxt, on=shared[0],
                               extra_keys=shared[1:],
                               num_buckets=num_buckets,
                               lcols=bound,
                               rcols=list(dict.fromkeys(pat_vars)))
        bound = list(dict.fromkeys(bound + pat_vars))
    assert cur is not None, "empty pattern list"
    return cur.map_batches(lambda df: df[sel], batch_format="pandas")


def parse_sparql(query: str) -> tuple[list[str], list[tuple[str, str, str]],
                                      int | None]:
    """Parse the SELECT-BGP subset of SPARQL the reference's stores accept
    for simple graph queries: PREFIX declarations, SELECT with explicit
    variables, a WHERE block of dot-separated triple patterns ('a' sugar for
    rdf:type), and an optional LIMIT. Returns (select_vars, patterns, limit).

    Term forms: ?var, <iri>, prefix:local (expanded), "literal", bare token
    (kept verbatim). No OPTIONAL/FILTER/UNION — those are native Dataset
    filters/joins in this engine (`core.filters`, `ops.joins`).
    """
    import re

    prefixes = dict(re.findall(
        r"(?im)^\s*prefix\s+(\w*):\s*<([^>]*)>", query))
    m = re.search(r"(?is)select\s+(.*?)\s+where\s*\{(.*)\}\s*"
                  r"(?:limit\s+(\d+))?\s*$", query)
    if not m:
        raise ValueError("unsupported SPARQL (need SELECT ?vars WHERE "
                         "{ patterns } [LIMIT n])")
    select = re.findall(r"\?\w+", m.group(1))
    if not select:
        raise ValueError("SELECT * not supported — name the variables")
    limit = int(m.group(3)) if m.group(3) else None

    def term(tok: str) -> str:
        if tok.startswith("?") or tok.startswith('"'):
            return tok.strip('"') if tok.startswith('"') else tok
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return tok

    # tokenize the whole block: '.' separates patterns ONLY outside <> / ""
    # (IRIs and literals may contain dots)
    toks = re.findall(r'<[^>]*>|"[^"]*"|[^\s.]+|\.', m.group(2))
    patterns, cur = [], []
    for tok in toks + ["."]:
        if tok == ".":
            if cur:
                if len(cur) != 3:
                    raise ValueError(f"pattern needs 3 terms: {cur!r}")
                patterns.append(tuple(term(t) for t in cur))
                cur = []
        else:
            cur.append(tok)
    if not patterns:
        raise ValueError("empty WHERE block")
    return select, patterns, limit


def sparql_select(triples: ray.data.Dataset, query: str,
                  **kw) -> ray.data.Dataset:
    """Run a SELECT-BGP SPARQL string against a triple Dataset."""
    select, patterns, limit = parse_sparql(query)
    out = bgp_select(triples, patterns, select, **kw)
    return out.limit(limit) if limit is not None else out
