"""SPARQL 1.1 Update over the triple table (W3C SPARQL 1.1 Update).

The reference submits update text to a remote SPARQL endpoint and never
executes it locally (kgforge/specializations/stores/sparql_store.py builds
query text only); here an update is a functional Dataset -> Dataset
transform: the input triple table is never mutated, the returned Dataset is
the updated graph (immutable blocks fit Ray Data; callers persist via
write_parquet / the parquet store's register()).

Supported forms (prefixes allowed, as in kg.bgp):
- ``INSERT DATA { constant triples }``
- ``DELETE DATA { constant triples }``
- ``DELETE WHERE { patterns }``            (the pattern group is the template)
- ``DELETE { tmpl } INSERT { tmpl } WHERE { group }``  (either part optional)

Scale notes:
- WHERE bindings run through the full kg.bgp SELECT surface (FILTER,
  OPTIONAL, VALUES, paths, ...), entirely distributed.
- Deletions are one bucketed anti-join on the composite (subj,pred,obj) key
  — the deleted set never reaches the driver. DATA forms ship only the
  constant triples written in the update text (bounded by the text itself).
- The result is set-semantic (RDF graphs are sets): inserts union with the
  survivors and a bucketed distinct collapses duplicates.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

_SEP = "\x1d"  # composite-key separator; cannot occur in parsed terms
_QUAD_COLS = ("graph", "subj", "pred", "obj")


def _composite(df: pd.DataFrame) -> pd.Series:
    return (df["subj"].astype(str) + _SEP + df["pred"].astype(str)
            + _SEP + df["obj"].astype(str))


def _constant_rows(block: str, prefixes: dict[str, str]) -> pd.DataFrame:
    from nexus_forge_ray.kg.bgp import _is_var, _template_patterns
    pats = _template_patterns(block, prefixes)
    if not pats:
        raise ValueError("empty data block")
    if any(_is_var(t) for pat in pats for t in pat):
        raise ValueError("INSERT/DELETE DATA must not contain variables")
    return pd.DataFrame(pats, columns=["subj", "pred", "obj"])


def _expand(bindings: ray.data.Dataset,
            template: list[tuple[str, str, str]]) -> ray.data.Dataset:
    """One (subj,pred,obj) row per template pattern per binding; rows with
    an unbound variable (OPTIONAL) drop, per spec."""
    from nexus_forge_ray.kg.bgp import _is_var

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for s, p, o in template:
            cols = {}
            for name, t in (("subj", s), ("pred", p), ("obj", o)):
                cols[name] = df[t[1:]] if _is_var(t) \
                    else pd.Series([t] * len(df), index=df.index)
            tri = pd.DataFrame(cols)
            parts.append(tri[tri.notna().all(axis=1)])
        if not parts:
            return pd.DataFrame({"subj": [], "pred": [], "obj": []})
        return pd.concat(parts, ignore_index=True).astype(str)

    return bindings.map_batches(emit, batch_format="pandas")


def _minus(triples: ray.data.Dataset, deletes: ray.data.Dataset,
           num_buckets: int) -> ray.data.Dataset:
    """triples ∖ deletes via one bucketed anti-join on the composite key."""
    from nexus_forge_ray.ops.joins import partitioned_anti_join

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["subj", "pred", "obj"]].copy()
        df["__k"] = _composite(df)
        return df

    survivors = partitioned_anti_join(
        triples.map_batches(keyed, batch_format="pandas"),
        deletes.map_batches(keyed, batch_format="pandas"),
        on="__k", num_buckets=num_buckets,
        lcols=["subj", "pred", "obj", "__k"])
    return survivors.map_batches(
        lambda df: df[["subj", "pred", "obj"]], batch_format="pandas")


def sparql_update_quads(quads: ray.data.Dataset, update: str, *,
                        num_buckets: int = 32, **kw) -> ray.data.Dataset:
    """Graph-management subset of SPARQL 1.1 Update over a QUAD Dataset
    (graph, subj, pred, obj) — the per-crawl-feed maintenance surface:

    - ``CLEAR GRAPH <g>`` / ``DROP GRAPH <g>`` — remove every quad of g
      (one vectorized scan filter; in a quad table the two are the same).
    - ``CLEAR ALL`` / ``DROP ALL`` / ``CLEAR NAMED`` / ``DROP NAMED`` —
      empty dataset (every graph here is a named graph).
    - ``ADD <g1> TO <g2>`` — union g1's triples into g2 (set semantics).
    - ``COPY <g1> TO <g2>`` — replace g2 with g1's triples.
    - ``MOVE <g1> TO <g2>`` — COPY then drop g1.
    - ``INSERT DATA { GRAPH <g> { triples } ... }`` /
      ``DELETE DATA { GRAPH <g> { triples } ... }`` — constant quads per
      named GRAPH block (inserted set-semantically / removed via one
      bucketed anti-join on the composite quad key).
    - ``WITH <g> DELETE {...} INSERT {...} WHERE {...}`` — the triple-level
      update (sparql_update) scoped to graph g's slice; other graphs pass
      through untouched.

    Everything is a functional Dataset -> Dataset transform; graph terms
    may be <iri> or pfx:name (PREFIX headers as in kg.bgp).
    """
    from nexus_forge_ray.kg.bgp import graph_term, split_prefixes
    from nexus_forge_ray.ops.agg import distinct_rows

    prefixes, body, header = split_prefixes(update)

    def gterm(tok: str) -> str:
        return graph_term(tok, prefixes)

    def only(g: str, keep: bool) -> ray.data.Dataset:
        return quads.map_batches(
            lambda df, g=g, keep=keep:
            df[(df["graph"] == g) if keep else (df["graph"] != g)],
            batch_format="pandas")

    m = re.match(r"(?is)^\s*(clear|drop)\s+graph\s+(\S+)\s*$", body)
    if m:
        return only(gterm(m.group(2)), keep=False)

    if re.match(r"(?is)^\s*(clear|drop)\s+(all|named)\s*$", body):
        return quads.map_batches(lambda df: df.iloc[0:0],
                                 batch_format="pandas")

    m = re.match(r"(?is)^\s*(insert|delete)\s+data\s*\{(.*)\}\s*$", body)
    if m:
        op, block = m.group(1).lower(), m.group(2)
        if op == "insert":
            # the insert path scans `quads` twice (untouched rest + touched
            # slice); pin the blocks so a derived input isn't recomputed
            quads = quads.materialize()
        parts: list[pd.DataFrame] = []

        def grab(mm: re.Match) -> str:
            g = gterm(mm.group(1))
            rows = _constant_rows(mm.group(2), prefixes)
            parts.append(rows.assign(graph=g)[list(_QUAD_COLS)])
            return " "

        rest = re.sub(r"(?is)\bgraph\s+(\S+)\s*\{([^{}]*)\}", grab, block)
        if rest.strip():
            raise ValueError("quad INSERT/DELETE DATA requires GRAPH "
                             "blocks (this dataset has no separate "
                             "default-graph store)")
        if not parts:
            raise ValueError("empty data block")
        const = pd.concat(parts, ignore_index=True)
        data = ray.data.from_pandas(const)
        if op == "insert":
            # dedupe ONLY the touched graphs' slices: untouched graphs
            # keep bag pass-through (like ADD/COPY/MOVE/DROP/WITH) and
            # the distinct exchange is sized to the touched slices, not
            # the corpus
            touched = frozenset(const["graph"])
            rest = quads.map_batches(
                lambda df, gs=touched: df[~df["graph"].isin(gs)],
                batch_format="pandas")
            merged = quads.map_batches(
                lambda df, gs=touched: df[df["graph"].isin(gs)],
                batch_format="pandas").union(data)
            return rest.union(distinct_rows(
                merged, list(_QUAD_COLS),
                num_buckets=num_buckets, keep_cols=[]))
        from nexus_forge_ray.ops.joins import partitioned_anti_join

        def keyed(df: pd.DataFrame) -> pd.DataFrame:
            df = df[list(_QUAD_COLS)].copy()
            df["__k"] = df["graph"].astype(str) + _SEP + _composite(df)
            return df

        survivors = partitioned_anti_join(
            quads.map_batches(keyed, batch_format="pandas"),
            data.map_batches(keyed, batch_format="pandas"),
            on="__k", num_buckets=num_buckets,
            lcols=list(_QUAD_COLS) + ["__k"])
        return survivors.map_batches(
            lambda df: df[list(_QUAD_COLS)], batch_format="pandas")

    m = re.match(r"(?is)^\s*(add|copy|move)\s+(\S+)\s+to\s+(\S+)\s*$", body)
    if m:
        op, g1, g2 = m.group(1).lower(), gterm(m.group(2)), gterm(m.group(3))
        if g1 == g2:
            return quads  # same source and destination: no-op (3.2.5-7)
        # src / dst / rest are three scans of the same input: pin the
        # blocks so a derived `quads` plan isn't re-executed per scan
        quads = quads.materialize()
        src_as_dst = only(g1, keep=True).map_batches(
            lambda df, g=g2: df.assign(graph=g), batch_format="pandas")
        if op == "add":
            merged = only(g2, keep=True).union(src_as_dst)
        else:  # copy/move: g2 is REPLACED by g1's triples
            merged = src_as_dst
        # dedupe ONLY the destination slice — untouched graphs pass through
        # verbatim (bag pass-through, matching DROP/WITH), and the distinct
        # exchange is sized to g2 ∪ src instead of the whole table
        rest = only(g2, keep=False)
        if op == "move":
            rest = rest.map_batches(
                lambda df, g=g1: df[df["graph"] != g], batch_format="pandas")
        return rest.union(distinct_rows(
            merged, ["graph", "subj", "pred", "obj"],
            num_buckets=num_buckets, keep_cols=[]))

    m = re.match(r"(?is)^\s*with\s+(\S+)\s+(.*)$", body)
    if m:
        g = gterm(m.group(1))
        quads = quads.materialize()   # scanned twice: scope + pass-through
        scope = only(g, keep=True).map_batches(
            lambda df: df[["subj", "pred", "obj"]], batch_format="pandas")
        updated = sparql_update(scope, f"{header}\n{m.group(2)}",
                                num_buckets=num_buckets, **kw)
        return only(g, keep=False).union(updated.map_batches(
            lambda df, g=g: df.assign(graph=g)[
                ["graph", "subj", "pred", "obj"]],
            batch_format="pandas"))

    raise ValueError("unsupported quad update form (expected CLEAR/DROP "
                     "GRAPH, ADD/COPY/MOVE ... TO ..., or WITH <g> ...)")


def upsert_subjects(base: ray.data.Dataset, delta: ray.data.Dataset, *,
                    subj_col: str = "subj",
                    num_buckets: int = 32) -> ray.data.Dataset:
    """Re-crawl maintenance: replace EVERY triple of every subject the new
    crawl re-extracted — ``base ∖ {s ∈ subjects(delta)} ∪ delta``.

    This is the incremental-update primitive a web-scale KG needs per crawl
    snapshot: a page's old facts must disappear wholesale (stale mentions
    are not corrected row-by-row, the page is re-asserted). The reference
    expresses this as per-resource ``forge.update`` round-trips (one HTTP
    call per changed resource, demo_store.py:120-143 replaces the stored
    record); here it is ONE bucketed anti-join on the subject key (the
    delta's subject set never reaches the driver — re-crawls are O(corpus))
    plus a block-level union. Output keeps bag semantics: both inputs'
    triple sets are subject-disjoint after the anti-join, so no distinct
    exchange is needed (callers with duplicated delta rows dedupe first).
    """
    from nexus_forge_ray.ops.joins import partitioned_anti_join

    cols = [subj_col, "pred", "obj"]
    delta = delta.materialize()   # scanned twice: subject keys + re-assert
    survivors = partitioned_anti_join(
        base, delta.map_batches(lambda df: df[[subj_col]],
                                batch_format="pandas"),
        on=subj_col, num_buckets=num_buckets, lcols=cols)
    return survivors.union(
        delta.map_batches(lambda df: df[cols], batch_format="pandas"))


def sparql_update(triples: ray.data.Dataset, update: str, *,
                  num_buckets: int = 32, **kw) -> ray.data.Dataset:
    """Execute one SPARQL 1.1 Update operation; returns the updated graph
    as a (subj, pred, obj) Dataset with set semantics."""
    from nexus_forge_ray.kg.bgp import (_is_var, _template_patterns,
                                        sparql_select, split_prefixes)
    from nexus_forge_ray.ops.agg import distinct_rows

    prefixes, body, header = split_prefixes(update)

    m = re.match(r"(?is)^\s*(insert|delete)\s+data\s*\{(.*)\}\s*$", body)
    if m:
        rows = _constant_rows(m.group(2), prefixes)
        data = ray.data.from_pandas(rows)
        if m.group(1).lower() == "insert":
            return distinct_rows(triples.union(data),
                                 ["subj", "pred", "obj"],
                                 num_buckets=num_buckets, keep_cols=[])
        return distinct_rows(_minus(triples, data, num_buckets),
                             ["subj", "pred", "obj"],
                             num_buckets=num_buckets, keep_cols=[])

    m = re.match(r"(?is)^\s*delete\s+where\s*\{(.*)\}\s*$", body)
    if m:
        del_tmpl, ins_tmpl, where = m.group(1), None, m.group(1)
    else:
        m = re.match(
            r"(?is)^\s*(?:delete\s*\{(.*?)\}\s*)?(?:insert\s*\{(.*?)\}\s*)?"
            r"where\s*\{(.*)\}\s*$", body)
        if not m or (m.group(1) is None and m.group(2) is None):
            raise ValueError(
                "unsupported update form (expected INSERT/DELETE DATA, "
                "DELETE WHERE, or DELETE/INSERT ... WHERE)")
        del_tmpl, ins_tmpl, where = m.group(1), m.group(2), m.group(3)

    templates: dict[str, list[tuple[str, str, str]]] = {}
    tvars: list[str] = []
    for kind, block in (("delete", del_tmpl), ("insert", ins_tmpl)):
        if block is None:
            continue
        pats = _template_patterns(block, prefixes)
        if not pats:
            raise ValueError(f"empty {kind.upper()} template")
        templates[kind] = pats
        tvars += [t for pat in pats for t in pat if _is_var(t)]
    tvars = list(dict.fromkeys(tvars))
    if not tvars:
        raise ValueError("update templates bind no variables; "
                         "use INSERT/DELETE DATA for constant triples")

    # the WHERE select, the anti-join and the insert union each scan
    # `triples`: pin the blocks so a derived input isn't recomputed per scan
    triples = triples.materialize()
    # bindings feed both templates: one distributed SELECT, materialized so
    # delete and insert expansion don't re-run the WHERE plan
    bindings = sparql_select(
        triples, f"{header}\nSELECT {' '.join(tvars)} WHERE {{{where}}}",
        **kw).materialize()

    out = triples
    if "delete" in templates:
        out = _minus(out, _expand(bindings, templates["delete"]),
                     num_buckets)
    if "insert" in templates:
        out = out.union(_expand(bindings, templates["insert"]))
    return distinct_rows(out, ["subj", "pred", "obj"],
                         num_buckets=num_buckets, keep_cols=[])
