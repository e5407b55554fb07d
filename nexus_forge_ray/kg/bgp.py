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

import re
from typing import NamedTuple

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


# --- grouped property paths (SPARQL 9.1 full grammar subset) -----------
#
# Simple paths (a bare predicate with ^ / | / + / * / ? / ! sugar, or a
# top-level sequence of such steps) are expanded at parse time into chained
# triple patterns (`expand_path`) — no extra machinery. A GROUPED sub-path
# — a modifier applying to a parenthesized sequence like `(p1/p2)+`, or an
# alternation of sequences like `(p1/p2)|p3` — cannot be expressed as a
# pattern chain, so it is compiled here: a recursive-descent parse into an
# AST, then a bottom-up evaluation where every node yields a distributed
# (src, dst) edge Dataset. Composition is a bucketed hash join on the
# midpoint, alternation a union, closure the iterated-doubling
# `kg.closure.transitive_closure` — so a grouped path costs exactly the
# joins its structure implies and never materializes on the driver.
# Partitioning assumption (document per closure caller): `+`/`*` close the
# edge set of the INNER expression, so the inner slice must be bounded
# (class hierarchies, bounded chains) — same contract as plain `p+`.

_PATH_MARK = "\x00path\x00"


def is_complex_path(p: str) -> bool:
    """True when the predicate token needs the grouped-path compiler:
    a '/' inside a paren group (a sequence under a modifier / alternation),
    '|' and '/' both at top level (alternation of sequences), or a paren
    alternation composed into a top-level sequence like ``(<a>|<b>)/<c>``
    (the simple expander would split the '/' inside the group's IRIs)."""
    if not isinstance(p, str) or p.startswith(("?", '"')) or "/" not in p:
        return False
    depth, in_iri = 0, False
    paren_seq = paren_alt = top_alt = top_seq = False
    for ch in p:
        if in_iri:
            in_iri = ch != ">"
            continue
        if ch == "<":
            in_iri = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "/":
            if depth > 0:
                paren_seq = True
            else:
                top_seq = True
        elif ch == "|":
            if depth > 0:
                paren_alt = True
            else:
                top_alt = True
    return paren_seq or ((top_alt or paren_alt) and top_seq)


def resolve_path_atoms(expr: str, term) -> str:
    """Rewrite every prefixed-name / `a` atom in a path expression to a
    bracketed full IRI via the caller's term() resolver, leaving existing
    `<iri>` tokens and operators untouched — so the execution-time parser
    never needs the prefix map."""
    def sub(seg: str) -> str:
        return re.sub(
            r"[A-Za-z_][\w.-]*:[\w.-]+|\ba\b",
            lambda m: "<" + term(m.group(0)) + ">", seg)
    out, i = [], 0
    for m in re.finditer(r"<[^>]*>", expr):
        out.append(sub(expr[i:m.start()]))
        out.append(m.group(0))
        i = m.end()
    out.append(sub(expr[i:]))
    return "".join(out)


def parse_path(expr: str):
    """Path grammar over resolved tokens:
    path := seq ('|' seq)* ; seq := unit ('/' unit)* ;
    unit := '^'? primary ('+'|'*'|'?')* ;
    primary := '(' path ')' | '!' atomset | <iri>.
    AST nodes: (atom iri) (neg [iris]) (inv n) (seq [n]) (alt [n])
    (plus n) (star n) (opt n)."""
    toks = re.findall(r"<[^>]*>|[()/|^+*?!]", expr)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def eat():
        tok = toks[pos[0]]
        pos[0] += 1
        return tok

    def parse_alt():
        parts = [parse_seq()]
        while peek() == "|":
            eat()
            parts.append(parse_seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def parse_seq():
        parts = [parse_unit()]
        while peek() == "/":
            eat()
            parts.append(parse_unit())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def parse_unit():
        inv = peek() == "^"
        if inv:
            eat()
        node = parse_primary()
        while peek() in ("+", "*", "?"):
            node = ({"+": "plus", "*": "star", "?": "opt"}[eat()], node)
        return ("inv", node) if inv else node

    def parse_primary():
        if peek() == "(":
            eat()
            node = parse_alt()
            if eat() != ")":
                raise ValueError(f"unbalanced parens in path: {expr!r}")
            return node
        if peek() == "!":
            eat()
            atoms = []
            if peek() == "(":
                eat()
                atoms.append(eat()[1:-1])
                while peek() == "|":
                    eat()
                    atoms.append(eat()[1:-1])
                if eat() != ")":
                    raise ValueError(f"unbalanced !() in path: {expr!r}")
            else:
                atoms.append(eat()[1:-1])
            return ("neg", atoms)
        tok = eat()
        if not tok.startswith("<"):
            raise ValueError(f"unexpected token {tok!r} in path {expr!r}")
        return ("atom", tok[1:-1])

    node = parse_alt()
    if pos[0] != len(toks):
        raise ValueError(f"trailing tokens in path: {expr!r}")
    return node


def compile_path_edges(triples: ray.data.Dataset, expr: str, *,
                       num_buckets: int = 16) -> ray.data.Dataset:
    """Evaluate a grouped path expression to its (src, dst) edge Dataset."""
    from nexus_forge_ray.kg.closure import transitive_closure
    from nexus_forge_ray.ops.agg import distinct_rows
    from nexus_forge_ray.ops.joins import partitioned_join

    def identity_edges() -> ray.data.Dataset:
        nodes = distinct_rows(triples.map_batches(
            lambda df: pd.DataFrame({"n": pd.concat(
                [df["subj"], df["obj"]], ignore_index=True)}),
            batch_format="pandas"), ["n"],
            num_buckets=num_buckets, keep_cols=[])
        return nodes.map_batches(
            lambda df: pd.DataFrame({"src": df["n"], "dst": df["n"]}),
            batch_format="pandas")

    def ev(node) -> ray.data.Dataset:
        kind = node[0]
        if kind == "atom":
            return triples.map_batches(
                lambda df, p=node[1]: df.loc[
                    df["pred"] == p, ["subj", "obj"]].rename(
                    columns={"subj": "src", "obj": "dst"}),
                batch_format="pandas")
        if kind == "neg":
            return triples.map_batches(
                lambda df, ps=frozenset(node[1]): df.loc[
                    ~df["pred"].isin(ps), ["subj", "obj"]].rename(
                    columns={"subj": "src", "obj": "dst"}),
                batch_format="pandas")
        if kind == "inv":
            return ev(node[1]).map_batches(
                lambda df: pd.DataFrame(
                    {"src": df["dst"], "dst": df["src"]}),
                batch_format="pandas")
        if kind == "seq":
            cur = ev(node[1][0])
            for part in node[1][1:]:
                lhs = cur.map_batches(
                    lambda df: df.rename(
                        columns={"src": "__a", "dst": "__m"}),
                    batch_format="pandas")
                rhs = ev(part).map_batches(
                    lambda df: df.rename(
                        columns={"src": "__m", "dst": "__b"}),
                    batch_format="pandas")
                cur = partitioned_join(
                    lhs, rhs, on="__m", num_buckets=num_buckets,
                    lcols=["__a", "__m"], rcols=["__m", "__b"]
                ).map_batches(
                    lambda df: df.rename(
                        columns={"__a": "src", "__b": "dst"})
                    [["src", "dst"]],
                    batch_format="pandas")
            return cur
        if kind == "alt":
            cur = ev(node[1][0])
            for part in node[1][1:]:
                cur = cur.union(ev(part))
            return cur
        if kind == "plus":
            return transitive_closure(ev(node[1]),
                                      num_buckets=num_buckets)
        if kind == "star":
            closed = transitive_closure(ev(node[1]),
                                        num_buckets=num_buckets)
            return distinct_rows(closed.union(identity_edges()),
                                 ["src", "dst"],
                                 num_buckets=num_buckets, keep_cols=[])
        if kind == "opt":
            return distinct_rows(ev(node[1]).union(identity_edges()),
                                 ["src", "dst"],
                                 num_buckets=num_buckets, keep_cols=[])
        raise AssertionError(f"unknown path node {kind!r}")

    return ev(parse_path(expr))


def plan_patterns(patterns: list[tuple[str, str, str]]) \
        -> list[tuple[str, str, str]]:
    """Greedy join-order planner: start from the most selective pattern
    (most constant positions; constant subject > object > predicate as the
    tie-break — predicates are low-cardinality in real graphs), then
    repeatedly take the most selective pattern sharing a variable with the
    bound set. Patterns a user wrote in arbitrary order execute as if
    ordered best-first; genuinely disconnected groups (cross joins) keep
    their relative order and still fail downstream with the explicit
    cross-join error."""
    def score(pat) -> tuple:
        consts = sum(0 if _is_var(t) else 1 for t in pat)
        pos = (0 if _is_var(pat[0]) else 4) \
            + (0 if _is_var(pat[2]) else 2) \
            + (0 if _is_var(pat[1]) else 1)
        return (consts, pos)

    remaining = list(patterns)
    if not remaining:
        return remaining
    ordered = [max(remaining, key=score)]
    remaining.remove(ordered[0])
    bound = {t[1:] for t in ordered[0] if _is_var(t)}
    while remaining:
        linked = [p for p in remaining
                  if any(_is_var(t) and t[1:] in bound for t in p)]
        nxt = max(linked, key=score) if linked else remaining[0]
        ordered.append(nxt)
        remaining.remove(nxt)
        bound |= {t[1:] for t in nxt if _is_var(t)}
    return ordered


def bgp_select(triples: ray.data.Dataset,
               patterns: list[tuple[str, str, str]],
               select: list[str], *,
               num_buckets: int = 16,
               plan: bool = True) -> ray.data.Dataset:
    """SELECT ?vars WHERE { patterns } — conjunctive triple-pattern query.

    Patterns are greedily reordered most-selective-first (`plan_patterns`;
    pass plan=False to keep the caller's order) and join left-to-right on
    their shared variables. Duplicate rows are kept (SPARQL SELECT
    semantics without DISTINCT); wrap with `ops.agg.distinct_rows` for
    SELECT DISTINCT. Patterns with no variable shared with the accumulated
    bindings would be a cross join and are rejected.
    """
    from nexus_forge_ray.ops.joins import partitioned_join

    if plan:
        patterns = plan_patterns(patterns)
    triples = triples.materialize()  # scanned once per pattern
    sel = [v.lstrip("?") for v in select]
    bound: list[str] = []
    cur: ray.data.Dataset | None = None
    for pat in patterns:
        pat_vars = [t[1:] for t in pat if _is_var(t)]
        pred = pat[1]
        if (not _is_var(pred)) and pred.startswith(_PATH_MARK):
            # grouped property path: compile to a (src, dst) edge Dataset
            # and bind like a plain pattern whose predicate is the marker
            edges = compile_path_edges(triples,
                                       pred[len(_PATH_MARK):],
                                       num_buckets=num_buckets)
            nxt = match_pattern(
                edges.map_batches(
                    lambda df, p=pred: pd.DataFrame(
                        {"subj": df["src"], "pred": p,
                         "obj": df["dst"]}),
                    batch_format="pandas"),
                pat)
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
            continue
        neg = (not _is_var(pred)) and pred.startswith("!")
        if neg:
            pred = pred[1:]
        mod = pred[-1] if (not _is_var(pred) and pred
                           and pred[-1] in "+*?") else ""
        base = pred[:-1] if mod else pred
        alts = base.split("|") if (not _is_var(base) and "|" in base) \
            else [base]
        if neg:
            # negated property set !p / !(p1|p2): any predicate OUTSIDE the
            # set — one vectorized ~isin scan (SPARQL 9.1 NPS, forward
            # direction only)
            nxt = match_pattern(
                triples.map_batches(
                    lambda df, ps=frozenset(alts), p="!" + base:
                    df.loc[~df["pred"].isin(ps),
                           ["subj", "obj"]].assign(pred=p)[
                        ["subj", "pred", "obj"]],
                    batch_format="pandas"),
                (pat[0], "!" + base, pat[2]))
        elif mod == "?":
            # zero-or-one path: the direct edges UNION the zero-length
            # identity over every RDF term (no closure needed)
            from nexus_forge_ray.ops.agg import distinct_rows
            direct = triples.map_batches(
                lambda df, ps=frozenset(alts): df.loc[
                    df["pred"].isin(ps), ["subj", "obj"]].rename(
                    columns={"subj": "src", "obj": "dst"}),
                batch_format="pandas")
            nodes = distinct_rows(triples.map_batches(
                lambda df: pd.DataFrame({"n": pd.concat(
                    [df["subj"], df["obj"]], ignore_index=True)}),
                batch_format="pandas"), ["n"],
                num_buckets=num_buckets, keep_cols=[])
            zero = nodes.map_batches(
                lambda df: pd.DataFrame({"src": df["n"], "dst": df["n"]}),
                batch_format="pandas")
            closed = distinct_rows(direct.union(zero), ["src", "dst"],
                                   num_buckets=num_buckets, keep_cols=[])
            nxt = match_pattern(
                closed.map_batches(
                    lambda df, p=base: pd.DataFrame(
                        {"subj": df["src"], "pred": p, "obj": df["dst"]}),
                    batch_format="pandas"),
                (pat[0], base, pat[2]))
        elif mod:
            # one-or-more / zero-or-more path: close the predicate slice
            # (iterated doubling, kg.closure); `*` additionally unions the
            # zero-length identity over every RDF term in the graph (W3C
            # path semantics), then binds like a plain pattern
            from nexus_forge_ray.kg.closure import transitive_closure
            from nexus_forge_ray.ops.agg import distinct_rows
            slice_ = triples.map_batches(
                lambda df, ps=frozenset(alts): df.loc[
                    df["pred"].isin(ps), ["subj", "obj"]].rename(
                    columns={"subj": "src", "obj": "dst"}),
                batch_format="pandas")
            closed = transitive_closure(slice_, num_buckets=num_buckets)
            if mod == "*":
                nodes = distinct_rows(triples.map_batches(
                    lambda df: pd.DataFrame({"n": pd.concat(
                        [df["subj"], df["obj"]], ignore_index=True)}),
                    batch_format="pandas"), ["n"],
                    num_buckets=num_buckets, keep_cols=[])
                zero = nodes.map_batches(
                    lambda df: pd.DataFrame(
                        {"src": df["n"], "dst": df["n"]}),
                    batch_format="pandas")
                closed = distinct_rows(closed.union(zero), ["src", "dst"],
                                       num_buckets=num_buckets,
                                       keep_cols=[])
            nxt = match_pattern(
                closed.map_batches(
                    lambda df, p=base: pd.DataFrame(
                        {"subj": df["src"], "pred": p, "obj": df["dst"]}),
                    batch_format="pandas"),
                (pat[0], base, pat[2]))
        elif len(alts) > 1:
            # alternative path p1|p2|...: one vectorized isin over the
            # predicate column (a branch-union without the extra scans)
            nxt = match_pattern(
                triples.map_batches(
                    lambda df, ps=frozenset(alts), p=base:
                    df.loc[df["pred"].isin(ps),
                           ["subj", "obj"]].assign(pred=p)[
                        ["subj", "pred", "obj"]],
                    batch_format="pandas"),
                (pat[0], base, pat[2]))
        else:
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
    # reindex, not df[sel]: empty blocks can arrive column-less
    return cur.map_batches(lambda df: df.reindex(columns=sel),
                           batch_format="pandas")


class ParsedQuery(NamedTuple):
    select: list[str]
    patterns: list[tuple[str, str, str]]
    limit: int | None
    distinct: bool = False
    # cmp filters: (var, op, value, value_is_var); op in _CMP_OPS
    filters: list[tuple[str, str, object, bool]] = []
    regex_filters: list[tuple[str, str]] = []       # (var, pattern)
    order_by: list[tuple[str, bool]] = []           # (var, descending)
    optionals: list[list[tuple[str, str, str]]] = []  # OPTIONAL {...} groups
    # { g1 } UNION { g2 } ... branches; mutually exclusive with `patterns`
    union_groups: list[list[tuple[str, str, str]]] = []
    group_by: list[str] = []                        # GROUP BY ?vars
    # (func, source_var|"*", alias); func in count/sum/min/max/avg
    aggregates: list[tuple[str, str, str]] = []
    values_clauses: list[tuple[str, list[object]]] = []  # VALUES ?v {...}
    offset: int | None = None                       # OFFSET n (needs ORDER BY)
    # FILTER NOT EXISTS {...} / MINUS {...} groups. Subset semantics: both
    # compile to an anti-join on the variables shared with the required
    # patterns (equivalent to full SPARQL whenever the group binds at least
    # one shared variable, which this subset requires).
    not_exists: list[list[tuple[str, str, str]]] = []
    # FILTER EXISTS {...} groups — bucketed semi-join on the shared vars
    exists: list[list[tuple[str, str, str]]] = []
    # BIND(expr AS ?v): (fn, args, alias); fn in concat/strlen/ucase/
    # lcase/str/substr/strbefore/strafter/replace/abs/round/ceil/floor/
    # coalesce/if/arith (arith args = [t1, op, t2]; args are raw tokens)
    binds: list[tuple[str, list, str]] = []
    # HAVING(?aggAlias OP number) — post-aggregation group filter
    having: list[tuple[str, str, float]] = []
    # per-UNION-branch (filters, regex_filters, values_clauses, binds),
    # parallel to union_groups — clauses written INSIDE a branch apply to
    # that branch's solutions only (SPARQL group scoping)
    union_clauses: list[tuple] = []
    # nested `{ SELECT ... }` group texts (PREFIX decls re-attached) —
    # each executes recursively and inner-joins the outer solutions on the
    # variables shared with its projection
    subqueries: list[str] = []
    # per-OPTIONAL-group (filters, regex_filters), parallel to `optionals`:
    # a FILTER written inside OPTIONAL {...} constrains the optional-side
    # solutions BEFORE the left join, so a failing match leaves the
    # optional vars unbound instead of dropping the base row (SPARQL 8.3
    # semantics for filters local to the optional group; restricted to
    # filters over the group's own variables)
    optional_filters: list[tuple] = []


_CMP_OPS = {"=": "eq", "!=": "ne", "<": "lt", "<=": "le",
            ">": "gt", ">=": "ge"}


def _split_top(expr: str, sep: str) -> list[str]:
    """Split `expr` on a top-level logical connective (`&&` / `||`) —
    occurrences inside parentheses or double-quoted strings don't split."""
    parts, depth, inq, last, i = [], 0, False, 0, 0
    while i < len(expr):
        ch = expr[i]
        if ch == '"':
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and expr.startswith(sep, i):
                parts.append(expr[last:i])
                i += len(sep)
                last = i
                continue
        i += 1
    parts.append(expr[last:])
    return [p.strip() for p in parts]


def _strip_outer_parens(expr: str) -> str:
    """Remove parens that wrap the ENTIRE expression (repeatedly)."""
    while expr.startswith("(") and expr.endswith(")"):
        depth = 0
        for i, ch in enumerate(expr):
            depth += {"(": 1, ")": -1}.get(ch, 0)
            if depth == 0 and i < len(expr) - 1:
                return expr  # the opening paren closes early — not a wrap
        expr = expr[1:-1].strip()
    return expr


def _parse_filter_atom(expr: str, term) -> tuple[str, str, object, bool]:
    """One atomic FILTER expression -> a uniform (var, op, val, is_var)
    tuple (regex atoms use op 'regexm')."""
    rm = re.match(r'(?is)^regex\(\s*\?(\w+)\s*,\s*"([^"]*)"\s*\)$', expr)
    cm = re.match(r'(?s)^\?(\w+)\s*(!=|<=|>=|=|<|>)\s*'
                  r'(\?\w+|<[^>]*>|"[^"]*"|\S+)$', expr)
    bm = re.match(r"(?is)^(!\s*)?bound\(\s*\?(\w+)\s*\)$", expr)
    im = re.match(r"(?is)^\?(\w+)\s+(not\s+)?in\s*\((.*)\)$", expr)
    sm = re.match(r'(?is)^(!\s*)?(strstarts|strends|contains)'
                  r'\(\s*\?(\w+)\s*,\s*"([^"]*)"\s*\)$', expr)
    if im:
        toks = re.findall(r'<[^>]*>|"[^"]*"|[^,\s]+', im.group(3))
        vals = []
        for tk in toks:
            v: object = term(tk)
            try:
                v = float(tk)
            except ValueError:
                pass
            vals.append(v)
        # IN compares both raw and numeric forms downstream
        return (im.group(1), "notisin" if im.group(2) else "isin",
                vals, False)
    if sm:
        fn = sm.group(2).lower()
        return (sm.group(3), ("not" + fn) if sm.group(1) else fn,
                sm.group(4), False)
    if bm:
        # (not-)bound over an OPTIONAL variable: null-ness mask
        return (bm.group(2), "notbound" if bm.group(1) else "bound",
                None, False)
    if rm:
        return (rm.group(1), "regexm", rm.group(2), False)
    if cm:
        var, op, rhs = cm.group(1), cm.group(2), cm.group(3)
        is_var = rhs.startswith("?")
        val: object = rhs[1:] if is_var else term(rhs)
        if not is_var:
            try:
                val = float(rhs)
            except ValueError:
                pass
        return (var, _CMP_OPS[op], val, is_var)
    raise ValueError(f"unsupported FILTER expression: {expr!r}")


def _parse_filter_expr(expr: str, term) \
        -> list[tuple[str, str, object, bool]]:
    """FILTER expression with optional top-level `&&` / `||` connectives.

    SPARQL precedence: `||` binds loosest, so the top-level split is on
    `||` first (`A && B || C` = `(A && B) || C`). A pure conjunction
    flattens to independent AND-ed atoms (conjunction is the filter
    list's native semantics); a disjunction becomes ONE
    (None, '__or__', branches, False) entry whose branches are atom
    lists, vectorized downstream as an OR of per-branch AND masks.
    Parenthesized sub-groups recurse one level each way — the nesting
    real queries use; an unrecognized atom raises."""
    def or_group(alts: list[str]) -> tuple:
        branches = [[_parse_filter_atom(x, term)
                     for x in _split_top(_strip_outer_parens(a), "&&")]
                    for a in alts]
        return (None, "__or__", branches, False)

    alts = _split_top(expr, "||")
    if len(alts) > 1:
        return [or_group(alts)]
    out: list[tuple[str, str, object, bool]] = []
    for conj in _split_top(expr, "&&"):
        c = _strip_outer_parens(conj)
        calts = _split_top(c, "||")
        if len(calts) == 1:
            out.append(_parse_filter_atom(c, term))
        else:
            out.append(or_group(calts))
    return out


def parse_sparql(query: str) -> ParsedQuery:
    """Parse the SELECT-BGP subset of SPARQL the reference's stores accept
    for simple graph queries: PREFIX declarations, SELECT [DISTINCT] with
    explicit variables, a WHERE block of dot-separated triple patterns
    ('a' sugar for rdf:type) and FILTER clauses (`FILTER(?v OP term)` with
    OP in =/!=/</<=/>/>=, `FILTER regex(?v, "pat")`, and compound
    expressions with `&&` / `||` at SPARQL precedence — `||` loosest,
    parenthesized sub-groups one level each way), then optional ORDER BY
    (?v / ASC(?v) / DESC(?v)) and LIMIT.

    OPTIONAL { patterns [FILTER...] } groups are supported (left-join
    semantics, one level; a group-local FILTER over the group's own
    variables constrains the optional side before the join), as is a
    WHERE body that is a
    chain of { group } UNION { group } (branches execute independently
    and union; every branch must bind the selected variables).
    FILTER EXISTS / FILTER NOT EXISTS / MINUS groups compile to bucketed
    semi-/anti-joins on the variables shared with the required patterns.
    BIND(expr AS ?v) supports CONCAT/STRLEN/UCASE/LCASE/STR/SUBSTR/
    STRBEFORE/STRAFTER/REPLACE/ABS/ROUND/CEIL/FLOOR/COALESCE/IF and binary
    arithmetic (vectorized per batch; bound vars usable in FILTER).
    GROUP BY ?vars with aggregate projections `(FUNC(?v) AS ?alias)`
    (COUNT/SUM/MIN/MAX/AVG/SAMPLE, COUNT(*), GROUP_CONCAT with optional
    `; SEPARATOR="..."` — values sorted within the group for determinism)
    and inline `VALUES ?v { t1 t2 ... }` bindings (the var must also be
    pattern-bound) complete the analytics surface. LIMIT takes an optional
    OFFSET (requires ORDER BY; the page is bounded by LIMIT). Term
    forms: ?var, <iri>, prefix:local (expanded), "literal", numbers,
    bare token (kept verbatim). Numeric FILTER literals compare
    numerically; everything else compares as strings.
    """
    import re

    query = normalize_quotes(query)
    prefixes = dict(re.findall(
        r"(?i)\bprefix\s+(\w*):\s*<([^>]*)>", query))
    # pull nested `{ SELECT ... }` groups (subqueries) BEFORE the outer
    # shape match — their internal braces would defeat the body regex.
    # An occurrence whose `{` directly follows WHERE is the outer body
    # itself, not a subquery.
    subqueries: list[str] = []
    prefix_text = "".join(f"PREFIX {p}: <{iri}> "
                          for p, iri in prefixes.items())

    def _cut_subqueries(text: str) -> str:
        out, i = [], 0
        while True:
            mm = re.search(r"\{\s*(?i:select)\b", text[i:])
            if not mm:
                out.append(text[i:])
                break
            start = i + mm.start()
            if re.search(r"(?is)\bwhere\s*$", text[:start]):
                # outer WHERE body that IS a select — unsupported shape,
                # leave for the main regex to reject coherently
                out.append(text[i:start + 1])
                i = start + 1
                continue
            depth, j = 0, start
            while j < len(text):
                if text[j] == "{":
                    depth += 1
                elif text[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise ValueError("unbalanced braces around subquery")
            # leave a numbered placeholder so a subquery written INSIDE a
            # UNION branch can be re-attached to that branch after the
            # union split (branch scoping); the non-union path and the
            # global text strip the placeholders back out
            subqueries.append(prefix_text + text[start + 1:j].strip())
            out.append(text[i:start]
                       + f" \x00subq{len(subqueries) - 1}\x00 ")
            i = j + 1
        return "".join(out)

    query = _cut_subqueries(query)

    def _take_subqs(text: str) -> tuple[str, list[str]]:
        """Strip subquery placeholders from a text span, returning the
        clean text plus the subquery strings that were embedded in it."""
        idxs = [int(k) for k in re.findall("\x00subq(\\d+)\x00", text)]
        return (re.sub("\x00subq\\d+\x00", " ", text),
                [subqueries[k] for k in idxs])
    m = re.search(r"(?is)select\s+(distinct\s+)?(.*?)\s+where\s*\{(.*)\}"
                  r"\s*(?:group\s+by\s+((?:\s*\?\w+)+))?"
                  r"\s*(?:having\s*\(([^()]*)\))?"
                  r"\s*(?:order\s+by\s+((?:\s*(?:asc|desc)\(\s*\?\w+\s*\)"
                  r"|\s*\?\w+)+))?\s*(?:limit\s+(\d+))?"
                  r"\s*(?:offset\s+(\d+))?\s*$", query)
    if not m:
        raise ValueError("unsupported SPARQL (need SELECT [DISTINCT] ?vars "
                         "WHERE { patterns [FILTER...] } [GROUP BY ...] "
                         "[ORDER BY ...] [LIMIT n])")
    distinct = bool(m.group(1))
    # aggregate projections: (FUNC(?v | *) AS ?alias); GROUP_CONCAT takes
    # an optional `; SEPARATOR="..."` (default " ") and encodes it into the
    # func slot ("group_concat\x00<sep>") to keep the tuple shape
    agg_re = re.compile(
        r"(?is)\(\s*(count|sum|min|max|avg|sample|group_concat)\s*\("
        r"\s*(distinct\s+)?(\*|\?\w+)"
        r'\s*(?:;\s*separator\s*=\s*"([^"]*)")?\s*\)'
        r"\s+as\s+\?(\w+)\s*\)")
    aggregates = []
    for mm in agg_re.finditer(m.group(2)):
        f, dis, v, sep, a = (mm.group(1).lower(), mm.group(2),
                             mm.group(3), mm.group(4), mm.group(5))
        if dis:
            if f != "count" or v == "*":
                raise ValueError("DISTINCT supported for COUNT(?v) only")
            f = "count_distinct"
        if f == "group_concat":
            # findall would blur absent vs empty separator; finditer keeps
            # the distinction (None = absent -> the SPARQL default " ")
            f = "group_concat\x00" + (sep if sep is not None else " ")
        aggregates.append((f, v if v == "*" else v[1:], a))
    plain = re.findall(r"\?\w+", agg_re.sub(" ", m.group(2)))
    select = plain + ["?" + a for _, _, a in aggregates]
    if not select:
        raise ValueError("SELECT * not supported — name the variables")
    group_by = re.findall(r"\?(\w+)", m.group(4) or "")
    if aggregates:
        if sorted(v[1:] for v in plain) != sorted(group_by):
            raise ValueError("non-aggregated SELECT variables must exactly "
                             "match the GROUP BY variables")
        bad = [f for f, v, _ in aggregates
               if v == "*" and f != "count"]
        if bad:
            raise ValueError(f"only COUNT accepts *: {bad}")
    elif group_by:
        raise ValueError("GROUP BY requires at least one aggregate "
                         "in the SELECT clause")
    limit = int(m.group(7)) if m.group(7) else None
    offset = int(m.group(8)) if m.group(8) else None
    having: list[tuple[str, str, float]] = []
    if m.group(5):
        hm = re.match(r"(?s)^\s*\?(\w+)\s*(!=|<=|>=|=|<|>)\s*"
                      r"(-?[\d.]+)\s*$", m.group(5))
        if not hm:
            raise ValueError("HAVING must be (?aggAlias OP number)")
        having.append((hm.group(1), _CMP_OPS[hm.group(2)],
                       float(hm.group(3))))
    order_by = [(g1 or g2, (d or "").lower() == "desc")
                for d, g1, g2 in re.findall(
                    r"(?i)(?:(asc|desc)\(\s*\?(\w+)\s*\)|\?(\w+))",
                    m.group(6) or "")]
    body = m.group(3)

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

    def extract_clauses(text: str):
        """Pull VALUES / BIND / FILTER clauses out of a pattern text
        (shared by the global WHERE body and each UNION branch, so clauses
        written inside a branch stay branch-scoped — SPARQL group scoping).
        Returns (clean_text, filters, regex_filters, values_clauses,
        binds_raw)."""
        values_clauses: list[tuple[str, list[object]]] = []

        def _values(mm) -> str:
            toks = re.findall(r'<[^>]*>|"[^"]*"|\S+', mm.group(2))
            values_clauses.append((mm.group(1), [term(t) for t in toks]))
            return " "

        text = re.sub(r"(?is)\bvalues\s+\?(\w+)\s*\{([^{}]*)\}",
                      _values, text)

        # BIND(expr AS ?v) — non-greedy expr, terminated by the trailing
        # `AS ?v )` (the subset's exprs never contain the token ' AS ')
        binds_raw: list[tuple[str, str]] = []
        text = re.sub(r"(?is)\bbind\s*\((.*?)\s+as\s+\?(\w+)\s*\)",
                      lambda mm: (binds_raw.append(
                          (mm.group(1).strip(), mm.group(2))), " ")[1],
                      text)

        # then pull FILTER clauses (their parens may nest)
        filters: list[tuple[str, str, object, bool]] = []
        regex_filters: list[tuple[str, str]] = []
        out_body = []
        i, n = 0, len(text)
        while i < n:
            fm = re.compile(r"(?i)\bfilter\b\s*").search(text, i)
            if not fm:
                out_body.append(text[i:])
                break
            out_body.append(text[i:fm.start()])
            fun = re.match(r"(?is)(regex\s*)?\(", text[fm.end():])
            if not fun:
                raise ValueError("FILTER must be FILTER(expr) or "
                                 "FILTER regex(?v, \"pat\")")
            depth, j = 1, fm.end() + fun.end()
            inner_start = j
            while j < n and depth:
                depth += {"(": 1, ")": -1}.get(text[j], 0)
                j += 1
            if depth:
                raise ValueError("unbalanced parens in FILTER")
            inner = text[inner_start:j - 1].strip()
            expr = f"regex({inner})" if fun.group(1) else inner
            for atom in _parse_filter_expr(expr, term):
                if atom[1] == "regexm" and atom[0] is not None:
                    # bare regex atom: keep the dedicated regex list
                    regex_filters.append((atom[0], atom[2]))
                else:
                    filters.append(atom)
            i = j
            # swallow an optional pattern separator after the FILTER
            while i < n and text[i] in " \t\r\n.":
                i += 1
        return ("".join(out_body), filters, regex_filters, values_clauses,
                binds_raw)

    fresh = [0]

    def norm_pred(p: str) -> str:
        """Normalize a (non-sequence) path step in the predicate position:
        strip a trailing `+`/`*` modifier and surrounding parens, expand
        each `|`-alternative through term(), re-join with `|` and re-append
        the modifier. `<iri>+`, `(p1|p2)*`, `p1|p2` all normalize here."""
        if p.startswith(("?", '"')):
            return term(p)
        neg = ""
        if p.startswith("!"):
            neg, p = "!", p[1:]
        mod = ""
        if p and p[-1] in "+*?":
            p, mod = p[:-1], p[-1]
        if p.startswith("(") and p.endswith(")"):
            p = p[1:-1]
        if neg and mod:
            raise ValueError("a negated property set cannot carry a "
                             f"+/*/? modifier: !{p}{mod}")
        return neg + "|".join(term(x) for x in p.split("|")) + mod

    def expand_path(cur: list[str]) -> list[tuple[str, str, str]]:
        """Expand property-path sugar in the predicate position: `^p`
        (inverse) and `p1/p2/...` sequences — each sequence step becomes a
        pattern chained through a fresh variable. Steps may carry `+`/`*`
        modifiers and `|` alternations (handled downstream in bgp_select);
        bracketed-IRI sequence chains (`<a>/<b>`) are supported because the
        tokenizer keeps IRIs opaque."""
        s, p, o = cur
        if is_complex_path(p):
            # grouped sub-path ((p1/p2)+, (p1/p2)|p3, ...): keep it as ONE
            # pattern whose predicate carries the resolved expression for
            # the execution-time compiler
            return [(term(s), _PATH_MARK + resolve_path_atoms(p, term),
                     term(o))]
        if p.startswith(("<", "?", '"')):
            steps = [p] if not re.search(r">\s*/", p) else \
                re.split(r"/(?=[<^])", p)
        else:
            steps = [p] if "/" not in p else p.split("/")
        out, subj = [], s
        for i, step in enumerate(steps):
            if i == len(steps) - 1:
                obj = o
            else:
                obj = f"?__p{fresh[0]}"
                fresh[0] += 1
            inv = step.startswith("^")
            pred = step[1:] if inv else step
            trip = (obj, pred, subj) if inv else (subj, pred, obj)
            out.append((term(trip[0]), norm_pred(trip[1]), term(trip[2])))
            subj = obj
        return out

    def patterns_of(text: str) -> list[tuple[str, str, str]]:
        if "\x00subq" in text:
            # a subquery placeholder survived into a keyword group (EXISTS
            # / NOT EXISTS / MINUS body) — not a supported position
            raise ValueError("a subquery inside EXISTS/NOT EXISTS/MINUS "
                             "is unsupported (join it beside the group "
                             "on the shared variables)")
        # tokenize: '.' separates patterns ONLY outside <> / "" / () (IRIs
        # and literals may contain dots); a token is a maximal run of
        # bracketed IRIs, quoted literals, paren groups and plain chars, so
        # path forms like `<iri>+` and `(p1|p2)*` stay single tokens
        toks = re.findall(
            r'(?:<[^>]*>|"[^"]*"|\([^()]*\)|[^\s.])+|\.', text)
        pats, cur = [], []
        for tok in toks + ["."]:
            if tok == ".":
                if cur:
                    if len(cur) != 3:
                        raise ValueError(f"pattern needs 3 terms: {cur!r}")
                    pats.extend(expand_path(cur))
                    cur = []
            else:
                cur.append(tok)
        return pats

    # a WHERE body that is a chain of { group } UNION { group } becomes
    # branch pattern-lists executed independently and unioned; the
    # structural split runs BEFORE clause extraction so FILTER/VALUES/BIND
    # written inside a branch stay branch-scoped (SPARQL group scoping)
    # instead of silently hoisting to global scope
    def _parse_optional_group(g: str) -> tuple[list, tuple]:
        """An OPTIONAL {...} body -> (patterns, (filters, regex_filters,
        values_clauses, binds)). Group-local clauses evaluate on the
        optional side BEFORE the left join (SPARQL 8.3: a failing match
        unbinds, it never drops the base row); BIND inputs and FILTER /
        VALUES vars are restricted to the group's own vars (+ the group's
        own BIND aliases for the filters)."""
        if "\x00subq" in g:
            raise ValueError("a subquery inside OPTIONAL is unsupported "
                             "(write it beside the OPTIONAL and join on "
                             "the shared variables)")
        # the widened extraction admits one brace level (VALUES payloads);
        # a NESTED keyword group that rode along is unsupported — say so
        # instead of letting the tokenizer produce a confusing error
        g_probe = re.sub(r'<[^>]*>|"[^"]*"', " ", g)
        if re.search(r"(?is)\b(optional|minus|exists|union|graph)\b",
                     g_probe):
            raise ValueError("a nested OPTIONAL/MINUS/EXISTS/UNION/GRAPH "
                             "group inside OPTIONAL is unsupported")
        gclean, gf, grf, gvc, gb_raw = extract_clauses(g)
        gp = patterns_of(gclean)
        if not gp:
            raise ValueError("empty OPTIONAL block")
        gvars = {t[1:] for pat in gp for t in pat if _is_var(t)}
        gbinds = _parse_binds(gb_raw)
        # validate binds IN ORDER: each may read pattern vars plus earlier
        # aliases (_apply_binds evaluates sequentially); SPARQL forbids
        # re-binding an in-scope var, so an alias colliding with a pattern
        # var or earlier alias fails loudly
        seen = set(gvars)
        for _, args, alias in gbinds:
            ins = {a[1:] for a in args
                   if isinstance(a, str) and a.startswith("?")}
            if not ins <= seen:
                raise ValueError(
                    "BIND inside OPTIONAL may only read the group's own "
                    f"variables or earlier aliases (unknown: "
                    f"{sorted(ins - seen)})")
            if alias in seen:
                raise ValueError(
                    f"BIND inside OPTIONAL re-binds in-scope variable "
                    f"?{alias} (SPARQL forbids re-binding)")
            seen.add(alias)
        gvars = gvars | {a for _, _, a in gbinds}
        used = set(
            [f[0] for f in gf if f[0] is not None]
            + [f[2] for f in gf if f[3]]
            + [a[0] for f in gf if f[1] == "__or__"
               for br in f[2] for a in br]
            + [a[2] for f in gf if f[1] == "__or__"
               for br in f[2] for a in br if a[3]]
            + [r[0] for r in grf]
            + [v for v, _ in gvc])
        if not used <= gvars:
            raise ValueError("FILTER/VALUES inside OPTIONAL may only use "
                             f"the group's own variables (got {used})")
        return gp, (gf, grf, gvc, gbinds)

    def _inline_bare_groups(text: str) -> str:
        """Inline pattern-only nested `{ ... }` groups (SPARQL: a bare
        group joins with its siblings, so for groups holding only triple
        patterns inlining is exact). Groups still carrying clause
        keywords at this point — every supported keyword group was
        already extracted — are genuinely unsupported shapes and fail
        loudly."""
        while True:
            m = re.search(r"\{([^{}]*)\}", text)
            if not m:
                return text
            inner = m.group(1)
            # keyword probe must not fire on IRI path segments or literal
            # text (e.g. <http://x/graph/g1>): blank those spans first
            probe = re.sub(r'<[^>]*>|"[^"]*"', " ", inner)
            if re.search(r"(?is)\b(filter|values|bind|optional|minus|"
                         r"exists|select|union|graph)\b", probe):
                raise ValueError(
                    "nested group with clause keywords is unsupported "
                    f"here (only pattern-only groups inline): "
                    f"{{{inner.strip()}}}")
            # ' . ' on BOTH sides: SPARQL lets a triple pattern directly
            # precede a group with no dot, so the group body must not
            # merge into the preceding pattern (a leading separator at
            # text start is harmless — patterns_of skips empty patterns)
            body_txt = inner.strip(" \t\r\n.")
            text = (text[:m.start()]
                    + (" . " + body_txt + " . " if body_txt else " ")
                    + text[m.end():])

    union_groups: list[list[tuple[str, str, str]]] = []
    union_clauses: list[tuple] = []
    global_subqs = subqueries
    union_split = _split_union(body)
    if union_split is not None:
        branch_texts, global_text = union_split
        # global-scope groups beside the UNION chain (SPARQL algebra: the
        # union is one group graph pattern — OPTIONAL / EXISTS / NOT
        # EXISTS / MINUS written alongside it join/filter the unioned
        # solutions, exactly like they would a plain BGP)
        g_not_exists_raw: list[str] = []
        global_text = re.sub(
            r"(?is)\bfilter\s+not\s+exists\s*\{([^{}]*)\}",
            lambda mm: (g_not_exists_raw.append(mm.group(1)), " ")[1],
            global_text)
        global_text = re.sub(
            r"(?is)\bminus\s*\{([^{}]*)\}",
            lambda mm: (g_not_exists_raw.append(mm.group(1)), " ")[1],
            global_text)
        g_exists_raw: list[str] = []
        global_text = re.sub(
            r"(?is)\bfilter\s+exists\s*\{([^{}]*)\}",
            lambda mm: (g_exists_raw.append(mm.group(1)), " ")[1],
            global_text)
        g_opts_raw: list[str] = []
        global_text = re.sub(
            r"(?is)\boptional\b\s*\{((?:[^{}]|\{[^{}]*\})*)\}",
            lambda mm: (g_opts_raw.append(mm.group(1)), " ")[1],
            global_text)
        global_text, global_subqs = _take_subqs(global_text)
        gbody, filters, regex_filters, values_clauses, binds_raw = \
            extract_clauses(global_text)
        # pattern-only bare groups inline; any patterns they leave at
        # global scope trip the leftover check below (the executor joins
        # only branch patterns — a global BGP beside a UNION chain is
        # unsupported and must fail loudly, not drop)
        gbody = _inline_bare_groups(gbody)
        leftover = re.sub(r"(?i)\bunion\b", " ", gbody).strip(" \t\r\n.")
        if leftover:
            raise ValueError(f"unparsed text around UNION branches: "
                             f"{leftover!r}")
        for bt in branch_texts:
            # branch-scoped OPTIONAL / NOT EXISTS / MINUS / EXISTS groups
            # pull out FIRST (SPARQL group scoping: the joins happen inside
            # the branch, before the union) — same extraction as the
            # non-union path. Subqueries are taken only AFTER this, so a
            # subquery nested inside one of those groups keeps its
            # placeholder and trips the loud position guards below instead
            # of silently joining at branch scope.
            b_anti_raw: list[str] = []
            bt = re.sub(r"(?is)\bfilter\s+not\s+exists\s*\{([^{}]*)\}",
                        lambda mm: (b_anti_raw.append(mm.group(1)),
                                    " ")[1], bt)
            bt = re.sub(r"(?is)\bminus\s*\{([^{}]*)\}",
                        lambda mm: (b_anti_raw.append(mm.group(1)),
                                    " ")[1], bt)
            b_semi_raw: list[str] = []
            bt = re.sub(r"(?is)\bfilter\s+exists\s*\{([^{}]*)\}",
                        lambda mm: (b_semi_raw.append(mm.group(1)),
                                    " ")[1], bt)
            b_opts_raw: list[str] = []
            bt = re.sub(r"(?is)\boptional\b\s*\{((?:[^{}]|\{[^{}]*\})*)\}",
                        lambda mm: (b_opts_raw.append(mm.group(1)),
                                    " ")[1], bt)
            # a subquery at branch TOP level re-attaches here and joins
            # the branch solutions BEFORE the union (branch scoping)
            bt, b_subqs = _take_subqs(bt)
            btext, bf, brf, bv, bb_raw = extract_clauses(bt)
            if re.search(r"(?i)\bunion\b", btext):
                raise ValueError("a UNION chain nested inside a UNION "
                                 "branch is unsupported (flatten it into "
                                 "the outer chain)")
            btext = _inline_bare_groups(btext)
            pats = patterns_of(btext)
            if not pats:
                raise ValueError("empty UNION branch")
            b_opts = [_parse_optional_group(g) for g in b_opts_raw]
            b_anti = [patterns_of(g) for g in b_anti_raw]
            b_semi = [patterns_of(g) for g in b_semi_raw]
            if any(not g for g in b_anti + b_semi):
                raise ValueError("empty EXISTS / NOT EXISTS / MINUS block")
            union_groups.append(pats)
            union_clauses.append((bf, brf, bv, _parse_binds(bb_raw),
                                  b_opts, b_anti, b_semi, b_subqs))
        patterns: list[tuple[str, str, str]] = []
        # global-scope groups parsed above apply to the unioned solutions
        optionals = []
        optional_filters = []
        for g in g_opts_raw:
            gp, gff = _parse_optional_group(g)
            optionals.append(gp)
            optional_filters.append(gff)
        not_exists = [patterns_of(g) for g in g_not_exists_raw]
        exists = [patterns_of(g) for g in g_exists_raw]
        if any(not g for g in not_exists + exists):
            raise ValueError("empty EXISTS / NOT EXISTS / MINUS block")
    else:
        # pull FILTER NOT EXISTS { ... } / MINUS { ... } / FILTER EXISTS
        # { ... } / OPTIONAL { ... } groups before the clause scan (the
        # generic FILTER scanner expects a parenthesized expression)
        not_exists_raw: list[str] = []
        body = re.sub(r"(?is)\bfilter\s+not\s+exists\s*\{([^{}]*)\}",
                      lambda mm: (not_exists_raw.append(mm.group(1)),
                                  " ")[1], body)
        body = re.sub(r"(?is)\bminus\s*\{([^{}]*)\}",
                      lambda mm: (not_exists_raw.append(mm.group(1)),
                                  " ")[1], body)
        # positive FILTER EXISTS (after NOT EXISTS: that regex requires the
        # `not`, so the remaining `filter exists` matches are all positive)
        exists_raw: list[str] = []
        body = re.sub(r"(?is)\bfilter\s+exists\s*\{([^{}]*)\}",
                      lambda mm: (exists_raw.append(mm.group(1)), " ")[1],
                      body)
        optionals_raw: list[str] = []
        body = re.sub(r"(?is)\boptional\b\s*\{((?:[^{}]|\{[^{}]*\})*)\}",
                      lambda mm: (optionals_raw.append(mm.group(1)),
                                  " ")[1], body)
        body, global_subqs = _take_subqs(body)
        body, filters, regex_filters, values_clauses, binds_raw = \
            extract_clauses(body)
        body = _inline_bare_groups(body)
        patterns = patterns_of(body)
        if not patterns:
            raise ValueError("empty WHERE block")
        optionals = []
        optional_filters: list[tuple] = []
        for g in optionals_raw:
            gp, gff = _parse_optional_group(g)
            optionals.append(gp)
            optional_filters.append(gff)
        not_exists = [patterns_of(g) for g in not_exists_raw]
        if any(not g for g in not_exists):
            raise ValueError("empty NOT EXISTS / MINUS block")
        exists = [patterns_of(g) for g in exists_raw]
        if any(not g for g in exists):
            raise ValueError("empty EXISTS block")
    if offset is not None and not order_by:
        raise ValueError("OFFSET needs ORDER BY (deterministic pages)")

    binds = _parse_binds(binds_raw)
    if having:
        agg_aliases = {a for _, _, a in aggregates}
        bad = [h for h, _, _ in having if h not in agg_aliases]
        if not aggregates or bad:
            raise ValueError("HAVING filters aggregate aliases only "
                             f"(got {bad or having})")
    return ParsedQuery(select, patterns, limit, distinct, filters,
                       regex_filters, order_by, optionals, union_groups,
                       group_by, aggregates, values_clauses, offset,
                       not_exists, exists, binds, having, union_clauses,
                       global_subqs, optional_filters)


def _split_call_args(text: str) -> list[str]:
    """Split a function-call argument list at top-level commas (commas
    inside quoted literals or nested parens belong to the argument)."""
    parts, depth, cur, inq = [], 0, [], False
    for ch in text:
        if ch == '"':
            inq = not inq
        if ch == "," and not inq and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        if not inq:
            depth += ch == "("
            depth -= ch == ")"
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


# BIND function arities: name -> (min_args, max_args, first_arg_is_var)
_BIND_FNS = {"concat": (1, 99, False), "strlen": (1, 1, True),
             "ucase": (1, 1, True), "lcase": (1, 1, True),
             "str": (1, 1, True), "substr": (2, 3, True),
             "strbefore": (2, 2, True), "strafter": (2, 2, True),
             "replace": (3, 3, True), "abs": (1, 1, True),
             "round": (1, 1, True), "ceil": (1, 1, True),
             "floor": (1, 1, True), "coalesce": (1, 99, False)}
_BIND_ARG = re.compile(r'^(\?\w+|"[^"]*"|-?\d+(?:\.\d+)?)$')


def _parse_binds(binds_raw: list[tuple[str, str]]) \
        -> list[tuple[str, list, str]]:
    """Compile raw BIND (expr, alias) pairs into (fn, args, alias) triples.

    fn in concat/strlen/ucase/lcase/str/substr/strbefore/strafter/replace/
    abs/round/ceil/floor/coalesce/if/arith. Args are kept as raw tokens
    ('?v', '"lit"', '3') — the apply side interprets them, so string
    literals and numbers stay distinguishable. IF takes a comparison
    condition: IF(?v OP term, then, else)."""
    binds: list[tuple[str, list, str]] = []
    for expr, alias in binds_raw:
        mfn = re.match(r"(?is)^(\w+)\s*\((.*)\)$", expr)
        if mfn and mfn.group(1).lower() in _BIND_FNS:
            fn = mfn.group(1).lower()
            args = _split_call_args(mfn.group(2))
            lo, hi, var0 = _BIND_FNS[fn]
            if not (lo <= len(args) <= hi):
                raise ValueError(f"{fn.upper()} takes {lo}..{hi} args, "
                                 f"got {len(args)} in {expr!r}")
            bad = [a for a in args if not _BIND_ARG.match(a)]
            if bad:
                raise ValueError(f"unsupported BIND argument(s) {bad} "
                                 f"in {expr!r}")
            if var0 and not args[0].startswith("?"):
                raise ValueError(
                    f"{fn.upper()}'s first argument must be a variable")
            binds.append((fn, args, alias))
            continue
        if mfn and mfn.group(1).lower() == "if":
            args = _split_call_args(mfn.group(2))
            if len(args) != 3:
                raise ValueError(f"IF takes (cond, then, else): {expr!r}")
            mc = re.match(r'(?s)^(\?\w+)\s*(!=|<=|>=|=|<|>)\s*'
                          r'(\?\w+|"[^"]*"|<[^>]*>|-?[\d.]+)$', args[0])
            if not mc:
                raise ValueError("IF condition must be ?var OP term: "
                                 f"{args[0]!r}")
            for a in args[1:]:
                if not _BIND_ARG.match(a):
                    raise ValueError(f"unsupported IF branch {a!r}")
            binds.append(("if", [mc.group(1), mc.group(2), mc.group(3),
                                 args[1], args[2]], alias))
            continue
        ma = re.match(r"(?s)^(\?\w+|-?[\d.]+)\s*([+\-*/])"
                      r"\s*(\?\w+|-?[\d.]+)$", expr)
        if ma:
            binds.append(("arith", [ma.group(1), ma.group(2), ma.group(3)],
                          alias))
            continue
        raise ValueError(f"unsupported BIND expression: {expr!r}")
    return binds


def _split_union(body: str):
    """Detect the `{ group } UNION { group } ...` WHERE-body shape BEFORE
    clause extraction. Returns (branch_texts, global_text) when the body is
    a top-level UNION chain, else None. Brace groups that are payloads of a
    preceding VALUES / OPTIONAL / EXISTS / MINUS keyword are folded back
    into the surrounding text (they are clauses, not union branches);
    between-branch text must be exactly the UNION keyword."""
    if "{" not in body:
        return None
    segs: list[tuple[str, str]] = []   # ('t', text) | ('g', group body)
    depth, start = 0, 0
    for i, ch in enumerate(body):
        if ch == "{":
            if depth == 0:
                segs.append(("t", body[start:i]))
                start = i + 1
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth < 0:
                raise ValueError("unbalanced braces in WHERE block")
            if depth == 0:
                segs.append(("g", body[start:i]))
                start = i + 1
    if depth:
        raise ValueError("unbalanced braces in WHERE block")
    segs.append(("t", body[start:]))
    merged: list[tuple[str, str]] = []
    for kind, s in segs:
        if kind == "g" and merged and merged[-1][0] == "t" \
                and re.search(r"(?is)\b(values\s+\?\w+|optional|minus|"
                              r"exists)\s*$", merged[-1][1]):
            merged[-1] = ("t", merged[-1][1] + "{" + s + "}")
            continue
        if kind == "t" and merged and merged[-1][0] == "t":
            merged[-1] = ("t", merged[-1][1] + s)
            continue
        merged.append((kind, s))
    branches = [s for k, s in merged if k == "g"]
    texts = [s for k, s in merged if k == "t"]
    n_unions = sum(len(re.findall(r"(?i)\bunion\b", t)) for t in texts)
    if not branches or not n_unions:
        return None
    if n_unions != len(branches) - 1:
        raise ValueError("unsupported UNION shape: a WHERE body with UNION "
                         "must be a chain of { group } UNION { group }")
    # between-branch text must be exactly UNION; leading/trailing text
    # around the chain carries global clauses
    between = [t for (k1, t), nxt in zip(merged, merged[1:] + [("t", "")])
               if k1 == "t" and nxt[0] == "g"][1:]
    for t in between:
        if not re.match(r"(?is)^\s*union\s*$", t):
            raise ValueError(f"only the UNION keyword may separate UNION "
                             f"branches (got {t!r})")
    return branches, " ".join(texts)


def _apply_filters(ds: ray.data.Dataset,
                   filters: list[tuple[str, str, object, bool]],
                   regex_filters: list[tuple[str, str]],
                   values_clauses: list[tuple[str, list[object]]]) \
        -> ray.data.Dataset:
    """One vectorized mask per batch for every FILTER clause. Numeric
    literals coerce the binding column (non-numeric bindings drop, SPARQL
    type-error semantics); strings/IRIs compare lexicographically."""
    import operator as _op
    ops = {"eq": _op.eq, "ne": _op.ne, "lt": _op.lt, "le": _op.le,
           "gt": _op.gt, "ge": _op.ge}

    def atom_mask(batch: pd.DataFrame, var, op, val, is_var) -> pd.Series:
        if op in ("bound", "notbound"):
            # a variable no pattern ever binds is unbound everywhere
            # (SPARQL: bound() is false, not an error)
            nn = batch[var].notna() if var in batch.columns \
                else pd.Series(False, index=batch.index)
            return nn if op == "bound" else ~nn
        if op == "regexm":
            return batch[var].str.contains(val, regex=True, na=False)
        if op in ("isin", "notisin"):
            # FILTER(?v IN (...)): match on the lexical form OR the
            # numeric form (numbers arrive as floats from the parser)
            sval = batch[var].astype(str)
            strs = {str(v) for v in val}
            hit = sval.isin(strs)
            nums = [v for v in val if isinstance(v, float)]
            if nums:
                hit |= pd.to_numeric(batch[var],
                                     errors="coerce").isin(nums)
            return hit if op == "isin" else ~hit
        if op in ("strstarts", "strends", "contains", "notstrstarts",
                  "notstrends", "notcontains"):
            s = batch[var].astype(str)
            base_fn = op[3:] if op.startswith("not") else op
            hit = (s.str.startswith(val) if base_fn == "strstarts"
                   else s.str.endswith(val) if base_fn == "strends"
                   else s.str.contains(val, regex=False))
            hit = hit.fillna(False)
            return ~hit if op.startswith("not") else hit
        lhs = batch[var]
        rhs = batch[val] if is_var else val
        if is_var:
            # var-var compare: the sides may carry different dtypes
            # (e.g. a stringly-typed binding vs a numeric aggregate
            # alias) — compare numerically where BOTH coerce, else
            # lexically (matches the literal-vs-literal convention)
            ln = pd.to_numeric(lhs, errors="coerce")
            rn = pd.to_numeric(rhs, errors="coerce")
            num = ln.notna() & rn.notna()
            res = pd.Series(False, index=batch.index)
            if num.any():
                res[num] = ops[op](ln[num], rn[num])
            if (~num).any():
                res[~num] = ops[op](lhs[~num].astype(str),
                                    rhs[~num].astype(str))
            return res.fillna(False)
        if isinstance(val, float):
            lhs = pd.to_numeric(lhs, errors="coerce")
        return ops[op](lhs, rhs).fillna(False)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        mask = pd.Series(True, index=batch.index)
        for var, op, val, is_var in filters:
            if op == "__or__":
                # disjunction: OR of per-branch AND masks, one pass
                m = pd.Series(False, index=batch.index)
                for branch in val:
                    bm = pd.Series(True, index=batch.index)
                    for (v2, o2, vl2, iv2) in branch:
                        bm &= atom_mask(batch, v2, o2, vl2, iv2)
                    m |= bm
                mask &= m
                continue
            mask &= atom_mask(batch, var, op, val, is_var)
        for var, pat in regex_filters:
            mask &= batch[var].str.contains(pat, regex=True, na=False)
        for var, vals in values_clauses:
            mask &= batch[var].isin(vals)
        return batch[mask]

    return ds.map_batches(fn, batch_format="pandas")


def _apply_binds(ds: ray.data.Dataset,
                 binds: list[tuple[str, list, str]]) -> ray.data.Dataset:
    """Vectorized BIND(expr AS ?alias) application: appends one column per
    bind. String fns run as pandas .str kernels, numeric fns as numpy;
    each bound alias is visible to later binds and FILTERs."""
    def lit(tok: str) -> str:
        # raw token -> python value: strip quotes / angle brackets
        if tok.startswith('"'):
            return tok[1:-1]
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        return tok

    def apply_binds(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        df = df.copy()
        for fn, args, alias in binds:
            def sv(tok=None, i=0):          # string series of arg i
                t = tok if tok is not None else args[i]
                return df[t[1:]].astype(str)

            def nv(tok):                    # numeric view of a token
                return pd.to_numeric(df[tok[1:]], errors="coerce") \
                    if tok.startswith("?") else float(tok)

            if fn == "concat":
                acc = None
                for a in args:
                    part = sv(a) if a.startswith("?") else lit(a)
                    acc = part if acc is None else acc + part
                df[alias] = acc
            elif fn == "strlen":
                df[alias] = sv().str.len().astype("int64")
            elif fn in ("ucase", "lcase"):
                df[alias] = sv().str.upper() if fn == "ucase" \
                    else sv().str.lower()
            elif fn == "str":
                df[alias] = sv()
            elif fn == "substr":            # SPARQL/xpath: 1-based start
                start = int(float(lit(args[1]))) - 1
                if start < 0:
                    raise ValueError("SUBSTR start is 1-based")
                df[alias] = (sv().str.slice(
                    start, start + int(float(lit(args[2]))))
                    if len(args) > 2 else sv().str.slice(start))
            elif fn in ("strbefore", "strafter"):
                s, needle = sv(), lit(args[1])
                if needle == "":
                    # STRBEFORE(s,"") = "", STRAFTER(s,"") = s (17.4.3)
                    df[alias] = "" if fn == "strbefore" else s
                else:
                    part = s.str.partition(needle)
                    df[alias] = (part[0].where(part[1] == needle, "")
                                 if fn == "strbefore" else part[2])
            elif fn == "replace":
                # $n group references map to python \n backrefs
                rep = re.sub(r"\$(\d)", r"\\\1", lit(args[2]))
                df[alias] = sv().str.replace(lit(args[1]), rep, regex=True)
            elif fn in ("abs", "round", "ceil", "floor"):
                v = nv(args[0])
                df[alias] = (v.abs() if fn == "abs"
                             # fn:round: ties resolve toward +inf
                             else np.floor(v + 0.5) if fn == "round"
                             else np.ceil(v) if fn == "ceil"
                             else np.floor(v))
            elif fn == "coalesce":
                acc = pd.Series([None] * len(df), index=df.index,
                                dtype=object)
                for a in args:
                    if a.startswith("?"):
                        if a[1:] in df.columns:
                            acc = acc.where(acc.notna(), df[a[1:]])
                    else:               # a literal is always bound: done
                        acc = acc.where(acc.notna(), lit(a))
                        break
                df[alias] = acc
            elif fn == "if":
                var, op, term, then, els = args
                import operator as _op
                ops = {"=": _op.eq, "!=": _op.ne, "<": _op.lt,
                       "<=": _op.le, ">": _op.gt, ">=": _op.ge}
                rhs_num = (not term.startswith(('?', '"', '<'))
                           and re.match(r"^-?[\d.]+$", term))
                if term.startswith("?") or not rhs_num:
                    lhs = sv(var)
                    rhs = sv(term) if term.startswith("?") else lit(term)
                else:
                    lhs, rhs = nv(var), float(term)
                mask = ops[op](lhs, rhs).fillna(False)
                tv = df[then[1:]] if then.startswith("?") else lit(then)
                ev = df[els[1:]] if els.startswith("?") else lit(els)
                df[alias] = pd.Series(
                    np.where(mask, tv, ev), index=df.index)
            else:                       # arith
                t1, op, t2 = args
                import operator as _op
                ops = {"+": _op.add, "-": _op.sub,
                       "*": _op.mul, "/": _op.truediv}
                df[alias] = ops[op](nv(t1), nv(t2))
        return df

    return ds.map_batches(apply_binds, batch_format="pandas")


def _aggregate_groups(ds: ray.data.Dataset, q: ParsedQuery) -> ray.data.Dataset:
    """GROUP BY execution: per-batch pandas partials (sum/min/max, non-null
    counts; avg as sum+count) feed one bucketed shuffle via hash_groupby_agg —
    the exchange moves one row per (batch, group), never the bindings.
    Numeric aggregates coerce string literals with to_numeric (SPARQL bag
    semantics: non-numeric bindings contribute nothing)."""
    from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_join

    keys = list(q.group_by) or ["__all"]
    cd = [(f, v, a) for f, v, a in q.aggregates if f == "count_distinct"]
    rest = [(f, v, a) for f, v, a in q.aggregates
            if f != "count_distinct"]

    def keyed(batch: pd.DataFrame, cols: dict) -> pd.DataFrame:
        out = pd.DataFrame(index=batch.index)
        for k in q.group_by:
            out[k] = batch[k]
        if not q.group_by:
            out["__all"] = 0
        for name, series in cols.items():
            out[name] = series
        return out

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cols: dict = {}
        for func, var, alias in rest:
            if func == "count":
                cols[alias] = (1.0 if var == "*"
                               else batch[var].notna().astype("float64"))
            elif func == "sample" or func.startswith("group_concat"):
                cols[alias] = batch[var]         # raw strings, no coercion
            else:
                cols[alias] = pd.to_numeric(batch[var], errors="coerce")
                if func in ("min", "max"):
                    # string fallback: SPARQL MIN/MAX over non-numeric
                    # literals compare by codepoint — carry the raw values
                    # so groups with zero coercible bindings still resolve
                    cols[alias + "__s"] = batch[var]
            if func == "avg":
                cols[alias + "__n"] = cols[alias].notna().astype("float64")
        return keyed(batch, cols)

    out, out_cols = None, list(keys)
    if rest:
        aggs = {}
        for func, _, alias in rest:
            how = ("collect" if func.startswith("group_concat") else
                   {"count": "sum", "sum": "sum", "min": "min",
                    "max": "max", "avg": "sum",
                    # SAMPLE may return any group value (18.5.1.9); the
                    # codepoint-min is a valid pick and deterministic
                    # regardless of block layout (oracle: min(v))
                    "sample": "min"}[func])
            aggs[alias] = (alias, how)
            if func == "avg":
                aggs[alias + "__n"] = (alias + "__n", "sum")
            elif func in ("min", "max"):
                aggs[alias + "__s"] = (alias + "__s", how)
        out = hash_groupby_agg(
            ds.map_batches(partial, batch_format="pandas"),
            keys, aggs, num_buckets=16)
        out_cols = list(keys) + list(aggs)

    # COUNT(DISTINCT ?v): per-group value dedup (map-side pair dedup inside
    # distinct_rows bounds the exchange by group-value cardinality), then a
    # plain grouped count; joined back on the group keys
    for func, var, alias in cd:
        dd = distinct_rows(
            ds.map_batches(lambda df, v=var: keyed(df, {v: df[v]}),
                           batch_format="pandas"),
            keys + [var], num_buckets=16)
        cnt = hash_groupby_agg(dd, keys, {alias: (var, "count")},
                               num_buckets=16)
        if out is None:
            out = cnt
        else:
            out = partitioned_join(
                out, cnt, on=keys[0], extra_keys=keys[1:],
                num_buckets=16, lcols=out_cols, rcols=keys + [alias])
        out_cols = list(dict.fromkeys(out_cols + keys + [alias]))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for func, _, alias in q.aggregates:
            if func == "avg":
                df[alias] = df[alias] / df[alias + "__n"]
                df = df.drop(columns=[alias + "__n"])
            elif func in ("count", "count_distinct"):
                df[alias] = df[alias].astype("int64")
            elif func in ("min", "max"):
                miss = df[alias].isna()
                if miss.any():   # all-numeric groups keep their dtype
                    df[alias] = df[alias].astype(object)
                    df.loc[miss, alias] = df.loc[miss, alias + "__s"]
                df = df.drop(columns=[alias + "__s"])
            elif func.startswith("group_concat"):
                sep = func.split("\x00", 1)[1]
                df[alias] = df[alias].map(
                    lambda lst: sep.join(lst))   # values pre-sorted
        sel = [v.lstrip("?") for v in q.select]
        return df[sel]

    assert out is not None
    return out.map_batches(finish, batch_format="pandas")


def sparql_select(triples: ray.data.Dataset, query: str,
                  **kw) -> ray.data.Dataset:
    """Run a SELECT-BGP SPARQL string against a triple Dataset: patterns
    compile to vectorized filters + bucketed joins, FILTERs to batch masks,
    OPTIONAL groups to bucketed LEFT joins (unmatched bindings stay null),
    DISTINCT to a bucketed dedup, ORDER BY to a distributed sort (which
    makes a trailing LIMIT a deterministic cut)."""
    from nexus_forge_ray.ops.joins import partitioned_join

    q = parse_sparql(query)
    triples = triples.materialize()     # scanned by every pattern group
    sel = [v.lstrip("?") for v in q.select]
    aliases = {a for _, _, a in q.aggregates} | {a for _, _, a in q.binds}
    bind_inputs = [a[1:] for _, args, _ in q.binds
                   for a in args if isinstance(a, str) and a.startswith("?")]
    wanted = list(dict.fromkeys(
        v for v in
        ([v for v in sel]
         + [v for _, v, _ in q.aggregates if v != "*"]
         + [f[0] for f in q.filters if f[0] is not None]
         + [f[2] for f in q.filters if f[3]]
         # vars referenced inside __or__ branches (atoms nest in f[2])
         + [a[0] for f in q.filters if f[1] == "__or__"
            for br in f[2] for a in br]
         + [a[2] for f in q.filters if f[1] == "__or__"
            for br in f[2] for a in br if a[3]]
         + [r[0] for r in q.regex_filters]
         + [v for v, _ in q.values_clauses]
         + [v for v, _ in q.order_by]
         + bind_inputs)
        if v not in aliases))
    if q.union_groups:
        branches = []
        clauses = q.union_clauses or \
            [([], [], [], [], [], [], [], [])] * len(q.union_groups)
        clauses = [(*c, *([[]] * (8 - len(c)))) for c in clauses]
        # vars bound by ANY branch's patterns, and vars of the global-scope
        # groups beside the UNION: a global group can only join on vars the
        # branches project, so extend the union's output schema with the
        # overlap (branches lacking such a var emit it unbound — null key
        # rows simply never match the global join)
        any_branch_var = {t[1:] for g in q.union_groups
                          for pat in g for t in pat if _is_var(t)}
        g_ordered = list(dict.fromkeys(
            t[1:] for grp in (q.optionals + q.not_exists + q.exists)
            for pat in grp for t in pat if _is_var(t)))
        g_group_vars = set(g_ordered)
        g_shared = [v for v in g_ordered
                    if v in any_branch_var and v not in wanted]
        wanted = wanted + g_shared
        # branch subquery projections (parsed up front so branches know
        # which wanted vars arrive via the subquery join, not the BGP)
        branch_subcols: list[list[list[str]]] = []
        for c in clauses:
            branch_subcols.append(
                [[v.lstrip("?") for v in parse_sparql(st).select]
                 for st in c[7]])
        any_subq = {v for bs in branch_subcols for cols in bs for v in cols}
        # a var that is ANY branch's BIND alias, optional-group binding or
        # subquery projection is allowed to stay unbound (null) in the
        # branches lacking it
        any_alias = {a for _, _, _, bb, *_ in clauses for _, _, a in bb}
        any_opt = {t[1:] for _, _, _, _, bo, _, _, _ in clauses
                   for gp, _ in bo for pat in gp
                   for t in pat if _is_var(t)} | \
            {a for _, _, _, _, bo, _, _, _ in clauses
             for _, (_, _, _, gb) in bo for _, _, a in gb} | \
            {v for v in g_group_vars if v not in any_branch_var}
        for bi, (g, (bf, brf, bv, bb, bo, banti, bsemi, bsubq)) in \
                enumerate(zip(q.union_groups, clauses)):
            gvars = {t[1:] for pat in g for t in pat if _is_var(t)}
            b_aliases = {a for _, _, a in bb}
            b_subcols = branch_subcols[bi]
            b_sub_all = {v for cols in b_subcols for v in cols}
            # branch-local working set: globally wanted vars the branch must
            # bind, plus vars its own clauses touch, plus the join vars its
            # subqueries share with the branch patterns
            b_want = list(dict.fromkeys(
                [v for v in wanted if v in gvars
                 or (v not in any_alias and v not in any_opt
                     and v not in any_subq)]
                + [f[0] for f in bf if f[0] in gvars]
                + [f[2] for f in bf if f[3] and f[2] in gvars]
                + [r[0] for r in brf if r[0] in gvars]
                + [v for v, _ in bv]
                + [a[1:] for _, args, _ in bb for a in args
                   if isinstance(a, str) and a.startswith("?")]
                + [v for v in b_sub_all if v in gvars]))
            missing = [v for v in b_want if v not in gvars]
            if missing:
                raise ValueError(f"UNION branch {g} does not bind {missing}"
                                 " — branches must bind the selected/"
                                 "filtered variables")
            b = bgp_select(triples, g, b_want, **kw)
            b_cols = list(b_want)
            # branch-scoped subqueries: evaluate recursively, bucketed
            # inner-join on the shared vars BEFORE the union (SPARQL
            # 11.2.4 join semantics, branch scoping preserved)
            for st, sub_cols in zip(bsubq, b_subcols):
                shared = [v for v in sub_cols if v in b_cols]
                if not shared:
                    raise ValueError(
                        f"subquery inside a UNION branch projects "
                        f"{sub_cols} but shares no variable with the "
                        "branch patterns")
                sub = sparql_select(triples, st, **kw)
                b = partitioned_join(b, sub, on=shared[0],
                                     extra_keys=shared[1:], how="inner",
                                     lcols=b_cols, rcols=sub_cols)
                b_cols = list(dict.fromkeys(b_cols + sub_cols))
            # branch-scoped NOT EXISTS/MINUS (anti) and EXISTS (semi)
            # groups: bucketed joins inside the branch, before the union
            if banti or bsemi:
                from nexus_forge_ray.ops.joins import (partitioned_anti_join,
                                                       partitioned_semi_join)

                def bkey_of(shared):
                    def fn(df: pd.DataFrame) -> pd.DataFrame:
                        df = df.copy()
                        key = df[shared[0]].astype(str)
                        for svv in shared[1:]:
                            key = key + "\x00" + df[svv].astype(str)
                        df["__nk"] = key
                        return df
                    return fn

                for sub_groups, joiner in ((banti, partitioned_anti_join),
                                           (bsemi, partitioned_semi_join)):
                    for gpats in sub_groups:
                        gv = {t[1:] for pat in gpats
                              for t in pat if _is_var(t)}
                        shared = [v for v in b_cols if v in gv]
                        if not shared:
                            raise ValueError(
                                f"EXISTS/NOT EXISTS/MINUS {gpats} inside a "
                                "UNION branch shares no variable with the "
                                "branch patterns")
                        sub = bgp_select(triples, gpats, shared, **kw)
                        b = joiner(
                            b.map_batches(bkey_of(shared),
                                          batch_format="pandas"),
                            sub.map_batches(bkey_of(shared),
                                            batch_format="pandas"),
                            on="__nk", lcols=b_cols + ["__nk"]) \
                            .map_batches(
                                lambda df: df.drop(columns="__nk"),
                                batch_format="pandas")
            # branch-scoped OPTIONAL groups: left-join inside the branch
            # BEFORE clause application, so branch FILTERs see the
            # optional bindings (SPARQL group join semantics)
            for gp, (gf, grf, gvc, gbinds) in bo:
                gv = list(dict.fromkeys(t[1:] for pat in gp
                                        for t in pat if _is_var(t)))
                shared = [v for v in gv if v in b_cols]
                if not shared:
                    raise ValueError(f"OPTIONAL {gp} inside a UNION branch "
                                     "shares no variable with the branch "
                                     "patterns")
                opt_ds = bgp_select(triples, gp, gv, **kw)
                if gbinds:
                    clash = {a for _, _, a in gbinds} \
                        & (set(b_cols) - set(gv))
                    if clash:
                        raise ValueError(
                            "BIND alias inside OPTIONAL collides with a "
                            f"variable bound outside the group: {clash} "
                            "(rename the alias)")
                    opt_ds = _apply_binds(opt_ds, list(gbinds))
                    gv = list(dict.fromkeys(
                        gv + [a for _, _, a in gbinds]))
                if gf or grf or gvc:
                    opt_ds = _apply_filters(opt_ds, list(gf), list(grf),
                                            list(gvc))
                b = partitioned_join(b, opt_ds, on=shared[0],
                                     extra_keys=shared[1:], how="left",
                                     lcols=b_cols, rcols=gv)
                b_cols = list(dict.fromkeys(b_cols + gv))
            if bb:
                b = _apply_binds(b, bb)
            if bf or brf or bv:
                b = _apply_filters(b, bf, brf, bv)
            # align the branch schemas before union (branch-local clause
            # vars drop; bind aliases materialize as columns)
            b = b.map_batches(
                lambda df, cols=tuple(wanted): df.reindex(
                    columns=list(cols)),
                batch_format="pandas")
            branches.append(b)
        out = branches[0]
        for b in branches[1:]:
            out = out.union(b)
        bound = list(wanted)
        # global-scope groups join/filter the unioned solutions below —
        # join on vars some branch actually BINDS (pattern, BIND alias or
        # subquery projection), not on reindexed all-null schema columns
        avail = {v for v in bound
                 if v in any_branch_var or v in any_alias or v in any_subq}
        # a var NO branch binds that a global OPTIONAL will bind must not
        # sit in the union as an all-null column — the left join below
        # re-introduces it from the optional side (the final projection
        # restores any still-missing selected columns as unbound)
        g_opt_bound = {t[1:] for g in q.optionals for pat in g
                       for t in pat if _is_var(t)} | \
            {a for _, _, _, gb in (q.optional_filters or ())
             for _, _, a in gb}
        g_opt_only = [v for v in bound
                      if v not in avail and v in g_opt_bound]
        if g_opt_only:
            bound = [v for v in bound if v not in g_opt_only]
            out = out.map_batches(
                lambda df, cols=tuple(bound): df.reindex(
                    columns=list(cols)),
                batch_format="pandas")
        opt_vars = [list(dict.fromkeys(t[1:] for pat in g for t in pat
                                       if _is_var(t)))
                    for g in q.optionals]
        shared_per_group = [[v for v in gv if v in avail]
                            for gv in opt_vars]
        anti_shared = [[v for v in dict.fromkeys(
            t[1:] for pat in g for t in pat if _is_var(t)) if v in avail]
            for g in q.not_exists]
        semi_shared = [[v for v in dict.fromkeys(
            t[1:] for pat in g for t in pat if _is_var(t)) if v in avail]
            for g in q.exists]
    else:
        req_vars = {t[1:] for pat in q.patterns for t in pat if _is_var(t)}
        opt_vars = [list(dict.fromkeys(t[1:] for pat in g for t in pat
                                       if _is_var(t))) for g in q.optionals]
        shared_per_group = [[v for v in gv if v in req_vars]
                            for gv in opt_vars]

        def _shared_of(groups):
            return [[v for v in dict.fromkeys(
                t[1:] for pat in g for t in pat if _is_var(t))
                if v in req_vars] for g in groups]

        anti_shared = _shared_of(q.not_exists)
        semi_shared = _shared_of(q.exists)
        needed = list(dict.fromkeys(
            [v for v in wanted if v in req_vars]
            + [v for sh in shared_per_group for v in sh]
            + [v for sh in anti_shared for v in sh]
            + [v for sh in semi_shared for v in sh]))
        out = bgp_select(triples, q.patterns, needed, **kw)
        bound = list(needed)

    # nested { SELECT ... } groups: evaluate recursively (each is a full
    # query over the same triple Dataset), then bucketed inner-join the
    # outer solutions on the variables shared with the sub-projection —
    # the sub's other projected vars (typically aggregate aliases) become
    # bound for the outer FILTERs/SELECT (SPARQL 11.2.4 join semantics)
    for subtext in q.subqueries:
        subq = parse_sparql(subtext)
        sub_cols = [v.lstrip("?") for v in subq.select]
        shared = [v for v in sub_cols if v in bound]
        if not shared:
            raise ValueError(f"subquery projects {sub_cols} but shares no "
                             "variable with the outer patterns")
        sub = sparql_select(triples, subtext, **kw)
        out = partitioned_join(out, sub, on=shared[0],
                               extra_keys=shared[1:], how="inner",
                               lcols=bound, rcols=sub_cols)
        bound = list(dict.fromkeys(bound + sub_cols))

    def key_of(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__nk"] = df[cols[0]].astype(str) if len(cols) == 1 \
                else df[cols].astype(str).agg("\x1f".join, axis=1)
            return df
        return fn

    from nexus_forge_ray.ops.joins import (partitioned_anti_join,
                                           partitioned_semi_join)
    for kind, groups, shareds in (("NOT EXISTS/MINUS", q.not_exists,
                                   anti_shared),
                                  ("EXISTS", q.exists, semi_shared)):
        joiner = partitioned_anti_join if kind != "EXISTS" \
            else partitioned_semi_join
        for gpats, shared in zip(groups, shareds):
            if not shared:
                raise ValueError(f"{kind} {gpats} shares no variable "
                                 "with the required patterns")
            sub = bgp_select(triples, gpats, shared, **kw)
            out = joiner(
                out.map_batches(key_of(shared), batch_format="pandas"),
                sub.map_batches(key_of(shared), batch_format="pandas"),
                on="__nk", lcols=bound + ["__nk"]) \
                .map_batches(lambda df: df.drop(columns="__nk"),
                             batch_format="pandas")
    # parse_sparql always emits 4-tuples (filters, regex_filters,
    # values_clauses, binds); the default covers ParsedQuery built by
    # other callers with optionals but no clause info
    opt_filts = q.optional_filters or [((), (), (), ())] * len(q.optionals)
    for gpats, gv, shared, (gf, grf, gvc, gbinds) in zip(
            q.optionals, opt_vars, shared_per_group, opt_filts):
        if not shared:
            raise ValueError(f"OPTIONAL {gpats} shares no variable with the "
                             "required patterns")
        opt_ds = bgp_select(triples, gpats, gv, **kw)
        if gbinds:
            # group-local BIND: computed on the optional side, its alias
            # joins the optional bindings (unbound when the match fails).
            # An alias shadowing a var already bound OUTSIDE the group
            # would collide in the left join (pandas suffixes, the final
            # projection would fabricate nulls) — reject loudly.
            clash = {a for _, _, a in gbinds} & (set(bound) - set(gv))
            if clash:
                raise ValueError(
                    "BIND alias inside OPTIONAL collides with a variable "
                    f"bound outside the group: {clash} (rename the alias)")
            opt_ds = _apply_binds(opt_ds, list(gbinds))
            gv = list(dict.fromkeys(gv + [a for _, _, a in gbinds]))
        if gf or grf or gvc:
            # group-local FILTER/VALUES: constrain the optional side BEFORE
            # the left join (failing rows unbind, they don't drop the base)
            opt_ds = _apply_filters(opt_ds, list(gf), list(grf), list(gvc))
        out = partitioned_join(out, opt_ds, on=shared[0],
                               extra_keys=shared[1:], how="left",
                               lcols=bound, rcols=gv)
        bound = list(dict.fromkeys(bound + gv))
    if q.binds:
        out = _apply_binds(out, q.binds)
        bound = list(dict.fromkeys(bound + [a for _, _, a in q.binds]))
    if q.filters or q.regex_filters or q.values_clauses:
        out = _apply_filters(out, q.filters, q.regex_filters,
                             q.values_clauses)
    if q.aggregates:
        out = _aggregate_groups(out, q)
        if not q.group_by:
            # SPARQL: an ungrouped aggregate query ALWAYS yields exactly one
            # solution — over an empty input, COUNT aliases are 0 and the
            # other aggregates are unbound (the grouped shuffle would emit
            # zero rows). The result is at most one row, so the driver-side
            # materialization here is O(1).
            pdf = out.to_pandas()
            if len(pdf) == 0:
                row = {a: (0 if f in ("count", "count_distinct") else None)
                       for f, _, a in q.aggregates}
                pdf = pd.DataFrame([row])[[v.lstrip("?") for v in q.select]]
                for f, _, a in q.aggregates:
                    if f in ("count", "count_distinct"):
                        pdf[a] = pdf[a].astype("int64")
            out = ray.data.from_pandas(pdf)
        if q.having:
            import operator as _op
            hops = {"eq": _op.eq, "ne": _op.ne, "lt": _op.lt,
                    "le": _op.le, "gt": _op.gt, "ge": _op.ge}

            def hav(df: pd.DataFrame) -> pd.DataFrame:
                mask = pd.Series(True, index=df.index)
                for alias, op, val in q.having:
                    mask &= hops[op](
                        pd.to_numeric(df[alias], errors="coerce"), val) \
                        .fillna(False)
                return df[mask]
            out = out.map_batches(hav, batch_format="pandas")
    else:
        out = out.map_batches(lambda df: df.reindex(columns=sel),
                              batch_format="pandas")
    if q.distinct:
        from nexus_forge_ray.ops.agg import distinct_rows
        out = distinct_rows(out, sel)
    if q.order_by:
        out = out.sort(key=[v for v, _ in q.order_by],
                       descending=[d for _, d in q.order_by])
    if q.offset:
        if q.limit is None:
            raise ValueError("OFFSET needs LIMIT in this subset "
                             "(unbounded pages don't stream)")
        page = out.limit(q.limit + q.offset).to_pandas() \
            .iloc[q.offset:].reset_index(drop=True)
        return ray.data.from_pandas(page)   # page is bounded by LIMIT
    return out.limit(q.limit) if q.limit is not None else out


def normalize_quotes(text: str) -> str:
    """Rewrite single-quoted SPARQL literals to the double-quoted form the
    parsers use ('fr' -> "fr"), leaving double-quoted spans — apostrophes
    inside them included — untouched (the alternation consumes them
    first)."""
    return re.sub(r'("[^"]*")|\'([^\']*)\'',
                  lambda m: m.group(1) if m.group(1) is not None
                  else '"' + m.group(2) + '"', text)


def split_prefixes(text: str) -> tuple[dict[str, str], str, str]:
    """(prefixes, body-without-PREFIX-decls, rebuilt PREFIX header) of a
    query/update string — the one shared scrape for every SPARQL surface
    (bgp / quads / updates), so the resolvers cannot drift. The body comes
    back with single-quoted literals normalized to double quotes."""
    prefixes = dict(re.findall(r"(?i)\bprefix\s+(\w*):\s*<([^>]*)>", text))
    body = normalize_quotes(
        re.sub(r"(?i)\bprefix\s+\w*:\s*<[^>]*>", " ", text).strip())
    header = "\n".join(f"PREFIX {p}: <{iri}>" for p, iri in prefixes.items())
    return prefixes, body, header


def graph_term(tok: str, prefixes: dict[str, str], *,
               allow_var: bool = False) -> str:
    """Resolve a GRAPH-position term: <iri> / pfx:name (/ ?var when
    allowed). Shared by the quad SELECT and quad-update surfaces."""
    if allow_var and tok.startswith("?"):
        return tok
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if ":" in tok:
        p, local = tok.split(":", 1)
        if p in prefixes:
            return prefixes[p] + local
    raise ValueError(f"bad graph term: {tok!r}")


def _template_patterns(block: str, prefixes: dict[str, str]) \
        -> list[tuple[str, str, str]]:
    """Dot-separated triple patterns of a CONSTRUCT/ASK group (same term
    forms as the WHERE parser: ?var, <iri>, prefix:local, "literal", 'a').
    Tokenizes BEFORE splitting on '.', exactly like the WHERE parser —
    IRIs and literals may contain dots."""
    def term(tok: str) -> str:
        if tok.startswith("?"):
            return tok
        if tok.startswith('"'):
            return tok.strip('"')
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return tok

    toks = re.findall(r'<[^>]*>|"[^"]*"|[^\s.]+|\.', block)
    pats, cur = [], []
    for tok in toks + ["."]:
        if tok == ".":
            if cur:
                if len(cur) != 3:
                    raise ValueError(f"bad triple pattern: {cur!r}")
                pats.append(tuple(term(t) for t in cur))
                cur = []
        else:
            cur.append(tok)
    return pats


def sparql_construct(triples: ray.data.Dataset, query: str,
                     **kw) -> ray.data.Dataset:
    """CONSTRUCT { template } WHERE { ... } — the query form the
    reference's OntologyResolver issues (ontology_resolver.py:48-129).

    Rewrites to the SELECT of the template's variables (reusing the whole
    WHERE surface: FILTER, OPTIONAL, EXISTS, VALUES, paths), then one
    vectorized map emits a (subj, pred, obj) row per template pattern per
    binding, and a bucketed distinct enforces graph (set) semantics.
    Bindings left unbound by OPTIONAL drop that pattern's row, per spec.
    """
    prefixes = dict(re.findall(r"(?i)\bprefix\s+(\w*):\s*<([^>]*)>",
                               query))
    header = "\n".join(f"PREFIX {p}: <{iri}>"
                       for p, iri in prefixes.items())
    m = re.search(r"(?is)\bconstruct\s*\{(.*?)\}\s*(where\s*\{.*)$", query)
    if not m:
        raise ValueError("need CONSTRUCT { template } WHERE { ... }")
    template = _template_patterns(m.group(1), prefixes)
    if not template:
        raise ValueError("empty CONSTRUCT template")
    tvars = list(dict.fromkeys(
        t for pat in template for t in pat if _is_var(t)))
    if not tvars:
        raise ValueError("CONSTRUCT template binds no variables")
    bindings = sparql_select(
        triples, f"{header}\nSELECT {' '.join(tvars)} {m.group(2)}", **kw)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for s, p, o in template:
            cols = {}
            for name, t in (("subj", s), ("pred", p), ("obj", o)):
                cols[name] = df[t[1:]] if _is_var(t) \
                    else pd.Series([t] * len(df), index=df.index)
            tri = pd.DataFrame(cols)
            parts.append(tri[tri.notna().all(axis=1)])
        return pd.concat(parts, ignore_index=True)

    from nexus_forge_ray.ops.agg import distinct_rows
    return distinct_rows(
        bindings.map_batches(emit, batch_format="pandas"),
        ["subj", "pred", "obj"])


def sparql_ask(triples: ray.data.Dataset, query: str, **kw) -> bool:
    """ASK { patterns } — True iff the pattern group has any solution.
    Rewrites to a LIMIT-1 SELECT of the group's variables; only one block
    ever leaves the cluster."""
    prefixes = dict(re.findall(r"(?i)\bprefix\s+(\w*):\s*<([^>]*)>",
                               query))
    header = "\n".join(f"PREFIX {p}: <{iri}>"
                       for p, iri in prefixes.items())
    m = re.search(r"(?is)\bask\s*(\{.*\})\s*$", query)
    if not m:
        raise ValueError("need ASK { patterns }")
    inner = m.group(1)[1:-1]
    gvars = list(dict.fromkeys(
        t for pat in _template_patterns(
            re.sub(r"(?is)\bfilter\s+not\s+exists\s*\{[^{}]*\}|"
                   r"\bfilter\s+exists\s*\{[^{}]*\}|\bminus\s*\{[^{}]*\}|"
                   r"\bfilter\s*\([^()]*\)", " ", inner), prefixes)
        for t in pat if _is_var(t)))
    if not gvars:
        raise ValueError("ASK group binds no variables")
    sel = sparql_select(
        triples, f"{header}\nSELECT {' '.join(gvars)} WHERE "
        f"{{{inner}}} LIMIT 1", **kw)
    return len(sel.take(1)) > 0


def sparql_describe(triples: ray.data.Dataset, query: str,
                    **kw) -> ray.data.Dataset:
    """DESCRIBE <iri> / DESCRIBE ?v WHERE { ... } — every triple whose
    subject is a described resource (the symmetric concise-bounded
    description is a union with the obj side; subject-CBD matches what the
    reference's stores return for retrieve-by-id). Matched subjects flow
    through a bucketed semi-join — the description set never touches the
    driver."""
    from nexus_forge_ray.ops.joins import partitioned_semi_join
    prefixes = dict(re.findall(r"(?i)\bprefix\s+(\w*):\s*<([^>]*)>",
                               query))
    m = re.search(r"(?is)\bdescribe\s+(.*?)\s*(?:where\s*(\{.*\}))?\s*$",
                  query)
    if not m:
        raise ValueError("need DESCRIBE <iri>... [WHERE { patterns }]")
    # parse the DESCRIBE targets with the shared term rules (each token
    # padded into a dummy pattern so _template_patterns expands it)
    toks = re.findall(r"<[^>]*>|\S+", m.group(1))
    targets = [_template_patterns(f"{tok} <p> <o>", prefixes)[0][0]
               for tok in toks]
    tvars = [t for t in targets if _is_var(t)]
    consts = [t for t in targets if not _is_var(t)]
    if tvars and not m.group(2):
        raise ValueError("DESCRIBE ?var needs a WHERE group")
    subjects: ray.data.Dataset | None = None
    if tvars:
        header = "\n".join(f"PREFIX {p}: <{iri}>"
                           for p, iri in prefixes.items())
        bindings = sparql_select(
            triples, f"{header}\nSELECT {' '.join(tvars)} WHERE "
            f"{m.group(2)}", **kw)
        subjects = bindings.map_batches(
            lambda df: pd.DataFrame(
                {"subj": pd.concat([df[v[1:]] for v in tvars],
                                   ignore_index=True).astype(str)}),
            batch_format="pandas")
    if consts:
        const_ds = ray.data.from_items([{"subj": c} for c in consts])
        subjects = const_ds if subjects is None \
            else subjects.union(const_ds)
    assert subjects is not None
    return partitioned_semi_join(triples, subjects, on="subj")
