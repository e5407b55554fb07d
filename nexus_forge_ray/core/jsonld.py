"""JSON-LD 1.1 context processing, expansion and compaction (offline subset).

The reference delegates to pyld's ``jsonld.expand`` / ``jsonld.compact`` with
``processingMode: json-ld-1.1`` and a ``Context`` wrapper that resolves
string contexts via file:// or http:// (kgforge/core/commons/context.py:22-71,
kgforge/core/conversions/rdf.py:128-138,428-527). This module reimplements
the subset of the W3C algorithms those calls exercise, with NO network I/O:
string context references resolve through a caller-supplied
:class:`ContextResolver` holding named documents (registered dicts or local
``file://`` JSON files) — mirroring the reference's ``context_resolver``
callable argument.

Implemented: @base (relative-IRI resolution for @id values), @vocab
(property-key expansion + vocab-relative compaction), compact IRIs
(prefix:suffix, recursive), keyword aliases ("id": "@id"), expanded term
definitions ({"@id", "@type", "@container", "@reverse", "@language",
"@context"} — property-scoped contexts included), @type coercion ("@id"
node refs and datatype wrapping), containers @list/@set/@language/@index,
@reverse (both the term flag and the @reverse block), term removal via
null, and list-of-contexts merge with later-wins order.

Also implemented (round 4): @nest — nested-property flattening on
expansion, incl. keyword-alias terms and @nest-targeted term definitions;
compaction emits the flat form (information-preserving) — and @json
literals (verbatim-JSON @value objects, round-tripped through compaction).

Not implemented (documented gaps — network-only or processor-directive
semantics a no-network sandbox cannot exercise): remote http(s) context
fetching, @propagate / @protected / @import / @direction.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional

KEYWORDS = {
    "@base", "@container", "@context", "@direction", "@graph", "@id",
    "@import", "@included", "@index", "@json", "@language", "@list", "@nest",
    "@none", "@prefix", "@propagate", "@protected", "@reverse", "@set",
    "@type", "@value", "@version", "@vocab",
}

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class ContextResolver:
    """Resolve string context references offline.

    Holds a registry of named context documents (IRI -> dict), and falls
    back to reading ``file://`` / plain-path JSON documents from local disk.
    The reference's equivalent accepts http:// too; this sandbox has no
    network, so unknown http IRIs raise (same failure mode as the
    reference's "context not resolvable", context.py:54).
    """

    def __init__(self, documents: Optional[dict[str, Any]] = None):
        self.documents = dict(documents or {})

    def register(self, iri: str, document: Any) -> None:
        self.documents[iri] = document

    def resolve(self, ref: str) -> Any:
        if ref in self.documents:
            doc = self.documents[ref]
        elif ref.startswith("file://"):
            with open(ref[len("file://"):], encoding="utf-8") as f:
                doc = json.load(f)
        elif not ref.startswith(("http://", "https://")):
            with open(ref, encoding="utf-8") as f:
                doc = json.load(f)
        else:
            raise ValueError(f"context not resolvable offline: {ref}")
        if isinstance(doc, dict) and "@context" in doc:
            return doc["@context"]
        return doc


@dataclass
class TermDef:
    iri: Optional[str] = None          # expanded IRI (None = explicit null)
    type: Optional[str] = None         # "@id" | "@vocab" | datatype IRI
    container: Optional[str] = None    # "@list" | "@set" | "@language" | "@index"
    reverse: bool = False
    language: Optional[str] = None     # term-scoped default language ("" = none)
    has_language: bool = False
    local_ctx: Any = None              # property-scoped context (raw)
    prefix_ok: bool = True             # usable as a curie prefix
    nest: Optional[str] = None         # "@nest" target term (1.1 §4.3;
    # guides re-nesting on compaction — expansion flattens regardless)


@dataclass
class Context:
    """A processed JSON-LD context (active context in spec terms)."""

    base: Optional[str] = None
    vocab: Optional[str] = None
    language: Optional[str] = None
    terms: dict[str, TermDef] = field(default_factory=dict)
    resolver: Optional[ContextResolver] = None

    # ---------------------------------------------------------- processing
    @classmethod
    def parse(cls, raw: Any, *, resolver: Optional[ContextResolver] = None,
              parent: Optional["Context"] = None) -> "Context":
        ctx = cls(resolver=resolver or (parent.resolver if parent else None))
        if parent is not None:
            ctx.base, ctx.vocab = parent.base, parent.vocab
            ctx.language = parent.language
            ctx.terms = dict(parent.terms)
        for entry in (raw if isinstance(raw, list) else [raw]):
            ctx._apply(entry)
        return ctx

    def _apply(self, entry: Any) -> None:
        if entry is None:
            self.base = self.vocab = self.language = None
            self.terms = {}
            return
        if isinstance(entry, str):
            if self.resolver is None:
                raise ValueError(
                    f"string context {entry!r} needs a ContextResolver")
            self._apply_dict_or_list(self.resolver.resolve(entry))
            return
        self._apply_dict_or_list(entry)

    def _apply_dict_or_list(self, entry: Any) -> None:
        if isinstance(entry, list):
            for e in entry:
                self._apply(e)
            return
        if not isinstance(entry, dict):
            raise TypeError(f"bad context entry: {type(entry)}")
        entry = entry.get("@context", entry) \
            if set(entry) == {"@context"} else entry
        if "@base" in entry:
            self.base = entry["@base"]
        if "@vocab" in entry:
            self.vocab = entry["@vocab"]
        if "@language" in entry:
            self.language = entry["@language"]
        for term, spec in entry.items():
            if term in ("@base", "@vocab", "@language", "@version"):
                continue
            if term in KEYWORDS:
                raise ValueError(f"cannot redefine keyword {term}")
            self._define(term, spec, entry)

    def _define(self, term: str, spec: Any, local: dict) -> None:
        if spec is None:
            self.terms[term] = TermDef(iri=None)
            return
        if isinstance(spec, str):
            if spec in KEYWORDS:                      # keyword alias
                self.terms[term] = TermDef(iri=spec)
            else:
                self.terms[term] = TermDef(
                    iri=self._expand_iri(spec, vocab=True, local=local))
            return
        if not isinstance(spec, dict):
            raise TypeError(f"bad term definition for {term!r}")
        d = TermDef()
        if "@reverse" in spec:
            d.reverse = True
            d.iri = self._expand_iri(spec["@reverse"], vocab=True, local=local)
        elif "@id" in spec:
            v = spec["@id"]
            d.iri = (v if v in KEYWORDS else
                     self._expand_iri(v, vocab=True, local=local)
                     if v is not None else None)
        else:
            d.iri = self._expand_iri(term, vocab=True, local=local)
        if "@type" in spec:
            t = spec["@type"]
            d.type = t if t in ("@id", "@vocab", "@json", "@none") else \
                self._expand_iri(t, vocab=True, local=local)
        if "@container" in spec:
            c = spec["@container"]
            d.container = c[0] if isinstance(c, list) else c
        if "@language" in spec:
            d.language = spec["@language"]
            d.has_language = True
        if "@context" in spec:
            d.local_ctx = spec["@context"]
        if "@prefix" in spec:
            d.prefix_ok = bool(spec["@prefix"])
        if "@nest" in spec:
            d.nest = spec["@nest"]
        self.terms[term] = d

    # ---------------------------------------------------------- IRI helpers
    def _expand_iri(self, value: str, *, vocab: bool = False,
                    document_relative: bool = False,
                    local: Optional[dict] = None) -> str:
        """IRI expansion (spec 5.2): keyword, term, curie, vocab, base."""
        if value in KEYWORDS or value is None:
            return value
        if vocab and value in self.terms:
            t = self.terms[value].iri
            if t is not None:
                return t
        # during context processing a sibling local definition may be needed
        if vocab and local is not None and value in local and \
                value not in self.terms and isinstance(local[value], (str, dict)):
            self._define(value, local[value], local)
            t = self.terms[value].iri
            if t is not None:
                return t
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if suffix.startswith("//"):              # absolute IRI
                return value
            if prefix in self.terms and self.terms[prefix].prefix_ok and \
                    self.terms[prefix].iri:
                return self.terms[prefix].iri + suffix
            if local is not None and prefix in local and \
                    prefix not in self.terms:
                self._define(prefix, local[prefix], local)
                if self.terms[prefix].iri:
                    return self.terms[prefix].iri + suffix
            if _ABS_IRI.match(value):
                return value
        if vocab and self.vocab:
            return self.vocab + value
        if document_relative and self.base:
            return resolve_iri(self.base, value)
        return value

    def expand_iri(self, value: str, *, vocab: bool = False,
                   document_relative: bool = False) -> str:
        return self._expand_iri(value, vocab=vocab,
                                document_relative=document_relative)

    # --------------------------------------------------------- compact side
    def _inverse(self) -> dict[str, list[tuple[str, TermDef]]]:
        # cached per instance: contexts are immutable once parse() returns,
        # and compaction calls this once per key — rebuilding the term index
        # per key made compact O(doc x context) instead of O(doc)
        inv = getattr(self, "_inv_cache", None)
        if inv is not None:
            return inv
        inv = {}
        for term, d in self.terms.items():
            if d.iri and d.iri not in KEYWORDS:
                inv.setdefault(d.iri, []).append((term, d))
        for terms in inv.values():
            terms.sort(key=lambda td: (len(td[0]), td[0]))
        object.__setattr__(self, "_inv_cache", inv)
        return inv

    def compact_iri(self, iri: str, *, vocab: bool = False,
                    value: Any = None, reverse: bool = False) -> str:
        """Pick the shortest faithful representation: exact term (matching
        container/type/reverse when a value is given), curie, vocab-relative,
        base-relative, else the IRI verbatim."""
        inv = self._inverse()
        if vocab and iri in inv:
            cands = [(t, d) for t, d in inv[iri] if d.reverse == reverse]
            if value is not None:
                scored = sorted(cands, key=lambda td:
                                (-_term_fitness(td[1], value), len(td[0])))
                if scored and _term_fitness(scored[0][1], value) >= 0:
                    return scored[0][0]
            elif cands:
                return cands[0][0]
        best = None
        for term, d in self.terms.items():
            if (d.iri and d.prefix_ok and not d.reverse
                    and d.iri not in KEYWORDS and iri.startswith(d.iri)
                    and len(iri) > len(d.iri)):
                curie = term + ":" + iri[len(d.iri):]
                if curie not in self.terms and \
                        (best is None or len(curie) < len(best)):
                    best = curie
        if best is not None:
            return best
        if vocab and self.vocab and iri.startswith(self.vocab) \
                and len(iri) > len(self.vocab):
            return iri[len(self.vocab):]
        if not vocab and self.base and iri.startswith(self.base) \
                and len(iri) > len(self.base):
            return iri[len(self.base):]
        return iri

    def alias(self, keyword: str) -> str:
        for term, d in self.terms.items():
            if d.iri == keyword:
                return term
        return keyword


def _term_fitness(d: TermDef, value: Any) -> int:
    """How well a term definition matches an expanded value (negative =
    unusable: the term would change the value's meaning)."""
    score = 0
    if isinstance(value, dict) and "@list" in value:
        if d.container == "@list":
            score += 2
        else:
            return -1 if d.container else 0
    elif d.container == "@list":
        return -1
    if isinstance(value, dict) and "@value" in value:
        vt = value.get("@type")
        vl = value.get("@language")
        if d.type is not None:
            score += 2 if vt == d.type else -99
        elif vt is not None:
            return -1
        if d.has_language:
            lang = d.language
            score += 2 if vl == lang or (vl is None and lang is None) else -99
        elif vl is not None and d.container != "@language":
            return -1
    elif isinstance(value, dict) and "@id" in value and len(value) == 1:
        if d.type == "@id":
            score += 2
        elif d.type not in (None, "@vocab"):
            return -1
    elif d.type not in (None,) and not isinstance(value, dict):
        return -1
    return score


def resolve_iri(base: str, ref: str) -> str:
    """Relative-IRI resolution against @base (RFC 3986 subset: absolute
    refs pass through; fragments/queries attach; paths join with dot-segment
    removal)."""
    if not ref:
        return base
    if _ABS_IRI.match(ref):
        return ref
    if ref.startswith("#"):
        return base.split("#", 1)[0] + ref
    if ref.startswith("?"):
        return base.split("#", 1)[0].split("?", 1)[0] + ref
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*:)?(//[^/?#]*)?([^?#]*)", base)
    scheme, authority, path = m.group(1) or "", m.group(2) or "", m.group(3)
    if ref.startswith("//"):
        return scheme + ref
    if ref.startswith("/"):
        merged = ref
    else:
        merged = path.rsplit("/", 1)[0] + "/" + ref if "/" in path else ref
    segs: list[str] = []
    for seg in merged.split("/"):
        if seg == "..":
            if segs and segs[-1]:
                segs.pop()
        elif seg != ".":
            segs.append(seg)
    out_path = "/".join(segs)
    if merged.endswith(("/.", "/..")) and not out_path.endswith("/"):
        out_path += "/"
    return scheme + authority + out_path


# ------------------------------------------------------------------ expand

def expand(doc: Any, ctx: Optional[Context] = None,
           resolver: Optional[ContextResolver] = None) -> list:
    """JSON-LD expansion (W3C algorithm subset). Returns the expanded form:
    a list of node objects with absolute-IRI keys, @value wrappers, and
    explicit @list containers."""
    ctx = ctx or Context(resolver=resolver)
    out = _expand_element(doc, ctx, active_property=None)
    if out is None:
        return []
    if isinstance(out, list):
        return out
    if isinstance(out, dict) and "@graph" in out and \
            set(out) <= {"@graph", "@context"}:
        return out["@graph"]
    return [out]


def _term(ctx: Context, prop: Optional[str]) -> Optional[TermDef]:
    return ctx.terms.get(prop) if prop else None


def _expand_element(el: Any, ctx: Context, active_property: Optional[str]):
    if el is None:
        return None
    td = _term(ctx, active_property)
    if isinstance(el, list):
        vals = []
        for item in el:
            v = _expand_element(item, ctx, active_property)
            if v is None:
                continue
            if isinstance(v, list):
                vals.extend(v)
            else:
                vals.append(v)
        return vals
    if not isinstance(el, dict):
        return _expand_value(el, ctx, td)
    if "@context" in el:
        ctx = Context.parse(el["@context"], parent=ctx)
        td = _term(ctx, active_property)
    # keyword-alias resolution pass
    result: dict[str, Any] = {}
    for key in sorted(el.keys()):
        if key == "@context":
            continue
        value = el[key]
        expanded_key = ctx.expand_iri(key, vocab=True)
        if expanded_key is None or \
                (expanded_key not in KEYWORDS and ":" not in expanded_key
                 and not ctx.vocab and expanded_key == key
                 and key not in ctx.terms):
            # not an IRI, keyword, or defined term -> dropped (spec 13.4)
            if expanded_key not in KEYWORDS and "://" not in str(expanded_key):
                if key not in ctx.terms and ":" not in key and not ctx.vocab:
                    continue
        ktd = ctx.terms.get(key)
        if ktd and ktd.iri is None:                    # nulled term
            continue
        if ktd and ktd.local_ctx is not None:
            item_ctx = Context.parse(ktd.local_ctx, parent=ctx)
        else:
            item_ctx = ctx
        if expanded_key == "@id":
            result["@id"] = ctx.expand_iri(str(value), document_relative=True)
        elif expanded_key == "@type":
            ts = value if isinstance(value, list) else [value]
            result["@type"] = [
                ctx.expand_iri(str(t), vocab=True, document_relative=True)
                for t in ts]
        elif expanded_key == "@value":
            result["@value"] = value
        elif expanded_key == "@language":
            result["@language"] = value
        elif expanded_key == "@index":
            result["@index"] = value
        elif expanded_key == "@list":
            v = _expand_element(value, item_ctx, key)
            result["@list"] = v if isinstance(v, list) else \
                ([] if v is None else [v])
        elif expanded_key == "@set":
            v = _expand_element(value, item_ctx, key)
            return v
        elif expanded_key == "@graph":
            v = _expand_element(value, item_ctx, key)
            result["@graph"] = v if isinstance(v, list) else \
                ([] if v is None else [v])
        elif expanded_key == "@nest":
            # JSON-LD 1.1 §4.3 nested properties: the nest object's members
            # expand as if they were the node's own (flattening); a value
            # object directly under @nest is an error per the spec
            for nv in (value if isinstance(value, list) else [value]):
                if not isinstance(nv, dict):
                    raise ValueError("@nest value must be a node object")
                ex = _expand_element(nv, item_ctx, active_property)
                if ex is None:
                    continue
                if isinstance(ex, dict) and "@value" in ex:
                    raise ValueError("@nest must not contain value objects")
                for k2, v2 in (ex or {}).items():
                    if k2 == "@reverse":
                        rev = result.setdefault("@reverse", {})
                        for rk, rv in v2.items():
                            rev.setdefault(rk, []).extend(rv)
                    elif k2 in ("@id", "@index"):
                        result[k2] = v2
                    elif k2 == "@type":
                        result.setdefault("@type", []).extend(v2)
                    else:
                        result.setdefault(k2, []).extend(
                            v2 if isinstance(v2, list) else [v2])
        elif expanded_key == "@reverse":
            if not isinstance(value, dict):
                raise ValueError("@reverse value must be a node object")
            rev = result.setdefault("@reverse", {})
            for rk, rv in value.items():
                riri = ctx.expand_iri(rk, vocab=True)
                vv = _expand_element(rv, item_ctx, rk)
                vv = vv if isinstance(vv, list) else [vv]
                rev.setdefault(riri, []).extend(vv)
        elif isinstance(expanded_key, str) and \
                (":" in expanded_key or expanded_key in KEYWORDS or ctx.vocab):
            if expanded_key in KEYWORDS:
                continue
            expanded_value = _expand_prop_value(value, item_ctx, key, ktd)
            if expanded_value is None:
                continue
            if ktd and ktd.reverse:
                rev = result.setdefault("@reverse", {})
                rev.setdefault(expanded_key, []).extend(
                    expanded_value if isinstance(expanded_value, list)
                    else [expanded_value])
            else:
                result.setdefault(expanded_key, []).extend(
                    expanded_value if isinstance(expanded_value, list)
                    else [expanded_value])
    if "@value" in result:
        clean = {k: v for k, v in result.items()
                 if k in ("@value", "@type", "@language", "@index")}
        # a value object carries a SINGLE @type string (spec 4.2.1) — undo
        # the node-object @type listing so re-expansion is idempotent
        if isinstance(clean.get("@type"), list) and len(clean["@type"]) == 1:
            clean["@type"] = clean["@type"][0]
        return clean if result["@value"] is not None else None
    return result


def _expand_prop_value(value: Any, ctx: Context, prop: str,
                       td: Optional[TermDef]):
    if td and td.type == "@json":
        # JSON literal (1.1 §4.2.2): the value is copied VERBATIM — maps,
        # lists, scalars all stay raw JSON, never interpreted as JSON-LD
        return [{"@value": value, "@type": "@json"}]
    if td and td.container == "@language" and isinstance(value, dict):
        out = []
        for lang in sorted(value):
            for v in (value[lang] if isinstance(value[lang], list)
                      else [value[lang]]):
                out.append({"@value": v, "@language": lang.lower()})
        return out
    if td and td.container == "@index" and isinstance(value, dict):
        out = []
        for idx in sorted(value):
            v = _expand_element(value[idx], ctx, prop)
            for item in (v if isinstance(v, list) else [v]):
                if isinstance(item, dict):
                    item.setdefault("@index", idx)
                out.append(item)
        return out
    if td and td.container == "@list" and not (
            isinstance(value, dict) and "@list" in value):
        v = _expand_element(value, ctx, prop)
        return [{"@list": v if isinstance(v, list) else
                 ([] if v is None else [v])}]
    return _expand_element(value, ctx, prop)


def _expand_value(value: Any, ctx: Context, td: Optional[TermDef]):
    """Value expansion (spec 5.3): coercion per the term definition."""
    if td and td.type == "@id" and isinstance(value, str):
        return {"@id": ctx.expand_iri(value, document_relative=True)}
    if td and td.type == "@vocab" and isinstance(value, str):
        return {"@id": ctx.expand_iri(value, vocab=True,
                                      document_relative=True)}
    out: dict[str, Any] = {"@value": value}
    if td and td.type not in (None, "@id", "@vocab", "@none"):
        out["@type"] = td.type
    elif isinstance(value, str):
        lang = td.language if (td and td.has_language) else ctx.language
        if lang:
            out["@language"] = lang
    return out


# ----------------------------------------------------------------- compact

def compact(doc: Any, raw_ctx: Any,
            resolver: Optional[ContextResolver] = None) -> dict:
    """JSON-LD compaction: expand first (idempotent on expanded input), then
    compact keys/values against the processed context. Mirrors the
    reference's jsonld.compact(item, ctx=context) call (rdf.py:128-138).

    `raw_ctx` may be a pre-parsed Context — hot loops (one compact per
    record) parse the model context once and pass it here; the output then
    carries no "@context" entry (the caller owns the raw form)."""
    if isinstance(raw_ctx, Context):
        ctx, raw_ctx = raw_ctx, None
    else:
        ctx = Context.parse(raw_ctx, resolver=resolver)
    expanded = doc if isinstance(doc, list) else expand(doc, ctx)
    items = [_compact_node(n, ctx) for n in expanded]
    if len(items) == 1:
        out = items[0]
    else:
        out = {ctx.alias("@graph"): items}
    return {"@context": raw_ctx, **out} if raw_ctx is not None else out


def _compact_node(node: Any, ctx: Context) -> Any:
    if not isinstance(node, dict):
        return node
    if "@value" in node:
        return _compact_value(node, ctx, None)
    out: dict[str, Any] = {}
    for key in sorted(node.keys()):
        value = node[key]
        if key == "@id":
            out[ctx.alias("@id")] = ctx.compact_iri(value)
        elif key == "@type":
            ts = [ctx.compact_iri(t, vocab=True) for t in value]
            out[ctx.alias("@type")] = ts[0] if len(ts) == 1 else ts
        elif key == "@index":
            out[ctx.alias("@index")] = value
        elif key == "@graph":
            out[ctx.alias("@graph")] = [_compact_node(n, ctx) for n in value]
        elif key == "@list":
            term_vals = [_compact_node(v, ctx) for v in value]
            out[ctx.alias("@list")] = term_vals
        elif key == "@reverse":
            rev_out: dict[str, Any] = {}
            for riri, rvals in value.items():
                term = ctx.compact_iri(riri, vocab=True, reverse=True,
                                       value=rvals[0] if rvals else None)
                if term in ctx.terms and ctx.terms[term].reverse:
                    out[term] = _compact_values(rvals, ctx, term)
                else:
                    rev_out[ctx.compact_iri(riri, vocab=True)] = \
                        _compact_values(rvals, ctx, None)
            if rev_out:
                out[ctx.alias("@reverse")] = rev_out
        else:
            sample = value[0] if isinstance(value, list) and value else value
            term = ctx.compact_iri(key, vocab=True, value=sample)
            out[term] = _compact_values(value, ctx, term
                                        if term in ctx.terms else None)
    return out


def _compact_values(vals: Any, ctx: Context, term: Optional[str]):
    td = ctx.terms.get(term) if term else None
    if not isinstance(vals, list):
        vals = [vals]
    if td and td.container == "@language":
        lmap: dict[str, Any] = {}
        for v in vals:
            lang = v.get("@language", "@none") if isinstance(v, dict) else "@none"
            lmap.setdefault(lang, []).append(
                v.get("@value") if isinstance(v, dict) else v)
        return {k: (v[0] if len(v) == 1 else v) for k, v in lmap.items()}
    if td and td.container == "@index":
        imap: dict[str, Any] = {}
        for v in vals:
            idx = v.pop("@index", "@none") if isinstance(v, dict) else "@none"
            imap.setdefault(idx, []).append(_compact_node(v, ctx))
        return {k: (v[0] if len(v) == 1 else v) for k, v in imap.items()}
    if (td and td.container == "@list" and len(vals) == 1
            and isinstance(vals[0], dict) and "@list" in vals[0]):
        inner = [_compact_value(v, ctx, td) for v in vals[0]["@list"]]
        return inner
    cv = [_compact_value(v, ctx, td) for v in vals]
    if td and td.container == "@set":
        return cv
    return cv[0] if len(cv) == 1 else cv


def _compact_value(v: Any, ctx: Context, td: Optional[TermDef]):
    if isinstance(v, dict) and "@list" in v:
        lst = [_compact_value(x, ctx, td) for x in v["@list"]]
        if td and td.container == "@list":
            return lst
        return {ctx.alias("@list"): lst}
    if isinstance(v, dict) and "@value" in v:
        val, vt = v.get("@value"), v.get("@type")
        vl = v.get("@language")
        if td and td.type and vt == td.type:
            return val
        if td and td.has_language and vl == td.language:
            return val
        if vt is None and vl is None:
            if ctx.language and isinstance(val, str):
                pass  # fall through to explicit form
            else:
                return val
        if vt is None and vl is not None and ctx.language == vl and \
                not (td and td.has_language):
            return val
        out = {ctx.alias("@value"): val}
        if vt:
            out[ctx.alias("@type")] = ctx.compact_iri(vt, vocab=True)
        if vl:
            out[ctx.alias("@language")] = vl
        return out
    if isinstance(v, dict) and set(v) == {"@id"}:
        iri = v["@id"]
        if td and td.type == "@id":
            return ctx.compact_iri(iri)
        if td and td.type == "@vocab":
            return ctx.compact_iri(iri, vocab=True)
        return {ctx.alias("@id"): ctx.compact_iri(iri)}
    if isinstance(v, dict):
        return _compact_node(v, ctx)
    return v
