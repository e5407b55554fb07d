"""KnowledgeGraphForge — the reference's session facade
(kgforge/core/forge.py:140-1002) over the Ray-Data-native engine.

One object wires Model (shapes + templates + context), Store (versioned
Parquet + files), Resolvers (scoped targets) and Formatters, exposing the
same user surface: template/validate/resolve/map/reshape/search/paths/
register/update/deprecate/tag/freeze/retrieve/attach/download plus the
as_/from_ codecs. Record-level calls take dicts (the Resource equivalent);
data-plane calls also accept a ray.data.Dataset and return a Dataset, which
is where this engine departs from the one-record-at-a-time reference.

Config shape (forge.py:203-260 YAML sections, simplified to a dict):
    {"model":      {"source": <schema dir>},            # optional
     "store":      {"base": <dir>},                     # optional
     "resolvers":  {<scope>: [{"target": t, "entries": [...],
                               "kind": "default"|"ontology"|"agent"}]},
     "formatters": {<name>: "<str.format template>"},
     "context":    {<term>: <iri>}}

Query text never leaves the process (SURVEY §2.1 S9): `sparql()` accepts
the SELECT-BGP subset and compiles it to native filters + bucketed joins
(`kg.bgp`); `elastic()` accepts the bool/term/range ES-DSL subset and
compiles it to native Filters (`core.filters`).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import ray.data

from nexus_forge_ray.core import conversions as conv
from nexus_forge_ray.core.filters import Filter
from nexus_forge_ray.core.paths import PathsWrapper, wrap_paths
from nexus_forge_ray.core.reshaping import reshape_dataset, reshape_record
from nexus_forge_ray.resolving.embedding import ResolverScopes
from nexus_forge_ray.store.files import FileStore
from nexus_forge_ray.store.parquet_store import ParquetStore
from nexus_forge_ray.validation.loader import SchemaDirectory
from nexus_forge_ray.validation.shapes import (Shape, ShapeValidator,
                                               validate_dataset)
from nexus_forge_ray.validation.templates import template as _template


class KnowledgeGraphForge:
    def __init__(self, config: dict | None = None, **kwargs):
        cfg = dict(config or {})
        cfg.update(kwargs)
        raw_context = cfg.get("context")
        self.context: dict = (dict(raw_context)
                              if isinstance(raw_context, dict) else {})
        from nexus_forge_ray.core.jsonld import ContextResolver
        self._context_resolver = ContextResolver(
            cfg.get("context_documents") or {})
        if isinstance(raw_context, (str, list)):
            # resolvable reference(s) — flatten through the 1.1 processor
            from nexus_forge_ray.core.jsonld import Context as _LDContext
            ld = _LDContext.parse(raw_context, resolver=self._context_resolver)
            self.context = {t: d.iri for t, d in ld.terms.items()
                            if d.iri and not d.iri.startswith("@")}
            if ld.vocab:
                self.context.setdefault("@vocab", ld.vocab)
        self._formatters: dict[str, str] = dict(cfg.get("formatters") or {})
        model = cfg.get("model") or {}
        self._schema_dir: SchemaDirectory | None = (
            SchemaDirectory(model["source"]) if model.get("source") else None)
        self._shapes: list[Shape] = list(cfg.get("shapes") or (
            self._schema_dir.all_shapes() if self._schema_dir else []))
        store = cfg.get("store") or {}
        self._store: ParquetStore | None = (
            ParquetStore(store["base"]) if store.get("base") else None)
        self._files: FileStore | None = (
            FileStore(store["base"]) if store.get("base") else None)
        # mappings-as-data registry (reference: model-dir mapping files,
        # forge.py:545-581): {source: {entity: rules dict | str | Mapping}}
        self._mappings: dict[str, dict[str, Any]] = {
            src: dict(ents)
            for src, ents in (cfg.get("mappings") or {}).items()}
        self._resolvers: dict[str, ResolverScopes] = {}
        for scope, targets in (cfg.get("resolvers") or {}).items():
            scopes = ResolverScopes()
            for t in targets:
                scopes.register(t["target"], t["entries"],
                                kind=t.get("kind", "default"),
                                resolve_with_properties=t.get(
                                    "resolve_with_properties"))
            self._resolvers[scope] = scopes

    # ------------------------------------------------------------- vocabulary

    def prefixes(self) -> dict[str, str]:
        return {k: v for k, v in self.context.items()
                if isinstance(v, str) and v.endswith(("/", "#"))}

    def types(self) -> list[str]:
        return sorted({s.target_type for s in self._shapes})

    def get_store_context(self) -> dict:
        """The JSON-LD context the store serializes under (reference
        forge.py:973-975 — here store and session share one context)."""
        return dict(self.context)

    def get_model_context(self) -> dict:
        """The JSON-LD context the model (schema layer) resolves terms
        with (reference forge.py:977-979; one shared context here)."""
        return dict(self.context)

    # -------------------------------------------------------------- templates

    def template(self, type: str, only_required: bool = False) -> dict:
        return _template(self._shapes, type, only_required)

    def paths(self, type: str) -> PathsWrapper:
        return wrap_paths(self.template(type))

    # ------------------------------------------------------------- validation

    def validate(self, data, type_col: str = "type", **kw):
        """dict/list -> records with valid/violation; Dataset -> Dataset."""
        subclass = self._schema_dir.subclass_of if self._schema_dir else None
        if isinstance(data, ray.data.Dataset):
            return validate_dataset(data, self._shapes, type_col=type_col,
                                    subclass_of=subclass, **kw)
        rows = data if isinstance(data, list) else [data]
        v = ShapeValidator(self._shapes, type_col=type_col,
                           subclass_of=subclass)
        out = v(pd.DataFrame(rows)).to_dict("records")
        return out if isinstance(data, list) else out[0]

    # -------------------------------------------------------------- resolving

    def resolvers(self) -> dict[str, list[str]]:
        return {scope: list(s.targets) for scope, s in self._resolvers.items()}

    def resolve(self, text: str, scope: str | None = None,
                target: str | None = None, **kw):
        """forge.resolve(scope selection, forge.py:395-461): unknown scope ->
        ValueError; no scope -> first hit across scopes in config order."""
        if scope is not None:
            if scope not in self._resolvers:
                raise ValueError(
                    f"Unknown scope value: {scope}. Supported scopes are: "
                    f"{list(self._resolvers)}")
            return self._resolvers[scope].resolve(text, target=target, **kw)
        for scopes in self._resolvers.values():
            hit = scopes.resolve(text, target=target, **kw)
            if hit is not None:
                return hit
        return None

    # ---------------------------------------------------------------- mapping

    def map(self, data, mapping, na=None):
        """DictionaryMapping application; Dataset in -> Dataset out."""
        from nexus_forge_ray.mapping.mapper import DictionaryMapper, RuleContext
        from nexus_forge_ray.mapping.rules import Mapping
        rules = mapping.rules if isinstance(mapping, Mapping) \
            else Mapping.load(mapping).rules
        mapper = DictionaryMapper(rules, forge=RuleContext(self._formatters),
                                  nas=(na,) if not isinstance(na, tuple)
                                  else na)
        if isinstance(data, ray.data.Dataset):
            return data.map_batches(
                lambda df: pd.DataFrame(
                    {"record": [mapper.map_record(r)
                                for r in df.to_dict("records")]}),
                batch_format="pandas")
        rows = data if isinstance(data, list) else [data]
        out = [mapper.map_record(r) for r in rows]
        return out if isinstance(data, list) else out[0]

    def sources(self) -> list[str]:
        """Data sources with registered mappings (forge.py:545-552)."""
        return sorted(self._mappings)

    def mappings(self, source: str) -> dict[str, list[str]]:
        """entity -> [mapping types] for a source (forge.py:554-566)."""
        if source not in self._mappings:
            raise ValueError(f"Unknown source: {source}. Sources with "
                             f"mappings: {self.sources()}")
        return {entity: ["DictionaryMapping"]
                for entity in sorted(self._mappings[source])}

    def mapping(self, entity: str, source: str):
        """The registered Mapping for (entity, source) (forge.py:568-581)."""
        from nexus_forge_ray.mapping.rules import Mapping
        ents = self._mappings.get(source)
        if ents is None or entity not in ents:
            raise ValueError(f"No mapping for entity {entity!r} in source "
                             f"{source!r}")
        m = ents[entity]
        return m if isinstance(m, Mapping) else Mapping.load(m)

    def format(self, what: str, *args) -> str:
        if what not in self._formatters:
            raise ValueError(f"Unknown formatter: {what}")
        return self._formatters[what].format(*args)

    # -------------------------------------------------------------- reshaping

    def reshape(self, data, keep: list[str], **kw):
        if isinstance(data, ray.data.Dataset):
            return reshape_dataset(data, keep, **kw)
        rows = data if isinstance(data, list) else [data]
        out = [reshape_record(r, keep) for r in rows]
        return out if isinstance(data, list) else out[0]

    # ------------------------------------------------------------------ store

    def _need_store(self) -> ParquetStore:
        if self._store is None:
            raise ValueError("no store configured")
        return self._store

    def register(self, data):
        rows = data if isinstance(data, list) else [data]
        out = [self._need_store().register(r) for r in rows]
        return out if isinstance(data, list) else out[0]

    def update(self, data):
        rows = data if isinstance(data, list) else [data]
        out = [self._need_store().update(r) for r in rows]
        return out if isinstance(data, list) else out[0]

    def deprecate(self, rid):
        ids = rid if isinstance(rid, list) else [rid]
        out = [self._need_store().deprecate(r) for r in ids]
        return out if isinstance(rid, list) else out[0]

    def tag(self, rid: str, version: int, value: str) -> None:
        self._need_store().tag(rid, version, value)

    def retrieve(self, rid: str, version=None) -> dict:
        return self._need_store().retrieve(rid, version)

    def freeze(self, data):
        return self._need_store().freeze(data)

    def search(self, *filters: Filter | dict, **kw):
        return self._need_store().search(*filters, **kw)

    def elastic(self, query: dict, data: ray.data.Dataset | None = None,
                **kw):
        """Elasticsearch-DSL search (the reference's forge.elastic,
        kgforge/core/forge.py:568-596): the bool/term/range subset compiles
        to native Filters (`core.filters.filters_from_elastic`) and runs
        against the store — or against an explicit Dataset when given.
        Bodies with an `aggs` section run the terms-aggregation subset
        natively (`core.filters.elastic_terms_agg`) and return the bucket
        table as a DataFrame."""
        from nexus_forge_ray.core.filters import (_is_score_sort,
                                                  elastic_score_page,
                                                  elastic_search_page,
                                                  elastic_terms_agg,
                                                  filters_from_elastic,
                                                  search as _search)
        if "aggs" in query or "aggregations" in query:
            if data is None:
                raise ValueError("aggs need an explicit Dataset — the "
                                 "record store is row-oriented")
            return elastic_terms_agg(data, query)
        def _source_cols(src):
            """ES _source forms: list, single string, {'includes': [...]}."""
            if isinstance(src, str):
                return [src]
            if isinstance(src, dict):
                return list(src.get("includes") or [])
            return list(src)

        if data is not None and _is_score_sort(query.get("sort")):
            # _score-ranked relevance page (boosted should / constant_score
            # / dense_vector script_score) — core.filters.elastic_score_page
            return elastic_score_page(data, query, **kw)
        if data is not None and "sort" in query:
            page = elastic_search_page(data, query, **kw)
            src = query.get("_source")
            if src:       # ES applies _source filtering on sorted pages too
                cols = [c for c in _source_cols(src) if c in page.columns]
                page = page[cols]
            return page
        filters = filters_from_elastic(query)
        if data is not None:
            out = _search(data, *filters, **kw)
            src = query.get("_source")
            if src:       # ES source filtering: project the hit columns
                # missing fields are omitted, not errors (ES semantics)
                cols = _source_cols(src)
                out = out.map_batches(
                    lambda df, c=tuple(cols):
                    df[[x for x in c if x in df.columns]],
                    batch_format="pandas")
            if "size" in query:
                # size without sort: a bounded but arbitrarily-ordered
                # page, exactly ES without an explicit sort (no _score
                # ranking in this engine)
                out = out.limit(int(query["size"]))
            return out
        return self._need_store().search(*filters, **kw)

    def sparql(self, query: str, triples: ray.data.Dataset, **kw):
        """SPARQL over a triple Dataset (the reference's forge.sparql,
        kgforge/core/forge.py:539-566, with the graph passed explicitly —
        this engine's stores hold records, not endpoint state). Dispatches
        on the query form: SELECT -> binding Dataset, CONSTRUCT -> triple
        Dataset (set semantics), ASK -> bool. Patterns compile to
        vectorized filters + bucketed joins (`kg.bgp`). A Dataset with a
        `graph` column is an RDF dataset (quads): SELECT queries — GRAPH
        blocks included — route to the quad engine (`kg.graphs`); updates
        route to `kg.update.sparql_update` (triple tables) or
        `kg.update.sparql_update_quads` (quad tables: CLEAR/DROP GRAPH,
        ADD/COPY/MOVE ... TO ..., WITH <g> DELETE/INSERT ... WHERE)."""
        import re as _re

        from nexus_forge_ray.kg.bgp import (sparql_ask, sparql_construct,
                                            sparql_describe, sparql_select,
                                            split_prefixes)
        is_quads = "graph" in triples.schema().names
        # the keyword alone is not enough (a ?delete VARIABLE must not
        # dispatch): update forms are always a bare INSERT/DELETE keyword
        # (lookbehind: not ?delete, not pfx:delete) followed by DATA /
        # WHERE / a template brace; the graph-management forms
        # (CLEAR/DROP/ADD/COPY/MOVE/WITH) are leading keywords after the
        # PREFIX header. IRIs and both literal quote forms are stripped
        # before any keyword scan.
        strip_terms = r"<[^>]*>|\"[^\"]*\"|'[^']*'"
        stripped = _re.sub(strip_terms, " ", query)
        is_update = bool(_re.search(
            r"(?is)(?<![?\w:])(insert|delete)\s*(data\b|where\b|\{)",
            stripped))
        if is_quads:
            _, body, _ = split_prefixes(query)
            if is_update or _re.match(
                    r"(?is)^\s*(clear|drop|add|copy|move|with)\b", body):
                from nexus_forge_ray.kg.update import sparql_update_quads
                return sparql_update_quads(triples, query, **kw)
            # keyword scan over the body with IRIs/literals stripped; the
            # lookbehind keeps ?graph / ?from VARIABLES (and pfx:graph
            # local names) from tripping the dispatch
            if _re.search(r"(?is)(?<![?\w:])(graph|from)\b",
                          _re.sub(strip_terms, " ", body)):
                from nexus_forge_ray.kg.graphs import sparql_select_quads
                return sparql_select_quads(triples, query, **kw)
            # GRAPH-free, FROM-free query over an RDF dataset: it only
            # touches the default graph (set-semantic union of the named
            # graphs) — project that view once and run the FULL triple
            # engine (FILTER / OPTIONAL / paths / aggregates / CONSTRUCT)
            from nexus_forge_ray.kg.graphs import default_graph_view
            triples = default_graph_view(triples)
        if is_update:
            from nexus_forge_ray.kg.update import sparql_update
            return sparql_update(triples, query, **kw)
        # strip IRIs and PREFIX declarations first: an IRI like
        # <http://ex/ask#> or a prefix NAMED 'ask' must not decide the
        # dispatch (declarations can share a line, so no ^ anchor)
        head = _re.sub(r"<[^>]*>", " ", query)
        head = _re.sub(r"(?is)\bprefix\s+\w*:\s*", " ", head)
        form = _re.search(r"(?is)\b(select|construct|ask|describe)\b", head)
        if form is None:
            raise ValueError("need a SELECT / CONSTRUCT / ASK / DESCRIBE "
                             "query")
        fn = {"select": sparql_select, "construct": sparql_construct,
              "ask": sparql_ask,
              "describe": sparql_describe}[form.group(1).lower()]
        return fn(triples, query, **kw)

    # ------------------------------------------------------------------ files

    def attach(self, path: str, content_type: str | None = None):
        if self._files is None:
            raise ValueError("no store configured")
        return self._files.upload(path, content_type)

    def download(self, data, follow: str = "distribution.contentUrl",
                 path: str = ".", **kw):
        if self._files is None:
            raise ValueError("no store configured")
        return self._files.download(data, follow, path, **kw)

    # ----------------------------------------------------------------- codecs

    def as_json(self, record: dict) -> dict:
        return {k: v for k, v in record.items() if not k.startswith("_")}

    def as_jsonld(self, record: dict, form: str = "compacted") -> dict:
        return conv.as_jsonld(record, self.context, form)

    def from_json(self, data, na=None):
        """JSON dict(s) -> record(s), dropping `na` sentinel values — the
        reference's from_json (forge.py:914-925) without its Resource
        wrapper (records ARE dicts here)."""
        def one(d: dict) -> dict:
            return {k: v for k, v in d.items()
                    if not (na is not None and v == na)}
        return [one(d) for d in data] if isinstance(data, list) \
            else one(data)

    def from_jsonld(self, doc: dict) -> dict:
        return conv.from_jsonld(doc)

    def jsonld_expand(self, doc: dict, context=None) -> list:
        """Full JSON-LD 1.1 expansion (the reference's pyld jsonld.expand,
        rdf.py:428-487) against the forge context (or an explicit one):
        @base/@vocab/curies/containers/@reverse/scoped contexts all apply.
        String contexts resolve offline via the configured resolver."""
        from nexus_forge_ray.core import jsonld as ld
        raw = context if context is not None else self.context
        ctx = ld.Context.parse(raw, resolver=self._context_resolver)
        body = {k: v for k, v in doc.items() if k != "@context"}
        if "@context" in doc:
            ctx = ld.Context.parse(doc["@context"], parent=ctx)
        return ld.expand(body, ctx)

    def jsonld_compact(self, doc, context=None) -> dict:
        """Full JSON-LD 1.1 compaction (the reference's jsonld.compact with
        processingMode json-ld-1.1, rdf.py:128-138)."""
        from nexus_forge_ray.core import jsonld as ld
        raw = context if context is not None else self.context
        return ld.compact(doc, raw, resolver=self._context_resolver)

    def as_graph(self, data):
        """record dict/list -> (subj, pred, obj, obj_is_iri, obj_datatype)
        triples; Dataset -> triple Dataset (the reference's as_graph,
        forge.py:865-882, rdflib replaced by the flat triple table)."""
        from nexus_forge_ray.kg.triples import explode_dataset, explode_record
        if isinstance(data, ray.data.Dataset):
            return explode_dataset(data, context=self.context)
        rows = data if isinstance(data, list) else [data]
        out: list[tuple] = []
        for r in rows:
            out.extend(explode_record(r, self.context))
        return out

    def from_graph(self, triples, types: list[str] | None = None):
        """Inverse of as_graph — JSON-LD framing by type + compaction
        (the reference's from_graph, rdf.py:100-140). A Dataset returns the
        assembled (subj, record) Dataset; a triple list returns records."""
        from nexus_forge_ray.kg.triples import assemble_resources
        if isinstance(triples, ray.data.Dataset):
            return assemble_resources(triples, context=self.context,
                                      types=types)
        df = pd.DataFrame(triples, columns=["subj", "pred", "obj",
                                            "obj_is_iri", "obj_datatype"])
        out = assemble_resources(ray.data.from_pandas(df),
                                 context=self.context, types=types) \
            .to_pandas()
        if "record" not in out.columns:     # nothing survived the frame
            return []
        return sorted(out["record"], key=lambda r: str(r.get("id")))

    def as_dataframe(self, records: list[dict], na=None) -> pd.DataFrame:
        return conv.records_to_dataframe(records, na)

    def from_dataframe(self, df: pd.DataFrame, na=None) -> list[dict]:
        return conv.dataframe_to_records(df, na)
