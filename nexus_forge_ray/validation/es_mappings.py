"""Elasticsearch mapping generation from Shape specs.

The reference's ES query path resolves every filter against an ES mapping
whose field types were derived from the SHACL schema backing each type:
keyword-searchable strings carry a `keyword` (sub)field, nested typed
resources become `nested`, embeddings become `dense_vector`, and the
query builder picks term-vs-match by probing for a keyword path
(kgforge/core/commons/es_query_builder.py:29-180 `resolve_nested` /
`_build_keyword_path` / `_detect_mapping_type`). This module produces
that mapping FROM the repo's Shape specs so the same resolution works
against the in-repo ES DSL surface (core/filters.py).

Type derivation (constraint -> ES field):
- sh:in (enum) / sh:datatype anyURI / sh:nodeKind IRI  -> keyword
- sh:datatype string                -> text + fields.keyword (ignore_above
                                       256 — the ES dynamic-mapping default
                                       the reference relies on)
- integer/long/int                  -> long
- float/double/decimal              -> double (ES default float family)
- boolean                           -> boolean
- date/dateTime/time                -> date
- sh:node (nested shape)            -> nested + recursive properties
- sh:class only (IRI reference)     -> object with id/type keywords
- sh:or / sh:xone / sh:and          -> first alternative that yields a
                                       concrete type (reference collectors
                                       emit the first constraint's type)
- vector_dims[path] declared        -> dense_vector with dims
- no typing constraint at all       -> text + keyword (dynamic default)

`id` and `type` meta-fields lead every mapping as keywords (the
reference's store metadata contract).
"""

from __future__ import annotations

from nexus_forge_ray.validation.shapes import PropertyConstraint, Shape

_NUM_LONG = {"integer", "int", "long", "short", "byte", "positiveInteger",
             "nonNegativeInteger", "negativeInteger", "nonPositiveInteger",
             "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte"}
_NUM_DOUBLE = {"float", "double", "decimal"}
_DATE = {"date", "dateTime", "time"}

def _text_keyword() -> dict:
    # built fresh per call: generated mappings are plain mutable dicts and
    # must not alias each other (or a module constant) through 'fields'
    return {"type": "text",
            "fields": {"keyword": {"type": "keyword",
                                   "ignore_above": 256}}}


def _field_for(c: PropertyConstraint, by_type: dict[str, Shape],
               vector_dims: dict[str, int], path: str,
               depth: int) -> dict | None:
    """ES field spec for one constraint, or None if it contributes no
    typing signal (e.g. bare pattern/minCount)."""
    if path in vector_dims:
        return {"type": "dense_vector", "dims": int(vector_dims[path])}
    if c.node_shape is not None:
        props = _properties(c.node_shape, by_type, vector_dims, depth + 1)
        return {"type": "nested", "properties": props}
    if c.class_type is not None:
        return {"type": "object",
                "properties": {"id": {"type": "keyword"},
                               "type": {"type": "keyword"}}}
    if c.in_values is not None or c.node_kind == "IRI":
        return {"type": "keyword"}
    dt = c.datatype
    if dt is not None:
        if dt in ("string", "normalizedString"):
            return _text_keyword()
        if dt == "anyURI":
            return {"type": "keyword"}
        if dt in _NUM_LONG:
            return {"type": "long"}
        if dt in _NUM_DOUBLE:
            return {"type": "double"}
        if dt == "boolean":
            return {"type": "boolean"}
        if dt in _DATE:
            return {"type": "date"}
    # numeric range constraints without a datatype imply a number
    if c.min_inclusive is not None or c.max_inclusive is not None \
            or c.min_exclusive is not None or c.max_exclusive is not None:
        return {"type": "double"}
    for alts in (c.all_of, c.any_of, c.one_of):
        if alts:
            for alt in alts:
                f = _field_for(alt, by_type, vector_dims,
                               alt.path or path, depth)
                if f is not None:
                    return f
    return None


def _properties(shape: Shape, by_type: dict[str, Shape],
                vector_dims: dict[str, int], depth: int = 0) -> dict:
    if depth > 8:
        raise ValueError("shape nesting too deep (cyclic sh:node?)")
    props: dict = {}
    concrete: set[str] = set()
    for c in shape.constraints:
        if not c.path:
            continue
        f = _field_for(c, by_type, vector_dims, c.path, depth)
        # several constraints may target one path (e.g. datatype + pattern);
        # the FIRST concrete typing signal wins, and a signal-free
        # constraint never clobbers a derived type with the text fallback
        if f is not None and c.path not in concrete:
            props[c.path] = f
            concrete.add(c.path)
        elif c.path not in props:
            props[c.path] = _text_keyword()
    return props


def es_mapping(shapes: list[Shape], type: str, *,
               vector_dims: dict[str, int] | None = None,
               dynamic: bool = False) -> dict:
    """Build the ES index mapping for `type` from its Shape."""
    by_type = {s.target_type: s for s in shapes}
    if type not in by_type:
        raise ValueError(f"'{type}' is not a managed type; managed: "
                         f"{sorted(by_type)}")
    props = {"id": {"type": "keyword"}, "type": {"type": "keyword"}}
    props.update(_properties(by_type[type], by_type, vector_dims or {}))
    return {"dynamic": dynamic, "properties": props}


def keyword_path(mapping: dict, path: str) -> str | None:
    """Resolve the exact-match (term/terms) path for a dotted field, the
    repo twin of the reference's `_build_keyword_path`: a keyword field
    is itself; a text field with a keyword subfield appends it; anything
    else (bare text, numbers match directly) returns the sensible target.

    Returns None when the path does not exist and the mapping is not
    dynamic (the reference raises in that case — callers decide)."""
    parts = path.split(".")
    node = mapping
    for i, p in enumerate(parts):
        props = node.get("properties", {})
        if p not in props:
            return path if mapping.get("dynamic") else None
        node = props[p]
    t = node.get("type")
    if t == "keyword":
        return path
    if t == "text":
        for sub, spec in node.get("fields", {}).items():
            if spec.get("type") == "keyword":
                return f"{path}.{sub}"
        return None              # analyzed text: match query, no term path
    return path                  # numeric/date/boolean: term works directly
