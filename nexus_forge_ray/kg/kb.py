"""Deterministic knowledge base over the synthetic corpus vocabulary.

Shape mirrors the reference's resolver targets (tests/data/demo-resolver/*.json:
id/type/label/acronym entries — FIXTURES.md F3). The labels are terms that
occur in the driver's `documents` table so mention detection has real hits.
"""

BASE_IRI = "http://example.org/entity/"
PRED_MENTIONS = "http://example.org/vocab/mentions"
PRED_LANG = "http://example.org/vocab/lang"
PRED_SOURCE = "http://example.org/vocab/source"
PRED_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DOC_TYPE_IRI = "http://example.org/vocab/Document"
DOC_BASE = "http://example.org/doc/"
GRAPH_BASE = "http://example.org/graph/"

KB_TERMS = ["spark", "table", "join", "sort", "merge", "filter",
            "window", "customer", "vector", "stream", "query", "hash"]

DEFAULT_KB = [
    {"id": f"{BASE_IRI}{t}", "type": "Class", "label": t, "acronym": t[:3].upper()}
    for t in KB_TERMS
]


# Ontology-shaped KB (ontology_resolver.py expected_fields): every class
# carries definition + subClassOf; labels are capitalized so the
# case-insensitive UNION match is actually exercised; notation/prefLabel/
# altLabel give the four resolve properties distinct values.
ONTOLOGY_KB = [
    {"id": f"{BASE_IRI}{t}", "type": "Class",
     "label": t.capitalize(),
     "notation": t[:3].upper(),
     "prefLabel": f"{t.capitalize()} Concept",
     "altLabel": t,
     "definition": f"definition of {t}",
     "subClassOf": f"{BASE_IRI}concept",
     "isDefinedBy": "http://example.org/ontology"}
    for t in KB_TERMS
]


def kb_aliases():
    """(kb, aliases) in the embedding linker's shape
    (entity_linking_sklearn_service.py:26-34): kb uid -> (label, definition);
    aliases [(alias, uid)] including acronyms."""
    kb = {e["id"]: (e["label"], f"definition of {e['label']}") for e in DEFAULT_KB}
    aliases = [(e["label"], e["id"]) for e in DEFAULT_KB]
    aliases += [(e["acronym"], e["id"]) for e in DEFAULT_KB]
    return kb, aliases
