"""Schema directory loader with owl:imports closure.

Reference behavior reproduced (kgforge/specializations/models/rdf/
directory_service.py + service.py:430-496 `_transitive_load_resource_graph`):
- a directory of schema JSON files (shapes-1.json style: @id, owl:imports,
  shapes[] with targetClass + property constraints);
- resolving a schema loads its node shapes PLUS the transitive closure of its
  owl:imports (cycle-safe, each resource loaded once — the `_imported` cache);
- imported ontology resources contribute rdfs:subClassOf entries, feeding the
  validator's rdfs-inference shape lookup (service.py collects imported
  ontologies into a separate graph for inference);
- sh:node references across files resolve after the whole directory loads.

Terms are compacted to local names (as_term, rdf/utils.py): constraint paths
and datatypes keep only the part after ':'/'#'/'/'.
"""

from __future__ import annotations

import json
import os

from nexus_forge_ray.validation.shapes import PropertyConstraint, Shape


def as_term(value: str) -> str:
    """Local name of an IRI/CURIE (rdf/utils.py as_term)."""
    v = str(value)
    for sep in ("#", "/"):
        if sep in v:
            v = v.rsplit(sep, 1)[-1]
    if ":" in v and not v.startswith("http"):
        v = v.rsplit(":", 1)[-1]
    return v


def _constraint(spec: dict) -> PropertyConstraint:
    return PropertyConstraint(
        path=as_term(spec["path"]),
        min_count=int(spec.get("minCount", 0)),
        max_count=spec.get("maxCount"),
        datatype=as_term(spec["datatype"]) if spec.get("datatype") else None,
        in_values=spec.get("in"),
        pattern=spec.get("pattern"),
        min_inclusive=spec.get("minInclusive"),
        max_inclusive=spec.get("maxInclusive"),
        class_type=as_term(spec["class"]) if spec.get("class") else None,
        # sh:node holds a shape @id; resolved to the Shape after full load
        node_shape=spec.get("node"),
    )


class SchemaDirectory:
    """Parsed schema directory with import-closure resolution."""

    def __init__(self, dirpath: str):
        self.schemas: dict[str, dict] = {}
        self.shapes_by_id: dict[str, Shape] = {}
        self.subclass_of: dict[str, list[str]] = {}
        for fname in sorted(os.listdir(dirpath)):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(dirpath, fname)) as f:
                doc = json.load(f)
            sid = doc.get("@id", fname)
            imports = doc.get("owl:imports", [])
            if isinstance(imports, str):
                imports = [imports]
            shapes = []
            for sh in doc.get("shapes", []):
                target = sh.get("targetClass")
                shape = Shape(
                    target_type=as_term(target) if target else
                    as_term(sh.get("@id", "")),
                    constraints=[_constraint(p)
                                 for p in sh.get("property", [])])
                shapes.append(shape)
                if sh.get("@id"):
                    self.shapes_by_id[sh["@id"]] = shape
            for sub, sups in doc.get("subClassOf", {}).items():
                sups = sups if isinstance(sups, list) else [sups]
                self.subclass_of.setdefault(as_term(sub), []).extend(
                    as_term(s) for s in sups)
            self.schemas[sid] = {"imports": imports, "shapes": shapes}
        # resolve sh:node shape references now that every file is parsed
        for info in self.schemas.values():
            for shape in info["shapes"]:
                for c in shape.constraints:
                    if isinstance(c.node_shape, str):
                        ref = self.shapes_by_id.get(c.node_shape)
                        if ref is None:
                            raise ValueError(
                                f"sh:node references unknown shape "
                                f"{c.node_shape}")
                        c.node_shape = ref

    def shapes_for(self, schema_id: str) -> list[Shape]:
        """Shapes of the schema plus its transitive owl:imports closure
        (service.py:430-496; cycle-safe via the loaded set)."""
        if schema_id not in self.schemas:
            raise ValueError(f"unknown schema {schema_id}; known: "
                             f"{sorted(self.schemas)}")
        out: list[Shape] = []
        loaded: set[str] = set()
        frontier = [schema_id]
        while frontier:
            sid = frontier.pop(0)
            if sid in loaded:
                continue
            loaded.add(sid)
            info = self.schemas.get(sid)
            if info is None:
                raise ValueError(
                    f"Imported resource {sid} is not loaded as schema or "
                    f"ontology")  # service.py:477-480 wording
            out.extend(info["shapes"])
            frontier.extend(info["imports"])
        return out

    def all_shapes(self) -> list[Shape]:
        out = []
        for info in self.schemas.values():
            out.extend(info["shapes"])
        return out
