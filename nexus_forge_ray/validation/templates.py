"""Model templates — forge.template / NodeProperties materialization
(kgforge/core/archetypes/model.py:99-117 + rdf_model.py DEFAULT_VALUE map at
:38-63; expected shapes in tests/specializations/models/data.py
ACTIVITY_TEMPLATE / BUILDING_TEMPLATE).

A template is the dict a user fills to create a resource of a type:
- 'id': "" and 'type': <compact type> always lead;
- each shape property gets a placeholder from its constraint:
  sh:in          -> first allowed value
  sh:datatype    -> DEFAULT_VALUE[xsd type] (dateTime -> 9999-12-31T00:00:00)
  sh:node        -> the referenced shape's template, nested (reference: each
                    nested typed resource has its template included)
  sh:class only  -> {"id": "", "type": <class>}
  otherwise      -> ""
- only_required keeps id/type plus minCount >= 1 properties
  (template(..., only_required=True), ACTIVITY_TEMPLATE_MANDATORY).
- unmanaged type -> ValueError (model.py policy).
"""

from __future__ import annotations

import datetime

from nexus_forge_ray.validation.shapes import Shape

DEFAULT_VALUE: dict[str, object] = {
    "string": "", "normalizedString": "", "anyURI": "",
    "float": 0.0, "double": 0.0,
    "decimal": 0, "int": 0, "integer": 0, "positiveInteger": 0,
    "negativeInteger": 0, "nonPositiveInteger": 0, "nonNegativeInteger": 0,
    "long": 0, "short": 0, "unsignedLong": 0, "unsignedInt": 0,
    "unsignedShort": 0, "byte": 0, "unsignedByte": 0, "base64Binary": 0,
    "boolean": False,
    "time": datetime.time().isoformat(),
    "date": datetime.date(9999, 12, 31).isoformat(),
    "dateTime": datetime.datetime(9999, 12, 31).isoformat(),
}


def template(shapes: list[Shape], type: str,
             only_required: bool = False) -> dict:
    """Materialize the creation template for `type` from its shape."""
    by_type = {s.target_type: s for s in shapes}
    if type not in by_type:
        raise ValueError(f"'{type}' is not a managed type; managed: "
                         f"{sorted(by_type)}")
    shape = by_type[type]
    out: dict = {"id": "", "type": type}
    props: dict = {}
    for c in shape.constraints:
        if only_required and c.min_count < 1:
            continue
        props[c.path] = _placeholder(c, shapes)
    out.update({k: props[k] for k in sorted(props)})
    return out


def _placeholder(c, shapes: list[Shape]):
    if c.in_values:
        return c.in_values[0]
    if c.node_shape is not None:
        return template(shapes + [c.node_shape], c.node_shape.target_type)
    if c.class_type is not None:
        return {"id": "", "type": c.class_type}
    if c.datatype is not None:
        return DEFAULT_VALUE.get(c.datatype, "")
    return ""
