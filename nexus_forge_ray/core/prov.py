"""PROV Dataset properties — the reference's Dataset resource specialization.

Reference semantics (kgforge/specializations/resources/datasets.py:27-205):
`add_parts/add_distribution/add_contribution/add_generation/add_derivation/
add_invalidation` append `{type, entity/agent/...}` reference structures to
list-valued PROV properties of a record; references use the (optionally
versioned) id of the target resource.
"""

from __future__ import annotations

from typing import Any


def _append(record: dict, prop: str, value: Any) -> dict:
    out = dict(record)
    cur = out.get(prop)
    if cur is None:
        out[prop] = [value]
    elif isinstance(cur, list):
        out[prop] = cur + [value]
    else:
        out[prop] = [cur, value]
    return out


def _ref(resource_id: str, versioned: bool = False,
         version: int | None = None) -> dict:
    rid = f"{resource_id}?_version={version}" if versioned and version else \
        resource_id
    return {"id": rid}


def add_parts(record: dict, part_ids: list[str]) -> dict:
    out = dict(record)
    out["hasPart"] = list(out.get("hasPart", [])) + [_ref(p) for p in part_ids]
    return out


def add_distribution(record: dict, content_url: str,
                     media_type: str = "application/octet-stream") -> dict:
    return _append(record, "distribution",
                   {"type": "DataDownload", "contentUrl": content_url,
                    "encodingFormat": media_type})


def add_contribution(record: dict, agent_id: str) -> dict:
    return _append(record, "contribution",
                   {"type": "Contribution", "agent": _ref(agent_id)})


def add_generation(record: dict, activity_id: str) -> dict:
    return _append(record, "generation",
                   {"type": "Generation", "activity": _ref(activity_id)})


def add_derivation(record: dict, entity_id: str, version: int | None = None,
                   ) -> dict:
    return _append(record, "derivation",
                   {"type": "Derivation",
                    "entity": _ref(entity_id, versioned=version is not None,
                                   version=version)})


def add_invalidation(record: dict, activity_id: str) -> dict:
    return _append(record, "invalidation",
                   {"type": "Invalidation", "activity": _ref(activity_id)})
