"""PathsWrapper — schema-navigation filter building
(kgforge/core/wrappings/paths.py:55-105): `p = wrap_paths(template);
p.address.city == "X"` yields a Filter with path ["address", "city"].

Comparison operators on a wrapped path PRODUCE Filter objects (they do not
compare) — the reference's exact trick, composing with
`nexus_forge_ray.core.filters.search`.
"""

from __future__ import annotations

from typing import Any

from nexus_forge_ray.core.filters import Filter

_RESERVED = {"_path"}


class FilterMixin:
    def __init__(self, path: list[str]) -> None:
        self._path = list(path)

    def _for(self, op: str, other: Any) -> Filter:
        return Filter(tuple(self._path), op, other)

    def __lt__(self, other):
        return self._for("__lt__", other)

    def __le__(self, other):
        return self._for("__le__", other)

    def __eq__(self, other):  # noqa: A003 — intentionally returns a Filter
        return self._for("__eq__", other)

    def __ne__(self, other):
        return self._for("__ne__", other)

    def __gt__(self, other):
        return self._for("__gt__", other)

    def __ge__(self, other):
        return self._for("__ge__", other)

    __hash__ = None  # mirror reference: wrapped paths are not hashable


class PathWrapper(FilterMixin):
    pass


class PathsWrapper(FilterMixin):
    def __init__(self, path: list[str], paths: dict) -> None:
        bad = _RESERVED & set(paths)
        if bad:
            raise ValueError(f"reserved attribute collision: {sorted(bad)}")
        super().__init__(path)
        self.__dict__.update(paths)


def wrap_paths(template: dict) -> PathsWrapper:
    """Template dict -> navigable path wrapper (paths.py:100-105)."""
    return _wrap(template, [])


def _wrap(data: Any, path: list[str]):
    if isinstance(data, dict):
        return PathsWrapper(path, {k: _wrap(v, path + [k])
                                   for k, v in data.items()})
    return PathWrapper(path)
