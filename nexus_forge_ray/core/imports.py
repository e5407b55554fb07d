"""Dynamic archetype plug-in loading — import_class semantics
(kgforge/core/commons/imports.py:22-39 + forge.py:190-194): any class named
in a pipeline config is imported dynamically, with the reference's
`'SomeClass from package.module'` syntax and error wording.

Default module roots map the reference's `kgforge.specializations.{kind}` to
this package's module layout, so configs say e.g. `'DictionaryResolver'` with
kind='resolvers' or `'CustomStage from my_pkg.stages'`.
"""

from __future__ import annotations

import re
from importlib import import_module
from typing import Callable


class ConfigurationError(Exception):
    pass


DEFAULT_MODULES = {
    "models": "nexus_forge_ray.validation.shapes",
    "stores": "nexus_forge_ray.store.parquet_store",
    "resolvers": "nexus_forge_ray.resolving.dictionary",
    "mappers": "nexus_forge_ray.mapping.mapper",
    "mappings": "nexus_forge_ray.mapping.rules",
}

_SYNTAX = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)(?: from ([a-z_][a-z0-9_.]*))?$")


def import_class(configuration: str, kind: str) -> Callable:
    """'ClassName' or 'ClassName from package.module' -> the class object.

    `kind` selects the default module when none is given (the reference's
    forge_module_name, e.g. 'resolvers'). Errors mirror imports.py:33-39.
    """
    archetype = kind[:-1].capitalize() if kind.endswith("s") else \
        kind.capitalize()
    matched = _SYNTAX.match(configuration or "")
    if not matched:
        raise ConfigurationError(
            f"incorrect {archetype} configuration for '{configuration}'")
    default_module = DEFAULT_MODULES.get(kind, kind)
    class_name, module_import = matched.groups(default=default_module)
    try:
        module = import_module(module_import)
        return getattr(module, class_name)
    except ModuleNotFoundError as exc1:
        raise ConfigurationError(
            f"{archetype} module not found for '{configuration}'") from exc1
    except AttributeError as exc2:
        raise ConfigurationError(
            f"{archetype} class not found for '{configuration}'") from exc2
