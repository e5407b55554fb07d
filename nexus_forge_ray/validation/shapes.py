"""SHACL-style shape validation as vectorized column checks.

Reproduces the constraint kinds the reference's fixtures exercise
(SURVEY.md §2 T5, FIXTURES.md F4; collectors list at
kgforge/specializations/models/rdf/service.py:49-63):

- minCount / maxCount      (cardinality; missing/null column counts as 0)
- datatype                 (xsd string/integer/float/boolean/dateTime subset,
                            DEFAULT_VALUE map at rdf_model.py:38-63)
- in                       (sh:in enumeration)
- pattern                  (sh:pattern regex)
- minInclusive/maxInclusive(numeric range)
- class                    (sh:class, ClassCollector at rdf/collectors.py:177:
                            the value must be a node typed with the class)
- node                     (sh:node, NodeCollector at rdf/collectors.py:218:
                            the nested resource must conform to the referenced
                            shape — validated recursively, vectorized over the
                            nested frame)
- "no focus node" rule     (rdf/service.py:241-266): a row whose type has no
                            matching shape target fails validation.
- rdfs inference           (rdf_model.py validate(inference="rdfs"),
                            test_rdf_model.py:129-159: a Patient validates
                            against the Person shape iff Patient rdfs:subClassOf
                            Person and inference is enabled) — pass
                            `subclass_of` to ShapeValidator.

Execution: one `map_batches(batch_format="pandas")` pass; each constraint is a
vectorized mask; the first violated constraint per row becomes the `violation`
string (reference reports one reason, demo_model.py:165-170). Output columns:
`valid: bool`, `violation: string ('' when valid)`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import ray.data

_DATETIME_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?)?$")


@dataclass
class PropertyConstraint:
    path: str                      # column (dots for nested-flattened fields)
    min_count: int = 0
    max_count: int | None = None
    datatype: str | None = None    # xsd local name: string/integer/float/boolean/dateTime/anyURI
    in_values: list | None = None
    pattern: str | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None
    class_type: str | None = None  # sh:class — nested node's type must match
    node_shape: "Shape | None" = None  # sh:node — nested shape conformance

    def check(self, df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ok_mask, per-row violation labels '' where ok)."""
        n = len(df)
        if self.path not in df.columns:
            present = np.zeros(n, dtype=bool)
            col = pd.Series([None] * n)
        else:
            col = df[self.path]
            present = col.notna().to_numpy()
            if col.dtype == object:
                present &= ~(col.astype(str) == "").to_numpy()
        ok = np.ones(n, dtype=bool)
        labels = np.full(n, "", dtype=object)

        def apply(kind_ok: np.ndarray, label: str):
            nonlocal ok
            newly = ok & ~kind_ok
            labels[newly] = label
            ok &= kind_ok

        if self.min_count > 0:
            apply(present.copy(), f"MinCountConstraint: {self.path}")
        if self.datatype and present.any():
            apply(self._datatype_ok(col, present),
                  f"DatatypeConstraint: {self.path}")
        if self.in_values is not None and present.any():
            apply(~present | col.isin(self.in_values).to_numpy(),
                  f"InConstraint: {self.path}")
        if self.pattern and present.any():
            matched = col.astype(str).str.match(self.pattern).fillna(False).to_numpy()
            apply(~present | matched, f"PatternConstraint: {self.path}")
        if self.min_inclusive is not None or self.max_inclusive is not None:
            vals = pd.to_numeric(col, errors="coerce")
            ok_r = np.ones(n, dtype=bool)
            if self.min_inclusive is not None:
                ok_r &= (~present) | (vals >= self.min_inclusive).to_numpy()
            if self.max_inclusive is not None:
                ok_r &= (~present) | (vals <= self.max_inclusive).to_numpy()
            apply(ok_r, f"MinMaxInclusiveConstraint: {self.path}")
        if self.class_type is not None and present.any():
            apply(~present | col.map(self._class_ok).to_numpy(dtype=bool),
                  f"ClassConstraint: {self.path}")
        if self.node_shape is not None and present.any():
            sub_idx = np.flatnonzero(present)
            nested = pd.DataFrame(
                [v if isinstance(v, dict) else {} for v in col.iloc[sub_idx]])
            nested_ok = np.ones(len(sub_idx), dtype=bool)
            for c in self.node_shape.constraints:
                okn, _ = c.check(nested)
                nested_ok &= okn
            full = np.ones(n, dtype=bool)
            full[sub_idx] = nested_ok
            apply(full, f"NodeConstraint: {self.path}")
        return ok, labels

    def _class_ok(self, v) -> bool:
        """sh:class: the value node carries the class among its rdf types.
        A nested record exposes its type under 'type'/'@type' (possibly a
        list); plain IRI strings cannot prove their class -> fail (matches
        the reference, where an untyped value node violates sh:class)."""
        if isinstance(v, dict):
            t = v.get("type", v.get("@type"))
        else:
            t = None
        if isinstance(t, (list, tuple, np.ndarray)):
            return self.class_type in list(t)
        return t == self.class_type

    def _datatype_ok(self, col: pd.Series, present: np.ndarray) -> np.ndarray:
        dt = self.datatype
        if dt in ("string", "normalizedString", "anyURI"):
            checked = col.map(lambda v: isinstance(v, str)).to_numpy(dtype=bool)
        elif dt in ("integer", "int", "long", "short", "byte",
                    "nonNegativeInteger", "positiveInteger"):
            if pd.api.types.is_integer_dtype(col):
                checked = np.ones(len(col), dtype=bool)
            else:
                checked = col.map(
                    lambda v: isinstance(v, (int, np.integer))
                    and not isinstance(v, bool)).to_numpy(dtype=bool)
        elif dt in ("float", "double", "decimal"):
            if pd.api.types.is_float_dtype(col) or pd.api.types.is_integer_dtype(col):
                checked = np.ones(len(col), dtype=bool)
            else:
                checked = col.map(lambda v: isinstance(v, (int, float, np.number))
                                  and not isinstance(v, bool)).to_numpy(dtype=bool)
        elif dt == "boolean":
            if pd.api.types.is_bool_dtype(col):
                checked = np.ones(len(col), dtype=bool)
            else:
                checked = col.map(lambda v: isinstance(v, (bool, np.bool_))
                                  ).to_numpy(dtype=bool)
        elif dt in ("dateTime", "date", "time"):
            if pd.api.types.is_datetime64_any_dtype(col):
                checked = np.ones(len(col), dtype=bool)
            else:
                checked = col.astype(str).str.match(_DATETIME_RE).fillna(False)\
                    .to_numpy(dtype=bool)
        else:
            checked = np.ones(len(col), dtype=bool)
        return ~present | checked


@dataclass
class Shape:
    """A target-typed shape: applies to rows whose `type_col` == target_type."""
    target_type: str
    constraints: list[PropertyConstraint] = field(default_factory=list)


class ShapeValidator:
    """map_batches stage; shapes compiled once per actor.

    Rows whose type has no shape fail with 'NoShapeForType' (the reference's
    "no focus node => fail" rule, rdf/service.py:241-266).
    """

    def __init__(self, shapes: list[Shape], type_col: str = "type",
                 require_shape: bool = True,
                 subclass_of: dict[str, list[str]] | None = None):
        self.by_type = {s.target_type: s for s in shapes}
        self.type_col = type_col
        self.require_shape = require_shape
        # rdfs-inference closure: type -> transitive superclasses, so a
        # subclass row validates against its nearest ancestor's shape
        # (reference: validate(inference="rdfs"); None = inference off)
        self.ancestors: dict[str, list[str]] = {}
        if subclass_of:
            for t in subclass_of:
                seen: list[str] = []
                frontier = list(subclass_of.get(t, []))
                while frontier:
                    s = frontier.pop(0)
                    if s not in seen:
                        seen.append(s)
                        frontier.extend(subclass_of.get(s, []))
                self.ancestors[t] = seen

    def _shape_for(self, t):
        shape = self.by_type.get(t)
        if shape is None:
            for anc in self.ancestors.get(t, []):
                if anc in self.by_type:
                    return self.by_type[anc]
        return shape

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        valid = np.ones(n, dtype=bool)
        violation = np.full(n, "", dtype=object)
        types = batch[self.type_col] if self.type_col in batch.columns \
            else pd.Series([None] * n)
        for t, idx in batch.groupby(types, dropna=False).groups.items():
            mask = batch.index.isin(idx)
            shape = self._shape_for(t)
            if shape is None:
                if self.require_shape:
                    valid[mask] = False
                    violation[mask] = f"NoShapeForType: {t}"
                continue
            sub = batch.loc[mask]
            sub_valid = np.ones(len(sub), dtype=bool)
            sub_viol = np.full(len(sub), "", dtype=object)
            for c in shape.constraints:
                ok, labels = c.check(sub)
                newly_bad = sub_valid & ~ok
                sub_viol[newly_bad] = labels[newly_bad]
                sub_valid &= ok
            valid[mask] = sub_valid
            violation[mask] = sub_viol
        out = batch.copy()
        out["valid"] = valid
        out["violation"] = violation
        return out


def validate_dataset(ds: ray.data.Dataset, shapes: list[Shape], *,
                     type_col: str = "type", require_shape: bool = True,
                     subclass_of: dict[str, list[str]] | None = None,
                     concurrency: int | None = None) -> ray.data.Dataset:
    """Task mode by default (shape compilation is cheap); actor pool on demand."""
    kw = dict(shapes=shapes, type_col=type_col, require_shape=require_shape,
              subclass_of=subclass_of)
    if concurrency is None:
        return ds.map_batches(ShapeValidator(**kw), batch_format="pandas")
    return ds.map_batches(
        ShapeValidator, fn_constructor_kwargs=kw,
        batch_format="pandas", concurrency=concurrency,
    )
