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
- hasValue                 (sh:hasValue, HasValueCollector at
                            rdf/collectors.py:81-96: the property MUST carry
                            the given value — absence is a violation)
- nodeKind                 (sh:nodeKind, NodeKindCollector at
                            rdf/collectors.py:134-153: IRI / Literal /
                            BlankNodeOrIRI value-kind check)
- and / or / xone          (sh:and/sh:or/sh:xone, And/Or/XoneCollector at
                            rdf/collectors.py:286-418: the value must satisfy
                            all / at least one / exactly one of the
                            alternative constraint lists; alternatives are
                            PropertyConstraints sharing the parent's path
                            unless they set their own)
- not                      (sh:not, NotCollector at rdf/collectors.py: the
                            value must NOT satisfy the wrapped constraint)
- minLength / maxLength    (sh:minLength/sh:maxLength over string value nodes)
- minExclusive/maxExclusive(strict numeric range, SHACL core 4.4.2/4.4.4)
- qualifiedValueShape      (sh:qualifiedValueShape + qualifiedMin/MaxCount,
                            SHACL core 4.5.2-3: the COUNT of value nodes
                            conforming to the qualified shape must fall in
                            the given range)
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

# IRI = string with a URI scheme (http://…, urn:…); matches the reference's
# node-kind split where resources are IRI-identified and raw scalars are
# literals (rdf/collectors.py:134-153)
_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _node_kind_of(v) -> str:
    """Classify a value as IRI / BlankNode / Literal for sh:nodeKind. A dict
    (nested node) with an IRI id is an IRI reference; an id-less dict is a
    blank node; scheme-shaped strings are IRIs; everything else a literal."""
    if isinstance(v, dict):
        vid = v.get("id", v.get("@id"))
        if isinstance(vid, str) and _IRI_RE.match(vid):
            return "IRI"
        return "BlankNode"
    if isinstance(v, str) and _IRI_RE.match(v):
        return "IRI"
    return "Literal"


@dataclass
class PropertyConstraint:
    path: str = ""                 # column (dots for nested-flattened fields);
    #                                empty only inside logical alternatives
    #                                (inherits the parent constraint's path)
    min_count: int = 0
    max_count: int | None = None
    datatype: str | None = None    # xsd local name: string/integer/float/boolean/dateTime/anyURI
    in_values: list | None = None
    pattern: str | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None
    min_exclusive: float | None = None   # sh:minExclusive (strict range)
    max_exclusive: float | None = None   # sh:maxExclusive
    min_length: int | None = None        # sh:minLength (string value nodes)
    max_length: int | None = None        # sh:maxLength
    class_type: str | None = None  # sh:class — nested node's type must match
    node_shape: "Shape | None" = None  # sh:node — nested shape conformance
    has_value: Any = None          # sh:hasValue — value must be present+equal
    node_kind: str | None = None   # sh:nodeKind — IRI/Literal/BlankNodeOrIRI
    # logical collectors: alternatives are PropertyConstraints; an empty
    # alternative path inherits this constraint's path
    all_of: "list[PropertyConstraint] | None" = None   # sh:and
    any_of: "list[PropertyConstraint] | None" = None   # sh:or
    one_of: "list[PropertyConstraint] | None" = None   # sh:xone
    not_of: "PropertyConstraint | None" = None         # sh:not
    # sh:qualifiedValueShape + sh:qualifiedMin/MaxCount (SHACL core 4.5.2-3):
    # count the value nodes (list members; a scalar is a 1-member list)
    # conforming to the qualified constraint, and require the count in
    # [qualified_min, qualified_max]. Unlike plain constraints these are NOT
    # vacuous on absent values: qualified_min > 0 over a missing property
    # violates (0 conforming nodes), mirroring sh:minCount.
    qualified: "PropertyConstraint | None" = None
    qualified_min: int | None = None
    qualified_max: int | None = None
    # property-pair constraints (SHACL core 4.3.1-4.3.4): compare this
    # path's value against ANOTHER path's value on the same focus row
    equals: str | None = None        # sh:equals — values must be equal
    disjoint: str | None = None      # sh:disjoint — values must differ
    less_than: str | None = None     # sh:lessThan — strictly smaller
    less_than_or_equals: str | None = None   # sh:lessThanOrEquals
    # language constraints (SHACL core 4.2.4-4.2.5) over language-tagged
    # literals ({"@value": ..., "@language": tag} dicts or lists of them)
    language_in: list[str] | None = None     # sh:languageIn
    unique_lang: bool = False                # sh:uniqueLang

    def _alt_matrix(self, df: pd.DataFrame,
                    alts: "list[PropertyConstraint]") -> np.ndarray:
        """(n_alts, n_rows) bool matrix: row i = alternative i's ok mask
        (vacuously true where the value is absent — callers gate on
        presence)."""
        from dataclasses import replace
        rows = []
        for alt in alts:
            sub = alt if alt.path else replace(alt, path=self.path)
            ok, _ = sub.check(df)
            rows.append(ok)
        return np.vstack(rows)

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
        if self.min_exclusive is not None or self.max_exclusive is not None:
            vals = pd.to_numeric(col, errors="coerce")
            ok_r = np.ones(n, dtype=bool)
            if self.min_exclusive is not None:
                ok_r &= (~present) | (vals > self.min_exclusive).to_numpy()
            if self.max_exclusive is not None:
                ok_r &= (~present) | (vals < self.max_exclusive).to_numpy()
            apply(ok_r, f"MinMaxExclusiveConstraint: {self.path}")
        if (self.min_length is not None or self.max_length is not None) \
                and present.any():
            lo, hi = self.min_length, self.max_length
            if pd.api.types.is_string_dtype(col) and not any(
                    isinstance(v, (list, tuple, np.ndarray))
                    for v in col.iloc[:8]):
                lens = col.str.len()
                len_ok = np.ones(n, dtype=bool)
                if lo is not None:
                    len_ok &= (lens >= lo).fillna(True).to_numpy(dtype=bool)
                if hi is not None:
                    len_ok &= (lens <= hi).fillna(True).to_numpy(dtype=bool)
            else:
                # list-valued / mixed columns: every value node's string
                # form must satisfy the bounds (SHACL judges per value node)
                def _len_ok(v, lo=lo, hi=hi) -> bool:
                    items = v if isinstance(v, (list, tuple, np.ndarray)) \
                        else [v]
                    for item in items:
                        s = item if isinstance(item, str) else str(item)
                        if lo is not None and len(s) < lo:
                            return False
                        if hi is not None and len(s) > hi:
                            return False
                    return True
                len_ok = col.map(_len_ok).to_numpy(dtype=bool)
            label = ("MinLengthConstraint" if hi is None else
                     "MaxLengthConstraint" if lo is None else
                     "MinMaxLengthConstraint")
            apply(~present | len_ok, f"{label}: {self.path}")
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
        if self.has_value is not None:
            # sh:hasValue mandates the value be PRESENT and equal (or a
            # member, for list-valued properties) — absence violates
            hv = self.has_value
            eq = col.map(
                lambda v, hv=hv: hv in list(v)
                if isinstance(v, (list, tuple, np.ndarray)) else v == hv
            ).to_numpy(dtype=bool)
            apply(present & eq, f"HasValueConstraint: {self.path}")
        if self.node_kind is not None and present.any():
            kinds = col.map(_node_kind_of).to_numpy(dtype=object)
            if self.node_kind == "IRI":
                kind_ok = kinds == "IRI"
            elif self.node_kind == "Literal":
                kind_ok = kinds == "Literal"
            elif self.node_kind == "BlankNodeOrIRI":
                kind_ok = (kinds == "IRI") | (kinds == "BlankNode")
            elif self.node_kind == "BlankNode":
                kind_ok = kinds == "BlankNode"
            else:
                raise ValueError(f"unknown sh:nodeKind {self.node_kind!r}")
            apply(~present | kind_ok.astype(bool),
                  f"NodeKindConstraint: {self.path}")
        if self.all_of is not None and present.any():
            sat = self._alt_matrix(df, self.all_of).all(axis=0)
            apply(~present | sat, f"AndConstraint: {self.path}")
        if self.any_of is not None and present.any():
            sat = self._alt_matrix(df, self.any_of).any(axis=0)
            apply(~present | sat, f"OrConstraint: {self.path}")
        if self.equals or self.disjoint or self.less_than \
                or self.less_than_or_equals:
            for other, kind, label in (
                    (self.equals, "eq", "EqualsConstraint"),
                    (self.disjoint, "ne", "DisjointConstraint"),
                    (self.less_than, "lt", "LessThanConstraint"),
                    (self.less_than_or_equals, "le",
                     "LessThanOrEqualsConstraint")):
                if not other:
                    continue
                oth = df[other] if other in df.columns \
                    else pd.Series([None] * n, index=df.index)
                both = present & oth.notna().to_numpy()
                # numeric compare where both sides coerce, lexical otherwise
                ln = pd.to_numeric(col, errors="coerce")
                rn = pd.to_numeric(oth, errors="coerce")
                numeric = ln.notna().to_numpy() & rn.notna().to_numpy()
                cmp = np.zeros(n, dtype=bool)
                if kind == "eq":
                    cmp[numeric] = (ln[numeric] == rn[numeric]).to_numpy()
                    nl = ~numeric
                    cmp[nl] = (col[nl].astype(str)
                               == oth[nl].astype(str)).to_numpy()
                elif kind == "ne":
                    cmp[numeric] = (ln[numeric] != rn[numeric]).to_numpy()
                    nl = ~numeric
                    cmp[nl] = (col[nl].astype(str)
                               != oth[nl].astype(str)).to_numpy()
                elif kind == "lt":
                    cmp[numeric] = (ln[numeric] < rn[numeric]).to_numpy()
                    nl = ~numeric
                    cmp[nl] = (col[nl].astype(str)
                               < oth[nl].astype(str)).to_numpy()
                else:
                    cmp[numeric] = (ln[numeric] <= rn[numeric]).to_numpy()
                    nl = ~numeric
                    cmp[nl] = (col[nl].astype(str)
                               <= oth[nl].astype(str)).to_numpy()
                # pair constraints only judge rows where BOTH values exist;
                # sh:lessThan on an absent other-side value is a violation
                # (the comparison cannot be proven), matching pySHACL
                apply(~present | (both & cmp),
                      f"{label}: {self.path}")
        if self.language_in is not None and present.any():
            allowed = set(self.language_in)

            def lang_ok(v, allowed=allowed) -> bool:
                vals = v if isinstance(v, (list, tuple, np.ndarray)) else [v]
                for item in vals:
                    tag = item.get("@language") if isinstance(item, dict) \
                        else None
                    if tag not in allowed:
                        return False
                return True
            apply(~present | col.map(lang_ok).to_numpy(dtype=bool),
                  f"LanguageInConstraint: {self.path}")
        if self.unique_lang and present.any():
            def uniq_ok(v) -> bool:
                vals = v if isinstance(v, (list, tuple, np.ndarray)) else [v]
                tags = [item.get("@language") for item in vals
                        if isinstance(item, dict)
                        and item.get("@language") is not None]
                return len(tags) == len(set(tags))
            apply(~present | col.map(uniq_ok).to_numpy(dtype=bool),
                  f"UniqueLangConstraint: {self.path}")
        if self.one_of is not None and present.any():
            # sh:xone: EXACTLY one alternative satisfied (alternatives are
            # vacuously true on absent values, hence the presence gate)
            sat = self._alt_matrix(df, self.one_of).sum(axis=0) == 1
            apply(~present | sat, f"XoneConstraint: {self.path}")
        if self.not_of is not None and present.any():
            # sh:not (NotCollector semantics): the value must NOT conform
            sat = self._alt_matrix(df, [self.not_of])[0]
            apply(~present | ~sat, f"NotConstraint: {self.path}")
        if self.qualified is not None:
            from dataclasses import replace
            sub = self.qualified if self.qualified.path \
                else replace(self.qualified, path=self.path)
            members = col.map(
                lambda v: list(v) if isinstance(v, (list, tuple, np.ndarray))
                else [] if v is None else [v])
            lens = members.map(len).to_numpy(dtype=np.int64)
            counts = np.zeros(n, dtype=np.int64)
            if lens.sum():
                flat = pd.DataFrame(
                    {sub.path: [m for row in members for m in row]})
                okm, _ = sub.check(flat)
                counts = np.bincount(np.repeat(np.arange(n), lens),
                                     weights=okm.astype(np.float64),
                                     minlength=n).astype(np.int64)
            q_ok = np.ones(n, dtype=bool)
            if self.qualified_min is not None:
                q_ok &= counts >= self.qualified_min
            if self.qualified_max is not None:
                q_ok &= counts <= self.qualified_max
            apply(q_ok, f"QualifiedValueShapeConstraint: {self.path}")
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
    """A target-typed shape: applies to rows whose `type_col` == target_type.

    closed=True (sh:closed, SHACL core 4.8.1): a focus row may only carry
    values under the declared constraint paths plus `ignored_properties`
    (sh:ignoredProperties) — any other non-null column is a violation."""
    target_type: str
    constraints: list[PropertyConstraint] = field(default_factory=list)
    closed: bool = False
    ignored_properties: list[str] = field(default_factory=list)


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
            if shape.closed:
                allowed = ({c.path for c in shape.constraints}
                           | set(shape.ignored_properties)
                           | {self.type_col, "id", "@id"})
                for extra in [c for c in sub.columns if c not in allowed]:
                    colv = sub[extra]
                    bad = colv.notna().to_numpy()
                    if colv.dtype == object:
                        bad &= ~(colv.astype(str) == "").to_numpy()
                    newly_bad = sub_valid & bad
                    sub_viol[newly_bad] = f"ClosedConstraint: {extra}"
                    sub_valid &= ~bad
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


def sparql_constraint_report(triples, constraints, **kw):
    """SHACL-SPARQL constraints (SHACL spec §5, sh:sparql; the reference
    validates through pySHACL which supports them,
    /root/reference/kgforge/specializations/models/rdf/service.py): each
    constraint is (component, message, SELECT query) whose solutions ARE
    the violations — the spec's $this focus variable is written ?this.
    Returns one row per violation: (focus, component, message).

    Pure composition: every constraint query runs through the full
    distributed SPARQL surface (joins, FILTER, NOT EXISTS, paths...) over
    the shared materialized triple set; per-constraint results union.
    The report is one row per violation, so it stays a Dataset end-to-end
    — no driver collection."""
    from nexus_forge_ray.kg.bgp import parse_sparql, sparql_select

    triples = triples.materialize()   # scanned once per constraint query
    outs: list[ray.data.Dataset] = []
    for component, message, q in constraints:
        focus = parse_sparql(q).select[0].lstrip("?")
        sel = sparql_select(triples, q, **kw)
        outs.append(sel.map_batches(
            lambda df, c=component, m=message, fv=focus: pd.DataFrame({
                "focus": df[fv].astype(str),
                "component": c, "message": m}),
            batch_format="pandas"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
