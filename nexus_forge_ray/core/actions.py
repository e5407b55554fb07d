"""Actions + LazyAction — per-record outcome reports and deferred effects.

Reference semantics:
- Action/Actions (kgforge/core/commons/actions.py:22-59): per-record
  (operation, succeeded, error) with a Counter-style summary.
- LazyAction (actions.py:62-92): a deferred callable embedded in a resource
  property, executed at register time (execution.py:169-173).
- execution.run harness (execution.py:112-191): bad record => recorded failed
  Action, not a failed job.

Engine form: `with_actions` wraps any per-record operation into a map_batches
stage emitting `operation/succeeded/error` columns; `resolve_lazy` executes
LazyAction leaves of a record tree (the register-time hook).
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
import ray.data


class LazyAction:
    """Deferred side-effect: held in a record property, executed on demand."""

    def __init__(self, fn: Callable, *args, **kwargs):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs

    def execute(self) -> Any:
        return self.fn(*self.args, **self.kwargs)

    def __repr__(self) -> str:
        return f"LazyAction({getattr(self.fn, '__name__', self.fn)})"


def resolve_lazy(node: Any) -> Any:
    """Recursively execute LazyAction leaves (register-time semantics)."""
    if isinstance(node, LazyAction):
        return node.execute()
    if isinstance(node, dict):
        return {k: resolve_lazy(v) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_lazy(v) for v in node]
    return node


def with_actions(ds: ray.data.Dataset, fn: Callable[[dict], dict],
                 operation: str) -> ray.data.Dataset:
    """Apply fn per record; failures become failed-Action rows, never job
    aborts (execution.py:148-191). Output rows: fn's output columns (empty on
    failure) + operation/succeeded/error."""
    def run(batch: pd.DataFrame) -> pd.DataFrame:
        outs, ok, err = [], [], []
        for rec in batch.to_dict("records"):
            try:
                outs.append(fn(rec))
                ok.append(True)
                err.append("")
            except Exception as exc:
                outs.append({})
                ok.append(False)
                err.append(f"{type(exc).__name__}: {exc}")
        frame = pd.DataFrame({"record": outs})
        frame["operation"] = operation
        frame["succeeded"] = ok
        frame["error"] = err
        return frame

    return ds.map_batches(run, batch_format="pandas")
