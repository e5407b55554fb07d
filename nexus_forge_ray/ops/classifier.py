"""Distributed training of a linear quality classifier (logistic regression).

Model-based quality filtering is the step after heuristic gates in a
training-data pipeline (score every document with a small linear/fasttext
model, keep the top mass). The reference has no trainable stage — its
EntityLinkerSkLearn loads a PRE-trained pickled model
(/root/reference/kgentitylinkingsklearn/entitylinkersklearnmodel.py) — so
this supplies the missing train side with the same scale shape as
`ops/clustering`:

- the corpus NEVER shuffles: each full-batch gradient-descent iteration is
  one streaming `map_batches` pass emitting a single (d+1)-float partial
  gradient row per batch (X^T (sigmoid(Xw) - y) plus the row count);
- the weight vector is the only broadcast state (`ray.put` once per
  iteration, read zero-copy by every task);
- the driver reduce sums n_blocks tiny rows and takes one dense step —
  kilobytes of driver traffic at any corpus size;
- scoring is a final streaming pass appending a `score` column.

Deterministic for a fixed input (float64, fixed init w=0, fixed feature
order), which makes a small fixed iteration count SQL-oracle-checkable by
unrolling the weight updates into CTEs (w0=0 makes step 0 closed-form:
sigmoid(0)=0.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def _design(batch: pd.DataFrame, feature_cols: list[str]) -> np.ndarray:
    """Bias-augmented float64 design matrix [1 | features]."""
    n = len(batch)
    x = np.ones((n, len(feature_cols) + 1), dtype=np.float64)
    for j, c in enumerate(feature_cols):
        x[:, j + 1] = pd.to_numeric(batch[c], errors="coerce") \
            .fillna(0.0).to_numpy(dtype=np.float64)
    return x


def logreg_train(ds: ray.data.Dataset, feature_cols: list[str],
                 label_col: str, *, lr: float = 1.0,
                 iters: int = 2) -> np.ndarray:
    """Full-batch gradient descent; returns weights [bias, w_1..w_d].

    Each iteration: w <- w - lr * (1/N) X^T (sigmoid(Xw) - y), computed
    from per-batch partial sums. `ds` is materialized once and re-read per
    iteration (iterative consumers of a lazy pipeline would re-execute the
    upstream transforms every pass)."""
    ds = ds.materialize()
    d = len(feature_cols) + 1
    w = np.zeros(d, dtype=np.float64)

    for _ in range(iters):
        w_ref = ray.put(w)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            wt = ray.get(w_ref)
            x = _design(batch, feature_cols)
            y = pd.to_numeric(batch[label_col], errors="coerce") \
                .fillna(0.0).to_numpy(dtype=np.float64)
            resid = _sigmoid(x @ wt) - y
            g = x.T @ resid
            return pd.DataFrame({"g": [g], "n": [np.int64(len(batch))]})

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        if parts.empty or "n" not in parts.columns:
            return w
        n = int(parts["n"].sum())
        if n == 0:
            return w
        grad = np.sum(np.stack(parts["g"].to_numpy()), axis=0) / n
        w = w - lr * grad
    return w


def logreg_score(ds: ray.data.Dataset, weights: np.ndarray,
                 feature_cols: list[str], *, out: str = "score",
                 ndigits: int | None = 4) -> ray.data.Dataset:
    """Append sigmoid(x·w) to every row — one broadcast, one streaming pass."""
    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc
        wt = ray.get(w_ref)
        s = _sigmoid(_design(batch, feature_cols) @ wt)
        batch = batch.copy()
        if ndigits is not None:
            # half-away rounding to match SQL ROUND (np.round is banker's —
            # exact 4-decimal ties like 29/32 = 0.90625 would diverge)
            s = pc.round(pa.array(s, type=pa.float64()), ndigits=ndigits,
                         round_mode="half_towards_infinity") \
                .to_numpy(zero_copy_only=False)
        batch[out] = s
        return batch

    return ds.map_batches(score, batch_format="pandas")
