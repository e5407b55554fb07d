"""Shared vectorized helpers: stable hashing, arrow/numpy conversions."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# Mersenne prime for universal hashing (MinHash permutations).
MERSENNE_61 = (1 << 61) - 1


def stable_hash_u64(values: pd.Series | np.ndarray | list) -> np.ndarray:
    """Deterministic 64-bit hash per element, stable across processes/nodes.

    pandas' hash_pandas_object is SipHash-1-3 with a fixed default key —
    deterministic for a given pandas version, vectorized in C.
    """
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def md5_hex(values) -> np.ndarray:
    """Per-row md5 hexdigest of utf-8 encoded strings (fingerprinting)."""
    return np.array(
        [hashlib.md5(v.encode("utf-8")).hexdigest() if v is not None else None
         for v in values],
        dtype=object,
    )


def md5_u64(values) -> np.ndarray:
    """64-bit hash per element, reproducible in SQL: equals DuckDB's
    ``md5_number_lower`` (little-endian low 8 bytes of the md5 digest).

    Slower than `stable_hash_u64` (one hashlib call per UNIQUE value, so
    cost is bounded by batch vocabulary) — use for auditable or
    cross-engine-reproducible fingerprints; SipHash stays the scale default.
    """
    arr = (values.to_numpy(dtype=object) if isinstance(values, pd.Series)
           else np.asarray(values, dtype=object))
    if len(arr) == 0:
        return np.array([], dtype=np.uint64)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(t).encode("utf-8")).digest()[8:],
                        "little") for t in uniq),
        dtype=np.uint64, count=len(uniq))
    return h[inv]


def list_column_to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Zero-copy-ish conversion of a fixed-width list<float> column to (n, d) ndarray."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):  # e.g. Ray's ArrowTensorType
        arr = col.to_numpy(zero_copy_only=False)
        return np.stack(arr) if arr.dtype == object else np.asarray(arr)
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        off = col.offset * d  # sliced arrays don't start at 0
        return vals[off: off + len(col) * d].reshape(len(col), d)
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        offsets = col.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) == 0:
            return np.empty((0, 0), dtype=np.float32)
        d = int(widths[0])
        if not np.all(widths == d):
            raise ValueError("ragged list column; expected fixed-width embeddings")
        values = col.values.to_numpy(zero_copy_only=False)
        # offsets may not start at 0 when the array is sliced
        return values[offsets[0]: offsets[-1]].reshape(-1, d)
    raise TypeError(f"expected list array, got {type(col)}")


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
