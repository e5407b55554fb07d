"""Mergeable distributed sketches (HyperLogLog approximate distinct count).

Exact COUNT(DISTINCT) at 100 TB needs a full shuffle of the key universe
(see `ops.agg.distinct_rows`); an HLL sketch replaces that with one fixed
4 KiB register vector per (batch, group) — the exchange volume is
O(batches x groups), independent of cardinality. Registers merge by
element-wise max, so the combine tree is associative and the result is
deterministic for a given input set (hash-based, order-independent).

Precision p=12 -> m=4096 registers -> ~1.6% standard error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.utils import stable_hash_u64

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _registers(values: pd.Series | np.ndarray) -> np.ndarray:
    """(m,) uint8 register vector for one value set — fully vectorized."""
    h = stable_hash_u64(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - P)) - 1)
    # rank = leading-zero count of the low 64-p bits, +1; w fits float64's
    # 53-bit mantissa exactly (64-12 = 52 bits), so log2 is exact
    lz = (64 - P) - np.floor(np.log2(w.astype(np.float64),
                                     where=w > 0,
                                     out=np.zeros(len(w)))).astype(np.int64) - 1
    rank = np.where(w == 0, 64 - P + 1, lz + 1).astype(np.uint8)
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    e = _ALPHA * M * M / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * M and zeros:  # small-range (linear counting) correction
        return M * np.log(M / zeros)
    return float(e)


def approx_distinct(ds: ray.data.Dataset, col: str) -> float:
    """Approximate global distinct count of `col` (~1.6% std error).

    Each block contributes ONE 4 KiB register row; the driver merges
    O(blocks) rows by element-wise max — no shuffle at all.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"regs": [_registers(batch[col]).tobytes()]})

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    regs = np.zeros(M, dtype=np.uint8)
    for r in rows:
        regs = np.maximum(regs, np.frombuffer(r["regs"], dtype=np.uint8))
    return _estimate(regs)


def approx_distinct_grouped(ds: ray.data.Dataset, keys: str | list[str],
                            col: str, out_col: str = "approx_distinct",
                            num_buckets: int = 16) -> ray.data.Dataset:
    """Per-group approximate distinct count (e.g. users per window).

    Partial registers per (batch, group), then ONE bucketed shuffle of
    register rows (4 KiB x groups-per-batch, never the raw values); the
    final stage max-merges and estimates per group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False).agg(
            regs=(col, lambda s: _registers(s).tobytes()))
        h = np.zeros(len(g), dtype=np.uint64)
        for k in keys:
            h ^= stable_hash_u64(g[k])
        g["__bucket"] = (h % np.uint64(num_buckets)).astype("int32")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        def merge(s: pd.Series) -> float:
            regs = np.maximum.reduce(
                [np.frombuffer(b, dtype=np.uint8) for b in s])
            return _estimate(regs)
        out = group.groupby(keys, as_index=False).agg(**{out_col: ("regs", merge)})
        return out

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("__bucket").map_groups(final, batch_format="pandas")
