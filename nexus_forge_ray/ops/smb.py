"""Sort-merge-bucket (SMB) persisted layout: pay the shuffle once at write
time, join shuffle-free forever after.

The pattern every warehouse uses for repeatedly-joined 100 TB tables
(Hive/Spark bucketed tables): `bucketed_write` partitions a Dataset on disk
by `hash(key) % B` (hive layout, one directory per bucket), and
`bucketed_join_read` joins two SUCH layouts bucket-by-bucket — each task
reads exactly one bucket directory from each side and merges locally, so
the join moves ZERO rows between workers. Re-bucketing is never silent: the
bucket count and key are recorded in a `_smb.json` manifest and validated
at join time.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from nexus_forge_ray.utils import stable_hash_u64


def bucketed_write(ds: ray.data.Dataset, out_dir: str, on: str, *,
                   num_buckets: int = 16) -> str:
    """Persist `ds` hive-partitioned by hash(on) % num_buckets."""
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (stable_hash_u64(df[on])
                        % np.uint64(num_buckets)).astype("int32")
        return df

    ds.map_batches(tag, batch_format="pandas") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "_smb.json"), "w") as f:
        json.dump({"on": on, "num_buckets": num_buckets}, f)
    return out_dir


def _manifest(d: str) -> dict:
    with open(os.path.join(d, "_smb.json")) as f:
        return json.load(f)


def bucketed_join_read(left_dir: str, right_dir: str, on: str, *,
                       how: str = "inner",
                       lcols: list[str] | None = None,
                       rcols: list[str] | None = None) -> ray.data.Dataset:
    """Join two SMB layouts bucket-by-bucket, one task per bucket, no
    exchange. The task list is a Dataset of bucket ids, so Ray schedules /
    retries / pipelines buckets like any other blocks."""
    lm, rm = _manifest(left_dir), _manifest(right_dir)
    if (lm["on"], lm["num_buckets"]) != (on, rm["num_buckets"]) \
            or rm["on"] != on:
        raise ValueError(
            f"SMB layouts disagree: left={lm} right={rm} join on={on!r} — "
            "rewrite one side with matching key and bucket count")
    nb = lm["num_buckets"]

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b in df["bucket"]:
            ld, rd = (os.path.join(left_dir, f"bucket={b}"),
                      os.path.join(right_dir, f"bucket={b}"))
            l = (pq.read_table(ld, columns=lcols).to_pandas()
                 if os.path.isdir(ld) else
                 pd.DataFrame(columns=lcols or [on]))
            r = (pq.read_table(rd, columns=rcols).to_pandas()
                 if os.path.isdir(rd) else
                 pd.DataFrame(columns=rcols or [on]))
            if len(l) or how in ("right", "outer"):
                out.append(l.merge(r, on=on, how=how))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame())

    buckets = ray.data.from_pandas(
        pd.DataFrame({"bucket": np.arange(nb, dtype=np.int32)})) \
        .repartition(nb)
    return buckets.map_batches(join_bucket, batch_format="pandas")
