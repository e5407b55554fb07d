"""Driver-mimic oracle checker.

Runs `__ray_entry__.queries()` entries against `oracle_sql()` through DuckDB
over the same parquet tables, comparing rows / schema / sorted-value hash the
way the driver does (columns sorted by name, rows sorted, float tolerance via
rounding). Usage:

    python tools/check_window.py [--sf /root/testdata/sf0.01] [--first N]
    python tools/check_window.py --names q_es_score kg_bgp_path_group
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype(float).round(6)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


def frame_hash(df: pd.DataFrame) -> str:
    n = norm_frame(df)
    payload = n.to_csv(index=False, float_format="%.6g")
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__
    qs = __ray_entry__.queries()
    oracles = __ray_entry__.oracle_sql()
    names = args.names or list(qs)[:args.first]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{args.sf}/{t}.parquet')")

    import ray.data
    import pyarrow as pa
    results, n_fail = {}, 0
    for name in names:
        t0 = time.time()
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None}
        try:
            got = qs[name](args.sf)
            if isinstance(got, ray.data.Dataset):
                got = got.to_pandas()
            elif isinstance(got, pa.Table):
                got = got.to_pandas()
            if name not in oracles:
                row["err"] = "rows_only"
                row["spark_rows"] = len(got)
            else:
                want = con.execute(oracles[name]).fetchdf()
                row["spark_rows"] = len(got)
                row["oracle_rows"] = len(want)
                row["rows_match"] = len(got) == len(want)
                row["schema_match"] = sorted(got.columns) == sorted(
                    want.columns)
                row["hash_match"] = (row["rows_match"]
                                     and row["schema_match"]
                                     and frame_hash(got) == frame_hash(want))
        except Exception:
            row["err"] = traceback.format_exc(limit=3).splitlines()[-1]
        row["sec"] = round(time.time() - t0, 2)
        ok = row["hash_match"] is True
        if not ok:
            n_fail += 1
        results[name] = row
        print(f"{'PASS' if ok else 'FAIL'} {name:34s} "
              f"{row.get('spark_rows', '?')!s:>8s} rows  "
              f"{row['sec']:6.1f}s  {row['err'] or ''}")
    print(json.dumps({"checked": len(names), "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
