"""Cross-shard canonicalization at volume (VERDICT r3 next-round #8).

Runs the flagship TWICE over the same ~1M-page input — once unsharded, once
as 4 hash shards + the global canonicalization phase — asserts the final
sorted triple sets are identical, and reports the resume overhead (second
`flagship_sharded` invocation over committed manifests must skip all work).

Usage:  python tools/bench_sharded.py [--sf /root/testdata/sf0.1]
        [--replicate 200] [--cpus 32] [--shards 4]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def frame_md5(files: list[str]) -> tuple[str, int]:
    import pandas as pd
    df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                   ignore_index=True)
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False)
    return hashlib.md5(payload.encode()).hexdigest(), len(df)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=200)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--shards", type=int, default=4)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    from nexus_forge_ray.pipelines.sharded import (flagship_sharded,
                                                   global_canonicalize)

    root = "/tmp/bench_sharded"
    shutil.rmtree(root, ignore_errors=True)
    un_dir, run_dir, canon_dir = (f"{root}/unsharded", f"{root}/run",
                                  f"{root}/canonical")

    t0 = time.time()
    flagship(args.sf, replicate=args.replicate, out_dir=un_dir)
    t_unsharded = time.time() - t0

    t0 = time.time()
    flagship_sharded(args.sf, run_dir, num_shards=args.shards,
                     replicate=args.replicate)
    t_sharded = time.time() - t0

    t0 = time.time()
    global_canonicalize(run_dir, canon_dir)
    t_global = time.time() - t0

    # resume: every shard manifest is committed -> the rerun must skip
    t0 = time.time()
    flagship_sharded(args.sf, run_dir, num_shards=args.shards,
                     replicate=args.replicate)
    t_resume = time.time() - t0

    h_un, n_un = frame_md5(glob.glob(os.path.join(un_dir, "*.parquet")))
    h_gc, n_gc = frame_md5(glob.glob(os.path.join(canon_dir, "shard=global",
                                                  "*.parquet"))
                           or glob.glob(os.path.join(canon_dir, "*",
                                                     "*.parquet")))
    out = {
        "sf": args.sf, "replicate": args.replicate, "cpus": args.cpus,
        "shards": args.shards,
        "triples_unsharded": n_un, "triples_sharded_global": n_gc,
        "byte_identical": h_un == h_gc,
        "sec_unsharded": round(t_unsharded, 1),
        "sec_sharded": round(t_sharded, 1),
        "sec_global_phase": round(t_global, 1),
        "sec_resume_noop": round(t_resume, 2),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0 if out["byte_identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
