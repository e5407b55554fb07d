"""CLI entry point — the `ray job submit` surface of the north rule:

    ray job submit -- python -m nexus_forge_ray \
        --sf-dir /data/sf0.1 --out /data/triples --replicate 100 --shards 8

Runs the sharded resumable flagship (per-shard lineage manifests; a rerun
skips committed shards) followed by the phase-2 global cross-shard
canonicalization, printing one JSON status line. Owns its Ray session only
when none exists (the driver/jobs runtime usually provides one).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nexus_forge_ray")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="input directory with documents.parquet")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--replicate", type=int, default=1)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--skip-global", action="store_true",
                   help="skip the phase-2 cross-shard canonicalization")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    from nexus_forge_ray.pipelines.sharded import (flagship_sharded,
                                                   global_canonicalize)
    t0 = time.time()
    status = flagship_sharded(args.sf_dir, args.out,
                              num_shards=args.shards,
                              replicate=args.replicate)
    out = {"shards": status, "out": args.out}
    if not args.skip_global:
        out["global_dir"] = global_canonicalize(args.out,
                                                args.out + "_global")
    out["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
