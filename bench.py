#!/usr/bin/env python
"""Bench harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) in THIS process with
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON
line: {"metric", "value" (headline sec), "unit", "queries": {name: sec},
"sf", "num_cpus", "docs_per_s", "triples_per_s"}.

--scaling: run the headline pipeline at N and 4N CPUs (default 2 vs 8) in
fresh processes on the same input, paired interleaved trials, print both
throughputs + scaling efficiency (median per-pair ratio / 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# pages per document (deterministic replicas) — scales the flagship workload
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "100"))


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    import ray.data as rd

    from nexus_forge_ray.pipelines import corpus, relational
    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    from nexus_forge_ray.pipelines.kg_queries import kg_triples

    # warm-up (untimed): OS page cache for the input + the Ray worker pool
    # (spawning NUM_CPUS python workers + imports costs seconds; that is
    # session setup, not pipeline throughput)
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pandas").count()
    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()
    n_docs = rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        return out

    # headline: flagship KG DAG (extract -> validate -> map -> link -> triples
    # -> canonicalize -> sort+write)
    out_dir = f"/tmp/bench_triples_{NUM_CPUS}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    flagship(SF_DIR, replicate=REPLICATE, out_dir=out_dir)
    headline = time.time() - t0
    import pyarrow.parquet as pq
    import glob
    n_triples = sum(pq.read_metadata(f).num_rows
                    for f in glob.glob(f"{out_dir}/*.parquet"))
    timings["flagship_kg"] = round(headline, 3)

    only_flagship = os.environ.get("GRAFT_BENCH_ONLY_FLAGSHIP") == "1"
    # operator suite
    if not only_flagship:
        timed("q1_pricing_summary", lambda: relational.q1_pricing_summary(SF_DIR))
        timed("q3_top_revenue_orders",
              lambda: relational.q3_top_revenue_orders(SF_DIR))
        timed("q_events_hourly", lambda: relational.q_events_hourly(SF_DIR))
        timed("doc_token_counts",
              lambda: corpus.doc_token_counts(SF_DIR).count())
        timed("dedup_exact", lambda: corpus.dedup_exact(SF_DIR).count())
        timed("minhash_near_dup",
              lambda: corpus.minhash_near_dup(SF_DIR).count())
        timed("similarity_topk", lambda: corpus.similarity_topk(SF_DIR))
        timed("doc_span_dedup", lambda: corpus.doc_span_dedup(SF_DIR).count())
        timed("doc_heavy_tokens", lambda: corpus.doc_heavy_tokens(SF_DIR))
        timed("q_events_distinct_users",
              lambda: relational.q_events_distinct_users(SF_DIR))
        timed("kg_triples", lambda: kg_triples(SF_DIR).count())
        timed("doc_tfidf", lambda: corpus.doc_tfidf(SF_DIR))
        from nexus_forge_ray.pipelines.kg_queries import kg_pagerank
        timed("kg_pagerank", lambda: kg_pagerank(SF_DIR))
        timed("doc_quality_classifier",
              lambda: corpus.doc_quality_classifier(SF_DIR))

    n_pages = n_docs * REPLICATE
    result = {
        "metric": "flagship_kg_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": REPLICATE,
        "docs": n_pages,
        "triples": n_triples,
        "docs_per_s": round(n_pages / headline, 1),
        "triples_per_s": round(n_triples / headline, 1),
    }
    ray.shutdown()
    return result


def run_stages() -> dict:
    """Per-stage flagship breakdown (BASELINE.md §3 ask): wall per pipeline
    phase, docs/s per phase. Phases run sequentially with explicit
    materialization boundaries — the fused default interleaves them, so the
    sum here is an upper bound on the fused wall."""
    import shutil
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    import ray.data as rd
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pandas").count()
    n_docs = rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    from nexus_forge_ray.kg import kb as KB
    from nexus_forge_ray.kg.canonicalize import components_from_compact
    from nexus_forge_ray.kg.fused import PageFeatures
    from nexus_forge_ray.kg.triples import sort_and_write
    from nexus_forge_ray.pipelines.kg_pipeline import (CONTEXT, PAGE_MAPPING,
                                                       PAGE_SHAPE,
                                                       _add_page_keys,
                                                       _dup_key_rows,
                                                       drop_dup_triples)
    from nexus_forge_ray.sources.pages import extract_text, synth_pages
    from nexus_forge_ray.validation.shapes import validate_dataset

    stages: dict[str, float] = {}
    t = time.time()

    def mark(name):
        nonlocal t
        stages[name] = round(time.time() - t, 3)
        t = time.time()

    # GRAFT_STAGES_PANDAS=1 drives the LEGACY pandas-batch chain — kept
    # for A/B-measuring the round-4 Arrow-native conversion (same stages,
    # same session config, only the batch format + kernels differ)
    legacy = os.environ.get("GRAFT_STAGES_PANDAS") == "1"
    pages = extract_text(synth_pages(SF_DIR, replicate=REPLICATE))
    if legacy:
        from nexus_forge_ray.sources.pages import extract_text_batch
        pages = synth_pages(SF_DIR, replicate=REPLICATE).map_batches(
            extract_text_batch, batch_format="pandas")
        pages = pages.map_batches(_add_page_keys, batch_format="pandas")
        validated = validate_dataset(pages, [PAGE_SHAPE], type_col="rtype")
        valid_pages = validated.map_batches(
            lambda df: df[df["valid"]].drop(
                columns=["html", "warc_ts", "valid", "violation"]),
            batch_format="pandas")
        feats = valid_pages.map_batches(
            PageFeatures(PAGE_MAPPING, CONTEXT, KB.DEFAULT_KB, KB.KB_TERMS,
                         num_perm=64, num_bands=8),
            batch_format="pandas", batch_size=None).materialize()
    else:
        from nexus_forge_ray.pipelines.kg_pipeline import (
            _add_page_keys_arrow, _validate_pages_arrow)
        pages = pages.map_batches(_add_page_keys_arrow,
                                  batch_format="pyarrow")
        valid_pages = pages.map_batches(_validate_pages_arrow,
                                        batch_format="pyarrow")
        feats = valid_pages.map_batches(
            PageFeatures(PAGE_MAPPING, CONTEXT, KB.DEFAULT_KB, KB.KB_TERMS,
                         num_perm=64, num_bands=8),
            batch_format="pyarrow", batch_size=None).materialize()
    mark("extract_validate_map_link_sign")  # the fused per-page pass
    if legacy:
        triples = feats.map_batches(
            lambda df: df.loc[df["kind"] == 1,
                              ["page_nid", "subj", "pred", "obj",
                               "obj_is_iri", "obj_datatype"]],
            batch_format="pandas")
        sig_rows = feats.map_batches(
            lambda df: df.loc[df["kind"] == 0, ["page_nid", "sig_hash"]
                              + [f"b{i}" for i in range(8)]],
            batch_format="pandas")
    else:
        import pyarrow.compute as pc
        TCOLS = ["page_nid", "subj", "pred", "obj", "obj_is_iri",
                 "obj_datatype"]
        SCOLS = ["page_nid", "sig_hash"] + [f"b{i}" for i in range(8)]
        triples = feats.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 1))
                       .select(TCOLS), batch_format="pyarrow")
        sig_rows = feats.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0))
                       .select(SCOLS), batch_format="pyarrow")
    comp = components_from_compact(sig_rows, id_col="page_nid", num_bands=8)
    dup_keys = comp.map_batches(_dup_key_rows,
                                batch_format="pandas").materialize()
    mark("canonicalize_components")
    out_dir = f"/tmp/bench_stage_triples_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    deduped = drop_dup_triples(triples, dup_keys).drop_columns(["page_nid"])
    sort_and_write(deduped, out_dir)
    mark("dedup_sort_write")
    total = round(sum(stages.values()), 3)
    n_pages = n_docs * REPLICATE
    result = {"metric": "flagship_stage_sec", "value": total, "unit": "sec",
              "stages": stages,
              "stage_docs_per_s": {k: round(n_pages / v, 1)
                                   for k, v in stages.items()},
              "sf": SF_DIR, "num_cpus": NUM_CPUS, "docs": n_pages}
    ray.shutdown()
    return result


def run_child(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
               GRAFT_BENCH_ONLY_FLAGSHIP="1")
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_scaling() -> dict:
    """Same job at N and 4N CPUs in fresh processes — measured at BOTH
    2→8 and 8→32 (GRAFT_SCALE_BOTH=0 restricts to the primary pair).

    The primary criterion pair is N=2 vs 4N=8: this sandbox is a shared VM
    whose memory bandwidth saturates well below 32 concurrent workers, so
    8→32 measures the host, not the engine — it is still reported each round
    (secondary block) so the efficiency claim stays traceable. Trials
    alternate between levels and the MIN per level is reported — the
    least-contended sample under noisy-neighbor interference (single-run
    walls on this box vary by >2x).
    """
    primary = _measure_pair(int(os.environ.get("GRAFT_SCALE_LO", "2")))
    if os.environ.get("GRAFT_SCALE_BOTH", "1") != "0":
        secondary = _measure_pair(8)
        primary["secondary_8_to_32"] = {
            k: secondary[k] for k in
            ("value", "sec_8", "sec_32", "docs_per_s_8", "docs_per_s_32",
             "all_sec_lo", "all_sec_hi")}
    return primary


def _measure_pair(lo_cpus: int) -> dict:
    hi_cpus = lo_cpus * 4
    trials = int(os.environ.get("GRAFT_SCALE_TRIALS", "1"))
    # scaling children get a heavier workload than the plain bench so compute
    # dominates the fixed per-stage orchestration floor (~10 s)
    os.environ.setdefault("GRAFT_REPLICATE",
                          os.environ.get("GRAFT_SCALE_REPLICATE", "200"))
    lo_runs, hi_runs, ratios = [], [], []
    for _ in range(trials):
        # paired: lo and hi run back-to-back so each pair samples similar
        # host conditions; the per-pair ratio is robust to slow drift
        lo_runs.append(run_child(lo_cpus))
        hi_runs.append(run_child(hi_cpus))
        ratios.append(lo_runs[-1]["value"] / hi_runs[-1]["value"])
    ratios.sort()
    median_ratio = ratios[len(ratios) // 2] if len(ratios) % 2 else \
        (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    eff = median_ratio / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction_of_ideal",
        "cpus_lo": lo_cpus, "cpus_hi": hi_cpus,
        f"sec_{lo_cpus}": t_lo, f"sec_{hi_cpus}": t_hi,
        f"docs_per_s_{lo_cpus}": lo["docs_per_s"],
        f"docs_per_s_{hi_cpus}": hi["docs_per_s"],
        f"triples_per_s_{lo_cpus}": lo["triples_per_s"],
        f"triples_per_s_{hi_cpus}": hi["triples_per_s"],
        "trials_per_level": trials,
        "all_sec_lo": [r["value"] for r in lo_runs],
        "all_sec_hi": [r["value"] for r in hi_runs],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stages" in sys.argv:
        print(json.dumps(run_stages()))
    else:
        print(json.dumps(run_bench()))
