"""Synthetic Common-Crawl-style page table (FIXTURES.md F1, input_hint schema).

Deterministically derived from the driver's `documents` table — no randomness,
no wall-clock: every field is a pure function of (doc_id, text, lang, replica).

Schema: (url: string, warc_ts: timestamp[us], html: binary,
         text: large_string, lang: string).

Invariant (BASELINE.json input_hint): `text` is byte-identically recoverable
from `html` — `extract_text_batch(html) == text` for every row; tested in
tests/test_pages.py.

Host distribution is Zipf-ish (hash-uniform u ** 3 over n_hosts buckets) so a
few head hostnames dominate — exercising the skew/salting paths.

`replicate` produces N deterministic copies per document (distinct urls, same
text) to scale bench volume without new source data.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from nexus_forge_ray.utils import stable_hash_u64

N_HOSTS = 50
_EPOCH = pd.Timestamp("2024-01-01")


N_LINKS = 3


def _host_of(doc_id: np.ndarray, replica: int = 0) -> np.ndarray:
    u = stable_hash_u64(pd.Series(doc_id * 1000003 + replica)) / np.float64(2**64)
    return (N_HOSTS * u**3).astype(np.int64)              # Zipf-ish head skew


def link_targets(doc_id: np.ndarray) -> list[np.ndarray]:
    """Deterministic outlink targets per page (pure function of doc_id) —
    the page links to N_LINKS other synthetic docs; targets may or may not
    exist in the corpus slice (dangling links, as on the real web)."""
    return [(doc_id * 7 + j * 13 + 1) % 100_000 for j in range(N_LINKS)]


def synth_pages_batch(batch: pd.DataFrame, replica: int = 0) -> pd.DataFrame:
    doc_id = batch["doc_id"].to_numpy()
    host_idx = _host_of(doc_id, replica)
    urls = [f"https://host{h}.example.com/doc/{d}r{replica}"
            for h, d in zip(host_idx, doc_id)]
    texts = batch["text"].astype(str)
    tgt_arrays = link_targets(doc_id)
    tgt_hosts = [_host_of(t) for t in tgt_arrays]
    html = [(f"<html><head><title>doc {d}</title></head><body><p>"
             f"{t}</p>"
             + "".join(
                 f'<a href="https://host{tgt_hosts[j][i]}.example.com'
                 f'/doc/{tgt_arrays[j][i]}r0">l</a>'
                 for j in range(N_LINKS))
             + "</body></html>").encode("utf-8")
            for i, (d, t) in enumerate(zip(doc_id, texts))]
    return pd.DataFrame({
        "url": urls,
        "warc_ts": _EPOCH + pd.to_timedelta(doc_id + replica, unit="s"),
        "html": html,
        "text": texts,
        "lang": batch["lang"].astype(str),
    })


_EPOCH_US = int(_EPOCH.value // 1_000)      # microseconds since epoch


def synth_pages_batch_arrow(batch: pa.Table, replica: int = 0) -> pa.Table:
    """Arrow-native synthesis: every string column (url, html) is built with
    `pc.binary_join_element_wise` — C-speed concatenation, no Python
    per-row f-strings, no pandas object columns. Output uses large_string /
    large_binary so a block of 10^5 pages never risks 32-bit offset
    overflow. Values are byte-identical to `synth_pages_batch` (tested)."""
    doc_id = batch.column("doc_id").to_numpy()
    host_idx = _host_of(doc_id, replica)
    LS = pa.large_string()

    def s(arr) -> pa.Array:
        return pc.cast(pa.array(arr), LS)

    def lit(x: str):
        return pa.scalar(x, type=LS)

    doc_s, host_s = s(doc_id), s(host_idx)
    url = pc.binary_join_element_wise(
        lit("https://host"), host_s, lit(".example.com/doc/"), doc_s,
        lit(f"r{replica}"), lit(""))
    text = pc.cast(batch.column("text"), LS)
    tgt_arrays = link_targets(doc_id)
    tgt_hosts = [_host_of(t) for t in tgt_arrays]
    pieces: list = [lit("<html><head><title>doc "), doc_s,
                    lit("</title></head><body><p>"), text, lit("</p>")]
    for j in range(N_LINKS):
        pieces += [lit('<a href="https://host'), s(tgt_hosts[j]),
                   lit(".example.com/doc/"), s(tgt_arrays[j]),
                   lit('r0">l</a>')]
    pieces.append(lit("</body></html>"))
    html = pc.cast(pc.binary_join_element_wise(*pieces, lit("")),
                   pa.large_binary())
    warc = pa.array(_EPOCH_US + (doc_id + replica) * 1_000_000,
                    type=pa.timestamp("us"))
    return pa.table({
        "url": url, "warc_ts": warc, "html": html, "text": text,
        "lang": pc.cast(batch.column("lang"), LS)})


def synth_pages(sf_dir: str, replicate: int = 1,
                drop_text: bool = True,
                shard: tuple[int, int] | None = None,
                expand_blocks: int | None = None) -> ray.data.Dataset:
    """documents.parquet -> page Dataset. With drop_text=True the pipeline
    must recover text from html (proving the extract stage).
    shard=(n, i) keeps documents with doc_id % n == i (resumable sharding).

    When replicating, the seed table is repartitioned first: the downstream
    fused chain's task count equals the input block count, and a small seed
    parquet reads as ~16 blocks — half a 32-cpu node would sit idle. (Real
    crawl inputs have thousands of blocks; this only matters for the
    synthetic amplification path.)"""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    if shard is not None:
        n_shards, idx = shard
        docs = docs.map_batches(
            lambda df: df[df["doc_id"] % n_shards == idx],
            batch_format="pandas")
    if expand_blocks is None:
        import os
        env = os.environ.get("GRAFT_EXPAND_BLOCKS")
        if env is not None:
            expand_blocks = int(env)
        else:
            # max(32, 2x cpus): ~2 waves of full-width tasks on a wide
            # node, floor of 32 so narrow sessions still split work while
            # amortizing per-task stage construction (PageFeatures builds
            # its mapping plan + KB index per task). The 32-cpu point is
            # cleanly A/B'd (500k pages: 16 blocks 10.7-12.8 s,
            # 32 10.1-10.5 s, 64 9.2-9.7 s, 128 14.8-19.6 s); at 2-8 cpus
            # 32 vs 64 blocks are indistinguishable within this host's
            # noise (1M pages / 8 cpus: 26.5-28.4 s vs 27.5-27.8 s across
            # quiet windows), so the formula just encodes the wave rule.
            ncpu = int(ray.cluster_resources().get("CPU", 32)) \
                if ray.is_initialized() else 32
            expand_blocks = max(32, 2 * ncpu)
            if replicate > 1:
                # cap per-task page volume at ~50k: beyond that the fused
                # per-page task turns superlinear from worker-heap pressure
                # (measured at 5M pages / 8 cpus: 156k pages/task 358 s
                # fused wall, 39k pages/task 125 s; 1M-2M runs at <=62k
                # pages/task scale linearly)
                # count a doc_id-only projection: the shard filter blocks
                # metadata-count pushdown on `docs`, and counting it
                # directly would read the full text column once just to
                # size the repartition
                seed_ids = ray.data.read_parquet(
                    f"{sf_dir}/documents.parquet", columns=["doc_id"])
                if shard is not None:
                    seed_ids = seed_ids.map_batches(
                        lambda df, n=shard[0], i=shard[1]:
                        df[df["doc_id"] % n == i], batch_format="pandas")
                n_seed = seed_ids.count()
                need = -(-n_seed * replicate // 50_000)
                expand_blocks = min(max(expand_blocks, need), 512)
    if replicate > 1 and expand_blocks > 0:
        docs = docs.repartition(expand_blocks)

    def expand(batch: pa.Table):
        # stream the replication in ~32k-row chunks: one giant concat per
        # task stalls workers on frame assembly + GC (measured at 10M
        # pages), while per-replica yields of a few dozen rows make every
        # fused downstream stage pay its per-batch overhead hundreds of
        # times — mid-sized yields keep the expansion streaming AND the
        # vectorized kernels amortized. Arrow-native end-to-end: synthesis
        # emits large_string/large_binary buffers that pass to the fused
        # chain zero-copy (no pandas object columns ever exist here).
        target_rows = 32768
        acc: list[pa.Table] = []
        acc_rows = 0
        for r in range(replicate):
            out = synth_pages_batch_arrow(batch, r)
            if drop_text:
                out = out.drop_columns(["text"])
            acc.append(out)
            acc_rows += len(out)
            if acc_rows >= target_rows:
                yield pa.concat_tables(acc)
                acc, acc_rows = [], 0
        if acc:
            yield pa.concat_tables(acc)

    return docs.map_batches(expand, batch_format="pyarrow")


_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


def extract_text_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """html binary -> text, byte-identical to the embedded source text.

    Per-row C-speed regex over bytes; utf-8 decode only once per row. The
    invariant "byte-identical extracted text per url" holds because synthesis
    embeds text inside a single <p>...</p> and extraction returns exactly that
    span.
    """
    texts = [b"".join(_P_RE.findall(h)).decode("utf-8")
             for h in batch["html"]]
    batch = batch.copy()
    batch["text"] = texts
    return batch


def extract_text_batch_arrow(batch: pa.Table) -> pa.Table:
    """Arrow-native extract: one RE2 `pc.extract_regex` over the html
    column (zero-copy in, large_string out) — the page text never becomes
    a Python object. Byte-identical to `extract_text_batch`: pages with
    more than one <p> block (impossible for synthesized pages, possible
    for arbitrary html) and non-utf8 html fall back to the per-row
    findall+join path for exactly those rows."""
    html = batch.column("html")
    try:
        hs = pc.cast(html, pa.large_string())
    except pa.ArrowInvalid:          # non-utf8 html: per-row general path
        texts = [b"".join(_P_RE.findall(h)).decode("utf-8")
                 for h in html.to_pylist()]
        return batch.append_column(
            "text", pa.array(texts, type=pa.large_string()))
    m = pc.extract_regex(hs, pattern="(?s)<p>(?P<t>.*?)</p>")
    first = pc.struct_field(m, "t")
    # rows with 0 or 2+ <p> blocks need the general concat-all semantics
    n_p = pc.count_substring(hs, "<p>")
    simple = pc.equal(n_p, 1)
    if pc.all(simple).as_py() and first.null_count == 0:
        text = first
    else:
        texts = first.to_pylist()
        mask = pc.invert(simple).to_pylist()
        raw = html.to_pylist()
        for i, odd in enumerate(mask):
            if odd or texts[i] is None:
                texts[i] = b"".join(_P_RE.findall(raw[i])).decode("utf-8")
        text = pa.array(texts, type=pa.large_string())
    return batch.append_column("text", text)


def extract_text(pages: ray.data.Dataset) -> ray.data.Dataset:
    return pages.map_batches(extract_text_batch_arrow, batch_format="pyarrow")


_HREF_RE = re.compile(rb'href="([^"]+)"')
_HOST_RE = re.compile(r"https://([^/]+)/")


def extract_links_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """html binary -> one (url, link) row per outbound href (C-speed bytes
    regex; decode per matched href only, never the whole page)."""
    urls, links = [], []
    for u, h in zip(batch["url"], batch["html"]):
        for m in _HREF_RE.findall(h):
            urls.append(u)
            links.append(m.decode("utf-8"))
    return pd.DataFrame({"url": urls, "link": links})


def host_graph(pages: ray.data.Dataset,
               num_buckets: int = 16) -> ray.data.Dataset:
    """Weighted host-level link graph from the page table: extract hrefs,
    reduce (src_host, dst_host) pairs map-side, one bucketed count — the
    web-graph build that feeds host PageRank. Self-links (same host) are
    kept: they carry real rank mass on the web."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg

    def hosts(df: pd.DataFrame) -> pd.DataFrame:
        pairs = extract_links_batch(df)
        out = pd.DataFrame({
            "src": pairs["url"].str.extract(_HOST_RE, expand=False),
            "dst": pairs["link"].str.extract(_HOST_RE, expand=False),
        }).dropna()
        return out.groupby(["src", "dst"], as_index=False) \
            .size().rename(columns={"size": "n_links"})

    out = hash_groupby_agg(
        pages.map_batches(hosts, batch_format="pandas"), ["src", "dst"],
        {"n_links": ("n_links", "sum")}, num_buckets=num_buckets)
    return out.map_batches(
        lambda df: df.assign(n_links=df["n_links"].astype("int64")),
        batch_format="pandas")
