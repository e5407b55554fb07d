"""Byte-pair-encoding merge learning and application over a corpus.

Production BPE trainers (SentencePiece, HF tokenizers) share one shape:
the corpus-scale work is a single word-count pass, and the merge loop then
runs on the aggregated (word, count) vocabulary — orders of magnitude
smaller than the corpus (Heaps' law). Ray-Data-first that means:

- `bpe_learn`: ONE distributed count (map-side partial counts, one bucketed
  groupby — raw tokens never shuffle; `ops/agg.hash_groupby_agg`), then the
  merge loop on the collected vocab. The vocab is the only data that leaves
  the cluster; for a 100 TB corpus it is a few million rows (cap with
  `max_vocab` — lowest-frequency tail words contribute negligible pair
  mass, the standard trainer truncation).
- `bpe_encode_counts`: applying learned merges is embarrassingly parallel —
  the ranked merge table broadcasts via `ray.put` and each batch tokenizes
  its docs independently (greedy lowest-rank-first, GPT-2 style), with a
  per-batch word cache since corpus word frequency follows Zipf.

Deterministic: each round's best pair maximizes (count, then lexicographic
ascending as the tie-break), so learned merges are reproducible; gated by
a pure-Python reference implementation test rather than SQL (iterative
algorithm — no SQL equivalent).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import ray
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg

END = "</w>"


def word_counts(ds: ray.data.Dataset, text_col: str = "text", *,
                num_buckets: int = 16) -> ray.data.Dataset:
    """(word, n) — whitespace words, partial-counted per batch before the
    one bucketed groupby (the shuffle moves (word, partial) rows)."""
    def toks(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[text_col].fillna("").str.split().explode().dropna()
        return pd.DataFrame({"word": ex.to_numpy()})

    return hash_groupby_agg(
        ds.map_batches(toks, batch_format="pandas"),
        "word", {"n": ("word", "count")}, num_buckets=num_buckets)


def _pair_counts(words: list[tuple[str, ...]], counts: np.ndarray) -> Counter:
    pc: Counter = Counter()
    for syms, n in zip(words, counts):
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += int(n)
    return pc


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str],
                joined: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if (i < len(syms) - 1 and syms[i] == pair[0]
                and syms[i + 1] == pair[1]):
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_learn(ds: ray.data.Dataset, text_col: str = "text", *,
              n_merges: int = 20, max_vocab: int = 1_000_000,
              num_buckets: int = 16) -> pd.DataFrame:
    """Learn `n_merges` merges; returns (rank, left, right, freq) with
    rank 0 = first merge and freq = the pair's weighted count when merged."""
    vocab = word_counts(ds, text_col, num_buckets=num_buckets).to_pandas()
    vocab = vocab.sort_values(["n", "word"], ascending=[False, True],
                              kind="mergesort").head(max_vocab)
    words = [tuple(w) + (END,) for w in vocab["word"]]
    counts = vocab["n"].to_numpy()

    merges = []
    for rank in range(n_merges):
        pc = _pair_counts(words, counts)
        if not pc:
            break
        best_n = max(pc.values())
        pair = min(p for p, n in pc.items() if n == best_n)
        merges.append({"rank": rank, "left": pair[0], "right": pair[1],
                       "freq": int(best_n)})
        joined = pair[0] + pair[1]
        words = [_merge_word(s, pair, joined) if pair[0] in s else s
                 for s in words]
    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"])


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE symbols for one word (greedy lowest-rank-first)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi: bi + 2] = [syms[bi] + syms[bi + 1]]
    return len(syms)


def bpe_encode_counts(ds: ray.data.Dataset, merges: pd.DataFrame, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      concurrency: int | None = None) -> ray.data.Dataset:
    """(id, n_bpe_tokens) per document. The ranked merge table broadcasts
    once; each batch encodes independently with a word-level cache (Zipf:
    a handful of distinct words dominate every batch). Task mode by default
    (the cache rebuilds per task but an actor pool sized near the CPU count
    can starve upstream reads on small sessions); pass `concurrency` to pin
    an actor pool when the merge table is large enough to matter."""
    ranks = {(r.left, r.right): int(r.rank) for r in merges.itertuples()}
    ranks_ref = ray.put(ranks)

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(ranks_ref)
            self.cache: dict[str, int] = {}

        def _n(self, word: str) -> int:
            n = self.cache.get(word)
            if n is None:
                n = self.cache[word] = _encode_word(word, self.ranks)
            return n

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            uniq_per_doc = df[text_col].fillna("").str.split()
            out = np.fromiter(
                (sum(self._n(w) for w in ws) for ws in uniq_per_doc),
                dtype=np.int64, count=len(df))
            return pd.DataFrame({id_col: df[id_col],
                                 "n_bpe_tokens": out})

    if concurrency is not None:
        return ds.map_batches(Encoder, batch_format="pandas",
                              concurrency=concurrency)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ranks2 = ray.get(ranks_ref)
        cache: dict[str, int] = {}

        def n_of(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = cache[word] = _encode_word(word, ranks2)
            return n

        out = np.fromiter(
            (sum(n_of(w) for w in ws)
             for ws in df[text_col].fillna("").str.split()),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({id_col: df[id_col], "n_bpe_tokens": out})

    return ds.map_batches(encode, batch_format="pandas")
