"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine.

Scale notes (100 TB design):
- exact dedup: vectorized content-hash in map_batches, then `groupby(hash)` keeps one
  row per group — the only shuffle moves (hash, id, payload) rows, and the payload can
  be pruned before the shuffle when only ids are needed.
- MinHash-LSH: shingle→minhash per batch (numpy universal hashing, no Python per-shingle
  loop beyond set building), explode to (band, band_hash) rows — the shuffle key is the
  16-byte band hash, NOT the document text. Candidate pairs emerge from groupby on band
  buckets; oversized buckets (degenerate content) are capped and logged, which bounds the
  quadratic pair-gen per bucket.
- all stages stream; nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from nexus_forge_ray.utils import MERSENNE_61, stable_hash_u64


# ---------------------------------------------------------------- exact dedup

def with_content_hash(ds: ray.data.Dataset, text_col: str = "text",
                      out_col: str = "content_hash") -> ray.data.Dataset:
    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = stable_hash_u64(batch[text_col]).astype("uint64")
        return batch
    return ds.map_batches(add_hash, batch_format="pandas")


def dedup_exact(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the minimum-id row per identical text. Bucketed: the shuffle key is
    hash(text) % B (tens of groups, vectorized drop_duplicates per bucket).
    Semantics = reference's id-collision rule (first writer wins,
    demo_store.py:232-239) made deterministic by min(id)."""
    from nexus_forge_ray.ops.agg import min_by_rows
    return min_by_rows(ds, text_col, id_col)


# ---------------------------------------------------------------- MinHash-LSH

def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] — vectorized per-segment arange."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    seg_starts = np.cumsum(counts)[:-1]
    out[seg_starts] = 1 - counts[:-1]
    return np.cumsum(out)

# odd multipliers for positional mixing of the rolling shingle hash
_SHINGLE_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                         0x165667B19E3779F9, 0xD6E8FEB86659FD93,
                         0xA5A5A5A5A5A5A5A5], dtype=np.uint64)


def _shingle_hashes(texts, k: int, tok_lists=None
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-window u64 shingle hashes for a batch of docs, doc-segmented.

    Returns (sh, reps, doc_has):
      sh       concatenated window hashes of NONEMPTY docs, in doc order
      reps     windows per nonempty doc (len == doc_has.sum())
      doc_has  (n_docs,) mask of docs with >= 1 token

    Semantics match MinHasher._shingles: k-token windows for docs with
    >= k tokens, ONE position-mixed whole-doc hash for shorter nonempty
    docs. The k window size is FIXED per call so a doc's hashes don't
    depend on which batch it lands in (determinism across blocks/cluster).
    No shingle strings are ever built — token explode + SipHash are
    pandas/numpy C paths, window mixing is pure numpy.
    """
    n = len(texts)
    if n == 0:
        return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=bool))
    if tok_lists is None:
        s = pd.Series(texts, dtype=object).fillna("")
        tok_lists = s.str.split()
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    doc_has = lens > 0
    total = int(lens.sum())
    if total == 0:
        return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64),
                doc_has)
    flat = tok_lists.explode().dropna()
    th = stable_hash_u64(flat).astype(np.uint64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    starts = offsets[:-1]

    # shingle value per window-start position; one value per doc for docs
    # shorter than k (position-mixed whole-doc hash)
    n_windows = np.where(lens >= k, lens - k + 1, np.where(lens > 0, 1, 0))
    m = len(th) - k + 1
    if m > 0:
        win = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            win ^= (th[j:j + m] * _SHINGLE_MIX[j % len(_SHINGLE_MIX)])
    else:
        win = np.zeros(0, dtype=np.uint64)
    # short docs: mix of all their tokens (boundary-safe, batch-independent)
    short = doc_has & (lens < k)
    if short.any():
        pos = _ranges(lens[doc_has])  # position within each nonempty doc
        mixed_all = th * _SHINGLE_MIX[pos % len(_SHINGLE_MIX)]
        short_vals = np.bitwise_xor.reduceat(
            mixed_all, starts[doc_has] - 0)  # per nonempty doc
    reps = n_windows[doc_has]
    base_idx = np.repeat(starts[doc_has], reps) + _ranges(reps)
    sh = win[np.minimum(base_idx, max(0, m - 1))] if m > 0 else \
        np.zeros(int(reps.sum()), dtype=np.uint64)
    if short.any():
        # overwrite the single window of each short doc with its whole-doc mix
        seg_starts_all = np.zeros(len(reps), dtype=np.int64)
        np.cumsum(reps[:-1], out=seg_starts_all[1:])
        short_in_has = short[doc_has]
        sh[seg_starts_all[short_in_has]] = short_vals[short_in_has]
    return sh, reps, doc_has


class MinHasher:
    """Per-batch MinHash signatures over word shingles — an actor-pool stage.

    The k permutations (a_i * x + b_i mod p) are drawn ONCE per actor in
    __init__ from a fixed seed, so signatures are deterministic across the
    cluster. Shingle base-hashes are vectorized (pandas SipHash); the per-doc
    min is a numpy reduction over (k, n_shingles).
    """

    def __init__(self, num_perm: int = 64, shingle_size: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, MERSENNE_61, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, MERSENNE_61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_size
        self.text_col = text_col
        self.id_col = id_col

    def _shingles(self, text: str) -> list[str]:
        toks = text.split()
        if len(toks) <= self.k:
            return [" ".join(toks)] if toks else [""]
        return [" ".join(toks[i:i + self.k]) for i in range(len(toks) - self.k + 1)]

    # odd multipliers for positional mixing of the rolling shingle hash
    _MIX = _SHINGLE_MIX

    def signatures(self, texts, tok_lists=None) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix — fully vectorized.

        Shingle hashes are rolling combinations of per-token SipHashes (no
        shingle strings are ever built): token explode + hash are pandas/numpy
        C paths; window mixing, the (num_perm, n_shingles) universal-hash
        matrix and the per-doc min (np.minimum.reduceat) are pure numpy.
        MinHash over the shingle MULTISET equals MinHash over the set, so no
        per-doc dedup is needed.
        """
        n = len(texts)
        sigs = np.zeros((n, self.num_perm), dtype=np.uint64)
        if n == 0:
            return sigs
        sh, reps, doc_has = _shingle_hashes(texts, self.k, tok_lists)
        if reps.size == 0:
            return sigs
        # universal hashes per permutation, per-doc segment min.
        # One reused 1-D buffer per permutation keeps the working set cache-
        # resident: a (num_perm, n_shingles) matrix would churn hundreds of MB
        # of uint64 temporaries per batch and turn the stage memory-bandwidth-
        # bound (no speedup past a few workers). Hashing is multiply-add mod
        # 2^64 (multiply-shift family) — no division in the hot loop.
        seg_starts = np.zeros(int(doc_has.sum()), dtype=np.int64)
        np.cumsum(reps[:-1], out=seg_starts[1:])
        buf = np.empty_like(sh)
        out = np.empty((len(seg_starts), self.num_perm), dtype=np.uint64)
        for i in range(self.num_perm):
            np.multiply(sh, self.a[i] | np.uint64(1), out=buf)  # odd multiplier
            buf += self.b[i]
            out[:, i] = np.minimum.reduceat(buf, seg_starts)
        sigs[doc_has] = out
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        sigs = self.signatures(batch[self.text_col].tolist())
        # fixed_size_list<uint64> Arrow column: zero-copy block serialization
        # (a pandas object-column of ndarrays forces per-row pickling)
        mh = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm)
        return pa.table({self.id_col: pa.array(batch[self.id_col].to_numpy()),
                         "minhash": mh})


def _sig_matrix(batch: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (ids, (n,k) signature matrix) from an Arrow signature batch."""
    col = batch["minhash"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return (batch[id_col].to_numpy(zero_copy_only=False),
            flat.reshape(n, -1) if n else flat.reshape(0, 0))


_BAND_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0xD6E8FEB86659FD93,
                      0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63,
                      0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53], dtype=np.uint64)


def _band_rows(batch: pa.Table, num_bands: int, id_col: str) -> pd.DataFrame:
    """Explode signatures into (band_id, band_hash, id) rows — the LSH shuffle
    key. Band hash = vectorized positional mix over the band's rows (no
    per-row bytes building)."""
    ids, sigs = _sig_matrix(batch, id_col)
    n, k = sigs.shape if sigs.size else (0, 0)
    if n == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "band_id": pd.Series(dtype="int32"),
                             "band_hash": pd.Series(dtype="uint64")})
    rows_per_band = max(1, k // num_bands)
    out_ids, out_band, out_hash = [], [], []
    for b in range(num_bands):
        chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        bh = np.full(n, (b * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF,
                     dtype=np.uint64)
        for j in range(chunk.shape[1]):
            bh ^= (chunk[:, j] + np.uint64(j + 1)) * _BAND_MIX[j % len(_BAND_MIX)]
        out_ids.append(ids)
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(bh)
    return pd.DataFrame({
        id_col: np.concatenate(out_ids),
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
    })


def minhash_signatures_ds(ds: ray.data.Dataset, *, num_perm: int = 64,
                          shingle_size: int = 3, text_col: str = "text",
                          id_col: str = "doc_id",
                          concurrency: int | None = None) -> ray.data.Dataset:
    """(id, minhash list<uint64>) signature dataset."""
    hasher_kw = dict(num_perm=num_perm, shingle_size=shingle_size,
                     text_col=text_col, id_col=id_col)
    if concurrency is None:
        return ds.map_batches(MinHasher(**hasher_kw), batch_format="pandas")
    return ds.map_batches(MinHasher, fn_constructor_kwargs=hasher_kw,
                          batch_format="pandas", concurrency=concurrency)


def minhash_candidate_pairs(ds: ray.data.Dataset | None = None, *,
                            sig: ray.data.Dataset | None = None,
                            num_perm: int = 64,
                            num_bands: int = 16, shingle_size: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            concurrency: int | None = None,
                            max_bucket: int = 256,
                            pair_mode: str = "star") -> ray.data.Dataset:
    """Documents → candidate near-duplicate pairs (id_a < id_b) via banded MinHash.

    Shuffle key = (band_id, band_hash): two docs sharing any band land in the
    same group. Buckets larger than `max_bucket` are truncated to the
    `max_bucket` smallest ids (deterministic) — skew/degenerate-content guard.

    pair_mode:
    - "star" (default, the scale path): per bucket emit (min_id, other) edges
      only — O(n) per bucket, sufficient connectivity for connected-components
      canonicalization. A bucket of k exact replicas emits k-1 edges instead
      of k(k-2)/2; without this, big duplicate clusters explode quadratically.
    - "all": every pair in the bucket — O(n^2); use when the *pair list
      itself* is the product (near-dup pair reports on small corpora).

    Pass `sig` (a minhash_signatures_ds result) to reuse precomputed
    signatures; otherwise they are computed from `ds`.
    """
    if sig is None:
        sig = minhash_signatures_ds(ds, num_perm=num_perm,
                                    shingle_size=shingle_size,
                                    text_col=text_col, id_col=id_col,
                                    concurrency=concurrency)
    bands = sig.map_batches(
        lambda t: _band_rows(t, num_bands, id_col), batch_format="pyarrow"
    )

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (df["band_hash"] % np.uint64(64)).astype("int32")
        return df

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in group.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(sub[id_col].unique())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                ids = ids[:max_bucket]
            if pair_mode == "star":
                out_a.append(np.full(len(ids) - 1, ids[0]))
                out_b.append(ids[1:])
            else:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = bands.map_batches(add_bkt, batch_format="pandas")         .groupby("__bkt").map_groups(pairs, batch_format="pandas")
    # distinct pairs (a doc pair can share several bands)
    from nexus_forge_ray.ops.agg import distinct_rows
    return distinct_rows(cand, ["id_a", "id_b"], num_buckets=16)


def jaccard_verify_pairs(pairs_ds: ray.data.Dataset, docs_ds: ray.data.Dataset,
                         *, threshold: float = 0.7, shingle_size: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         broadcast_limit: int = 200_000) -> ray.data.Dataset:
    """Verify candidate pairs with true n-gram Jaccard — adaptive plan with
    a HARD driver-memory bound (the smart_join pattern).

    `pairs_ds.count()` <= broadcast_limit: the pair list and the candidate
    docs' shingle sets collect once and broadcast via `ray.put` — bounded
    at limit × ~32 B pairs plus the candidate subset's shingles, zero
    extra all-to-all (the small-corpus report path, optimal when
    candidates ≪ corpus). Above the limit NOTHING pair- or corpus-sized
    touches the driver: `_jaccard_verify_distributed` computes the exact
    intersections through bucketed hash joins of fixed-width
    (pair, shingle-hash) rows — the same machinery as
    `ngram_jaccard_pairs`. At web scale the count crosses the cap and the
    plan switches by itself. One contract note: the distributed plan
    verifies each DISTINCT (id_a, id_b) pair once, while the broadcast
    plan emits one output row per input row — callers passing duplicate
    pairs (none in this repo: candidate generators end with a distinct)
    get a deduped report above the cap.
    """
    import ray as _ray

    pairs_ds = pairs_ds.materialize()  # read twice below (id set + verify map)
    if pairs_ds.count() > broadcast_limit:
        return _jaccard_verify_distributed(
            pairs_ds, docs_ds, threshold=threshold, k=shingle_size,
            text_col=text_col, id_col=id_col)
    id_pairs = pairs_ds.to_pandas()  # bounded by broadcast_limit
    needed = set(id_pairs["id_a"]).union(id_pairs["id_b"])

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df[id_col].isin(needed)]
        sets = []
        for t in sub[text_col]:
            toks = (t or "").split()
            if len(toks) <= shingle_size:
                sets.append(frozenset({" ".join(toks)}))
            else:
                sets.append(frozenset(
                    " ".join(toks[i:i + shingle_size])
                    for i in range(len(toks) - shingle_size + 1)))
        return pd.DataFrame({id_col: sub[id_col].to_numpy(), "sh": sets})

    # shingle each candidate doc ONCE (distributed), then broadcast the sets;
    # a pair-verify without this recomputes sets O(cluster_size) times per doc
    sub = docs_ds.map_batches(shingle_rows, batch_format="pandas").to_pandas()
    sets_ref = _ray.put(dict(zip(sub[id_col], sub["sh"])))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sets = _ray.get(sets_ref)
        empty = frozenset()
        jac = np.empty(len(batch))
        for i, (a, b) in enumerate(zip(batch["id_a"], batch["id_b"])):
            sa, sb = sets.get(a, empty), sets.get(b, empty)
            union = len(sa | sb)
            jac[i] = len(sa & sb) / union if union else 0.0
        batch = batch.copy()
        batch["jaccard"] = np.round(jac, 4)
        return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


def _jaccard_verify_distributed(pairs_ds: ray.data.Dataset,
                                docs_ds: ray.data.Dataset, *,
                                threshold: float, k: int,
                                text_col: str, id_col: str
                                ) -> ray.data.Dataset:
    """Exact Jaccard for an EXPLICIT candidate-pair Dataset, fully
    distributed — the scale half of `jaccard_verify_pairs`.

    Plan (nothing pair- or corpus-sized on the driver):
    1. candidate ids  = bucketed distinct of the pair endpoints;
    2. candidate docs = bucketed semi-join of the corpus to those ids;
    3. per-doc DISTINCT u64 shingle hashes (`_shingle_hashes`, the shared
       rolling kernel — value-identical to the broadcast path's string
       shingles because both equate shingles iff the token windows are
       equal) + per-doc set sizes;
    4. each pair joins its two endpoints' shingle rows (two bucketed hash
       joins keyed by doc id), the intersection is one bucketed join on
       (pair, shingle) — fixed-width rows, text never ships;
    5. |A∪B| = |A|+|B|−|A∩B|; vectorized jaccard, round(4), threshold.
    """
    from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
    from nexus_forge_ray.ops.joins import (partitioned_join,
                                           partitioned_semi_join)
    SEP = "\x1f"

    def endpoint(col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({id_col: df[col]})
        return fn

    cand_ids = distinct_rows(
        pairs_ds.map_batches(endpoint("id_a"), batch_format="pandas")
        .union(pairs_ds.map_batches(endpoint("id_b"),
                                    batch_format="pandas")),
        [id_col])
    cdocs = partitioned_semi_join(docs_ds, cand_ids, id_col,
                                  lcols=[id_col, text_col])

    # token-less docs carry ONE sentinel shingle, mirroring the broadcast
    # path's frozenset({""}) — empty-empty candidate pairs (which minhash
    # DOES emit: all-zero signatures collide in every band) score J=1.0
    # on both plans instead of silently dropping here
    EMPTY_SH = np.uint64(0x9E3779B97F4A7C15)

    def sh_rows(df: pd.DataFrame) -> pd.DataFrame:
        sh, reps, doc_has = _shingle_hashes(df[text_col].tolist(), k)
        ids = df[id_col].to_numpy()[doc_has]
        out = pd.DataFrame({id_col: np.repeat(ids, reps),
                            "sh": sh}).drop_duplicates()
        empty_ids = df[id_col].to_numpy()[~doc_has]
        if len(empty_ids):
            out = pd.concat([out, pd.DataFrame(
                {id_col: empty_ids,
                 "sh": np.full(len(empty_ids), EMPTY_SH,
                               dtype=np.uint64)})],
                ignore_index=True)
        return out

    shingles = distinct_rows(
        cdocs.map_batches(sh_rows, batch_format="pandas"),
        [id_col, "sh"]).materialize()          # consumed three times below
    sizes = hash_groupby_agg(shingles, id_col,
                             {"n": ("sh", "count")}).materialize()

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["id_a", "id_b"]].copy()
        df["__pk"] = df["id_a"].astype(str) + SEP + df["id_b"].astype(str)
        return df

    # duplicate input pairs share a __pk and would square the intersection
    # counts — verify each DISTINCT pair once (the broadcast plan verifies
    # per input row; a duplicated pair simply repeats there)
    pk = distinct_rows(
        pairs_ds.map_batches(keyed, batch_format="pandas"),
        ["__pk"]).materialize()

    def side_rows(side: str) -> ray.data.Dataset:
        ren = shingles.map_batches(
            lambda df, s=side: df.rename(columns={id_col: s}),
            batch_format="pandas")
        return partitioned_join(pk, ren, on=side, how="inner",
                                lcols=["id_a", "id_b", "__pk"],
                                rcols=[side, "sh"]) \
            .map_batches(lambda df: df[["__pk", "sh"]],
                         batch_format="pandas")

    inter_rows = partitioned_join(side_rows("id_a"), side_rows("id_b"),
                                  on="__pk", extra_keys=["sh"],
                                  lcols=["__pk", "sh"],
                                  rcols=["__pk", "sh"])
    inter = hash_groupby_agg(inter_rows, "__pk", {"inter": ("sh", "count")})

    # sizes attach via two bucketed joins (sizes has ONE row per candidate
    # id, so each join is 1:1 on the pair side)
    with_na = partitioned_join(
        pk, sizes.map_batches(
            lambda df: df.rename(columns={id_col: "id_a", "n": "na"}),
            batch_format="pandas"),
        on="id_a", how="inner", lcols=["id_a", "id_b", "__pk"],
        rcols=["id_a", "na"])
    with_nb = partitioned_join(
        with_na, sizes.map_batches(
            lambda df: df.rename(columns={id_col: "id_b", "n": "nb"}),
            batch_format="pandas"),
        on="id_b", how="inner", lcols=["id_a", "id_b", "__pk", "na"],
        rcols=["id_b", "nb"])
    scored = partitioned_join(with_nb, inter, on="__pk", how="left",
                              lcols=["id_a", "id_b", "__pk", "na", "nb"],
                              rcols=["__pk", "inter"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        inter_n = pd.to_numeric(df["inter"], errors="coerce") \
            .fillna(0).to_numpy(dtype=np.float64)
        na = df["na"].to_numpy(dtype=np.float64)
        nb = df["nb"].to_numpy(dtype=np.float64)
        union = na + nb - inter_n
        jac = np.divide(inter_n, union, out=np.zeros_like(union),
                        where=union > 0)
        out = df[["id_a", "id_b"]].copy()
        out["jaccard"] = np.round(jac, 4)
        return out[out["jaccard"] >= threshold]

    return scored.map_batches(finish, batch_format="pandas")


# fixed hash for the empty document's shingle set ({""} — what a whole-doc
# join of zero tokens produces), so two empty docs are exact duplicates (J=1)
# like the string-based paths treat them
_EMPTY_SHINGLE = np.int64(-0x61C8864680B583EB)


def ngram_jaccard_pairs(ds: ray.data.Dataset, *, threshold: float = 0.5,
                        shingle_size: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT n-gram Jaccard all-pairs similarity join (jaccard >= threshold),
    fully distributed — no candidate collection or shingle-dict broadcast on
    the driver (contrast jaccard_verify_pairs, the small-corpus verify step).

    AllPairs/PPJoin prefix filtering (Bayardo et al. WWW'07, Xiao et al.
    WWW'08): shingles get a GLOBAL total order (document frequency, then
    hash); each doc posts only its first |S| - ceil(t*|S|) + 1 shingles into
    the inverted-index shuffle. For any pair with J >= t the smallest common
    shingle under that order provably sits inside BOTH prefixes (|I| >=
    ceil(t*|S|) and at most |S| - |I| non-shared shingles can precede it),
    so the candidate set is complete. Rare shingles sort first, so hot
    (boilerplate) shingles never fan out quadratically; a size-ratio filter
    (t * max(|A|,|B|) <= min(|A|,|B|)) prunes at pair generation. Candidates
    then get exact intersection counts via two bucketed hash joins of
    (id, shingle-hash) rows — fixed-width 24-byte rows, never text.

    Shingle semantics match MinHasher._shingles (k-token windows, whole-doc
    for shorter docs) via the shared rolling-u64 kernel, so results line up
    with the minhash/jaccard_verify family; hashes stand in for strings
    (64-bit, collision odds ~n^2/2^65).

    Output: (id_a, id_b, jaccard) with id_a < id_b, rounded to 4dp — the
    same report shape as minhash_near_dup but exact and closed under the
    threshold (no LSH recall caveat).
    """
    from nexus_forge_ray.ops.agg import (_bucket_of, distinct_rows,
                                         hash_groupby_agg)
    from nexus_forge_ray.ops.joins import partitioned_join

    k = int(shingle_size)
    t = float(threshold)

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        sh, reps, doc_has = _shingle_hashes(df[text_col].tolist(), k)
        ids = df[id_col].to_numpy()
        n_has = int(doc_has.sum())
        doc_idx = np.repeat(np.arange(n_has), reps)
        # per-doc distinct shingles: lexsort + adjacent dedup (vectorized)
        order = np.lexsort((sh, doc_idx))
        di, sv = doc_idx[order], sh[order]
        keep = np.ones(len(sv), dtype=bool)
        keep[1:] = (di[1:] != di[:-1]) | (sv[1:] != sv[:-1])
        di, sv = di[keep], sv[keep]
        sz = np.bincount(di, minlength=n_has).astype(np.int64)
        rows = pd.DataFrame({id_col: ids[doc_has][di],
                             "sh": sv.view(np.int64),
                             "sz": sz[di]})
        if not doc_has.all():
            emp = ids[~doc_has]
            rows = pd.concat([rows, pd.DataFrame({
                id_col: emp,
                "sh": np.full(len(emp), _EMPTY_SHINGLE, dtype=np.int64),
                "sz": np.ones(len(emp), dtype=np.int64)})],
                ignore_index=True)
        return rows

    # read 3x below (df counts, prefix path, both intersection joins):
    # materialize once instead of recomputing the shingle pass per consumer
    rows = ds.map_batches(shingle_rows, batch_format="pandas").materialize()

    dfreq = hash_groupby_agg(rows, "sh", {"df": (id_col, "count")},
                             num_buckets=num_buckets)
    rows_df = partitioned_join(rows, dfreq, on="sh",
                               lcols=[id_col, "sh", "sz"],
                               rcols=["sh", "df"], num_buckets=num_buckets)

    def add_id_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = _bucket_of(df, [id_col], num_buckets)
        return df

    def prefix(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "df", "sh"], kind="mergesort")
        rank = g.groupby(id_col, sort=False).cumcount().to_numpy()
        sz = g["sz"].to_numpy(dtype=np.int64)
        # ceil with a downward nudge: overestimating ceil(t*sz) would SHORTEN
        # the prefix and lose completeness; a longer prefix is merely slower
        p = sz - np.ceil(t * sz - 1e-9).astype(np.int64) + 1
        return g[rank < p][[id_col, "sh", "sz"]]

    pref = rows_df.map_batches(add_id_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(prefix, batch_format="pandas")

    def add_sh_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = _bucket_of(df, ["sh"], num_buckets)
        return df

    def gen_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in group.groupby("sh", sort=False):
            if len(sub) < 2:
                continue
            o = np.argsort(sub[id_col].to_numpy(), kind="mergesort")
            ids = sub[id_col].to_numpy()[o]
            szs = sub["sz"].to_numpy(dtype=np.int64)[o]
            ia, ib = np.triu_indices(len(ids), k=1)
            ok = (t * np.maximum(szs[ia], szs[ib]) - 1e-9
                  <= np.minimum(szs[ia], szs[ib]))
            out.append(pd.DataFrame({"id_a": ids[ia][ok],
                                     "id_b": ids[ib][ok],
                                     "sz_a": szs[ia][ok],
                                     "sz_b": szs[ib][ok]}))
        if not out:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "sz_a": pd.Series(dtype="int64"),
                                 "sz_b": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    cand = pref.map_batches(add_sh_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(gen_pairs, batch_format="pandas")
    cand = distinct_rows(cand, ["id_a", "id_b"], keep_cols=["sz_a", "sz_b"],
                         num_buckets=num_buckets)

    rows_a = rows.map_batches(
        lambda df: df[[id_col, "sh"]].rename(columns={id_col: "id_a"}),
        batch_format="pandas")
    rows_b = rows.map_batches(
        lambda df: df[[id_col, "sh"]].rename(columns={id_col: "id_b"}),
        batch_format="pandas")
    j1 = partitioned_join(cand, rows_a, on="id_a",
                          lcols=["id_a", "id_b", "sz_a", "sz_b"],
                          rcols=["id_a", "sh"], num_buckets=num_buckets)
    j2 = partitioned_join(j1, rows_b, on="id_b", extra_keys=["sh"],
                          lcols=["id_a", "id_b", "sz_a", "sz_b", "sh"],
                          rcols=["id_b", "sh"], num_buckets=num_buckets)
    inter = hash_groupby_agg(j2, ["id_a", "id_b", "sz_a", "sz_b"],
                             {"inter": ("sh", "count")},
                             num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        i = df["inter"].to_numpy(dtype=np.float64)
        u = (df["sz_a"].to_numpy(dtype=np.float64)
             + df["sz_b"].to_numpy(dtype=np.float64) - i)
        jac = i / u
        out = pd.DataFrame({"id_a": df["id_a"].to_numpy(),
                            "id_b": df["id_b"].to_numpy(),
                            "jaccard": np.round(jac, 4)})
        return out[jac >= t]  # threshold on the UNROUNDED value, like the SQL

    return inter.map_batches(finish, batch_format="pandas")


def minhash_verify_pairs(pairs_ds: ray.data.Dataset, sig_ds: ray.data.Dataset,
                         *, threshold: float = 0.7, id_col: str = "doc_id",
                         num_buckets: int = 32) -> ray.data.Dataset:
    """Verify pairs by MinHash signature agreement (unbiased Jaccard estimate,
    std ≈ sqrt(j(1-j)/k)).

    Fully distributed: two bucketed hash joins attach the signatures of both
    endpoints to every pair; the agreement fraction is one vectorized numpy
    comparison per bucket. No driver-side collection — scales to signature
    sets far beyond driver memory.
    """
    from nexus_forge_ray.ops.joins import partitioned_join

    def sig_as(side: str):
        def fn(t: pa.Table) -> pd.DataFrame:
            ids, m = _sig_matrix(t, id_col)
            # signatures travel as fixed-width bytes: Arrow binary columns
            # survive shuffles + null padding (object ndarrays don't)
            return pd.DataFrame({f"id_{side}": ids,
                                 f"mh_{side}": [r.tobytes() for r in m]})
        return fn

    sig_a = sig_ds.map_batches(sig_as("a"), batch_format="pyarrow")
    sig_b = sig_ds.map_batches(sig_as("b"), batch_format="pyarrow")
    j1 = partitioned_join(pairs_ds, sig_a, on="id_a", num_buckets=num_buckets,
                          lcols=["id_a", "id_b"], rcols=["id_a", "mh_a"])
    j2 = partitioned_join(j1, sig_b, on="id_b", num_buckets=num_buckets,
                          lcols=["id_a", "id_b", "mh_a"],
                          rcols=["id_b", "mh_b"])

    def agree(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        ma = np.frombuffer(b"".join(batch["mh_a"]), dtype=np.uint64) \
            .reshape(len(batch), -1)
        mb = np.frombuffer(b"".join(batch["mh_b"]), dtype=np.uint64) \
            .reshape(len(batch), -1)
        sim = (ma == mb).mean(axis=1)
        out = pd.DataFrame({"id_a": batch["id_a"].to_numpy(),
                            "id_b": batch["id_b"].to_numpy(),
                            "jaccard": np.round(sim, 4)})
        return out[out["jaccard"] >= threshold]

    return j2.map_batches(agree, batch_format="pandas")


# ------------------------------------------------------------------- SimHash

class SimHasher:
    """64-bit SimHash over whitespace tokens — actor-pool stage.

    Token hash → ±1 vote per bit weighted by term frequency; sign of the
    summed votes gives the fingerprint bit. Near-dups differ in few bits.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 hash_basis: str = "siphash"):
        self.text_col = text_col
        self.id_col = id_col
        # "siphash": vectorized pandas SipHash (scale default);
        # "md5": DuckDB md5_number_lower-reproducible (SQL-auditable).
        self.hash_basis = hash_basis
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        """Single-doc helper (tests); batches go through the vectorized path."""
        out = self.simhash_batch(pd.Series([text], dtype=object))
        return np.uint64(out[0])

    def simhash_batch(self, texts: pd.Series) -> np.ndarray:
        """Vectorized over the whole batch: one token explode + one SipHash
        pass, per-doc per-bit vote sums via np.add.reduceat — no per-row loop.
        A token occurring c times contributes c votes, identical to the
        unique+counts weighting."""
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return out
        tok_lists = texts.fillna("").astype(str).str.split()
        lens = tok_lists.map(len).to_numpy(dtype=np.int64)
        nonzero = lens > 0
        if not nonzero.any():
            return out
        flat = tok_lists.explode().dropna()
        if self.hash_basis == "md5":
            from nexus_forge_ray.utils import md5_u64
            th = md5_u64(flat)
        else:
            th = stable_hash_u64(flat).astype(np.uint64)
        # (n_tokens, 64) 0/1 bit matrix; int8 keeps the working set small
        bitmat = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                  & np.uint64(1)).astype(np.int8)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        starts = offsets[:-1][nonzero]
        ones = np.add.reduceat(bitmat, starts, axis=0).astype(np.int64)
        votes = 2 * ones - lens[nonzero][:, None]  # (+1/-1 vote sums)
        out[nonzero] = ((votes > 0).astype(np.uint64) * self.bits).sum(axis=1)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "simhash": self.simhash_batch(batch[self.text_col]),
        })


def simhash_near_dup_pairs(ds: ray.data.Dataset, *, max_hamming: int = 3,
                           text_col: str = "text", id_col: str = "doc_id",
                           num_bands: int = 4, max_bucket: int = 1024,
                           hash_basis: str = "siphash") -> ray.data.Dataset:
    """Near-duplicate pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole blocking: the 64-bit fingerprint splits into `num_bands`
    16-bit bands; two fingerprints within `max_hamming` (< num_bands) bits
    MUST agree on at least one band, so the shuffle key is (band_id,
    band_value) — recall is exact, no probabilistic miss. Per bucket the
    hamming verify is one vectorized XOR + popcount over the candidate
    pairs; cross-band duplicates collapse via distinct_rows.
    """
    assert max_hamming < num_bands, "pigeonhole needs max_hamming < num_bands"
    sig = simhash_signatures(ds, text_col=text_col, id_col=id_col,
                             hash_basis=hash_basis)
    sig = sig.materialize()  # consumed per band
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(dtype=np.uint64)
        ids = df[id_col].to_numpy()
        frames = []
        for b in range(num_bands):
            frames.append(pd.DataFrame({
                id_col: ids, "simhash": h,
                "band_id": np.int32(b),
                "band_val": (h >> np.uint64(b * width)) & mask}))
        out = pd.concat(frames, ignore_index=True)
        out["__bkt"] = ((out["band_val"]
                         ^ (np.uint64(0x9E3779B9) * out["band_id"]
                            .to_numpy(dtype=np.uint64)))
                        % np.uint64(64)).astype("int32")
        return out

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in group.groupby(["band_id", "band_val"], sort=False):
            sub = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(sub) < 2:
                continue
            if len(sub) > max_bucket:
                sub = sub.head(max_bucket)
            ids = sub[id_col].to_numpy()
            hs = sub["simhash"].to_numpy(dtype=np.uint64)
            ia, ib = np.triu_indices(len(sub), k=1)
            x = hs[ia] ^ hs[ib]
            # vectorized popcount via uint8 view + per-byte bit table
            bits = np.unpackbits(x.view(np.uint8)).reshape(len(x), -1) \
                .sum(axis=1)
            keep = bits <= max_hamming
            out.append(pd.DataFrame({"id_a": ids[ia[keep]],
                                     "id_b": ids[ib[keep]],
                                     "hamming": bits[keep].astype("int64")}))
        if not out:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True)

    cand = sig.map_batches(band_rows, batch_format="pandas") \
        .groupby("__bkt").map_groups(pairs, batch_format="pandas")
    from nexus_forge_ray.ops.agg import distinct_rows
    return distinct_rows(cand, ["id_a", "id_b"], num_buckets=16)


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", concurrency: int | None = None,
                       hash_basis: str = "siphash") -> ray.data.Dataset:
    kw = dict(text_col=text_col, id_col=id_col, hash_basis=hash_basis)
    if concurrency is None:
        return ds.map_batches(SimHasher(**kw), batch_format="pandas")
    return ds.map_batches(
        SimHasher, fn_constructor_kwargs=kw,
        batch_format="pandas", concurrency=concurrency,
    )


# ------------------------------------------------- embedding cosine near-dup

def _unit_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    from nexus_forge_ray.utils import list_column_to_matrix
    mat = list_column_to_matrix(batch[vec_col])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def embedding_near_dup_pairs(emb_ds: ray.data.Dataset, *, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             num_buckets: int = 8, seed: int = 42,
                             max_bucket: int = 1024,
                             ) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH — each vector gets an 8-bit signature
    under `num_buckets` independent hyperplane sets; two vectors sharing any
    bucket become a candidate pair. The LSH shuffle carries ONLY
    (id, bucket_set, bucket) rows (3 ints) — vectors never ride it (shipping
    the unit vector once per bucket set would inflate the exchange
    `num_buckets`× the corpus embedding volume). Candidate pairs are deduped,
    then verified by cosine with the unit vectors attached via two bucketed
    hash joins (float32 bytes), mirroring minhash_verify_pairs.
    """
    emb_ds = emb_ds.materialize()  # consumed 3x: buckets + both join sides

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        unit = _unit_matrix(batch, vec_col)
        rng = np.random.RandomState(seed)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_frames = []
        for bs in range(num_buckets):
            planes = rng.standard_normal((unit.shape[1], 8))
            sig = (unit @ planes > 0) @ (1 << np.arange(8))
            out_frames.append(pd.DataFrame({
                id_col: ids, "bucket_set": bs, "bucket": sig.astype(np.int64)}))
        return pd.concat(out_frames, ignore_index=True)

    buckets = emb_ds.map_batches(bucketize, batch_format="pyarrow")

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = ((df["bucket_set"].to_numpy() * 257 + df["bucket"].to_numpy())
                       % 64).astype("int32")
        return df

    def pairwise_groups(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in group.groupby(["bucket_set", "bucket"], sort=False):
            ids = np.sort(sub[id_col].unique())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:  # degenerate-bucket guard
                ids = ids[:max_bucket]
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = buckets.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(pairwise_groups, batch_format="pandas")
    from nexus_forge_ray.ops.agg import distinct_rows
    cand = distinct_rows(cand, ["id_a", "id_b"], num_buckets=16)

    # cosine verify: two bucketed joins attach unit vectors (as fixed-width
    # float32 bytes) to each endpoint — vectors travel once per candidate pair
    from nexus_forge_ray.ops.joins import partitioned_join

    def unit_rows(side: str):
        def fn(batch: pa.Table) -> pd.DataFrame:
            unit = _unit_matrix(batch, vec_col).astype(np.float32)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return pd.DataFrame({f"id_{side}": ids,
                                 f"u_{side}": [r.tobytes() for r in unit]})
        return fn

    j1 = partitioned_join(cand, emb_ds.map_batches(unit_rows("a"),
                                                   batch_format="pyarrow"),
                          on="id_a", num_buckets=16,
                          lcols=["id_a", "id_b"], rcols=["id_a", "u_a"])
    j2 = partitioned_join(j1, emb_ds.map_batches(unit_rows("b"),
                                                 batch_format="pyarrow"),
                          on="id_b", num_buckets=16,
                          lcols=["id_a", "id_b", "u_a"], rcols=["id_b", "u_b"])

    def cosine(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        ma = np.frombuffer(b"".join(batch["u_a"]), dtype=np.float32) \
            .reshape(len(batch), -1)
        mb = np.frombuffer(b"".join(batch["u_b"]), dtype=np.float32) \
            .reshape(len(batch), -1)
        sims = (ma * mb).sum(axis=1)
        # join padding widens the id columns to object — restore int64
        out = pd.DataFrame({"id_a": batch["id_a"].to_numpy().astype("int64"),
                            "id_b": batch["id_b"].to_numpy().astype("int64"),
                            "cosine": np.round(sims.astype(np.float64), 4)})
        return out[sims >= threshold]

    return j2.map_batches(cosine, batch_format="pandas")


# ------------------------------------------------------------ span-level dedup

def _chunk_rows(df: pd.DataFrame, text_col: str, id_col: str,
                k: int) -> pd.DataFrame:
    """Explode docs into k-token chunk rows (doc_id, chunk_no, chunk_text).

    Tokens are single-space splits (''.split(' ') == [''], so every doc —
    including empty ones — yields at least one chunk and survives to the
    reassembly stage). Vectorized: one explode + segment-arange; the only
    per-group Python is the ' '.join per chunk (bounded by k tokens).
    """
    toks = df[text_col].str.split(" ")
    lens = toks.map(len).to_numpy()
    flat = toks.explode()
    ords = _ranges(lens)
    chunks = pd.DataFrame({
        id_col: df[id_col].to_numpy().repeat(lens),
        "chunk_no": (ords // k).astype("int64"),
        "tok": flat.to_numpy(),
    })
    return chunks.groupby([id_col, "chunk_no"], as_index=False, sort=False) \
        .agg(chunk_text=("tok", " ".join))


def span_dedup(ds: ray.data.Dataset, *, k: int = 8, text_col: str = "text",
               id_col: str = "doc_id",
               num_buckets: int = 32) -> ray.data.Dataset:
    """Cross-document exact span dedup (C4-style): split every document into
    consecutive k-token chunks; a chunk survives only in its globally FIRST
    occurrence (lexicographic min (doc_id, chunk_no)); documents are
    reassembled from their surviving chunks in order (possibly empty).

    Two bucketed shuffles, each moving the corpus text once:
    1. by hash(chunk_text): winner election per identical chunk (vectorized
       sort + duplicated per bucket — never a per-chunk Python loop);
    2. by hash(doc_id): ordered reassembly. Every doc has >= 1 chunk row, so
       the output covers the full input universe even when a document loses
       all of its spans.

    At web scale the chunk rows are the unit of exchange (no full-document
    payloads cross the wire twice beyond their own text), and oversized
    winner buckets stay vectorized regardless of duplication skew.
    """
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = _chunk_rows(batch, text_col, id_col, k)
        out["__bucket"] = (stable_hash_u64(out["chunk_text"])
                           % np.uint64(num_buckets)).astype("int32")
        return out

    def elect(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "chunk_no"], kind="mergesort")
        g["keep"] = ~g.duplicated(subset="chunk_text")
        g["__bkt2"] = (stable_hash_u64(g[id_col]) % np.uint64(num_buckets)) \
            .astype("int32")
        return g.drop(columns="__bucket")

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "chunk_no"], kind="mergesort")
        kept = g[g["keep"]]
        txt = kept.groupby(id_col, sort=False)["chunk_text"].agg(" ".join)
        all_ids = pd.Index(g[id_col].unique(), name=id_col)
        return txt.reindex(all_ids, fill_value="").rename(text_col) \
            .reset_index()

    return ds.map_batches(explode, batch_format="pandas") \
        .groupby("__bucket").map_groups(elect, batch_format="pandas") \
        .groupby("__bkt2").map_groups(assemble, batch_format="pandas")


def substring_dedup(ds: ray.data.Dataset, *, k: int = 8,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 32) -> ray.data.Dataset:
    """Exact duplicated-substring removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — suffix-array semantics at
    k-token anchor resolution): every OVERLAPPING k-token window whose text
    occurred earlier in the corpus (global (doc_id, pos) order) has its
    tokens removed; the globally first occurrence keeps its text. Any
    duplicated run of >= k tokens is therefore cut from all but its first
    occurrence (the window resolution is the bound: shorter repeats
    survive). Unlike span_dedup's non-overlapping chunks, a duplicated
    passage is caught at ANY token offset.

    Scale shape: shuffle 1 ships only (doc_id, pos, h64) anchor rows
    (~24 B per window, never gram text) bucketed by the 64-bit gram hash
    for the first-occurrence election; shuffle 2 ships each doc's text
    ONCE plus its duplicate positions, bucketed by doc id, and the mask
    reassembly is one explode + anti-merge + groupby join (all
    vectorized). A 64-bit anchor-hash collision can over-delete one
    window (~2^-64 per pair) — the digest-equality trade documented at
    dedup_incremental.
    """
    def anchors(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series(dtype=batch[id_col].dtype
                              if len(batch) else "int64"),
            "pos": pd.Series(dtype="int64"),
            "h": pd.Series(dtype="uint64"),
            "__bucket": pd.Series(dtype="int32")})
        toks = batch[text_col].fillna("").str.split(" ")
        counts = toks.map(len).to_numpy()
        n = int(counts.sum())
        if n < k:
            return empty
        flat = toks.explode().to_numpy(dtype=object)
        docidx = np.repeat(np.arange(len(counts)), counts)
        valid = docidx[: n - k + 1] == docidx[k - 1:]
        if not valid.any():
            return empty
        gram = pd.Series(flat[: n - k + 1][valid])
        for i in range(1, k):
            gram = gram + " " + pd.Series(flat[i: n - k + 1 + i][valid])
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        win = np.arange(n - k + 1)[valid]
        h = stable_hash_u64(gram)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[docidx[win]],
            "pos": (win - starts[docidx[win]]).astype("int64"),
            "h": h,
            "__bucket": (h % np.uint64(num_buckets)).astype("int32")})

    def elect(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["h", id_col, "pos"], kind="mergesort")
        dup = g[g.duplicated(subset="h")]
        out = pd.DataFrame({id_col: dup[id_col].to_numpy(),
                            "pos": dup["pos"].to_numpy(dtype="int64")})
        out[text_col] = ""
        out["__bkt2"] = (stable_hash_u64(out[id_col])
                         % np.uint64(num_buckets)).astype("int32")
        return out

    def carrier(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                            "pos": np.full(len(batch), -1, dtype="int64")})
        out[text_col] = batch[text_col].fillna("").to_numpy()
        out["__bkt2"] = (stable_hash_u64(out[id_col])
                         % np.uint64(num_buckets)).astype("int32")
        return out

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        carriers = group[group["pos"] < 0]
        dups = group[group["pos"] >= 0]
        toks = carriers[text_col].str.split(" ")
        counts = toks.map(len).to_numpy()
        flat = toks.explode().to_numpy(dtype=object)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tokdf = pd.DataFrame({
            id_col: carriers[id_col].to_numpy().repeat(counts),
            "i": np.arange(len(flat))
            - starts.repeat(counts).astype("int64"),
            "tok": flat})
        if len(dups):
            cov = pd.DataFrame({
                id_col: dups[id_col].to_numpy().repeat(k),
                "i": (dups["pos"].to_numpy(dtype="int64")[:, None]
                      + np.arange(k)).ravel()}).drop_duplicates()
            tokdf = tokdf.merge(cov, on=[id_col, "i"], how="left",
                                indicator=True)
            tokdf = tokdf[tokdf["_merge"] == "left_only"]
        txt = tokdf.sort_values([id_col, "i"], kind="mergesort") \
            .groupby(id_col, sort=False)["tok"].agg(" ".join)
        all_ids = pd.Index(carriers[id_col].unique(), name=id_col)
        return txt.reindex(all_ids, fill_value="").rename(text_col) \
            .reset_index()

    ds = ds.materialize()  # consumed twice: anchor pass + carrier pass
    dups = ds.map_batches(anchors, batch_format="pandas") \
        .groupby("__bucket").map_groups(elect, batch_format="pandas")
    return ds.map_batches(carrier, batch_format="pandas").union(dups) \
        .groupby("__bkt2").map_groups(assemble, batch_format="pandas")


# ------------------------------------------------------------ incremental

def dedup_incremental(new_ds: ray.data.Dataset, index_dir: str, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int = 16) -> ray.data.Dataset:
    """Delta-shard exact dedup against a PERSISTED fingerprint index — the
    incremental-ingest shape: every run dedups its own shard, drops docs
    whose content an earlier run already accepted, and appends its
    survivors' fingerprints to the index. The index is content-md5 parquet
    under `index_dir` (one file per run, read as one Dataset); the
    index-vs-shard check is a bucketed anti-join, so neither the corpus
    nor the index ever reaches the driver.

    Earlier runs take precedence over later ones; within a shard the
    min-id row wins (same rule as `dedup_exact`), so running shards in id
    order reproduces dedup_exact over the union — the property the oracle
    checks. Fingerprints are 128-bit md5 hex: cross-run equality is by
    digest, not raw text (a deliberate exactness-for-index-size trade;
    collisions are ~2^-64 at web scale)."""
    import glob as _glob
    import hashlib
    import os
    import uuid

    def add_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__fp"] = [hashlib.md5(str(t).encode("utf-8")).hexdigest()
                      for t in df[text_col]]
        return df

    from nexus_forge_ray.ops.joins import partitioned_anti_join
    survivors = dedup_exact(new_ds, text_col, id_col) \
        .map_batches(add_fp, batch_format="pandas")
    existing = sorted(_glob.glob(os.path.join(index_dir, "run_*", "*.parquet")))
    if existing:
        idx = ray.data.read_parquet(existing).map_batches(
            lambda df: df.rename(columns={"fp": "__fp"}),
            batch_format="pandas")
        survivors = partitioned_anti_join(survivors, idx, on="__fp",
                                          num_buckets=num_buckets)
    survivors = survivors.materialize()
    os.makedirs(index_dir, exist_ok=True)
    run_dir = os.path.join(index_dir, f"run_{uuid.uuid4().hex[:8]}")
    survivors.map_batches(
        lambda df: pd.DataFrame({"fp": df["__fp"]}),
        batch_format="pandas").write_parquet(run_dir)
    return survivors.map_batches(
        lambda df: df.drop(columns="__fp"), batch_format="pandas")


# ------------------------------------------------------------------ SemDeDup

def semantic_dedup(emb_ds: ray.data.Dataset, *, k: int = 10, iters: int = 2,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   num_buckets: int = 8) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means clusters the
    embedding space, then semantic near-duplicates are pruned WITHIN each
    cluster only — a vector is removed when a lower-id vector in the SAME
    cluster has cosine >= threshold; the reported keeper is the smallest
    such id. Returns (removed_id, kept_id, cluster, cosine).

    Scale shape: cluster assignment is the broadcast-centroid k-means
    (`ops.clustering.kmeans_assign` — centroids are the only driver state,
    k*d floats); assignments re-attach to vectors via ONE bucketed hash
    join; the O(s^2) cosine matrix is computed per cluster inside
    map_groups. The paper's operating point scales k with corpus size so
    per-cluster s stays bounded (they run k=50k on 100M+ embeddings) —
    this preserves exactly that contract: only one cluster's vectors ever
    co-locate, and the pairwise work is s^2 per cluster, never corpus^2.
    """
    from nexus_forge_ray.ops.clustering import kmeans_assign
    from nexus_forge_ray.ops.joins import partitioned_join

    emb_ds = emb_ds.materialize()  # consumed twice: kmeans + the join side
    asg = kmeans_assign(emb_ds, k=k, iters=iters, id_col=id_col,
                        vec_col=vec_col)

    # vectors ride the shuffle as raw float64 bytes — Ray's tensor-column
    # concat chokes on object-typed vector columns mid-shuffle, and bytes
    # rows are also what the LSH verify path ships (see
    # embedding_near_dup_pairs)
    def to_bytes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "__vb": [np.asarray(v, dtype=np.float64).tobytes()
                     for v in batch[vec_col].to_numpy()]})

    emb_b = emb_ds.map_batches(to_bytes, batch_format="pandas")
    joined = partitioned_join(asg, emb_b, on=id_col,
                              num_buckets=num_buckets)

    empty = pd.DataFrame({"removed_id": pd.Series(dtype="int64"),
                          "kept_id": pd.Series(dtype="int64"),
                          "cluster": pd.Series(dtype="int64"),
                          "cosine": pd.Series(dtype="float64")})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        mat = np.stack([np.frombuffer(v, dtype=np.float64)
                        for v in g["__vb"].to_numpy()])
        unit = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cos = unit @ unit.T
        # strictly-lower triangle: row i duplicates column j (ids[j] < ids[i])
        dup = np.tril(cos >= threshold, k=-1)
        rows, cols = np.nonzero(dup)
        if not len(rows):
            return empty
        ids = g[id_col].to_numpy()
        out = pd.DataFrame({"removed_id": ids[rows], "kept_id": ids[cols],
                            "cosine": cos[rows, cols]})
        # keeper = smallest qualifying lower id
        out = out.sort_values(["removed_id", "kept_id"]) \
            .groupby("removed_id", as_index=False).first()
        out["cluster"] = np.int64(g["cluster"].iloc[0])
        return out[["removed_id", "kept_id", "cluster", "cosine"]]

    return joined.groupby("cluster").map_groups(prune,
                                                batch_format="pandas")


# ----------------------------------------------------------------- winnowing

def winnow_fingerprints(ds: ray.data.Dataset, *, k: int = 3, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """MOSS winnowing fingerprints (Schleimer et al. 2003): token k-gram
    rolling hashes, then the minimum hash of every w-hash window — the
    guarantee is that any shared run of >= w+k-1 tokens yields at least one
    shared fingerprint, while selecting ~2/(w+1) of the hashes. Returns
    DISTINCT (id, fp) rows.

    Vectorization: gram strings build per doc but hash in ONE md5 pass per
    batch (`utils.md5_u64` == DuckDB md5_number_lower, so the oracle is
    exact); the sliding-window min is a numpy stride trick per doc. Docs
    are single rows, so the fingerprint set is exact map-side — no shuffle
    in this stage."""
    from nexus_forge_ray.utils import md5_u64

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split()
        ids, grams, bounds = [], [], []
        for did, ts in zip(df[id_col].to_numpy(), toks):
            m = len(ts) - k + 1
            if m <= 0:
                continue
            grams.extend(" ".join(ts[i:i + k]) for i in range(m))
            ids.append(did)
            bounds.append(m)
        if not grams:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "fp": pd.Series(dtype="uint64")})
        h = md5_u64(grams)
        out_ids, out_fps = [], []
        pos = 0
        for did, m in zip(ids, bounds):
            hh = h[pos: pos + m]
            pos += m
            if m <= w:
                fps = {int(hh.min())}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hh, w)
                fps = set(sw.min(axis=1).tolist())
            out_ids.extend([did] * len(fps))
            out_fps.extend(sorted(fps))
        return pd.DataFrame({id_col: np.array(out_ids, dtype="int64"),
                             "fp": np.array(out_fps, dtype="uint64")})

    return ds.map_batches(per_batch, batch_format="pandas")


def winnow_near_dup_pairs(ds: ray.data.Dataset, *, k: int = 3, w: int = 4,
                          min_shared: int = 2, num_buckets: int = 16,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> ray.data.Dataset:
    """Document pairs sharing >= min_shared winnowing fingerprints — the
    content-overlap (plagiarism / boilerplate) detector. Pair generation
    happens inside fp-hash buckets via a vectorized self-merge (winnowing
    keeps fingerprints selective, bounding per-fp fan-out; degenerate
    corpora should cap bucket width upstream like minhash's banding does),
    partial pair counts pre-aggregate before the final bucketed sum."""
    from nexus_forge_ray.ops.agg import hash_groupby_agg
    from nexus_forge_ray.utils import stable_hash_u64

    fps = winnow_fingerprints(ds, k=k, w=w, text_col=text_col,
                              id_col=id_col)

    def add_bkt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (stable_hash_u64(df["fp"].astype(str))
                       % np.uint64(num_buckets)).astype("int32")
        return df

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["fp", id_col]]
        mm = g.merge(g, on="fp")
        mm = mm[mm[f"{id_col}_x"] < mm[f"{id_col}_y"]]
        return mm.groupby([f"{id_col}_x", f"{id_col}_y"], as_index=False) \
            .size().rename(columns={f"{id_col}_x": "doc_a",
                                    f"{id_col}_y": "doc_b",
                                    "size": "n"})

    partial = fps.map_batches(add_bkt, batch_format="pandas") \
        .groupby("__bkt").map_groups(pairs, batch_format="pandas")
    out = hash_groupby_agg(partial, ["doc_a", "doc_b"],
                           {"n_shared": ("n", "sum")},
                           num_buckets=max(4, num_buckets // 2))
    return out.map_batches(
        lambda df, t=min_shared: df[df["n_shared"] >= t]
        .astype({"n_shared": "int64"}),
        batch_format="pandas")
