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
    """Keep the minimum-id row per identical text. Hash-partitioned: the groupby
    key is a 64-bit content hash. Semantics = reference's id-collision rule
    (first writer wins, demo_store.py:232-239) made deterministic by min(id).
    """
    hashed = with_content_hash(ds, text_col)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # hash collision guard: within a hash bucket, dedup on the full text
        return group.sort_values(id_col).groupby(text_col, as_index=False).first()

    out = hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")
    return out.drop_columns(["content_hash"])


# ---------------------------------------------------------------- MinHash-LSH

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

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix."""
        all_shingles: list[str] = []
        offsets = [0]
        for t in texts:
            sh = set(self._shingles(t or ""))
            all_shingles.extend(sh)
            offsets.append(len(all_shingles))
        base = stable_hash_u64(all_shingles).astype(np.uint64)
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        a, b = self.a, self.b
        for i in range(len(texts)):
            h = base[offsets[i]:offsets[i + 1]]
            if len(h) == 0:
                sigs[i] = 0
                continue
            # (k, n) universal hashes, min over shingles — all numpy
            perm = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE_61
            sigs[i] = perm.min(axis=1)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch[self.text_col].tolist())
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "minhash": list(sigs),
        })


def _band_rows(df: pd.DataFrame, num_bands: int, id_col: str) -> pd.DataFrame:
    """Explode signatures into (band_id, band_hash, id) rows — the LSH shuffle key."""
    sigs = np.stack(df["minhash"].to_numpy())  # (n, k)
    n, k = sigs.shape
    rows_per_band = k // num_bands
    out_ids, out_band, out_hash = [], [], []
    for b in range(num_bands):
        chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        bh = stable_hash_u64([chunk[i].tobytes() for i in range(n)]).astype(np.uint64)
        out_ids.append(df[id_col].to_numpy())
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(bh)
    return pd.DataFrame({
        id_col: np.concatenate(out_ids),
        "band_id": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
    })


def minhash_candidate_pairs(ds: ray.data.Dataset, *, num_perm: int = 64,
                            num_bands: int = 16, shingle_size: int = 3,
                            text_col: str = "text", id_col: str = "doc_id",
                            concurrency: int | None = None,
                            max_bucket: int = 256) -> ray.data.Dataset:
    """Documents → candidate near-duplicate pairs (id_a < id_b) via banded MinHash.

    Shuffle key = (band_id, band_hash): two docs sharing any band land in the
    same group. Buckets larger than `max_bucket` are truncated to the
    `max_bucket` smallest ids (deterministic) — skew/degenerate-content guard
    bounding per-bucket O(n^2) pair generation.
    """
    hasher_kw = dict(num_perm=num_perm, shingle_size=shingle_size,
                     text_col=text_col, id_col=id_col)
    if concurrency is None:
        sig = ds.map_batches(MinHasher(**hasher_kw), batch_format="pandas")
    else:
        sig = ds.map_batches(MinHasher, fn_constructor_kwargs=hasher_kw,
                             batch_format="pandas", concurrency=concurrency)
    bands = sig.map_batches(
        lambda df: _band_rows(df, num_bands, id_col), batch_format="pandas"
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        if len(ids) > max_bucket:
            ids = ids[:max_bucket]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # distinct pairs (a doc pair can share several bands)
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard_verify_pairs(pairs_ds: ray.data.Dataset, docs_ds: ray.data.Dataset,
                         *, threshold: float = 0.7, shingle_size: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         ) -> ray.data.Dataset:
    """Verify candidate pairs with true n-gram Jaccard. The doc text is fetched
    via a broadcast of the candidate-id subset (candidates ≪ corpus): we
    semi-join docs to candidate ids, collect that small side once with
    ray.put, and verify inside map_batches.
    """
    import ray as _ray

    id_pairs = pairs_ds.to_pandas()  # candidate pairs are the small output, OK
    needed = set(id_pairs["id_a"]).union(id_pairs["id_b"])
    sub = docs_ds.map_batches(
        lambda df: df[df[id_col].isin(needed)][[id_col, text_col]],
        batch_format="pandas",
    ).to_pandas()
    texts_ref = _ray.put(dict(zip(sub[id_col], sub[text_col])))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        texts = _ray.get(texts_ref)

        def shingles(t: str) -> set:
            toks = (t or "").split()
            if len(toks) <= shingle_size:
                return {" ".join(toks)}
            return {" ".join(toks[i:i + shingle_size])
                    for i in range(len(toks) - shingle_size + 1)}

        jac = np.empty(len(batch))
        for i, (a, b) in enumerate(zip(batch["id_a"], batch["id_b"])):
            sa, sb = shingles(texts.get(a, "")), shingles(texts.get(b, ""))
            inter = len(sa & sb)
            union = len(sa | sb)
            jac[i] = inter / union if union else 0.0
        batch["jaccard"] = np.round(jac, 4)
        return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


# ------------------------------------------------------------------- SimHash

class SimHasher:
    """64-bit SimHash over whitespace tokens — actor-pool stage.

    Token hash → ±1 vote per bit weighted by term frequency; sign of the
    summed votes gives the fingerprint bit. Near-dups differ in few bits.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = (text or "").split()
        if not toks:
            return np.uint64(0)
        uniq, counts = np.unique(toks, return_counts=True)
        h = stable_hash_u64(uniq).astype(np.uint64)
        bitmat = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                  & np.uint64(1)).astype(np.int64)
        votes = ((bitmat * 2 - 1) * counts[:, None]).sum(axis=0)
        return np.uint64(((votes > 0).astype(np.uint64) * self.bits).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "simhash": np.array([self.simhash(t) for t in batch[self.text_col]],
                                dtype=np.uint64),
        })
        return out


def simhash_signatures(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", concurrency: int | None = None,
                       ) -> ray.data.Dataset:
    if concurrency is None:
        return ds.map_batches(SimHasher(text_col=text_col, id_col=id_col),
                              batch_format="pandas")
    return ds.map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas", concurrency=concurrency,
    )


# ------------------------------------------------- embedding cosine near-dup

def embedding_near_dup_pairs(emb_ds: ray.data.Dataset, *, threshold: float = 0.95,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             num_buckets: int = 8, seed: int = 42,
                             ) -> ray.data.Dataset:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH buckets (SimHash on the embedding) so the
    all-pairs comparison happens per bucket, not globally. A pair is emitted if
    the two vectors share a bucket under any of the hyperplane sets and cosine
    ≥ threshold; dedup across bucket sets by groupby(id_a, id_b).
    """
    from nexus_forge_ray.utils import list_column_to_matrix

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        mat = list_column_to_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        rng = np.random.RandomState(seed)
        out_frames = []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for bs in range(num_buckets):
            planes = rng.standard_normal((unit.shape[1], 8))
            sig = (unit @ planes > 0) @ (1 << np.arange(8))
            out_frames.append(pd.DataFrame({
                id_col: ids, "bucket_set": bs, "bucket": sig.astype(np.int64),
                "_unit": list(unit.astype(np.float32)),
            }))
        return pd.concat(out_frames, ignore_index=True)

    buckets = emb_ds.map_batches(bucketize, batch_format="pyarrow")

    def pairwise(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        mat = np.stack(g["_unit"].to_numpy())
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sims[ia, ib] >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cosine": np.round(sims[ia, ib][keep].astype(np.float64), 4)})

    pairs = buckets.groupby(["bucket_set", "bucket"]).map_groups(
        pairwise, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
