"""Similarity search over an embedding column (list<float>).

- `cosine_topk`: brute-force top-k per query — numpy matmul per batch against a
  broadcast query matrix (ray.put once, read per actor), partial top-k per
  batch, then a tiny global merge. This is the baseline and the oracle shape.
- `ivf_topk`: IVF-style scale path — k-means-ish coarse centroids (deterministic
  sample), each row assigned to its nearest centroid in one map_batches pass;
  queries probe `nprobe` nearest centroid partitions only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from nexus_forge_ray.utils import list_column_to_matrix


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class BatchScorer:
    """Actor-pool stage: per batch, cosine scores against the broadcast query
    matrix and a local top-k cut. The queries are fetched from the object store
    ONCE per actor (ray.get in __init__), not per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        obj = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qmat = obj
        self.qmat = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        mat = _normalize(list_column_to_matrix(batch[self.vec_col]).astype(np.float64))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.qmat @ mat.T                      # (n_queries, n_rows)
        k = min(self.k, sims.shape[1])
        # local top-k per query (argpartition = O(n))
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            cols = part[qi]
            out_q.append(np.full(k, self.query_ids[qi]))
            out_id.append(ids[cols])
            out_s.append(sims[qi, cols])
        return pd.DataFrame({
            "query_id": np.concatenate(out_q),
            self.id_col: np.concatenate(out_id),
            "score": np.concatenate(out_s),
        })


def cosine_topk(emb_ds: ray.data.Dataset, query_ids: list, query_matrix: np.ndarray,
                k: int = 10, *, id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency: int = 2, round_to: int | None = 4) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns a small pandas result
    (query_id, id, score) sorted by (query_id, -score, id).

    Partial top-k per batch → global merge of (n_batches × k) rows on the
    driver: the only materialized data is the candidate set, never the corpus.
    """
    queries_ref = ray.put((list(query_ids), np.asarray(query_matrix)))
    partial = emb_ds.map_batches(
        BatchScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=concurrency,
    )
    cand = partial.to_pandas()
    cand = cand.sort_values(["query_id", "score", id_col],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby("query_id", as_index=False, sort=True).head(k).copy()
    if round_to is not None:
        out["score"] = out["score"].round(round_to)
    return out.reset_index(drop=True)


def build_centroids(emb_ds: ray.data.Dataset, n_centroids: int = 16, *,
                    vec_col: str = "embedding", sample: int = 2048,
                    iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a limited sample (driver-side, small)."""
    sub = emb_ds.limit(sample).to_pandas()
    mat = _normalize(np.stack(sub[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_assign(emb_ds: ray.data.Dataset, centroids: np.ndarray, *,
               vec_col: str = "embedding") -> ray.data.Dataset:
    """Add a `centroid_id` partition column — one matmul per batch."""
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _normalize(list_column_to_matrix(batch[vec_col]).astype(np.float64))
        cid = (mat @ cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(cid))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def ivf_build_index(emb_ds: ray.data.Dataset, out_dir: str, *,
                    n_centroids: int = 16, vec_col: str = "embedding") -> str:
    """Persist the IVF index: vectors written as Parquet PARTITIONED BY
    centroid_id (hive layout), centroids saved alongside. Build once, search
    many times — the scale path (assignment is not recomputed per query run,
    and a search reads ONLY the probed partition directories)."""
    import os
    centroids = build_centroids(emb_ds, n_centroids, vec_col=vec_col)
    assigned = ivf_assign(emb_ds, centroids, vec_col=vec_col)
    assigned.write_parquet(out_dir, partition_cols=["centroid_id"])
    np.save(os.path.join(out_dir, "_centroids.npy"), centroids)
    return out_dir


def ivf_search_index(index_dir: str, query_ids: list,
                     query_matrix: np.ndarray, k: int = 10, *,
                     nprobe: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     concurrency: int = 2) -> pd.DataFrame:
    """Search a persisted IVF index: load centroids, pick the nprobe nearest
    partitions per query, and read ONLY those partition directories from
    storage (pruning at the read, not a post-read filter)."""
    import os
    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = sorted({int(c) for row in probe for c in row})
    import glob
    paths = [f for c in probe_sets
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"centroid_id={c}", "*.parquet")))]
    pruned = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return cosine_topk(pruned, query_ids, query_matrix, k,
                       id_col=id_col, vec_col=vec_col,
                       concurrency=concurrency)


def ivf_topk(emb_ds: ray.data.Dataset, query_ids: list, query_matrix: np.ndarray,
             k: int = 10, *, n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency: int = 2) -> pd.DataFrame:
    """Approximate top-k: probe only the `nprobe` closest centroid partitions
    per query. At scale the assignment is computed once and written as a
    partition column; here it is fused into the same pipeline run.
    """
    centroids = build_centroids(emb_ds, n_centroids, vec_col=vec_col)
    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = {int(c) for row in probe for c in row}
    assigned = ivf_assign(emb_ds, centroids, vec_col=vec_col)
    pruned = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["centroid_id"], value_set=pa.array(sorted(probe_sets),
                                                                  type=pa.int32()))),
        batch_format="pyarrow",
    )
    return cosine_topk(pruned, query_ids, query_matrix, k,
                       id_col=id_col, vec_col=vec_col, concurrency=concurrency)


def knn_classify(ds: ray.data.Dataset, ref_df: pd.DataFrame, *, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label",
                 out: str = "pred") -> ray.data.Dataset:
    """kNN label assignment against a broadcast labeled seed set — the
    weak-labeling move (label a web-scale corpus from a small curated set).

    The seed set is `ray.put` ONCE (it must fit a worker heap — true for
    curated seed sets; for corpus-vs-corpus use the IVF index instead);
    each batch computes distances with the fast |q|^2 - 2qR^T + |r|^2
    expansion, takes a top-(k+8) candidate cut, then RE-RANKS candidates
    with the exact (q-r)^2 sum (same formula as the SQL oracle — the
    expansion's float error must not decide neighbor order). A row's own id
    is excluded (self-match) so the query set may equal the seed set.
    Majority vote with ties toward the smaller label, neighbor ties toward
    the smaller id."""
    ids = ref_df[id_col].to_numpy()
    mat = np.stack(ref_df[vec_col].to_numpy()).astype(np.float64)
    labs = ref_df[label_col].to_numpy()
    uniq = np.unique(labs)
    lab_idx = {v: i for i, v in enumerate(uniq)}
    lab_codes = np.array([lab_idx[v] for v in labs])
    ref = ray.put((ids, mat, lab_codes, uniq))

    def predict(batch) -> pd.DataFrame:
        rid, rmat, rcode, runiq = ray.get(ref)
        from nexus_forge_ray.utils import list_column_to_matrix
        q = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        qid = batch[id_col].to_numpy(zero_copy_only=False)
        # fast candidate cut
        d2 = (q * q).sum(1)[:, None] - 2.0 * (q @ rmat.T) \
            + (rmat * rmat).sum(1)[None, :]
        d2[qid[:, None] == rid[None, :]] = np.inf      # exclude self
        cand = min(k + 8, d2.shape[1])
        top = np.argpartition(d2, cand - 1, axis=1)[:, :cand]
        # exact re-rank of the candidates (oracle formula), ties by id
        votes = np.zeros((len(q), len(runiq)), dtype=np.int64)
        diff = q[:, None, :] - rmat[top]               # (n, cand, d)
        exact = np.einsum("ncd,ncd->nc", diff, diff)
        exact[qid[:, None] == rid[top]] = np.inf
        order = np.lexsort((rid[top], exact), axis=1)[:, :k]
        knn_codes = np.take_along_axis(rcode[top], order, axis=1)
        # inf rows (the excluded self, when the seed set has < k non-self
        # candidates) must not vote — mask them out of the tally
        valid = np.isfinite(np.take_along_axis(exact, order, axis=1))
        rows = np.broadcast_to(np.arange(len(q))[:, None], knn_codes.shape)
        np.add.at(votes, (rows[valid], knn_codes[valid]), 1)
        pred = runiq[votes.argmax(axis=1)]             # argmax = smallest
        return pd.DataFrame({id_col: qid, out: pred})  # label on ties

    return ds.map_batches(predict, batch_format="pyarrow")
