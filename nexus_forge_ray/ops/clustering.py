"""Distributed Lloyd's k-means over an embedding column.

The reference exposes no clustering, but a training-data curation pipeline
needs it (semantic bucketing / topic balancing before sampling). Scale
shape, Ray-Data-first:

- the corpus NEVER shuffles: each iteration is one streaming `map_batches`
  pass that emits at most k (count, sum-vector) partial rows per batch;
- centroids (k x d float64) are the only broadcast state (`ray.put` once
  per iteration, read by every task);
- the driver reduce sees n_blocks x k x d floats (kilobytes for any sane
  k, d — e.g. 1000 blocks x 16 x 64 x 8 B = 8 MB at 100 TB corpus scale),
  the canonical tiny-partials pattern, cheaper than a k-row shuffle;
- assignment is a final streaming pass adding a `cluster` column.

Deterministic (and therefore SQL-oracle-checkable with unrolled CTEs):
init centroids are the vectors of the k smallest ids; argmin distance
ties break toward the smaller cluster id (np.argmin / ORDER BY dist, cid);
a cluster left empty by an update keeps its previous centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from nexus_forge_ray.utils import list_column_to_matrix


def _init_centroids(ds: ray.data.Dataset, k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """Vectors of the k smallest ids. Map-side per-batch k-smallest cut,
    then a driver merge of <= k rows per block (k rows total survive)."""
    def cut(batch: pa.Table) -> pa.Table:
        tbl = batch.select([id_col, vec_col])
        order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")])
        return tbl.take(order[: min(k, len(order))])

    small = ds.map_batches(cut, batch_format="pyarrow").to_pandas()
    small = small.sort_values(id_col, kind="mergesort").head(k)
    return np.stack(small[vec_col].to_numpy()).astype(np.float64)


def _sq_dists(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact squared Euclidean distances (n, k). The full (x-c)^2 expansion
    keeps the same floating-point formula as the SQL oracle's
    list_distance (sqrt is monotonic, argmin unaffected); the faster
    |x|^2 - 2x.c + |c|^2 form can flip argmin on near-ties."""
    diff = mat[:, None, :] - cent[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def kmeans_assign(ds: ray.data.Dataset, k: int = 10, iters: int = 2, *,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out: str = "cluster") -> ray.data.Dataset:
    """(id, cluster) after `iters` assignment rounds: assignment t uses the
    centroids updated from assignment t-1; the output is the final
    assignment (the last update is never computed)."""
    ds = ds.materialize()  # read once, iterate many times
    cent = _init_centroids(ds, k, id_col, vec_col)
    d = cent.shape[1]

    for _ in range(iters - 1):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pd.DataFrame:
            c = ray.get(cent_ref)
            mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
            a = _sq_dists(mat, c).argmin(axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=k)
            return pd.DataFrame({"cluster": np.arange(k, dtype=np.int64),
                                 "n": counts.astype(np.int64),
                                 "s": list(sums)})

        stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        for cid, grp in stats.groupby("cluster"):
            counts[cid] = grp["n"].sum()
            sums[cid] = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]

    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        a = _sq_dists(mat, c).argmin(axis=1).astype(np.int64)
        return pa.table({id_col: batch[id_col], out: pa.array(a)})

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_sizes(ds: ray.data.Dataset, k: int = 10, iters: int = 2, *,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> pd.DataFrame:
    """Cluster -> member count for the final assignment (k rows)."""
    assigned = kmeans_assign(ds, k, iters, id_col=id_col, vec_col=vec_col)
    return (assigned.groupby("cluster").count().to_pandas()
            .rename(columns={"count()": "n_members"})
            .sort_values("cluster").reset_index(drop=True))


def pca_project(ds: ray.data.Dataset, k: int = 8, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                out: str = "pca") -> ray.data.Dataset:
    """Distributed PCA: project each embedding onto the top-k principal
    components. Same two-pass partial-sum shape as k-means:

    - pass 1 streams the corpus once, emitting per-batch (n, sum-vector,
      d x d outer-product sum) — the driver reduce sees n_blocks tiny rows
      and eigendecomposes the d x d covariance (d is the embedding dim,
      64-4096 in practice; the corpus never leaves the cluster);
    - pass 2 broadcasts the (d, k) component matrix and projects per batch.

    Deterministic: components ordered by eigenvalue descending, each
    sign-normalized so its max-|coefficient| entry is positive. Verified
    against a single-process numpy reference (tests/test_clustering.py)."""
    ds = ds.materialize()

    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        return pd.DataFrame({"n": [len(mat)],
                             "s": [mat.sum(axis=0)],
                             "ss": [(mat.T @ mat).ravel()]})

    stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(stats["n"].sum())
    s = np.sum(np.stack(stats["s"].to_numpy()), axis=0)
    ss = np.sum(np.stack(stats["ss"].to_numpy()), axis=0)
    d = s.shape[0]
    mu = s / n
    cov = (ss.reshape(d, d) - n * np.outer(mu, mu)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, np.argsort(evals)[::-1][:k]]          # (d, k)
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(comp.shape[1])])
    comp = comp * flip
    comp_ref = ray.put((mu, comp))

    def project(batch: pa.Table) -> pa.Table:
        mu2, c = ray.get(comp_ref)
        mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        proj = (mat - mu2) @ c
        return pa.table({
            id_col: batch[id_col],
            out: pa.FixedSizeListArray.from_arrays(
                pa.array(proj.astype(np.float32).ravel()), proj.shape[1])})

    return ds.map_batches(project, batch_format="pyarrow")


def class_centroids(ds: ray.data.Dataset, *, label_col: str = "label",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """Per-class mean vectors (nearest-centroid-classifier prototypes /
    class-balanced semantic summaries). Same tiny-partials shape as
    k-means: one streaming pass emits at most n_labels (count, sum-vector)
    rows per batch; the driver reduce sees n_blocks x n_labels tiny rows.
    Returns a DataFrame (label, centroid ndarray) sorted by label."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        lab = batch[label_col].to_numpy(zero_copy_only=False)
        labs, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(labs), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(labs))
        return pd.DataFrame({"label": labs, "n": counts.astype(np.int64),
                             "s": list(sums)})

    stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for lab, grp in stats.groupby("label"):
        n = int(grp["n"].sum())
        s = np.sum(np.stack(grp["s"].to_numpy()), axis=0)
        rows.append({"label": lab, "n": n, "centroid": s / n})
    return pd.DataFrame(rows).sort_values("label").reset_index(drop=True)


def nearest_centroid_assign(ds: ray.data.Dataset,
                            centroids: pd.DataFrame, *,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            out: str = "pred") -> ray.data.Dataset:
    """Nearest-centroid classification: broadcast the (tiny) class
    prototypes once, one streaming argmin-distance pass (same exact
    squared-distance formula as k-means so ties behave identically;
    ties break toward the smaller label)."""
    labels = centroids["label"].to_numpy()
    cent = np.stack(centroids["centroid"].to_numpy()).astype(np.float64)
    cent_ref = ray.put((labels, cent))

    def assign(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(cent_ref)
        mat = list_column_to_matrix(batch[vec_col]).astype(np.float64)
        a = _sq_dists(mat, c).argmin(axis=1)
        return pa.table({id_col: batch[id_col],
                         out: pa.array(labs[a])})

    return ds.map_batches(assign, batch_format="pyarrow")
