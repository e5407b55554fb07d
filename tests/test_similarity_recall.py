"""IVF approximate search must retain high recall vs brute force."""

import numpy as np
import pyarrow.parquet as pq
import ray.data

from nexus_forge_ray.ops import similarity as sim


def test_ivf_recall_vs_brute_force(sf_dir):
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas().head(5)
    qmat = np.stack(qdf["embedding"].to_numpy())
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    exact = sim.cosine_topk(emb, qdf["vec_id"].tolist(), qmat, k=10)
    approx = sim.ivf_topk(emb, qdf["vec_id"].tolist(), qmat, k=10,
                          n_centroids=8, nprobe=4)
    recalls = []
    for qid in qdf["vec_id"]:
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls  # nprobe=4 of 8 centroids


def test_mm_image_features_rows(sf_dir):
    from nexus_forge_ray.pipelines.corpus import mm_image_features
    out = mm_image_features(sf_dir).to_pandas()
    assert len(out) > 0
    assert (out["dim"] == 16).all()
    assert (out["width"] >= 16).all()


def test_ivf_persisted_index_matches_inline(sf_dir, tmp_path):
    """ivf_build_index + ivf_search_index returns the same results as the
    inline ivf_topk (same deterministic centroids -> same probed partitions),
    while reading only the probed partition directories."""
    import numpy as np
    import os
    import pyarrow.parquet as pq
    import ray.data
    from nexus_forge_ray.ops.similarity import (ivf_build_index,
                                                ivf_search_index, ivf_topk)
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "<", 3)]).to_pandas()
    qmat = np.stack(qdf["embedding"].to_numpy())
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    idx = ivf_build_index(emb, str(tmp_path / "ivf"), n_centroids=8)
    assert os.path.exists(os.path.join(idx, "_centroids.npy"))
    assert any(d.startswith("centroid_id=") for d in os.listdir(idx))
    got = ivf_search_index(idx, qdf["vec_id"].tolist(), qmat, k=5, nprobe=4)
    want = ivf_topk(emb, qdf["vec_id"].tolist(), qmat, k=5,
                    n_centroids=8, nprobe=4)
    assert got[["query_id", "vec_id"]].values.tolist() == \
        want[["query_id", "vec_id"]].values.tolist()
    assert np.allclose(got["score"], want["score"])


def test_knn_small_seed_set_self_never_votes(ray_session):
    """Seed set smaller than k: the excluded self must not leak its gold
    label into the vote."""
    import numpy as np
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.similarity import knn_classify
    # 3 vectors: v0 sits next to two label-1 vectors; its own label is 0.
    df = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "label": [0, 1, 1],
        "embedding": [np.array([0.0, 0.0], dtype=np.float32),
                      np.array([0.1, 0.0], dtype=np.float32),
                      np.array([0.0, 0.1], dtype=np.float32)],
    })
    ds = ray.data.from_pandas(df)
    out = knn_classify(ds, df, k=5).to_pandas().sort_values("vec_id")
    # with self excluded and only 2 real neighbors, v0's vote is 1-1... wait
    assert out.loc[out["vec_id"] == 0, "pred"].iloc[0] == 1
