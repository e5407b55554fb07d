"""Distributed logistic regression: reference equality, separation,
layout independence."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops.classifier import logreg_score, logreg_train


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def _reference_gd(x, y, lr, iters):
    """Plain-numpy full-batch GD on the bias-augmented design matrix."""
    xa = np.hstack([np.ones((len(x), 1)), x])
    w = np.zeros(xa.shape[1])
    for _ in range(iters):
        w = w - lr * xa.T @ (_sigmoid(xa @ w) - y) / len(x)
    return w


def _toy(n=200, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(np.float64)
    return pd.DataFrame({"f1": x[:, 0], "f2": x[:, 1], "y": y,
                         "rid": np.arange(n)})


def test_matches_numpy_reference(ray_session):
    df = _toy()
    ds = ray.data.from_pandas(df).repartition(5)
    w = logreg_train(ds, ["f1", "f2"], "y", lr=1.0, iters=3)
    ref = _reference_gd(df[["f1", "f2"]].to_numpy(), df["y"].to_numpy(),
                        1.0, 3)
    assert np.allclose(w, ref, atol=1e-12)


def test_separable_data_classified(ray_session):
    df = _toy(300)
    ds = ray.data.from_pandas(df).repartition(4)
    w = logreg_train(ds, ["f1", "f2"], "y", lr=5.0, iters=60)
    scored = logreg_score(ds, w, ["f1", "f2"], ndigits=None).to_pandas() \
        .sort_values("rid")
    acc = ((scored["score"] >= 0.5).astype(float).to_numpy()
           == df.sort_values("rid")["y"].to_numpy()).mean()
    assert acc >= 0.97


def test_block_layout_independence(ray_session):
    df = _toy(150)
    w1 = logreg_train(ray.data.from_pandas(df).repartition(2),
                      ["f1", "f2"], "y", iters=2)
    w2 = logreg_train(ray.data.from_pandas(df).repartition(11),
                      ["f1", "f2"], "y", iters=2)
    assert np.allclose(w1, w2, atol=1e-12)


def test_empty_dataset_returns_zero_weights(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"f1": [], "f2": [], "y": []}))
    w = logreg_train(ds, ["f1", "f2"], "y", iters=2)
    assert np.allclose(w, 0.0)


def test_query_matches_oracle(ray_session, sf_dir, duck):
    from nexus_forge_ray.pipelines.corpus import doc_quality_classifier
    from nexus_forge_ray.pipelines.oracles import ORACLES
    got = doc_quality_classifier(sf_dir).sort_values("doc_id") \
        .reset_index(drop=True)
    want = duck.sql(ORACLES["doc_quality_classifier"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert np.allclose(got["score"], want["score"], atol=1e-9)
    # the trained scores separate en from non-en on the toy corpus
    assert got["score"].nunique() > 1
