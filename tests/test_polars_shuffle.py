"""GRAFT_SHUFFLE_POLARS pilot: the polars shuffle kernels must be
row-for-row equivalent to the default pandas kernels on the semantic
edge cases the pandas path deliberately preserves (NaN-key matching,
object-int exactness, null-skipping `first`)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops.agg import hash_groupby_agg
from nexus_forge_ray.ops.joins import partitioned_join

BIG = 2 ** 60 + 3


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: "\x00null"
                            if v is None or (isinstance(v, float)
                                             and np.isnan(v)) else repr(v))
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


def _both(monkeypatch, run):
    monkeypatch.delenv("GRAFT_SHUFFLE_POLARS", raising=False)
    base = run()
    monkeypatch.setenv("GRAFT_SHUFFLE_POLARS", "1")
    pilot = run()
    monkeypatch.delenv("GRAFT_SHUFFLE_POLARS", raising=False)
    return base, pilot


def test_groupby_agg_parity(ray_session, monkeypatch):
    df = pd.DataFrame({
        "k": ["a", "a", None, None, "b", "b"],
        "v": [1, 2, 3, 4, None, 6],
        "s": ["x", None, "y", "z", "w", "q"],
    })

    def run():
        ds = ray.data.from_pandas(df).repartition(3)
        return hash_groupby_agg(
            ds, "k", {"n": ("v", "count"), "nn": ("v", "count_nonnull"),
                      "sv": ("v", "sum"), "mn": ("v", "min"),
                      "fs": ("s", "first")}).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))


def test_groupby_agg_bigint_exact(ray_session, monkeypatch):
    # object-int keys/values above 2^53 must survive the polars round-trip
    df = pd.DataFrame({
        "k": pd.Series([BIG, BIG, BIG + 1, None], dtype=object),
        "v": pd.Series([BIG, 1, 2, 3], dtype=object),
    })

    def run():
        ds = ray.data.from_pandas(df).repartition(2)
        return hash_groupby_agg(
            ds, "k", {"mx": ("v", "max"), "n": ("v", "count")}).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))
    assert BIG in [int(x) for x in pilot["mx"] if x is not None]


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_partitioned_join_parity(ray_session, monkeypatch, how):
    left = pd.DataFrame({
        "k": ["a", "b", None, "d"],
        "lv": [1.5, 2.5, 3.5, 4.5],
    })
    right = pd.DataFrame({
        "k": ["a", "a", None, "e"],
        "rv": ["p", "q", "r", "s"],
    })

    def run():
        lds = ray.data.from_pandas(left).repartition(2)
        rds = ray.data.from_pandas(right).repartition(2)
        return partitioned_join(
            lds, rds, on="k", how=how,
            lcols=["k", "lv"], rcols=["k", "rv"]).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))


def test_partitioned_join_extra_keys(ray_session, monkeypatch):
    left = pd.DataFrame({"k": [1, 1, 2], "g": ["x", "y", "x"],
                         "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [1, 2, 2], "g": ["x", "x", "z"],
                          "rv": [7, 8, 9]})

    def run():
        lds = ray.data.from_pandas(left).repartition(2)
        rds = ray.data.from_pandas(right).repartition(2)
        return partitioned_join(
            lds, rds, on="k", extra_keys=["g"], how="inner",
            lcols=["k", "g", "lv"], rcols=["k", "g", "rv"]).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))


def test_distinct_rows_parity(ray_session, monkeypatch):
    from nexus_forge_ray.ops.agg import distinct_rows
    df = pd.DataFrame({
        "k": ["a", "a", None, None, "b", "a"],
        "v": [1, 1, 2, 2, 3, 9],
        "x": pd.Series([BIG, BIG, 1, 2, 3, 4], dtype=object),
    })

    def run():
        ds = ray.data.from_pandas(df).repartition(2)
        return distinct_rows(ds, ["k", "v"]).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))
    assert len(pilot) == 4   # (a,1) (null,2) (b,3) (a,9)


def test_grouped_topk_parity(ray_session, monkeypatch):
    from nexus_forge_ray.ops.agg import grouped_topk
    df = pd.DataFrame({
        "lang": ["en", "en", "en", "fr", "fr", None, "en"],
        "score": [3.0, 9.0, 9.0, 1.0, 2.0, 5.0, np.nan],
        "doc": ["a", "b", "c", "d", "e", "f", "g"],
    })

    def run():
        ds = ray.data.from_pandas(df).repartition(3)
        return grouped_topk(ds, "lang", "score", k=2, ascending=False,
                            tiebreak=["doc"]).to_pandas()

    base, pilot = _both(monkeypatch, run)
    pd.testing.assert_frame_equal(_norm(base), _norm(pilot))
    # ties break on doc asc: en -> b, c ; fr -> e, d ; None key drops
    top = pilot.sort_values(["lang", "doc"]).reset_index(drop=True)
    assert top["doc"].tolist() == ["b", "c", "d", "e"]
