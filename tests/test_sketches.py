"""HyperLogLog sketch: error bound vs exact, merge order-independence."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.sketches import (_estimate, _registers,
                                          approx_distinct,
                                          approx_distinct_grouped)


def test_hll_error_bound_vs_exact(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 80_000, size=200_000)  # ~73k distinct expected
    exact = len(np.unique(vals))
    ds = ray.data.from_pandas(pd.DataFrame({"v": [str(v) for v in vals]}))
    ds = ds.repartition(8)
    est = approx_distinct(ds, "v")
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_merge_is_order_independent():
    a = _registers(pd.Series([str(i) for i in range(1000)]))
    b = _registers(pd.Series([str(i) for i in range(500, 1500)]))
    m1 = np.maximum(a, b)
    m2 = np.maximum(b, a)
    assert (m1 == m2).all()
    # merged estimate ~ union cardinality (1500)
    assert abs(_estimate(m1) - 1500) / 1500 < 0.08


def test_hll_small_range_linear_counting():
    regs = _registers(pd.Series([str(i) for i in range(50)]))
    est = _estimate(regs)
    assert abs(est - 50) / 50 < 0.05


def test_grouped_sketch_matches_per_group_exact(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=60_000),
        "v": [str(x) for x in rng.integers(0, 5_000, size=60_000)],
    })
    ds = ray.data.from_pandas(df).repartition(6)
    got = approx_distinct_grouped(ds, "g", "v").to_pandas() \
        .set_index("g")["approx_distinct"]
    exact = df.groupby("g")["v"].nunique()
    for g in exact.index:
        assert abs(got[g] - exact[g]) / exact[g] < 0.06, g
