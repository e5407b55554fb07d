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


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    import ray
    from nexus_forge_ray.ops.sketches import bloom_build, bloom_prefilter
    keys = pd.DataFrame({"k": [f"key-{i}" for i in range(5_000)]})
    probe = pd.DataFrame({"k": [f"key-{i}" for i in range(20_000)]})
    bits = 1 << 18
    ref = bloom_build(ray.data.from_pandas(keys).repartition(4), "k",
                      num_bits=bits, num_hashes=5)
    kept = bloom_prefilter(ray.data.from_pandas(probe).repartition(4), ref,
                           "k", num_bits=bits, num_hashes=5).to_pandas()
    kept_set = set(kept["k"])
    # every true member survives
    assert set(keys["k"]).issubset(kept_set)
    # false positives bounded: (1-e^{-kn/m})^k ~ 0.9% here; allow 3%
    fp = len(kept_set) - len(keys)
    assert fp / 15_000 < 0.03, fp


def test_heavy_hitters_finds_true_heavies(ray_session):
    import ray
    from nexus_forge_ray.ops.sketches import heavy_hitters
    rng = np.random.default_rng(11)
    # 3 planted heavy values + uniform tail
    tail = [f"t{x}" for x in rng.integers(0, 20_000, size=50_000)]
    vals = ["hot-a"] * 9_000 + ["hot-b"] * 6_000 + ["hot-c"] * 3_000 + tail
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    out = heavy_hitters(ds, "v", capacity=128)
    top = out.head(3)["v"].tolist()
    assert set(top) == {"hot-a", "hot-b", "hot-c"}
    # MG estimates never exceed true counts
    est = out.set_index("v")["est_count"]
    assert est["hot-a"] <= 9_000 and est["hot-b"] <= 6_000


def test_approx_quantiles_rank_error(ray_session):
    import ray
    from nexus_forge_ray.ops.sketches import approx_quantiles
    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 1.5, size=300_000)  # heavy-tailed on purpose
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(12)
    got = approx_quantiles(ds, "x", (0.1, 0.5, 0.9, 0.99),
                           sample_per_block=2048)
    svals = np.sort(vals)
    for q, g in zip((0.1, 0.5, 0.9, 0.99), got):
        # rank of the estimate must be within 0.5% of the target rank
        rank = np.searchsorted(svals, g) / len(svals)
        assert abs(rank - q) < 0.005, (q, g, rank)


def test_approx_quantiles_grouped_vs_exact(ray_session):
    import ray
    from nexus_forge_ray.ops.sketches import approx_quantiles_grouped
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], size=120_000),
        "x": rng.gamma(2.0, 3.0, size=120_000),
    })
    ds = ray.data.from_pandas(df).repartition(10)
    got = approx_quantiles_grouped(ds, "g", "x", q=0.9).to_pandas() \
        .set_index("g")["approx_q"]
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["x"].to_numpy())
        rank = np.searchsorted(vals, got[g]) / len(vals)
        assert abs(rank - 0.9) < 0.01, (g, rank)


def test_count_min_bounds(ray_session):
    """One-sided error: est >= true always; est <= true + (e/width)*N for
    every queried value on a fixed-seed zipfish stream (deterministic)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.sketches import count_min

    rng = np.random.RandomState(3)
    vals = (rng.zipf(1.3, size=20_000) % 500).astype(str)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    sk = count_min(ds, "v", width=1024, depth=4)

    true = pd.Series(vals).value_counts()
    est = sk.query(true.index.to_numpy())
    n = len(vals)
    eps = np.e / 1024
    assert (est >= true.to_numpy()).all()
    assert (est - true.to_numpy() <= eps * n).all()
    # sketch totals: every row sums to the full (unit-weight) stream
    assert (sk.table.sum(axis=1) == n).all()
