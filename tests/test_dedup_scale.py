"""Scale-path equivalence tests: bucketed anti-join dup drop vs broadcast,
embedding LSH near-dup (vectors off the shuffle), vectorized SimHash."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.dedup import SimHasher, embedding_near_dup_pairs
from nexus_forge_ray.ops.joins import partitioned_anti_join
from nexus_forge_ray.utils import stable_hash_u64


def test_partitioned_anti_join_matches_local():
    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.arange(100) * 2})
    drop = pd.DataFrame({"k": np.array([3, 7, 7, 50, 99, 1000],
                                       dtype=np.int64)})
    out = partitioned_anti_join(
        ray.data.from_pandas(left), ray.data.from_pandas(drop),
        on="k", num_buckets=8, lcols=["k", "v"]).to_pandas()
    want = left[~left["k"].isin(set(drop["k"]))]
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("k").reset_index(drop=True))


def test_partitioned_anti_join_empty_right():
    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    empty = pd.DataFrame({"k": pd.Series(dtype="int64")})
    out = partitioned_anti_join(
        ray.data.from_pandas(left), ray.data.from_pandas(empty),
        on="k", num_buckets=4, lcols=["k"]).to_pandas()
    assert sorted(out["k"]) == list(range(10))


def test_flagship_anti_join_path_matches_broadcast(sf_dir):
    """dup_broadcast_limit=0 forces the bucketed anti-join; the surviving
    triple set must be identical to the (default) broadcast-probe path."""
    from nexus_forge_ray.pipelines.kg_pipeline import flagship
    a = flagship(sf_dir).to_pandas()
    b = flagship(sf_dir, dup_broadcast_limit=0).to_pandas()
    cols = ["subj", "pred", "obj"]
    ga = a[cols].sort_values(cols).reset_index(drop=True)
    gb = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, gb)


def test_embedding_near_dup_finds_planted_pairs():
    rng = np.random.RandomState(0)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    near = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
    mat = np.vstack([base, near])
    df = pd.DataFrame({"vec_id": np.arange(25, dtype=np.int64),
                       "embedding": list(mat)})
    out = embedding_near_dup_pairs(ray.data.from_pandas(df),
                                   threshold=0.95).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(i, i + 20) for i in range(5)}
    assert (out["cosine"] >= 0.95).all()
    assert out["id_a"].dtype == np.int64 and out["id_b"].dtype == np.int64


def test_semantic_dedup_prunes_within_cluster_only():
    from nexus_forge_ray.ops.dedup import semantic_dedup
    # four collinear vectors (pairwise cosine = 1.0) whose magnitudes put
    # them in two k-means clusters: SemDeDup must prune within each
    # cluster (2->0, 3->1) but NEVER across (1 survives despite cosine 1
    # with 0) — the scoping that distinguishes it from global near-dup
    mat = np.zeros((4, 8), dtype=np.float64)
    mat[0, 0], mat[1, 0], mat[2, 0], mat[3, 0] = 1.0, 100.0, 2.0, 99.0
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": list(mat)})
    out = semantic_dedup(ray.data.from_pandas(df), k=2, iters=2,
                         threshold=0.999).to_pandas()
    got = dict(zip(out["removed_id"], out["kept_id"]))
    assert got == {2: 0, 3: 1}
    assert (out["cosine"] >= 0.999).all()
    cl = dict(zip(out["removed_id"], out["cluster"]))
    assert cl[2] != cl[3]


def test_winnowing_guarantee_and_disjoint_docs():
    import ray.data
    from nexus_forge_ray.ops.dedup import (winnow_fingerprints,
                                           winnow_near_dup_pairs)
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"   # w+k-1 = 6 tokens
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"one two {shared} three four",
                 f"nine eight {shared} seven six",
                 "completely different words with no overlap at all here"],
    })
    ds = ray.data.from_pandas(df)
    fps = winnow_fingerprints(ds, k=k, w=w).to_pandas()
    s1 = set(fps.loc[fps["doc_id"] == 1, "fp"])
    s2 = set(fps.loc[fps["doc_id"] == 2, "fp"])
    s3 = set(fps.loc[fps["doc_id"] == 3, "fp"])
    # the winnowing guarantee: a shared run of >= w+k-1 tokens always
    # leaves at least one shared fingerprint
    assert s1 & s2
    assert not (s1 & s3) and not (s2 & s3)
    pairs = winnow_near_dup_pairs(ds, k=k, w=w, min_shared=1).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(1, 2)}


def _naive_simhash(text, bits):
    toks = (text or "").split()
    if not toks:
        return np.uint64(0)
    uniq, counts = np.unique(toks, return_counts=True)
    h = stable_hash_u64(uniq).astype(np.uint64)
    bm = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
          & np.uint64(1)).astype(np.int64)
    votes = ((bm * 2 - 1) * counts[:, None]).sum(axis=0)
    return np.uint64(((votes > 0).astype(np.uint64) * bits).sum())


def test_simhash_batch_matches_naive():
    sh = SimHasher()
    texts = pd.Series(["hello world hello", "foo bar baz qux", "", "single",
                       "a a a a b b c", None, "x " * 50])
    got = sh.simhash_batch(texts)
    want = np.array([_naive_simhash(t, sh.bits) for t in texts],
                    dtype=np.uint64)
    assert (got == want).all()


def test_salted_join_matches_unsalted_on_skew():
    """One hot key dominating: salted join spreads it over salt_factor
    buckets but returns the same rows as the plain bucketed join."""
    rng = np.random.RandomState(7)
    n = 3000
    keys = np.where(rng.rand(n) < 0.7, 42,
                    rng.randint(0, 50, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "v": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "w": np.arange(50) * 10})
    from nexus_forge_ray.ops.joins import (hot_keys, partitioned_join,
                                           salted_join)
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    hot = hot_keys(lds, "k", threshold=500)
    assert hot == [42]
    got = salted_join(lds, rds, "k", hot=hot, salt_factor=4,
                      lcols=["k", "v"], rcols=["k", "w"]).to_pandas()
    want = partitioned_join(lds, rds, "k",
                            lcols=["k", "v"], rcols=["k", "w"]).to_pandas()
    key = ["k", "v", "w"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True).astype("int64"),
        want[key].sort_values(key).reset_index(drop=True).astype("int64"))


def test_asof_join_semantics():
    left = pd.DataFrame({
        "k": [1, 1, 2, 3], "t": [10, 20, 15, 5],
        "lv": ["a", "b", "c", "d"]}).astype({"t": "int64"})
    right = pd.DataFrame({
        "k": [1, 1, 2], "t": [8, 18, 15],
        "rt": [8, 18, 15], "rv": ["x", "y", "z"]}).astype({"t": "int64"})
    from nexus_forge_ray.ops.joins import asof_join
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="t", by="k", num_buckets=4,
                    lcols=["k", "t", "lv"],
                    rcols=["k", "t", "rt", "rv"]).to_pandas()
    got = {(r.k, r.t): (r.rt, r.rv) for r in out.itertuples()}
    # backward: nearest right with rt <= t, per key; k=3 has no match -> drop;
    # equal timestamps match (t=15 joins rt=15)
    assert got == {(1, 10): (8, "x"), (1, 20): (18, "y"), (2, 15): (15, "z")}


def test_range_join_semantics():
    left = pd.DataFrame({"k": [1, 1, 2], "t": [100, 200, 50]})
    right = pd.DataFrame({"k": [1, 1, 1, 2], "rt": [80, 95, 150, 50]})
    from nexus_forge_ray.ops.joins import range_join
    out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     by="k", on="t", low=-30, high=0, r_on="rt",
                     lcols=["k", "t"], rcols=["k", "rt"],
                     num_buckets=4).to_pandas()
    got = sorted(zip(out["k"], out["t"], out["rt"]))
    # t=100: rt in [70,100] -> 80, 95; t=200: rt in [170,200] -> none;
    # t=50 (k=2): rt=50 inclusive upper bound
    assert got == [(1, 100, 80), (1, 100, 95), (2, 50, 50)]


def test_simhash_near_dup_finds_planted_pairs():
    """Planted near-identical docs (one token changed out of 60) have tiny
    hamming distance; unrelated docs don't collide. Pigeonhole blocking with
    max_hamming < num_bands guarantees exact recall."""
    rng = np.random.RandomState(3)
    vocab = np.array([f"w{i}" for i in range(500)])
    base_docs = [" ".join(rng.choice(vocab, 300)) for _ in range(20)]
    near = []
    for d in base_docs[:5]:
        toks = d.split()
        toks[7] = "CHANGED"
        near.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64),
                       "text": base_docs + near})
    from nexus_forge_ray.ops.dedup import simhash_near_dup_pairs
    out = simhash_near_dup_pairs(ray.data.from_pandas(df),
                                 max_hamming=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert {(i, i + 20) for i in range(5)} <= got
    # no pairs among the unrelated originals
    assert not any(a < 20 and b < 20 for a, b in got)
    assert (out["hamming"] <= 3).all()


def test_pack_sequences_invariants(sf_dir):
    """Every doc packed exactly once; no sequence exceeds the budget unless
    it holds a single over-long doc; deterministic across runs."""
    import ray.data
    from nexus_forge_ray.ops.text import pack_sequences
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = pack_sequences(docs, max_tokens=256).to_pandas()
    all_ids = [d for row in out["doc_ids"] for d in row]
    assert sorted(all_ids) == sorted(
        docs.to_pandas()["doc_id"].tolist())  # exactly once
    over = out[out["total_tokens"] > 256]
    assert (over["n_docs"] == 1).all()  # only single over-long docs overflow
    out2 = pack_sequences(docs, max_tokens=256).to_pandas()
    assert sorted(out["seq_id"]) == sorted(out2["seq_id"])  # deterministic


def test_mixture_sample_thresholds():
    import ray.data
    from nexus_forge_ray.ops.text import mixture_sample
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "source": ["a"] * 100 + ["b"] * 100})
    out = mixture_sample(ray.data.from_pandas(df),
                         {"a": 0.3, "b": 1.0}).to_pandas()
    a = out[out["source"] == "a"]["doc_id"]
    assert len(a) == 30 and (a % 100 < 30).all()
    assert len(out[out["source"] == "b"]) == 100


def test_dedup_incremental_cross_shard(ray_session, tmp_path):
    """Delta shard drops content an earlier run accepted; rerunning the
    same shard is idempotent (0 survivors)."""
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.dedup import dedup_incremental
    idx = str(tmp_path / "fp_index")
    a = pd.DataFrame({"doc_id": range(10),
                      "text": [f"t{i}" for i in range(10)]})
    # 5 cross-shard dups, one internal dup (t15 twice), 4 new
    b = pd.DataFrame({"doc_id": range(10, 20),
                      "text": [f"t{i}" for i in range(5)]
                      + ["t15", "t15", "t16", "t17", "t18"]})
    sa = dedup_incremental(ray.data.from_pandas(a).repartition(3), idx) \
        .to_pandas()
    sb = dedup_incremental(ray.data.from_pandas(b).repartition(3), idx) \
        .to_pandas()
    assert sorted(sa["doc_id"]) == list(range(10))
    assert sorted(sb["text"]) == ["t15", "t16", "t17", "t18"]
    assert sb.loc[sb["text"] == "t15", "doc_id"].item() == 15  # min-id wins
    again = dedup_incremental(ray.data.from_pandas(b), idx).to_pandas()
    assert len(again) == 0


def test_jaccard_verify_adaptive_paths_agree(ray_session):
    # the broadcast (small-side) and distributed (bucketed-join) verify
    # paths must produce identical (pair, jaccard) outputs
    import numpy as np

    from nexus_forge_ray.ops.dedup import (_jaccard_verify_distributed,
                                           jaccard_verify_pairs)
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = []
    for i in range(30):
        base = [vocab[int(x)] for x in rng.integers(0, len(vocab), 12)]
        texts.append(" ".join(base))
        if i % 3 == 0:   # a near-dup neighbor
            mut = list(base)
            mut[5] = "mut"
            texts.append(" ".join(mut))
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ids = docs["doc_id"].to_numpy()
    pairs = pd.DataFrame({
        "id_a": ids[:-1:2], "id_b": ids[1::2]})   # arbitrary explicit pairs
    docs_ds = ray.data.from_pandas(docs).repartition(3)
    pairs_ds = ray.data.from_pandas(pairs).repartition(2)

    bc = jaccard_verify_pairs(pairs_ds, docs_ds, threshold=0.2,
                              shingle_size=3).to_pandas()
    dist = _jaccard_verify_distributed(pairs_ds.materialize(), docs_ds,
                                       threshold=0.2, k=3,
                                       text_col="text",
                                       id_col="doc_id").to_pandas()

    def norm(df):
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)[
            ["id_a", "id_b", "jaccard"]].astype(
                {"id_a": "int64", "id_b": "int64", "jaccard": "float64"})
    pd.testing.assert_frame_equal(norm(bc), norm(dist))
    assert len(bc) > 0     # the mutated neighbors must survive


def test_jaccard_verify_switches_to_distributed(ray_session):
    # broadcast_limit=0 forces the distributed plan through the public API
    from nexus_forge_ray.ops.dedup import jaccard_verify_pairs
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e", "a b c d x", "q r s t u"]})
    pairs = pd.DataFrame({"id_a": [1, 1], "id_b": [2, 3]})
    out = jaccard_verify_pairs(
        ray.data.from_pandas(pairs), ray.data.from_pandas(docs),
        threshold=0.3, shingle_size=3, broadcast_limit=0).to_pandas()
    assert out[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    # shingles of 1: {abc,bcd,cde}; of 2: {abc,bcd,cdx} -> J = 2/4
    assert out["jaccard"].tolist() == [0.5]


def test_jaccard_verify_distributed_empty_docs_and_dup_pairs(ray_session):
    # review findings r5: (a) empty-empty candidate pairs must score 1.0
    # on BOTH plans (minhash emits them: all-zero signatures collide);
    # (b) duplicate input pairs must not square the intersection counts
    from nexus_forge_ray.ops.dedup import jaccard_verify_pairs
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["", "   ", "a b c d e", "a b c d x"]})
    pairs = pd.DataFrame({
        "id_a": [1, 3, 3],            # (3,4) duplicated
        "id_b": [2, 4, 4]})
    kw = dict(threshold=0.3, shingle_size=3)
    bc = jaccard_verify_pairs(
        ray.data.from_pandas(pairs), ray.data.from_pandas(docs),
        **kw).to_pandas()
    dist = jaccard_verify_pairs(
        ray.data.from_pandas(pairs), ray.data.from_pandas(docs),
        broadcast_limit=0, **kw).to_pandas()
    # broadcast: per input row -> (1,2):1.0, (3,4):0.5 twice
    assert sorted(map(tuple, bc[["id_a", "id_b", "jaccard"]].values)) == \
        [(1, 2, 1.0), (3, 4, 0.5), (3, 4, 0.5)]
    # distributed: distinct pairs, same values
    assert sorted(map(tuple, dist[["id_a", "id_b", "jaccard"]].values)) == \
        [(1, 2, 1.0), (3, 4, 0.5)]
