"""BPE merge learning vs an independent reference implementation, plus
determinism and encode invariants."""

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops.bpe import END, bpe_encode_counts, bpe_learn


def _reference_bpe(texts, n_merges):
    """Independent naive trainer: corpus-wide token list, full pair recount
    each round, (count desc, pair asc) selection."""
    from collections import Counter
    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    vocab = {w: tuple(w) + (END,) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        best_n = max(pairs.values())
        pair = min(p for p, n in pairs.items() if n == best_n)
        merges.append((pair[0], pair[1], best_n))
        new = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        vocab = new
    return merges


def _corpus_ds(texts, n_blocks=5):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    return ray.data.from_pandas(df).repartition(n_blocks)


TEXTS = ["low lower lowest low low",
         "newer newest new low wide wider",
         "widest wide wide new newer",
         "low low lower newest wide"] * 3


def test_bpe_learn_matches_reference(ray_session):
    got = bpe_learn(_corpus_ds(TEXTS), n_merges=12)
    want = _reference_bpe(TEXTS, 12)
    assert [(r.left, r.right, r.freq) for r in got.itertuples()] == want


def test_bpe_learn_layout_independent(ray_session):
    one = bpe_learn(_corpus_ds(TEXTS, n_blocks=1), n_merges=8)
    many = bpe_learn(_corpus_ds(TEXTS, n_blocks=11), n_merges=8)
    pd.testing.assert_frame_equal(one, many)


def test_bpe_learn_on_fixture(sf_dir):
    merges = bpe_learn(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"]), n_merges=10)
    assert len(merges) == 10
    assert merges["rank"].tolist() == list(range(10))
    assert (merges["freq"] > 0).all()


def test_bpe_encode_counts(ray_session):
    ds = _corpus_ds(TEXTS)
    merges = bpe_learn(ds, n_merges=12)
    out = bpe_encode_counts(ds, merges).to_pandas().sort_values("doc_id")
    assert len(out) == len(TEXTS)
    # with zero merges every word costs len(word)+1 symbols; with merges the
    # count can only shrink, and never below the word count
    no_merge = bpe_encode_counts(ds, merges.head(0)).to_pandas() \
        .sort_values("doc_id")
    chars = np.array([sum(len(w) + 1 for w in t.split()) for t in TEXTS])
    words = np.array([len(t.split()) for t in TEXTS])
    assert (no_merge["n_bpe_tokens"].to_numpy() == chars).all()
    got = out["n_bpe_tokens"].to_numpy()
    assert (got <= chars).all() and (got >= words).all()
    assert got.sum() < chars.sum()  # merges actually reduced symbol count


def test_bpe_merges_match_sql_oracle(duck, sf_dir):
    """The unrolled-CTE oracle reproduces bpe_learn's 20 merges exactly."""
    from nexus_forge_ray.pipelines.corpus import doc_bpe_merges
    from nexus_forge_ray.pipelines.oracles import ORACLES
    from tests.helpers import assert_frames_match
    got = doc_bpe_merges(sf_dir)
    want = duck.sql(ORACLES["doc_bpe_merges"]).df()
    assert_frames_match(got, want)
