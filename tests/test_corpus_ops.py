"""Round-2 corpus operators: PII redaction, normalization, decontamination,
grouped top-k — oracle-checked vs DuckDB plus unit edge cases."""

import pandas as pd
import pytest
import ray.data

from nexus_forge_ray.ops import text as tx
from nexus_forge_ray.ops.agg import grouped_topk
from nexus_forge_ray.pipelines import corpus
from nexus_forge_ray.pipelines.oracles import ORACLES

from .helpers import assert_frames_match

from nexus_forge_ray.pipelines import relational

CASES = {
    "doc_pii_redact": corpus.doc_pii_redact,
    "doc_normalize": corpus.doc_normalize,
    "doc_decontaminate": corpus.doc_decontaminate,
    "doc_top_per_lang": corpus.doc_top_per_lang,
    "simhash_signatures": corpus.simhash_signatures,
    "simhash_near_dup": corpus.simhash_near_dup,
    "q_events_median": relational.q_events_median,
    "q_events_running": relational.q_events_running,
    "doc_span_dedup": corpus.doc_span_dedup,
    "doc_heavy_tokens": corpus.doc_heavy_tokens,
    "q_events_distinct_users": relational.q_events_distinct_users,
    "q_events_top_users": relational.q_events_top_users,
    "q_es_agg": corpus.q_es_agg,
    "doc_tfidf": corpus.doc_tfidf,
    "doc_bm25": corpus.doc_bm25,
    "emb_semdedup": corpus.emb_semdedup,
    "doc_bigram_logprob": corpus.doc_bigram_logprob,
    "doc_ppl_buckets": corpus.doc_ppl_buckets,
    "doc_chunk_windows": corpus.doc_chunk_windows,
    "doc_temperature_mixture": corpus.doc_temperature_mixture,
    "doc_bpe_encode": corpus.doc_bpe_encode,
    "similarity_topk_ivf_full": corpus.similarity_topk_ivf_full,
    "doc_winnowing": corpus.doc_winnowing,
    "mm_audio_spectral": corpus.mm_audio_spectral,
    "mm_image_stats": corpus.mm_image_stats,
    "mm_image_formats": corpus.mm_image_formats,
    "doc_inverted_index": corpus.doc_inverted_index,
    "q_es_should": corpus.q_es_should,
    "q_es_match_phrase": corpus.q_es_match_phrase,
    "q_es_match": corpus.q_es_match,
    "q_events_pivot": relational.q_events_pivot,
    "q_events_gap": relational.q_events_gap,
    "q_revenue_rollup": relational.q_revenue_rollup,
    "dsir_weights": corpus.dsir_weights,
    "doc_substring_dedup": corpus.doc_substring_dedup,
    "doc_epoch_shuffle": corpus.doc_epoch_shuffle,
    "doc_ngram_jaccard": corpus.doc_ngram_jaccard,
    "doc_gopher_rules": corpus.doc_gopher_rules,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_query_matches_oracle(name, duck, sf_dir):
    got = CASES[name](sf_dir)
    want = duck.sql(ORACLES[name]).df()
    assert_frames_match(got, want, tol=1e-4)


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    """Prefix-filtered all-pairs join == brute-force Jaccard on a corpus with
    planted near-dups, exact dups, short docs (<k tokens) and empty docs."""
    from nexus_forge_ray.ops import dedup as dd

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [
            "a b c d e f g h",                       # 0
            "a b c d e f g x",                       # 1: J(0,1)=5/7
            "completely different words sit here",   # 2
            "a b",                                   # 3: short
            "a b",                                   # 4: short dup of 3
            "",                                      # 5: empty
            "",                                      # 6: empty dup of 5
            "a b c d e f g h",                       # 7: exact dup of 0
        ]})

    def shingles(t):
        toks = t.split()
        if len(toks) <= 3:
            return frozenset({" ".join(toks)})
        return frozenset(" ".join(toks[i:i + 3])
                         for i in range(len(toks) - 2))

    for thr in (0.5, 0.7, 1.0):
        got = dd.ngram_jaccard_pairs(
            ray.data.from_pandas(docs), threshold=thr).to_pandas()
        exp = set()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a, b = shingles(docs.text[i]), shingles(docs.text[j])
                jac = len(a & b) / len(a | b)
                if jac >= thr:
                    exp.add((i, j, round(jac, 4)))
        assert set(zip(got.id_a, got.id_b, got.jaccard)) == exp, thr


def test_pii_redact_kinds():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["mail a@b.com and c.d+x@e.org now",
                 "server 10.0.0.1 backup 192.168.1.255",
                 "call +1 555-0100 or +44 20-7946-0958"],
    })
    out = tx.pii_redact(ray.data.from_pandas(df)).to_pandas()
    assert out["n_emails"].tolist() == [2, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0]
    assert out["n_phones"].tolist() == [0, 0, 2]
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[1, "clean_text"] == "server <IP> backup <IP>"
    assert out.loc[2, "clean_text"] == "call <PHONE> or <PHONE>"


def test_normalize_text():
    df = pd.DataFrame({"doc_id": [1], "text": ["  Hello\t WORLD\n\n x  "]})
    out = tx.normalize_text(ray.data.from_pandas(df)).to_pandas()
    assert out.loc[0, "norm_text"] == "hello world x"
    assert out.loc[0, "n_chars_norm"] == 13


def test_shingle_frame_mirrors_minhasher():
    from nexus_forge_ray.ops.dedup import MinHasher
    texts = pd.Series(["a b c d e", "x y", "", "one two three"])
    got = tx.shingle_frame(texts, k=3)
    mh = MinHasher()
    for i, t in enumerate(texts):
        want = set(mh._shingles(t))
        assert set(got.loc[got["i"] == i, "sh"]) == want, f"row {i}"


def test_contamination_flags_overlap():
    bench = frozenset({"a b c", "q r s"})
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["z a b c d",        # contains shingle 'a b c'
                 "clean text with no overlap at all",
                 "q r s"],           # whole-text shingle match
    })
    out = tx.contamination(ray.data.from_pandas(docs), bench).to_pandas()
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    assert got == {1: 1, 3: 1}


def test_md5_u64_matches_duckdb(duck):
    from nexus_forge_ray.utils import md5_u64
    toks = ["abc", "", "hello world", "café", "123"]
    got = md5_u64(toks)
    for t, g in zip(toks, got):
        want = duck.sql("select md5_number_lower(?)", params=[t]).fetchone()[0]
        assert int(g) == int(want), t


def test_simhash_md5_basis_differs_only_in_token_hash():
    """Both bases share the vote machinery: identical texts agree with
    themselves, and near-identical texts stay within a few bits, per basis."""
    from nexus_forge_ray.ops.dedup import SimHasher
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")
    for basis in ("siphash", "md5"):
        sh = SimHasher(hash_basis=basis)
        assert sh.simhash(a) == sh.simhash(a)
        ham = bin(int(sh.simhash(a)) ^ int(sh.simhash(b))).count("1")
        assert ham <= 16, (basis, ham)


def test_grouped_topk_deterministic():
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": [5, 9, 9, 1, 2, 2, 2],
        "id": [10, 11, 12, 13, 20, 21, 22],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = grouped_topk(ds, "g", "v", k=2, ascending=False,
                       tiebreak=["id"]).to_pandas()
    out = out.sort_values(["g", "id"]).reset_index(drop=True)
    # a: the two 9s (ids 11, 12); b: ties on v=2 -> lowest ids 20, 21
    assert list(map(tuple, out[["g", "id"]].to_numpy())) == \
        [("a", 11), ("a", 12), ("b", 20), ("b", 21)]


def test_span_dedup_first_occurrence_wins(ray_session):
    import ray.data
    from nexus_forge_ray.ops.dedup import span_dedup
    # k=2 chunks: doc 1 = [a b][c d]; doc 2 repeats [a b] (dropped) and adds
    # [x y]; doc 3 is entirely chunks seen before -> empty text survives
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b x y", "c d"],
    })
    out = span_dedup(ray.data.from_pandas(df).repartition(3), k=2) \
        .to_pandas().set_index("doc_id")["text"].to_dict()
    assert out == {1: "a b c d", 2: "x y", 3: ""}


def test_span_dedup_drops_intra_doc_repeats(ray_session):
    import ray.data
    from nexus_forge_ray.ops.dedup import span_dedup
    df = pd.DataFrame({"doc_id": [7], "text": ["p q p q p"]})
    out = span_dedup(ray.data.from_pandas(df), k=2).to_pandas()
    # chunks: [p q][p q][p] -> second [p q] is a global repeat of the first
    assert out.loc[0, "text"] == "p q p"


def test_elastic_terms_agg_metrics(ray_session):
    import ray.data
    from nexus_forge_ray.core.filters import elastic_terms_agg
    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "b", "c"],
        "v": [1, 3, 10, 20, 30, 100],
    })
    out = elastic_terms_agg(ray.data.from_pandas(df).repartition(3), {
        "query": {"range": {"v": {"lt": 100}}},
        "aggs": {"by_g": {"terms": {"field": "g", "size": 2},
                          "aggs": {"s": {"sum": {"field": "v"}},
                                   "m": {"max": {"field": "v"}},
                                   "a": {"avg": {"field": "v"}}}}},
    })
    # c filtered out; b (3 docs) before a (2 docs)
    assert out["key"].tolist() == ["b", "a"]
    assert out["doc_count"].tolist() == [3, 2]
    assert out["s"].tolist() == [60, 4]
    assert out["m"].tolist() == [30, 3]
    assert out["a"].tolist() == [20.0, 2.0]


def test_normalize_urls_rules(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.text import normalize_urls
    urls = pd.DataFrame({"url": [
        "HTTP://WWW.Example.COM:80/Path/One/",
        "https://Host.Example.com:443/p#frag",
        "https://a.com:4430/x",            # non-default port kept
        "http://b.com:443/x",              # 443 on http kept
        "HTTPS://C.com",                   # authority-only
        "https://d.com/CaseKept?Q=Up#f",
    ]})
    out = normalize_urls(ray.data.from_pandas(urls)).to_pandas()
    assert out["url_norm"].tolist() == [
        "http://www.example.com/Path/One",
        "https://host.example.com/p",
        "https://a.com:4430/x",
        "http://b.com:443/x",
        "https://c.com",
        "https://d.com/CaseKept?Q=Up",
    ]


def test_snapshot_diff_statuses(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.diff import snapshot_diff
    old = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {"k": [2, 3, 4], "v": ["b", "X", "d"]}))
    out = snapshot_diff(old, new, "k", ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert dict(zip(out["k"], out["status"])) == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    row3 = out[out["k"] == 3].iloc[0]
    assert row3["v_old"] == "c" and row3["v_new"] == "X"
    delta = snapshot_diff(old, new, "k", ["v"],
                          include_unchanged=False).to_pandas()
    assert set(delta["k"]) == {1, 3, 4}


def test_compact_parquet(ray_session, sf_dir, tmp_path):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.ops.compact import compact_parquet
    src = str(tmp_path / "frag")
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "n_chars"])
    docs.repartition(20).write_parquet(src)      # fragment into small files
    out = str(tmp_path / "compacted")
    stats = compact_parquet(src, out, target_rows_per_file=300)
    assert stats["files_in"] >= 10
    assert stats["files_out"] < stats["files_in"]
    a = pd.read_parquet(src).sort_values("doc_id").reset_index(drop=True)
    b = pd.read_parquet(out).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dsir_weights_separate_target_from_junk(ray_session, tmp_path):
    # docs matching the curated-target distribution must outweigh docs
    # matching the raw-pool distribution
    tgt = "good clean prose flows here " * 4
    junk = "zz qq xx vv kk jj " * 4
    df = pd.DataFrame({
        "doc_id": [10, 20, 3, 17, 5, 6],
        #          ^target slice  ^raw sample  ^scored probes
        "text": [tgt, tgt, junk, junk, tgt, junk],
        "lang": ["en"] * 6,
    })
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = corpus.dsir_weights(str(tmp_path)).to_pandas() \
        .set_index("doc_id")["dsir_weight"]
    assert out[5] > out[6]
    assert out[10] > 0 > out[3]


def test_substring_dedup_catches_offset_duplicates(ray_session):
    # the duplicated passage sits at DIFFERENT offsets — span_dedup's
    # aligned chunks would miss it; overlapping windows must not
    from nexus_forge_ray.ops.dedup import substring_dedup
    passage = "one two three four five six seven eight"       # 8 tokens
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"intro {passage}",            # first occurrence (kept)
                 f"a b c {passage} tail",       # offset 3: passage cut
                 "totally unrelated text here"],
    })
    out = substring_dedup(ray.data.from_pandas(df).repartition(3), k=8) \
        .to_pandas().set_index("doc_id")["text"].to_dict()
    assert out[1] == f"intro {passage}"
    assert out[2] == "a b c tail"
    assert out[3] == "totally unrelated text here"


def test_substring_dedup_within_doc_and_long_runs(ray_session):
    from nexus_forge_ray.ops.dedup import substring_dedup
    run = " ".join(f"w{i}" for i in range(12))   # 12-token duplicated run
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [f"{run} mid {run}",  # within-doc repeat: 2nd copy cut
                 f"pre {run} post"],  # cross-doc: whole 12-token run cut
    })
    out = substring_dedup(ray.data.from_pandas(df).repartition(2), k=8) \
        .to_pandas().set_index("doc_id")["text"].to_dict()
    assert out[1] == f"{run} mid"
    assert out[2] == "pre post"


def test_global_row_number_and_ntile(ray_session):
    """global_row_number == pandas rank on a multi-block dataset with
    duplicate sort values (unique composite key); ntile_of == SQL NTILE."""
    import duckdb
    import numpy as np

    from nexus_forge_ray.ops.agg import global_row_number, ntile_of

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"score": rng.randint(0, 20, size=257) / 4.0,
                       "id": np.arange(257)})
    ds = ray.data.from_pandas(df).repartition(9)
    out = global_row_number(ds, ["score", "id"],
                            descending=[True, False],
                            rank_col="r").to_pandas()
    want = df.sort_values(["score", "id"], ascending=[False, True]) \
        .reset_index(drop=True)
    got = out.sort_values("r").reset_index(drop=True)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["r"].tolist() == list(range(257))

    for n, tiles in ((257, 3), (9, 4), (2, 5), (12, 3)):
        ranks = np.arange(n)
        got_t = ntile_of(ranks, n, tiles)
        want_t = duckdb.sql(
            f"select ntile({tiles}) over (order by r) from "
            f"(select unnest(generate_series(0, {n - 1})) as r)"
        ).df().iloc[:, 0].to_numpy()
        assert (got_t == want_t).all(), (n, tiles)
