"""Text-analysis operators over a document table — all vectorized map_batches stages.

These are the training-data-pipeline text ops (language ID, quality scoring,
token counting, fingerprinting). Each function takes/returns a Dataset and is
a thin composition of `map_batches` with a vectorized body; nothing touches
the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from nexus_forge_ray.utils import md5_hex, stable_hash_u64

# Tiny per-language stopword lists for the n-gram/stopword language-ID heuristic.
# Public knowledge (most frequent function words per language).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and a to in is it you that he was for on are".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su".split()),
    "fr": frozenset("le la de et les des en un du une est pour qui dans".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "zh": frozenset("的 一 是 不 了 人 我 在 有 他 这 中 大 来".split()),
}

_TOKEN_RE = r"[^\s]+"
_PUNCT_RE = r"[\.,;:!\?\'\"\(\)\[\]\{\}-]"
# BPE-ish word/number/punct splitter (GPT-2 style pattern, simplified, public).
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append whitespace-token and BPE-ish token counts. Zero-copy Arrow kernels."""
    txt = batch[text_col]
    ws = pc.count_substring_regex(txt, _TOKEN_RE)
    bpe = pc.count_substring_regex(txt, _BPE_RE)
    batch = batch.append_column("n_tokens", pc.cast(ws, pa.int64()))
    batch = batch.append_column("n_bpe_tokens", pc.cast(bpe, pa.int64()))
    return batch


def token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: token_count_batch(t, text_col), batch_format="pyarrow"
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals: length, token stats, punctuation ratio, stopword ratio.

    All pyarrow.compute kernels — no Python loop.
    """
    txt = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(txt, _TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(txt, _PUNCT_RE), pa.int64())
    n_stop = pc.cast(
        pc.count_substring_regex(
            txt, r"\b(" + "|".join(sorted(STOPWORDS["en"])) + r")\b"
        ),
        pa.int64(),
    )
    tok = pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())
    chars = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    batch = batch.append_column("n_chars_m", n_chars)
    batch = batch.append_column("n_tokens", n_tokens)
    # round ties toward +inf to match SQL ROUND on these positive ratios (ties are real here:
    # ratios with power-of-two denominators hit exact .5 boundaries)
    r4 = dict(ndigits=4, round_mode="half_towards_infinity")
    batch = batch.append_column(
        "mean_token_len",
        pc.round(pc.divide(pc.cast(n_chars, pa.float64()), tok), **r4))
    batch = batch.append_column(
        "punct_ratio",
        pc.round(pc.divide(pc.cast(n_punct, pa.float64()), chars), **r4))
    batch = batch.append_column(
        "stopword_ratio",
        pc.round(pc.divide(pc.cast(n_stop, pa.float64()), tok), **r4))
    return batch


def quality_scores(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: quality_score_batch(t, text_col), batch_format="pyarrow"
    )


# Gopher quality-filter word list (Rae et al. 2021, appendix A1.1: "contains
# at least 2 of the following English words")
_GOPHER_STOP_RE = r"\b(the|be|to|of|and|that|have|with)\b"


def gopher_rules_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher document-quality rules (Rae et al. 2021, A1.1) — the published
    thresholds, all pyarrow.compute kernels (RE2, same engine as the oracle):

      50 <= word count <= 100,000;  3 <= mean word length <= 10;
      symbol-to-word ratio ('#', '...', '…') <= 0.1;
      >= 80% of words contain an alphabetic character;
      >= 2 of {the, be, to, of, and, that, have, with}.

    Emits the per-rule signals plus `passes` (0/1) so downstream mixtures can
    cut on individual signals, not just the verdict.
    """
    txt = batch[text_col]
    n_words = pc.cast(pc.count_substring_regex(txt, _TOKEN_RE), pa.int64())
    chars_ns = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(txt, r"\s", "")), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(
        txt, r"\S*[A-Za-z]\S*"), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(txt, _GOPHER_STOP_RE),
                     pa.int64())
    n_sym = pc.add(pc.count_substring(txt, "#"),
                   pc.add(pc.count_substring(txt, "..."),
                          pc.count_substring(txt, "…")))
    wf = pc.cast(pc.max_element_wise(n_words, 1), pa.float64())
    mwl = pc.divide(pc.cast(chars_ns, pa.float64()), wf)
    af = pc.divide(pc.cast(n_alpha, pa.float64()), wf)
    sr = pc.divide(pc.cast(n_sym, pa.float64()), wf)
    ok = pc.and_(
        pc.and_(
            pc.and_(pc.greater_equal(n_words, 50),
                    pc.less_equal(n_words, 100_000)),
            pc.and_(pc.greater_equal(mwl, 3.0), pc.less_equal(mwl, 10.0))),
        pc.and_(
            pc.and_(pc.less_equal(sr, 0.1), pc.greater_equal(af, 0.8)),
            pc.greater_equal(n_stop, 2)))
    r4 = dict(ndigits=4, round_mode="half_towards_infinity")
    batch = batch.append_column("n_words", n_words)
    batch = batch.append_column("mean_word_len", pc.round(mwl, **r4))
    batch = batch.append_column("alpha_frac", pc.round(af, **r4))
    batch = batch.append_column("symbol_ratio", pc.round(sr, **r4))
    batch = batch.append_column("n_stop", n_stop)
    batch = batch.append_column("passes", pc.cast(ok, pa.int64()))
    return batch


def gopher_rules(ds: ray.data.Dataset,
                 text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: gopher_rules_batch(t, text_col), batch_format="pyarrow")


class LangIdModel:
    """Stopword-vote language identifier — an actor-pool stage.

    Regexes compiled ONCE per actor in __init__ (reference pattern: lazy
    service loading, kgforge/core/archetypes/resolver.py:44). Per batch:
    one vectorized count per language, argmax vote; ties and zero votes
    fall back to 'und'.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(STOPWORDS)
        # \b is ASCII-only in RE2: for languages whose stopwords contain
        # non-ASCII word characters (zh), count plain substrings instead —
        # CJK stopwords are single hanzi that appear unsegmented in text.
        self.patterns = {
            lang: (
                r"\b(" + "|".join(sorted(words)) + r")\b"
                if all(w.isascii() for w in words)
                else "(" + "|".join(sorted(words)) + ")"
            )
            for lang, words in STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        votes = np.stack(
            [
                pc.count_substring_regex(txt, self.patterns[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for lang in self.langs
            ],
            axis=1,
        )
        best = votes.argmax(axis=1)
        nonzero = votes.max(axis=1) > 0
        langs_arr = np.array(self.langs, dtype=object)
        pred = np.where(nonzero, langs_arr[best], "und")
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def lang_id(ds: ray.data.Dataset, text_col: str = "text",
            concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency is None:
        return ds.map_batches(LangIdModel(text_col=text_col),
                              batch_format="pyarrow")
    return ds.map_batches(
        LangIdModel, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency,
    )


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style repetition signals (public heuristics from the Gopher /
    MassiveText filtering literature), fully vectorized:

    - top_token_frac: occurrences of the most frequent token / n_tokens —
      high values flag keyword-stuffed or boilerplate pages;
    - dup_bigram_frac: 1 - distinct_bigrams/total_bigrams — high values flag
      repeated phrasing / template text.

    One token explode + two pandas C-path groupbys per batch; no per-row loop.
    Ratios round half-up (4 digits, vectorized pyarrow kernel) to match SQL
    ROUND — power-of-two token counts DO produce exact .5 ties at 1e-4.
    """
    df = pd.DataFrame({id_col: batch[id_col].to_numpy(zero_copy_only=False),
                       "__t": batch[text_col].to_pandas()})
    tok_lists = df["__t"].fillna("").str.split()
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    n = len(df)
    top_frac = np.zeros(n, dtype=np.float64)
    dup_bg = np.zeros(n, dtype=np.float64)
    if lens.sum():
        ex = pd.DataFrame({
            "i": np.repeat(np.arange(n), lens),
            "tok": tok_lists.explode().dropna().to_numpy(),
        })
        cnt = ex.groupby(["i", "tok"], sort=False).size()
        mx = cnt.groupby(level=0).max()
        top_frac[mx.index.to_numpy()] = \
            mx.to_numpy() / lens[mx.index.to_numpy()]
        # bigrams: join consecutive tokens within each doc
        has2 = lens >= 2
        if has2.any():
            toks = ex["tok"].to_numpy(dtype=object)
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            keep = np.ones(len(ex), dtype=bool)
            keep[starts[1:] - 1] = False  # last token of each doc: no bigram
            first = toks[:-1][keep[:-1]] if len(toks) > 1 else toks[:0]
            second = toks[1:][keep[:-1]] if len(toks) > 1 else toks[:0]
            bi = pd.DataFrame({
                "i": np.repeat(np.arange(n), np.maximum(lens - 1, 0)),
                "g": pd.Series(first, dtype=object).str.cat(
                    pd.Series(second, dtype=object), sep=" "),
            })
            agg = bi.groupby("i")["g"].agg(["size", "nunique"])
            dup_bg[agg.index.to_numpy()] = \
                1.0 - agg["nunique"].to_numpy() / agg["size"].to_numpy()

    def r4(a: np.ndarray) -> np.ndarray:  # half-up, matching SQL ROUND
        return pc.round(pa.array(a), ndigits=4,
                        round_mode="half_towards_infinity") \
            .to_numpy(zero_copy_only=False)

    return pd.DataFrame({id_col: df[id_col].to_numpy(),
                         "top_token_frac": r4(top_frac),
                         "dup_bigram_frac": r4(dup_bg)})


def repetition_signals(ds: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: repetition_batch(t, text_col, id_col),
        batch_format="pyarrow")


def mixture_sample(ds: ray.data.Dataset, weights: dict[str, float], *,
                   source_col: str = "source", id_col: str = "doc_id",
                   default: float = 0.0) -> ray.data.Dataset:
    """Deterministic training-mixture construction: keep a per-source
    fraction of documents (down-weighting over-represented sources is the
    standard mixture step before training). Selection is `id % 100 <
    weight*100` — reproducible across runs/nodes, no RNG state, and
    expressible in the SQL oracle. A pure map-side filter: no shuffle."""
    wref = {k: float(v) for k, v in weights.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        w = df[source_col].map(wref).fillna(default).to_numpy()
        sel = (df[id_col].to_numpy() % 100) < w * 100
        return df[sel]

    return ds.map_batches(keep, batch_format="pandas")


class SequencePacker:
    """Greedy first-fit packing of documents into fixed-token-budget training
    sequences — an actor-pool stage holding the open-bin state per block.

    Documents longer than `max_tokens` become their own (overflowing)
    sequence, mirroring common packing implementations that truncate
    downstream. Packing is per-BLOCK (sequences never span blocks): the
    partitioning assumption is that block-level packing efficiency is enough
    — global packing would serialize the corpus.
    """

    def __init__(self, max_tokens: int = 2048, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.max_tokens = max_tokens
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_tok = batch[self.text_col].fillna("").str.split().map(len) \
            .to_numpy(dtype=np.int64)
        ids = batch[self.id_col].to_numpy()
        seq_of = np.empty(len(batch), dtype=np.int64)
        fill: list[int] = []   # open-bin loads (first-fit)
        for i, t in enumerate(n_tok):
            for s, load in enumerate(fill):
                if load + t <= self.max_tokens:
                    fill[s] += t
                    seq_of[i] = s
                    break
            else:
                seq_of[i] = len(fill)
                fill.append(int(t))
        out = pd.DataFrame({"seq": seq_of, self.id_col: ids,
                            "n_tokens": n_tok})
        agg = out.groupby("seq").agg(
            doc_ids=(self.id_col, list), total_tokens=("n_tokens", "sum"),
            n_docs=(self.id_col, "size")).reset_index(drop=True)
        # globally-unique sequence ids: derive from the member doc ids
        agg["seq_id"] = [int(stable_hash_u64([",".join(map(str, d))])[0]
                             >> np.uint64(1)) for d in agg["doc_ids"]]
        return agg[["seq_id", "doc_ids", "total_tokens", "n_docs"]]


def pack_sequences(ds: ray.data.Dataset, max_tokens: int = 2048, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   concurrency: int | None = None) -> ray.data.Dataset:
    kw = dict(max_tokens=max_tokens, text_col=text_col, id_col=id_col)
    if concurrency is None:
        return ds.map_batches(SequencePacker(**kw), batch_format="pandas")
    return ds.map_batches(SequencePacker, fn_constructor_kwargs=kw,
                          batch_format="pandas", concurrency=concurrency)


# --------------------------------------------------------------- PII redaction

# RE2-compatible patterns (pyarrow and DuckDB both use RE2, so the oracle
# applies the byte-identical expressions).
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d\- ]{7,}\d"
_PII_STEPS = (("n_emails", PII_EMAIL_RE, "<EMAIL>"),
              ("n_ipv4", PII_IPV4_RE, "<IP>"),
              ("n_phones", PII_PHONE_RE, "<PHONE>"))


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / IPv4 addresses / +international phone numbers with
    placeholder tokens, counting each kind first. Sequential replacement
    (emails, then IPs, then phones) so earlier placeholders can't be re-matched.
    Pure pyarrow RE2 kernels — zero-copy in, no Python loop."""
    txt = batch[text_col]
    counts = {}
    for name, pat, repl in _PII_STEPS:
        counts[name] = pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
        txt = pc.replace_substring_regex(txt, pat, repl)
    for name, _, _ in _PII_STEPS:
        batch = batch.append_column(name, counts[name])
    return batch.append_column("clean_text", txt)


def pii_redact(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: pii_redact_batch(t, text_col), batch_format="pyarrow")


def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Text normalization: unicode lowercase, collapse whitespace runs to a
    single space, strip leading/trailing spaces. Arrow kernels only."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    batch = batch.append_column("norm_text", t)
    return batch.append_column(
        "n_chars_norm", pc.cast(pc.utf8_length(t), pa.int64()))


def normalize_text(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: normalize_batch(t, text_col), batch_format="pyarrow")


# ----------------------------------------------------- benchmark decontamination

def shingle_frame(texts: pd.Series, k: int = 3) -> pd.DataFrame:
    """Distinct (i, sh) word-k-gram shingles per row position i — vectorized:
    one explode + k shifted views, no per-row Python loop. Mirrors
    MinHasher._shingles semantics (docs of <= k tokens shingle to the whole
    text; empty text shingles to '')."""
    tok_lists = texts.reset_index(drop=True).fillna("").str.split()
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    n = len(texts)
    parts: list[pd.DataFrame] = []
    small = lens <= k
    if small.any():
        whole = tok_lists[small].str.join(" ")
        parts.append(pd.DataFrame({"i": np.arange(n)[small],
                                   "sh": whole.to_numpy(dtype=object)}))
    big = ~small
    if big.any():
        bl = lens[big]
        toks = tok_lists[big].explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(n)[big], bl)
        ends = np.cumsum(bl)
        valid = np.ones(len(toks), dtype=bool)
        for j in range(1, k):      # last k-1 positions of each doc: no window
            valid[ends - j] = False
        win = np.arange(len(toks))[valid]
        sh = pd.Series(toks[win], dtype=object)
        for j in range(1, k):
            sh = sh.str.cat(pd.Series(toks[win + j], dtype=object), sep=" ")
        parts.append(pd.DataFrame({"i": doc_idx[win],
                                   "sh": sh.to_numpy(dtype=object)}))
    if not parts:
        return pd.DataFrame({"i": np.array([], dtype=np.int64),
                             "sh": np.array([], dtype=object)})
    return pd.concat(parts, ignore_index=True).drop_duplicates()


def shingle_set(ds: ray.data.Dataset, *, text_col: str = "text",
                k: int = 3) -> set[str]:
    """DISTINCT shingle set of a (small) benchmark dataset, computed
    distributed (per-batch dedup + bucketed distinct) and collected once.
    The caller broadcasts the result via ray.put — this is the small side of
    a decontamination check (real benchmark suites are a few MB), never the
    corpus side."""
    from nexus_forge_ray.ops.agg import distinct_rows

    sh = ds.map_batches(
        lambda df: shingle_frame(df[text_col], k)[["sh"]].drop_duplicates(),
        batch_format="pandas")
    return set(distinct_rows(sh, "sh").to_pandas()["sh"])


class ContaminationChecker:
    """Actor-pool stage flagging corpus docs that share any k-gram shingle
    with a broadcast benchmark shingle set (train/test decontamination).

    The set is ray.put once and fetched ONCE per actor in __init__ (broadcast
    pattern) — never per batch. Per batch: vectorized shingle explode + one
    hash-table isin + groupby count."""

    def __init__(self, bench_ref, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3):
        import ray as _ray
        self.bench = (bench_ref if isinstance(bench_ref, (set, frozenset))
                      else _ray.get(bench_ref))
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = shingle_frame(batch[self.text_col], self.k)
        hits = sh[sh["sh"].isin(self.bench)]
        cnt = hits.groupby("i").size()
        ids = batch[self.id_col].to_numpy()
        return pd.DataFrame({self.id_col: ids[cnt.index.to_numpy()],
                             "n_overlap": cnt.to_numpy().astype("int64")})


def contamination(ds: ray.data.Dataset, bench_ref, *, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  concurrency: int | None = None) -> ray.data.Dataset:
    """(id, n_overlap) rows for docs sharing >= 1 distinct shingle with the
    benchmark set. bench_ref: a ray.ObjectRef (preferred at scale) or a set."""
    kw = dict(bench_ref=bench_ref, text_col=text_col, id_col=id_col, k=k)
    if concurrency is None:
        checker = ContaminationChecker(**kw)
        return ds.map_batches(checker, batch_format="pandas")
    return ds.map_batches(ContaminationChecker, fn_constructor_kwargs=kw,
                          batch_format="pandas", concurrency=concurrency)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprints: md5 hex (exact identity) + 64-bit rolling-style hash."""
    txt = batch[text_col].to_pandas()
    batch = batch.append_column("fp_md5", pa.array(md5_hex(txt), type=pa.string()))
    batch = batch.append_column(
        "fp_u64", pa.array(stable_hash_u64(txt).astype(np.uint64), type=pa.uint64())
    )
    return batch


def fingerprints(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: fingerprint_batch(t, text_col), batch_format="pyarrow"
    )


def token_rows(ds: ray.data.Dataset, text_col: str = "text",
               keep_cols: list[str] | None = None,
               out_col: str = "token") -> ray.data.Dataset:
    """Explode documents into one row per whitespace token (vectorized
    split+explode; empty/whitespace-only docs contribute no rows). Carries
    `keep_cols` (default: every non-text column) alongside each token —
    the fan-out stage for vocabulary building and distinct-count sketches."""
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        cols = (keep_cols if keep_cols is not None
                else [c for c in batch.columns if c != text_col])
        toks = batch[text_col].str.split()
        lens = toks.map(len).to_numpy()
        out = pd.DataFrame({out_col: toks.explode().dropna().to_numpy()})
        for c in cols:
            out[c] = batch[c].to_numpy().repeat(lens)
        return out
    return ds.map_batches(explode, batch_format="pandas")


def normalize_urls(ds: ray.data.Dataset, url_col: str = "url",
                   out: str = "url_norm") -> ray.data.Dataset:
    """URL canonicalization for web-corpus dedup-by-url (the step before
    exact URL dedup on a crawl): strip the fragment, lowercase the
    scheme+authority (path/query case is significant, host case is not),
    drop default ports (:80 http, :443 https) and trailing slashes.

    All four rules are single-pass vectorized regexes in a fixed order,
    each exactly mirrorable in SQL (regexp_replace/regexp_extract) so the
    operator is oracle-checkable end-to-end.
    """
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out] = normalize_url_series(batch[url_col])
        return batch

    return ds.map_batches(fn, batch_format="pandas")


_AUTH_RE = r"^([a-zA-Z][\w+.-]*://[^/?#]*)"


def normalize_url_series(u: pd.Series) -> pd.Series:
    """The pure vectorized rule chain behind `normalize_urls` (exposed for
    direct/property testing; idempotent by construction)."""
    u = u.astype(str)
    u = u.str.replace(r"#.*$", "", regex=True)              # 1 fragment
    pre = u.str.extract(_AUTH_RE, expand=False).fillna("")
    rest = u.str.replace(_AUTH_RE, "", regex=True)
    u = pre.str.lower() + rest                              # 2 authority
    # capture-group form (no lookahead): RE2 — the SQL oracle's
    # regex engine — has no lookahead, and both sides must share the
    # exact regex for the oracle to be meaningful
    u = u.str.replace(r"^(http://[^/?#]*):80($|[/?#])", r"\1\2",
                      regex=True)                           # 3 ports
    u = u.str.replace(r"^(https://[^/?#]*):443($|[/?#])", r"\1\2",
                      regex=True)
    return u.str.replace(r"/+$", "", regex=True)            # 4 trailing /


def chunk_windows(ds: ray.data.Dataset, *, window: int = 32,
                  stride: int = 24, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Overlapping token-window chunking — the RAG/embedding-prep splitter:
    one chunk per (doc, start) with start stepping by `stride`, each chunk
    `window` tokens (the last one shorter). Map-side only (no shuffle);
    tokenization is split-on-single-space so chunk boundaries reproduce in
    SQL (string_split semantics: empty text yields one empty token).

    Returns (id_col, chunk_id, chunk_text, n_tokens)."""
    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        ids, cids, texts, ns = [], [], [], []
        for i, t in zip(df[id_col], df[text_col].astype(str)):
            toks = t.split(" ")
            for ci, start in enumerate(range(0, len(toks), stride)):
                seg = toks[start:start + window]
                ids.append(i)
                cids.append(ci)
                texts.append(" ".join(seg))
                ns.append(len(seg))
        return pd.DataFrame({id_col: ids,
                             "chunk_id": pd.array(cids, dtype="int64"),
                             "chunk_text": pd.array(texts, dtype=object),
                             "n_tokens": pd.array(ns, dtype="int64")})

    return ds.map_batches(chunks, batch_format="pandas")
