"""DuckDB oracle SQL for every oracle-checkable queries() entry.

Column names/aliases MUST match the Ray pipeline outputs exactly — the driver
sorts columns by name before value-hashing. Float aggregates are rounded the
same way on both sides.

Remaining no-oracle queries (each with its justification):
- similarity_topk_ivf: approximate by design (IVF probe subset); gated by a
  recall-vs-brute-force test (tests/test_similarity_recall.py), while the
  exact variant similarity_topk IS oracle-checked.
- mm_image_features: decode kernels are honest stubs (no codecs in this env);
  only plumbing (schema/actor pool) is real, rows-only is the right check.
- doc_pack_sequences: greedy first-fit packing is stateful per block (no SQL
  equivalent); invariants test-gated (budget respected, every doc packed
  exactly once, deterministic).
- kg_flagship: end-to-end DAG including near-dup canonicalization; gated by
  the triple precision/recall harness (P=1.0, R>=0.95 vs an independent
  pandas oracle, tests/test_precision_recall.py) rather than SQL.
- doc_approx_distinct: HLL sketch, approximate by design (~1.6% std error);
  gated by the error-bound-vs-exact test (tests/test_sketches.py), while the
  exact variant q_events_distinct_users IS oracle-checked.
- emb_pca: principal components come from an eigendecomposition — no SQL
  equivalent; gated by a same-algorithm numpy reference comparison and
  layout-independence tests (tests/test_clustering.py).
- kg_host_rank: PageRank over the href-extracted host graph; the link
  synthesis basis is SipHash (not reproducible in DuckDB) — gated by the
  link-extraction-vs-synthesis-rule and rank-mass-conservation tests
  (tests/test_pages.py), while kg_pagerank (mention graph) is covered by
  the same fixed-iteration kernel.
"""

from nexus_forge_ray.ops.text import STOPWORDS


def _lang_pattern(words: frozenset[str]) -> str:
    """Mirror ops.text.LangIdModel's per-language regex exactly."""
    ws = "|".join(sorted(words))
    if all(w.isascii() for w in words):
        return r"\b(" + ws + r")\b"
    return "(" + ws + ")"


_LANGS = sorted(STOPWORDS)
_LANG_COUNTS = ",\n                   ".join(
    f"len(regexp_extract_all(text, '{_lang_pattern(STOPWORDS[lang])}'))"
    f"::bigint as c_{lang}" for lang in _LANGS)
# argmax with first-of-sorted-langs tie-break == numpy argmax over sorted cols
_LANG_ARGMAX = ("case when greatest("
                + ", ".join(f"c_{lang}" for lang in _LANGS) + ") = 0 then 'und'\n")
for _i, _lang in enumerate(_LANGS[:-1]):
    _rest = ", ".join(f"c_{l}" for l in _LANGS[_i + 1:])
    _g = f"greatest({_rest})" if "," in _rest else _rest
    _LANG_ARGMAX += f"                    when c_{_lang} >= {_g} then '{_lang}'\n"
_LANG_ARGMAX += f"                    else '{_LANGS[-1]}' end"

_EN_STOP_PATTERN = _lang_pattern(STOPWORDS["en"])

# SimHash bit votes in SQL: the engine's md5 hash basis equals DuckDB's
# md5_number_lower, so each of the 64 fingerprint bits is a per-token vote
# sum (+1 if the token-hash bit is set, else -1; bit set iff the sum > 0,
# matching SimHasher's `votes > 0` tie rule). Empty/whitespace-only docs
# fingerprint to 0 (the engine sees zero tokens).
_SIMHASH_BITSUMS = ",\n                      ".join(
    f"sum(case when (h >> {i}) & 1 = 1 then 1 else -1 end) as s{i}"
    for i in range(64))
# literal powers of two: DuckDB's << raises on (1 << 63) even for ubigint
_SIMHASH_COMBINE = "\n                 | ".join(
    f"(case when s{i} > 0 then {1 << i}::ubigint else 0::ubigint end)"
    for i in range(64))
_SIMHASH_SIG = f"""
        tok as (select doc_id, unnest(string_split(text, ' ')) as t
                from documents where coalesce(trim(text), '') != ''),
        h as (select doc_id, md5_number_lower(t) as h from tok),
        b as (select doc_id,
                      {_SIMHASH_BITSUMS}
              from h group by doc_id),
        sig as (select doc_id,
                   {_SIMHASH_COMBINE}
                as simhash from b
                union all
                select doc_id, 0::ubigint from documents
                where coalesce(trim(text), '') = '')
"""

# the engine's mention+lang triple set as a reusable CTE `t` — shared by the
# kg_triples oracle and the BGP self-join oracle
_KG_TRIPLES_CTE = """
        toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                 from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash')),
        t as (select 'http://example.org/doc/' || doc_id as subj,
                     'http://example.org/vocab/mentions' as pred,
                     'http://example.org/entity/' || tok as obj
              from m
              union all
              select 'http://example.org/doc/' || doc_id,
                     'http://example.org/vocab/lang', lang
              from documents)
"""

# the quad (named-graph) view: one graph per source feed; mention + lang
# quads — shared by the kg_quads / kg_graph_* oracles
_KG_QUADS_CTE = """
        toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                 from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash')),
        q as (select 'http://example.org/graph/' || d.source as graph,
                     'http://example.org/doc/' || m.doc_id as subj,
                     'http://example.org/vocab/mentions' as pred,
                     'http://example.org/entity/' || m.tok as obj
              from m join documents d using (doc_id)
              union all
              select 'http://example.org/graph/' || source,
                     'http://example.org/doc/' || doc_id,
                     'http://example.org/vocab/lang', lang
              from documents)
"""

# true 3-gram shingle sets per doc (docs of <= 3 tokens shingle to the whole
# text, mirroring MinHasher._shingles) — shared by the near-dup oracles
_SHINGLE_PAIRS = """
        t as (select doc_id, string_split(text, ' ') as toks from documents),
        idx as (select doc_id, toks,
                       unnest(generate_series(1, greatest(len(toks) - 2, 1)))
                       as i
                from t),
        sh0 as (select doc_id,
                       case when len(toks) <= 3 then array_to_string(toks, ' ')
                            else toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       end as sh
                from idx),
        ds as (select distinct doc_id, sh from sh0),
        sizes as (select doc_id, count(*) as n from ds group by 1),
        pair_int as (select x.doc_id as id_a, y.doc_id as id_b,
                            count(*) as inter
                     from ds x join ds y on x.sh = y.sh
                                        and x.doc_id < y.doc_id
                     group by 1, 2),
        jpairs as (select id_a, id_b,
                          inter::double / (sa.n + sb.n - inter) as j
                   from pair_int
                   join sizes sa on id_a = sa.doc_id
                   join sizes sb on id_b = sb.doc_id)
"""

def _pagerank_cte(iters: int = 3, d: float = 0.85) -> tuple[str, str]:
    """Unrolled fixed-iteration PageRank matching kg.pagerank's formula:
    r_i = (1-d)/N + d*(contrib_sum + dangling_mass/N)."""
    parts = []
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f"""
        d{i} as (select coalesce(sum(r.r), 0) as dm from {prev} r
                 left join deg on r.node = deg.src where deg.src is null),
        c{i} as (select e.dst as node, sum({prev}.r / deg.outd) as s
                 from e join {prev} on e.src = {prev}.node
                        join deg on e.src = deg.src group by 1),
        r{i} as (select nodes.node,
                        (1 - {d}) / nn.n
                        + {d} * (coalesce(c{i}.s, 0)
                                 + (select dm from d{i}) / nn.n) as r
                 from nodes cross join nn
                 left join c{i} on nodes.node = c{i}.node)""")
        prev = f"r{i}"
    return ",".join(parts), prev


_PR_ITERS, _PR_LAST = _pagerank_cte()


def _pagerank_weighted_cte(iters: int = 3, d: float = 0.85) \
        -> tuple[str, str]:
    """Unrolled WEIGHTED PageRank matching kg.pagerank(weight=...):
    contrib(e) = r(src) * e.w / deg.outd with deg.outd = sum of source
    weights; expects CTEs `e(src, dst, w)`, `deg(src, outd)`, `nodes`,
    `nn` and `r0`."""
    parts = []
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f"""
        d{i} as (select coalesce(sum(r.r), 0) as dm from {prev} r
                 left join deg on r.node = deg.src where deg.src is null),
        c{i} as (select e.dst as node, sum({prev}.r * e.w / deg.outd) as s
                 from e join {prev} on e.src = {prev}.node
                        join deg on e.src = deg.src group by 1),
        r{i} as (select nodes.node,
                        (1 - {d}) / nn.n
                        + {d} * (coalesce(c{i}.s, 0)
                                 + (select dm from d{i}) / nn.n) as r
                 from nodes cross join nn
                 left join c{i} on nodes.node = c{i}.node)""")
        prev = f"r{i}"
    return ",".join(parts), prev


_PRW_ITERS, _PRW_LAST = _pagerank_weighted_cte()


def _mis_ctes(rounds: int = 6) -> str:
    """Unrolled Luby rounds matching kg.mis.maximal_independent_set:
    expects `alive0(node)` and `ae0(src, dst)` (both edge orientations);
    round r priority = md5_number_lower(node || ':r'), select when
    strictly below every alive neighbor's priority (or no alive
    neighbor), then remove selected + neighbors."""
    parts = []
    for r in range(1, rounds + 1):
        # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
        # round references the previous one several times — inlined, the
        # recomputation tree grows exponentially with the unroll depth
        parts.append(f"""
        p{r} as materialized (select node,
                        md5_number_lower(node || ':{r}') as p
                 from alive{r - 1}),
        nb{r} as materialized (select e.src as node, min(p.p) as np
                  from ae{r - 1} e join p{r} p on e.dst = p.node
                  group by 1),
        sel{r} as materialized (select a.node from alive{r - 1} a
                   join p{r} p using (node)
                   left join nb{r} n using (node)
                   where n.np is null or p.p < n.np),
        dead{r} as materialized (select node from sel{r}
                    union
                    select e.dst from ae{r - 1} e
                    join sel{r} s on e.src = s.node),
        alive{r} as materialized (select node from alive{r - 1}
                     where node not in (select node from dead{r})),
        ae{r} as materialized (select e.src, e.dst from ae{r - 1} e
                  where e.src not in (select node from dead{r})
                    and e.dst not in (select node from dead{r}))""")
    return ",".join(parts)


_MIS_CTES = _mis_ctes()
_MIS_UNION = " union all ".join(
    f"select node, {r} as round from sel{r}" for r in range(1, 7))


def _walk_ctes(length: int = 3) -> str:
    """Per-step walk CTEs matching kg.walks.random_walks: expects `e` and
    `w0(walk_id, node, step)`; step t picks the out-neighbor minimizing
    (md5_number_lower(walk_id:t:dst), dst)."""
    parts = []
    for t in range(1, length + 1):
        parts.append(f"""
        s{t} as (select w{t - 1}.walk_id, e.dst,
                        row_number() over (partition by w{t - 1}.walk_id
                            order by md5_number_lower(
                                w{t - 1}.walk_id || ':{t}:' || e.dst),
                                e.dst) as rn
                 from w{t - 1} join e on w{t - 1}.node = e.src),
        w{t} as (select walk_id, dst as node, {t} as step
                 from s{t} where rn = 1)""")
    return ",".join(parts)


_WALK_CTES = _walk_ctes()


def _pagerank_personalized_cte(iters: int = 3, d: float = 0.85) \
        -> tuple[str, str]:
    """Unrolled personalized PageRank (teleport by pv.p instead of 1/N):
    r_i(n) = ((1-d) + d*DM) * p(n) + d*contrib(n); expects CTEs `nodes`,
    `e`, `deg` and `pv(node, p)` and an `r0` of `select node, p from pv`."""
    parts = []
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f"""
        d{i} as (select coalesce(sum(r.r), 0) as dm from {prev} r
                 left join deg on r.node = deg.src where deg.src is null),
        c{i} as (select e.dst as node, sum({prev}.r / deg.outd) as s
                 from e join {prev} on e.src = {prev}.node
                        join deg on e.src = deg.src group by 1),
        r{i} as (select nodes.node,
                        ((1 - {d}) + {d} * (select dm from d{i})) * pv.p
                        + {d} * coalesce(c{i}.s, 0) as r
                 from nodes join pv on nodes.node = pv.node
                 left join c{i} on nodes.node = c{i}.node)""")
        prev = f"r{i}"
    return ",".join(parts), prev


_PPR_ITERS, _PPR_LAST = _pagerank_personalized_cte()


def _hits_cte(iters: int = 2) -> tuple[str, str, str]:
    """Unrolled HITS matching kg.hits: per round auth = in-sum of hubs
    then L2-normalize, hub = out-sum of auths then L2-normalize. Expects
    CTEs `nodes` and `e`; emits h0..h{k}, a1..a{k}."""
    parts = ["""
        h0 as (select node, 1.0 as x from nodes)"""]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(f""",
        a{i}r as (select e.dst as node, sum({prev_h}.x) as x
                  from e join {prev_h} on e.src = {prev_h}.node group by 1),
        a{i} as (select node,
                        x / (select sqrt(sum(x * x)) from a{i}r) as x
                 from a{i}r),
        h{i}r as (select e.src as node, sum(a{i}.x) as x
                  from e join a{i} on e.dst = a{i}.node group by 1),
        h{i} as (select node,
                        x / (select sqrt(sum(x * x)) from h{i}r) as x
                 from h{i}r)""")
        prev_h = f"h{i}"
    return "".join(parts), prev_h, f"a{iters}"


_HITS_ITERS, _HITS_H, _HITS_A = _hits_cte()


def _bpe_merge_sql(n_merges: int) -> str:
    """Unrolled-CTE oracle for the first `n_merges` BPE merges: each word's
    symbol state is a string with every symbol wrapped in U+27E8/U+27E9
    brackets, so merging a pair is an unambiguous left-to-right
    non-overlapping replace() — exactly the trainer's leftmost application
    order. MATERIALIZED hints keep the 20-deep CTE chain linear (DuckDB
    would otherwise re-inline each round into its two consumers)."""
    parts = ["""
    with words as materialized (
        select word, count(*)::bigint as n from (
            select unnest(string_split(text, ' ')) as word from documents)
        where word != '' group by word),
    r0 as materialized (
        select '⟨' || array_to_string(regexp_split_to_array(word, ''),
                                       '⟩⟨')
               || '⟩⟨</w>⟩' as w, n
        from words)"""]
    for k in range(n_merges):
        parts.append(f""",
    s{k} as materialized (
        select string_split(trim(w, '⟨⟩'), '⟩⟨') as a, n
        from r{k} where len(w) > 0),
    p{k} as materialized (
        select '⟨' || a[i] || '⟩⟨' || a[i+1] || '⟩' as pair,
               sum(n)::bigint as c
        from s{k}, unnest(generate_series(1, len(a) - 1)) as t(i)
        group by 1),
    b{k} as materialized (
        select pair, c from p{k} order by c desc, pair asc limit 1),
    m{k} as materialized (
        select {k}::bigint as rank,
               string_split(trim(pair, '⟨⟩'), '⟩⟨')[1] as left_,
               string_split(trim(pair, '⟨⟩'), '⟩⟨')[2] as right_,
               c as freq from b{k}),
    r{k + 1} as materialized (
        select replace(w, b.pair, replace(b.pair, '⟩⟨', '')) as w, n
        from r{k}, b{k} b)""")
    union = " union all ".join(
        f'select rank, left_ as "left", right_ as "right", freq from m{k}'
        for k in range(n_merges))
    return "".join(parts) + "\n" + union + " order by rank"


def _bpe_encode_sql(n_merges: int) -> str:
    """Unrolled-CTE oracle for ENCODING under the learned merges: the same
    round-per-CTE merge replay as `_bpe_merge_sql`, but each word state
    carries its source word, so after the last round the per-word symbol
    count joins back to the per-document word explosion. Applying the
    ranked merge list in order with leftmost non-overlapping replace() is
    the classic equivalence with greedy lowest-rank-first BPE encoding."""
    parts = ["""
    with words as materialized (
        select word, count(*)::bigint as n from (
            select unnest(string_split(text, ' ')) as word from documents)
        where word != '' group by word),
    r0 as materialized (
        select word,
               '⟨' || array_to_string(regexp_split_to_array(word, ''),
                                       '⟩⟨')
               || '⟩⟨</w>⟩' as w, n
        from words)"""]
    for k in range(n_merges):
        parts.append(f""",
    s{k} as materialized (
        select string_split(trim(w, '⟨⟩'), '⟩⟨') as a, n
        from r{k} where len(w) > 0),
    p{k} as materialized (
        select '⟨' || a[i] || '⟩⟨' || a[i+1] || '⟩' as pair,
               sum(n)::bigint as c
        from s{k}, unnest(generate_series(1, len(a) - 1)) as t(i)
        group by 1),
    b{k} as materialized (
        select pair, c from p{k} order by c desc, pair asc limit 1),
    r{k + 1} as materialized (
        select word, replace(w, b.pair, replace(b.pair, '⟩⟨', '')) as w, n
        from r{k}, b{k} b)""")
    parts.append(f""",
    enc as materialized (
        select word,
               len(string_split(trim(w, '⟨⟩'), '⟩⟨'))::bigint as n_sym
        from r{n_merges}),
    docw as (
        select doc_id, unnest(string_split(text, ' ')) as word
        from documents)
    select d.doc_id,
           coalesce(sum(enc.n_sym), 0)::bigint as n_bpe_tokens
    from documents d
    left join docw on d.doc_id = docw.doc_id and docw.word != ''
    left join enc on docw.word = enc.word
    group by d.doc_id""")
    return "".join(parts)


ORACLES: dict[str, str] = {
    # first 20 BPE merges, unrolled round-by-round (see _bpe_merge_sql)
    "doc_bpe_merges": _bpe_merge_sql(20),
    # encode every document under those learned merges (train -> apply)
    "doc_bpe_encode": _bpe_encode_sql(20),
    "q1_pricing_summary": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                            as sum_qty,
               round(sum(l_extendedprice), 2)                       as sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)    as sum_disc_price,
               round(sum(l_quantity) / count(*), 2)                 as avg_qty,
               round(sum(l_extendedprice) / count(*), 2)            as avg_price,
               count(*)                                             as count_order
        from lineitem
        group by l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        select round(sum(l_extendedprice * l_discount), 2) as revenue
        from lineitem
        where l_shipdate >= timestamp '1994-01-01'
          and l_shipdate <  timestamp '1996-01-01'
          and l_discount >= 0.02 and l_quantity < 24
    """,
    "q3_top_revenue_orders": """
        select l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
               o_orderdate
        from customer
        join orders   on c_custkey = o_custkey
        join lineitem on l_orderkey = o_orderkey
        where c_mktsegment = 'BUILDING'
        group by l_orderkey, o_orderdate
        order by sum(l_extendedprice * (1 - l_discount)) desc, l_orderkey
        limit 10
    """,
    "q5_local_supplier_volume": """
        select n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from customer, orders, lineitem, supplier, nation, region
        where c_custkey = o_custkey and l_orderkey = o_orderkey
          and l_suppkey = s_suppkey and c_nationkey = s_nationkey
          and s_nationkey = n_nationkey and n_regionkey = r_regionkey
          and r_name = 'ASIA'
        group by n_name
    """,
    "q_distinct_segments": """
        select distinct c_mktsegment from customer
    """,
    "q_top_orders": """
        select o_orderkey, o_totalprice from orders
        order by o_totalprice desc, o_orderkey limit 10
    """,
    "q_customer_by_nation": """
        select n_name, count(*) as n_customers,
               round(sum(c_acctbal), 2) as total_acctbal
        from customer join nation on c_nationkey = n_nationkey
        group by n_name
    """,
    "q_brand_volume": """
        select p_brand, count(*) as n_items, round(sum(l_quantity), 2) as sum_qty
        from lineitem join part on l_partkey = p_partkey
        group by p_brand
    """,
    "q_events_hourly": """
        select event_type, date_trunc('hour', ts) as window_start,
               count(*) as n_events, round(sum(value), 2) as sum_value
        from events group by 1, 2
    """,
    "q_user_activity": """
        select user_id, count(*) as n_events, round(sum(value), 2) as sum_value,
               round(max(value), 2) as max_value
        from events group by user_id
    """,
    "doc_token_counts": """
        select doc_id,
               case when trim(text) = '' then 0
                    else length(string_split_regex(trim(text), '\\s+')) end
               ::bigint as n_tokens
        from documents
    """,
    "doc_quality_sql": """
        with t as (
            select doc_id, text,
                   case when trim(text) = '' then 0
                        else length(string_split_regex(trim(text), '\\s+')) end
                   ::bigint as n_tokens,
                   length(text)::bigint as n_chars,
                   (length(text) - length(regexp_replace(text,
                        '[\\.,;:!\\?''"\\(\\)\\[\\]\\{\\}-]', '', 'g')))::bigint
                   as n_punct
            from documents)
        select doc_id, n_tokens,
               round(n_chars / greatest(n_tokens, 1)::double, 4) as mean_token_len,
               round(n_punct / greatest(n_chars, 1)::double, 4) as punct_ratio
        from t
    """,
    # 2 unrolled full-batch GD steps from w=0: sigmoid(0)=0.5 closes step 0,
    # step 1 re-scores with the w1 CTE — exactly ops/classifier.logreg_train
    "doc_quality_classifier": """
        with t as (
            select doc_id,
                   case when trim(text) = '' then 0
                        else length(string_split_regex(trim(text), '\\s+')) end
                   ::bigint as n_tokens,
                   length(text)::bigint as n_chars,
                   (length(text) - length(regexp_replace(text,
                        '[\\.,;:!\\?''"\\(\\)\\[\\]\\{\\}-]', '', 'g')))::bigint
                   as n_punct,
                   (lang = 'en')::int::double as y
            from documents),
        f as (
            select doc_id, y,
                   n_tokens / 100.0 as f1,
                   round(n_chars / greatest(n_tokens, 1)::double, 4) as f2,
                   round(n_punct / greatest(n_chars, 1)::double, 4) as f3
            from t),
        w1 as (
            select avg(y - 0.5)        as b,
                   avg(f1 * (y - 0.5)) as a1,
                   avg(f2 * (y - 0.5)) as a2,
                   avg(f3 * (y - 0.5)) as a3
            from f),
        p as (
            select f.*,
                   1.0 / (1.0 + exp(-(w1.b + w1.a1 * f1 + w1.a2 * f2
                                      + w1.a3 * f3))) as p1
            from f, w1),
        w2 as (
            select any_value(w1.b)  - avg(p1 - y)        as b,
                   any_value(w1.a1) - avg(f1 * (p1 - y)) as a1,
                   any_value(w1.a2) - avg(f2 * (p1 - y)) as a2,
                   any_value(w1.a3) - avg(f3 * (p1 - y)) as a3
            from p, w1)
        select f.doc_id,
               round(1.0 / (1.0 + exp(-(w2.b + w2.a1 * f1 + w2.a2 * f2
                                        + w2.a3 * f3))), 4) as score
        from f, w2
    """,
    "doc_fingerprint": """
        select doc_id, md5(text) as fp_md5 from documents
    """,
    "dedup_exact": """
        select doc_id, text, lang, source, n_chars from documents
        qualify row_number() over (partition by text order by doc_id) = 1
    """,
    "q_events_stats": """
        select event_type, count(*) as n_events,
               round(avg(value), 2) as avg_value,
               round(stddev_samp(value), 2) as std_value
        from events group by event_type
    """,
    "q_events_sessions": """
        with e as (
            select user_id, ts, value,
                   case when lag(ts) over (partition by user_id order by ts)
                             is null
                        or ts - lag(ts) over (partition by user_id order by ts)
                             > interval 30 minute
                        then 1 else 0 end as new_s
            from events),
        s as (
            select user_id, ts, value,
                   sum(new_s) over (partition by user_id order by ts
                                    rows unbounded preceding)::bigint as session_id
            from e)
        select user_id, session_id, count(*) as n_events,
               round(sum(value), 2) as sum_value
        from s group by user_id, session_id
    """,
    "q_events_sliding": """
        with e as (
            select event_type, value,
                   unnest([time_bucket(interval 30 minutes, ts),
                           time_bucket(interval 30 minutes, ts)
                           - interval 30 minutes]) as window_start
            from events)
        select event_type, window_start, count(*) as n_events,
               round(sum(value), 2) as sum_value
        from e group by 1, 2
    """,
    "q_events_asof": """
        select l.user_id, l.ts, l.value,
               r.ts as click_ts, r.value as click_value
        from (select user_id, ts, value from events
              where event_type = 'purchase') l
        asof join (select user_id, ts, value from events
                   where event_type = 'click') r
          on l.user_id = r.user_id and l.ts >= r.ts
    """,
    "q_events_range": """
        select l.user_id, l.ts, r.ts as click_ts
        from (select user_id, ts from events
              where event_type = 'purchase') l
        join (select user_id, ts from events
              where event_type = 'click') r
          on l.user_id = r.user_id
         and r.ts >= l.ts - interval 30 minutes
         and r.ts <= l.ts
    """,
    "q_customers_no_orders": """
        select c_custkey, c_name from customer
        where not exists (select 1 from orders
                          where o_custkey = c_custkey
                            and o_totalprice > 300000)
    """,
    "q_order_priority_count": """
        select o_orderpriority, count(*) as n_orders
        from orders
        where exists (
            select 1 from lineitem
            where l_orderkey = o_orderkey
            group by l_orderkey
            having max(l_shipdate) > o_orderdate + interval 60 day)
        group by o_orderpriority
    """,
    "kg_mentions": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents)
        select doc_id, tok as mention, count(*) as n_mentions
        from toks
        where tok in ('spark','table','join','sort','merge','filter',
                      'window','customer','vector','stream','query','hash')
        group by doc_id, tok
    """,
    "kg_triples": f"""
        with {_KG_TRIPLES_CTE}
        select subj, pred, obj from t
    """,
    # owl:sameAs canonicalization: alias objects (_alt / _alt2 by doc_id % 3)
    # collapse onto the lexicographic min of their sameAs component
    # (base—alt—alt2 chains per KB term), then triples dedupe (set semantics)
    "kg_sameas_rewrite": """
        with recursive
        toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                 from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash')),
        t as (select 'http://example.org/doc/' || doc_id as subj,
                     'http://example.org/vocab/mentions' as pred,
                     'http://example.org/entity/' || tok ||
                         case doc_id % 3 when 1 then '_alt'
                                         when 2 then '_alt2' else '' end as obj
              from m
              union all
              select 'http://example.org/doc/' || doc_id,
                     'http://example.org/vocab/lang', lang
              from documents),
        terms(tok) as (select unnest(['spark','table','join','sort','merge',
                                      'filter','window','customer','vector',
                                      'stream','query','hash'])),
        e as (select 'http://example.org/entity/' || tok as a,
                     'http://example.org/entity/' || tok || '_alt' as b
              from terms
              union all
              select 'http://example.org/entity/' || tok || '_alt',
                     'http://example.org/entity/' || tok || '_alt2'
              from terms),
        sym as (select a, b from e union select b, a from e
                union select a, a from e union select b, b from e),
        reach(a, b) as (select a, b from sym
                        union
                        select r.a, s.b from reach r join sym s on r.b = s.a),
        canon as (select a as node, min(b) as canon from reach group by a)
        select distinct coalesce(cs.canon, t.subj) as subj, t.pred,
                        coalesce(co.canon, t.obj) as obj
        from t left join canon cs on t.subj = cs.node
               left join canon co on t.obj = co.node
    """,
    # TransE-style negative sampling: vocabulary index = per-md5-bucket
    # row_number + bucket offsets; draw = md5(s|o) mod V with a +1 step when
    # the draw hits the true object (md5_number_lower == utils.md5_u64)
    "kg_negative_samples": f"""
        with {_KG_TRIPLES_CTE},
        mt as (select subj, pred, obj from t
               where pred = 'http://example.org/vocab/mentions'),
        ents as (select distinct obj as ent from mt),
        eb as (select ent, (md5_number_lower(ent) % 32)::bigint as bkt
               from ents),
        er as (select ent, bkt,
                      row_number() over (partition by bkt order by ent) - 1
                          as rk
               from eb),
        cnt as (select bkt, count(*)::bigint as c from eb group by bkt),
        offs as (select bkt,
                        coalesce(sum(c) over (order by bkt
                            rows between unbounded preceding
                            and 1 preceding), 0)::bigint as off
                 from cnt),
        ei as (select er.ent, (er.rk + offs.off)::bigint as idx
               from er join offs using (bkt)),
        vv as (select count(*)::ubigint as v from ents),
        td as (select subj, pred, obj,
                      (md5_number_lower(subj || '|' || obj)
                       % (select v from vv))::bigint as i1
               from mt),
        td2 as (select subj, pred, obj, i1,
                       ((i1 + 1) % (select v from vv)::bigint)::bigint as i2
                from td)
        select t.subj, t.pred, t.obj,
               case when e1.ent <> t.obj then e1.ent else e2.ent end
                   as neg_obj
        from td2 t join ei e1 on e1.idx = t.i1
                   join ei e2 on e2.idx = t.i2
    """,
    # RDFS entailment: rdfs2 (domain), rdfs3 (range), rdfs9/11 (reflexive-
    # transitive subClassOf propagation) over the mention/lang triples
    "kg_infer_types": f"""
        with recursive {_KG_TRIPLES_CTE},
        sub(c, p) as (select * from (values
            ('http://example.org/class/Document',
             'http://example.org/class/WebResource'),
            ('http://example.org/class/WebResource',
             'http://example.org/class/Resource'),
            ('http://example.org/class/Entity',
             'http://example.org/class/Resource')) v(c, p)),
        cls(c) as (select c from sub union select p from sub),
        clos(c, s) as (select c, c from cls
                       union
                       select cl.c, sub.p from clos cl
                       join sub on cl.s = sub.c),
        dom(pred, c) as (select * from (values
            ('http://example.org/vocab/mentions',
             'http://example.org/class/Document'),
            ('http://example.org/vocab/lang',
             'http://example.org/class/Document')) v(pred, c)),
        rng(pred, c) as (select * from (values
            ('http://example.org/vocab/mentions',
             'http://example.org/class/Entity')) v(pred, c)),
        bt as (select t.subj as node, d.c from t join dom d using (pred)
               union all
               select t.obj, r.c from t join rng r using (pred))
        select distinct bt.node, clos.s as type
        from bt join clos on bt.c = clos.c
    """,
    # re-crawl upsert: base triples of re-crawled subjects drop wholesale,
    # the fresh extraction (text gained ' spark', lang normalized 'en')
    # replaces them — subject-disjoint union, bag semantics
    "kg_upsert_recrawl": f"""
        with {_KG_TRIPLES_CTE},
        newdocs as (select doc_id, text || ' spark' as text, 'en' as lang
                    from documents where doc_id % 5 = 0),
        ntoks as (select doc_id, unnest(string_split(text, ' ')) as tok
                  from newdocs),
        nm as (select distinct doc_id, tok from ntoks
               where tok in ('spark','table','join','sort','merge','filter',
                             'window','customer','vector','stream','query','hash')),
        d as (select 'http://example.org/doc/' || doc_id as subj,
                     'http://example.org/vocab/mentions' as pred,
                     'http://example.org/entity/' || tok as obj
              from nm
              union all
              select 'http://example.org/doc/' || doc_id,
                     'http://example.org/vocab/lang', lang
              from newdocs)
        select subj, pred, obj from t
        where subj not in (select distinct subj from d)
        union all
        select subj, pred, obj from d
    """,
    "kg_quads": f"""
        with {_KG_QUADS_CTE}
        select graph, subj, pred, obj from q
    """,
    "kg_graph_named": f"""
        with {_KG_QUADS_CTE}
        select subj as d, obj as e from q
        where graph = 'http://example.org/graph/src3'
          and pred = 'http://example.org/vocab/mentions'
    """,
    "kg_graph_var": f"""
        with {_KG_QUADS_CTE}
        select distinct a.graph as g, a.subj as d, a.obj as e
        from q a join q b on a.graph = b.graph and a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
    """,
    # default-graph pattern = distinct over the union of named graphs
    "kg_graph_mixed": f"""
        with {_KG_QUADS_CTE},
        dq as (select distinct subj, pred, obj from q)
        select q2.graph as g, dq.subj as d, q2.obj as l
        from dq join q q2 on dq.subj = q2.subj
        where dq.pred = 'http://example.org/vocab/mentions'
          and dq.obj = 'http://example.org/entity/spark'
          and q2.pred = 'http://example.org/vocab/lang'
    """,
    # FROM (default graph = union of the two listed feeds, set-semantic)
    # + FROM NAMED (GRAPH ?g may only match src4)
    "kg_graph_from": f"""
        with {_KG_QUADS_CTE},
        dq as (select distinct subj, obj from q
               where graph in ('http://example.org/graph/src1',
                               'http://example.org/graph/src4')
                 and pred = 'http://example.org/vocab/mentions')
        select g2.graph as g, dq.subj as d, dq.obj as e
        from dq join q g2 on dq.subj = g2.subj
        where g2.graph = 'http://example.org/graph/src4'
          and g2.pred = 'http://example.org/vocab/lang' and g2.obj = 'fr'
    """,
    # DROP GRAPH = every quad outside the dropped graph
    "kg_graph_drop": f"""
        with {_KG_QUADS_CTE}
        select graph, subj, pred, obj from q
        where graph != 'http://example.org/graph/src3'
    """,
    # WITH <g> DELETE/INSERT WHERE rename, scoped to one graph: CASE on
    # pred only where graph matches; other graphs pass through verbatim
    "kg_graph_with_update": f"""
        with {_KG_QUADS_CTE}
        select graph, subj,
               case when graph = 'http://example.org/graph/src0'
                     and pred = 'http://example.org/vocab/lang'
                    then 'http://example.org/vocab/language'
                    else pred end as pred,
               obj
        from q
    """,
    # GROUP BY over a GRAPH ?g binding: per-feed mention-edge stats
    "kg_graph_groupby": f"""
        with {_KG_QUADS_CTE}
        select graph as g, count(*)::bigint as n_edges,
               min(obj) as first_entity
        from q where pred = 'http://example.org/vocab/mentions'
        group by graph
    """,
    # INSERT DATA { GRAPH g:src0 {2 quads} } then DELETE DATA of one of
    # them, src0 slice: the feed's original quads + the surviving insert
    "kg_graph_data_update": f"""
        with {_KG_QUADS_CTE}
        select graph, subj, pred, obj from q
        where graph = 'http://example.org/graph/src0'
        union all
        select 'http://example.org/graph/src0',
               'http://example.org/doc/crawlnote',
               'http://example.org/vocab/mentions',
               'http://example.org/entity/spark'
    """,
    # GRAPH-free aggregate over the quad table = grouped count over the
    # DISTINCT union of the named graphs (the default graph)
    "kg_default_graph_agg": f"""
        with {_KG_QUADS_CTE},
        dq as (select distinct subj, pred, obj from q)
        select obj as e, count(*) as n from dq
        where pred = 'http://example.org/vocab/mentions'
        group by obj
    """,
    # SPARQL 1.1 Update rename (DELETE {{?d v:lang ?l}} INSERT {{?d
    # v:language ?l}} WHERE ...) == set algebra: survivors ∪ rewritten,
    # deduped (RDF graphs are sets)
    "kg_update": f"""
        with {_KG_TRIPLES_CTE}
        select distinct subj,
               case when pred = 'http://example.org/vocab/lang'
                    then 'http://example.org/vocab/language'
                    else pred end as pred,
               obj
        from t
    """,
    "kg_bgp": f"""
        with {_KG_TRIPLES_CTE}
        select a.subj as d, a.obj as e
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
    """,
    "kg_bgp_filter": f"""
        with {_KG_TRIPLES_CTE}
        select distinct a.subj as d, a.obj as e
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
          and a.obj > 'http://example.org/entity/m'
        order by d, e desc limit 100
    """,
    # || binds loosest: fr-docs' mentions OR (en-docs' mentions > threshold)
    "kg_bgp_filter_logic": f"""
        with {_KG_TRIPLES_CTE}
        select distinct a.subj as d, a.obj as e
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang'
          and (b.obj = 'fr'
               or (b.obj = 'en'
                   and a.obj > 'http://example.org/entity/s'))
    """,
    # sh:sparql constraint components: query solutions ARE the violations
    "kg_validate_sparql": f"""
        with {_KG_TRIPLES_CTE}
        select distinct a.subj as focus,
               'NonEnglishSparkMention' as component,
               'non-English documents must not mention the spark entity'
                   as message
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and a.obj = 'http://example.org/entity/spark'
          and b.pred = 'http://example.org/vocab/lang' and b.obj != 'en'
        union all
        select distinct m.subj, 'MissingLanguage',
               'documents with mentions must declare a language'
        from t m
        where m.pred = 'http://example.org/vocab/mentions'
          and not exists (select 1 from t l where l.subj = m.subj
                          and l.pred = 'http://example.org/vocab/lang')
    """,
    "kg_bgp_groupby": f"""
        with {_KG_TRIPLES_CTE}
        select obj as e, count(subj) as n from t
        where pred = 'http://example.org/vocab/mentions'
        group by obj
    """,
    "kg_bgp_values": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d, obj as l from t
        where pred = 'http://example.org/vocab/lang' and obj in ('fr', 'zh')
    """,
    "kg_cooccur": f"""
        with {_KG_TRIPLES_CTE}
        select 'http://example.org/entity/' || a.tok as e1,
               'http://example.org/entity/' || b.tok as e2,
               count(*) as n_docs
        from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
        group by 1, 2
    """,
    "kg_entity_jaccard": f"""
        with {_KG_TRIPLES_CTE},
        cooc as (select 'http://example.org/entity/' || a.tok as e1,
                        'http://example.org/entity/' || b.tok as e2,
                        count(*)::double as n12
                 from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
                 group by 1, 2),
        deg as (select 'http://example.org/entity/' || tok as e,
                       count(*)::double as d
                from m group by 1)
        select cooc.e1, cooc.e2,
               round(n12 / (da.d + db.d - n12), 4) as jaccard
        from cooc join deg da on cooc.e1 = da.e
                  join deg db on cooc.e2 = db.e
    """,
    "kg_bgp_notexists": f"""
        with {_KG_TRIPLES_CTE}
        select a.subj as d
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and a.obj = 'http://example.org/entity/spark'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
          and not exists (
              select 1 from t c
              where c.subj = a.subj
                and c.pred = 'http://example.org/vocab/mentions'
                and c.obj = 'http://example.org/entity/table')
    """,
    # mirror of sources/pages.link_targets: (doc_id*7 + j*13 + 1) % 100000
    "kg_inlinks": """
        with l as (
            select (doc_id * 7 + 1) % 100000 as tgt from documents
            union all
            select (doc_id * 7 + 14) % 100000 from documents
            union all
            select (doc_id * 7 + 27) % 100000 from documents)
        select tgt, count(*)::bigint as n_inlinks from l group by 1
    """,
    "kg_bgp_count_distinct": f"""
        with {_KG_TRIPLES_CTE}
        select b.obj as l,
               count(distinct a.obj)::bigint as entities,
               count(*)::bigint as mentions
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang'
        group by 1
    """,
    "kg_bgp_having": f"""
        with {_KG_TRIPLES_CTE}
        select obj as e, count(*)::bigint as n from t
        where pred = 'http://example.org/vocab/mentions'
        group by 1 having count(*) >= 20
    """,
    "kg_bgp_bind": f"""
        with {_KG_TRIPLES_CTE}
        select subj || '->' || obj as k, length(obj)::bigint as n
        from t where pred = 'http://example.org/vocab/mentions'
    """,
    "kg_bgp_functions": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d,
               replace(obj, 'http://example.org/entity/', '') as "local",
               substr(replace(obj, 'http://example.org/entity/', ''),
                      1, 3) as short,
               regexp_replace(obj, 'http://example.org/entity/(.*)',
                              'urn:ent:\\1') as uri,
               case when length(replace(obj,
                        'http://example.org/entity/', '')) >= 6
                    then 'long' else 'short' end as size
        from t where pred = 'http://example.org/vocab/mentions'
    """,
    "kg_bgp_sample": f"""
        with {_KG_TRIPLES_CTE}
        select b.obj as l, min(a.obj) as one,
               count(*)::bigint as mentions
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang'
        group by 1
    """,
    "kg_bgp_groupconcat": f"""
        with {_KG_TRIPLES_CTE}
        select a.subj as d,
               string_agg(a.obj, ',' order by a.obj) as entities
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
        group by 1
    """,
    "kg_bgp_describe": f"""
        with {_KG_TRIPLES_CTE}
        select subj, pred, obj from t
        where subj in (
            select a.subj
            from t a join t b on a.subj = b.subj
            where a.pred = 'http://example.org/vocab/mentions'
              and a.obj = 'http://example.org/entity/spark'
              and b.pred = 'http://example.org/vocab/lang'
              and b.obj = 'en')
    """,
    "kg_bgp_construct": f"""
        with {_KG_TRIPLES_CTE},
        en_mentions as (
            select distinct a.subj as d, a.obj as e
            from t a join t b on a.subj = b.subj
            where a.pred = 'http://example.org/vocab/mentions'
              and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en')
        select d as subj, 'http://example.org/vocab/hasTopic' as pred,
               e as obj from en_mentions
        union
        select e, 'http://example.org/vocab/topicOf', d from en_mentions
    """,
    "kg_bgp_exists": f"""
        with {_KG_TRIPLES_CTE}
        select a.subj as d
        from t a join t b on a.subj = b.subj
        where a.pred = 'http://example.org/vocab/mentions'
          and a.obj = 'http://example.org/entity/spark'
          and b.pred = 'http://example.org/vocab/lang' and b.obj = 'en'
          and exists (
              select 1 from t c
              where c.subj = a.subj
                and c.pred = 'http://example.org/vocab/mentions'
                and c.obj = 'http://example.org/entity/table')
    """,
    # label propagation unrolled (2 synchronous rounds): init label = node,
    # each round = weighted neighbor-label count + argmax with (sum desc,
    # label asc) tie-break — exactly kg/communities.label_propagation.
    "kg_communities": f"""
        with {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2,
                   count(*)::bigint as w
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        edges as materialized (
            select e1 as src, e2 as dst, w from cooc
            union all
            select e2, e1, w from cooc),
        l0 as (select distinct src as node, src as label from edges),
        r1 as (select node, label from (
            select e.dst as node, l.label, sum(e.w) as tw,
                   row_number() over (partition by e.dst
                                      order by sum(e.w) desc, l.label asc)
                       as rn
            from edges e join l0 l on e.src = l.node
            group by e.dst, l.label) where rn = 1),
        r2 as (select node, label from (
            select e.dst as node, l.label, sum(e.w) as tw,
                   row_number() over (partition by e.dst
                                      order by sum(e.w) desc, l.label asc)
                       as rn
            from edges e join r1 l on e.src = l.node
            group by e.dst, l.label) where rn = 1)
        select node, label from r2
    """,
    "kg_reachable": f"""
        with recursive {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        edges as (select e1 as src, e2 as dst from cooc
                  union all select e2, e1 from cooc),
        reach(node) as (
            select 'http://example.org/entity/spark'
            union
            select e.dst from edges e join reach r on e.src = r.node)
        select node from reach
    """,
    "kg_shortest_paths": f"""
        with recursive {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        edges as (select e1 as src, e2 as dst from cooc
                  union all select e2, e1 from cooc),
        walk(node, dist) as (
            select 'http://example.org/entity/spark', 0
            union
            select e.dst, w.dist + 1
            from edges e join walk w on e.src = w.node
            where w.dist < 8)
        select node, min(dist)::bigint as dist from walk group by node
    """,
    "kg_scc": """
        with recursive
        k as (select least(count(*), 1250) as k from documents),
        nodes as (select doc_id as node from documents, k
                  where doc_id < k.k),
        m as (select (k.k // 8) * 8 as m from k),
        base as (select node, node // 8 as blk, node % 8 as pos
                 from nodes, m where node < m.m),
        e_all as (
            select node as src, blk * 8 + (pos + 1) % 8 as dst
            from base where blk % 2 = 0 or pos < 7
            union
            select node as src, (node // 8 + 1) * 8 as dst
            from base, m where node % 5 = 0 and node + 8 < m.m),
        edges as (select src, dst from e_all where src <> dst),
        r(src, dst) as (
            select src, dst from edges
            union
            select r.src, e.dst from r join edges e on r.dst = e.src),
        mutual as (
            select r1.src as a, r1.dst as b
            from r r1 join r r2 on r1.src = r2.dst and r1.dst = r2.src),
        scc as (
            select n.node,
                   least(n.node, coalesce(min(m.b), n.node)) as scc
            from nodes n left join mutual m on m.a = n.node
            group by n.node)
        select node, scc from scc order by node
    """,
    "kg_triangles": f"""
        with {_KG_TRIPLES_CTE},
        e as (select distinct a.tok as e1, b.tok as e2
              from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok)
        select count(*) as n_triangles
        from e x join e y on x.e1 = y.e1 and x.e2 < y.e2
                 join e z on z.e1 = x.e2 and z.e2 = y.e2
    """,
    "kg_kcore": f"""
        with {_KG_TRIPLES_CTE},
        e0 as materialized (select 'http://example.org/entity/' || a.tok as e1,
                      'http://example.org/entity/' || b.tok as e2
               from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
               group by 1, 2 having count(*) >= 325),
        d1 as materialized (select node, count(*) as deg from
                 (select e1 as node from e0 union all
                  select e2 as node from e0) group by 1),
        k1 as materialized (select node from d1 where deg >= 3),
        e1 as materialized (select e1, e2 from e0
                 where e1 in (select node from k1)
                   and e2 in (select node from k1)),
        d2 as materialized (select node, count(*) as deg from
                 (select e1 as node from e1 union all
                  select e2 as node from e1) group by 1),
        k2 as materialized (select node from d2 where deg >= 3),
        e2 as materialized (select e1, e2 from e1
                 where e1 in (select node from k2)
                   and e2 in (select node from k2)),
        d3 as materialized (select node, count(*) as deg from
                 (select e1 as node from e2 union all
                  select e2 as node from e2) group by 1),
        k3 as materialized (select node from d3 where deg >= 3),
        e3 as materialized (select e1, e2 from e2
                 where e1 in (select node from k3)
                   and e2 in (select node from k3)),
        d4 as materialized (select node, count(*) as deg from
                 (select e1 as node from e3 union all
                  select e2 as node from e3) group by 1),
        k4 as materialized (select node from d4 where deg >= 3),
        e4 as materialized (select e1, e2 from e3
                 where e1 in (select node from k4)
                   and e2 in (select node from k4)),
        d5 as materialized (select node, count(*) as deg from
                 (select e1 as node from e4 union all
                  select e2 as node from e4) group by 1),
        k5 as materialized (select node from d5 where deg >= 3),
        e5 as materialized (select e1, e2 from e4
                 where e1 in (select node from k5)
                   and e2 in (select node from k5)),
        d6 as materialized (select node, count(*) as deg from
                 (select e1 as node from e5 union all
                  select e2 as node from e5) group by 1),
        k6 as materialized (select node from d6 where deg >= 3),
        e6 as materialized (select e1, e2 from e5
                 where e1 in (select node from k6)
                   and e2 in (select node from k6)),
        d7 as materialized (select node, count(*) as deg from
                 (select e1 as node from e6 union all
                  select e2 as node from e6) group by 1),
        k7 as materialized (select node from d7 where deg >= 3),
        e7 as materialized (select e1, e2 from e6
                 where e1 in (select node from k7)
                   and e2 in (select node from k7)),
        d8 as materialized (select node, count(*) as deg from
                 (select e1 as node from e7 union all
                  select e2 as node from e7) group by 1),
        k8 as materialized (select node from d8 where deg >= 3),
        e8 as materialized (select e1, e2 from e7
                 where e1 in (select node from k8)
                   and e2 in (select node from k8))
        select node, count(*) as deg from
            (select e1 as node from e8 union all
             select e2 as node from e8)
        group by 1
    """,
    "kg_resolve_exact": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents)
        select distinct tok as mention,
               'http://example.org/entity/' || tok as entity_id
        from toks
        where tok in ('spark','table','join','sort','merge','filter',
                      'window','customer','vector','stream','query','hash')
    """,
    "kg_resolve_fuzzy": """
        with toks as (select distinct unnest(string_split(text, ' ')) as mention
                      from documents),
        kb(entity_id, label) as (
            values ('http://example.org/entity/spark','spark'),
                  ('http://example.org/entity/table','table'),
                  ('http://example.org/entity/join','join'),
                  ('http://example.org/entity/sort','sort'),
                  ('http://example.org/entity/merge','merge'),
                  ('http://example.org/entity/filter','filter'),
                  ('http://example.org/entity/window','window'),
                  ('http://example.org/entity/customer','customer'),
                  ('http://example.org/entity/vector','vector'),
                  ('http://example.org/entity/stream','stream'),
                  ('http://example.org/entity/query','query'),
                  ('http://example.org/entity/hash','hash')),
        cand as (
            select mention, entity_id,
                   (length(label) - length(mention))::bigint as score
            from toks join kb on position(lower(mention) in lower(label)) > 0
            where length(mention) >= 4)
        select mention, entity_id, score from cand
        qualify row_number() over (partition by mention
                                   order by score, entity_id) = 1
    """,
    "kg_resolve_ontology": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents),
        kb(entity_id, label, notation, prefLabel, altLabel,
           definition, subClassOf) as (
            select 'http://example.org/entity/' || t,
                   upper(substr(t, 1, 1)) || substr(t, 2),
                   upper(substr(t, 1, 3)),
                   upper(substr(t, 1, 1)) || substr(t, 2) || ' Concept', t,
                   'definition of ' || t,
                   'http://example.org/entity/concept'
            from (select unnest(['spark','table','join','sort','merge',
                                 'filter','window','customer','vector',
                                 'stream','query','hash']) as t)),
        m as (select distinct tok as mention from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash'))
        select mention, entity_id,
               label as entity_label,
               definition as entity_definition,
               subClassOf as entity_subClassOf
        from m join kb
          on lower(mention) in (lower(label), lower(notation),
                                lower(prefLabel), lower(altLabel))
    """,
    "kg_entity_popularity": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash'))
        select 'http://example.org/entity/' || tok as entity_id,
               count(*) as n_docs
        from m group by tok
    """,
    "kg_triples_typed": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash'))
        select 'http://example.org/doc/' || doc_id as subj,
               'http://example.org/vocab/mentions' as pred,
               'http://example.org/entity/' || tok as obj,
               true as obj_is_iri, '' as obj_datatype
        from m
        union all
        select 'http://example.org/doc/' || doc_id,
               'http://example.org/vocab/lang', lang,
               false, 'http://www.w3.org/2001/XMLSchema#string'
        from documents
    """,
    "kg_assemble": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
                      from documents),
        m as (select distinct doc_id, tok from toks
              where tok in ('spark','table','join','sort','merge','filter',
                            'window','customer','vector','stream','query','hash')),
        tri as (
            select 'http://example.org/doc/' || doc_id as subj,
                   'http://example.org/vocab/mentions' as pred
            from m
            union all
            select 'http://example.org/doc/' || doc_id,
                   'http://example.org/vocab/lang'
            from documents)
        select subj, count(distinct pred)::bigint as n_props
        from tri group by subj
    """,
    "kg_validate_customers": """
        select c_custkey,
               case when c_name is null or c_name = '' then false
                    when c_mktsegment not in
                         ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY') then false
                    when c_acctbal < 0 then false
                    else true end as valid,
               case when c_name is null or c_name = '' then 'MinCountConstraint: c_name'
                    when c_mktsegment not in
                         ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                         then 'InConstraint: c_mktsegment'
                    when c_acctbal < 0 then 'MinMaxInclusiveConstraint: c_acctbal'
                    else '' end as violation
        from customer
    """,
    "kg_validate_nested": """
        select c_custkey,
               case when c_custkey % 7 = 0 then false
                    when c_custkey % 11 = 0 then false
                    else true end as valid,
               case when c_custkey % 7 = 0 then 'ClassConstraint: nation'
                    when c_custkey % 11 = 0 then 'NodeConstraint: nation'
                    else '' end as violation
        from customer
    """,
    # sh:or fires on the (-500, 0) gap, sh:xone on the [0, 1000] overlap
    # where both alternatives hold (first-violation-wins label order
    # matches the shape's constraint order)
    "kg_validate_logical": """
        select c_custkey,
               case when c_acctbal > -500 and c_acctbal < 0 then false
                    when c_acctbal >= 0 and c_acctbal <= 1000 then false
                    else true end as valid,
               case when c_acctbal > -500 and c_acctbal < 0
                         then 'OrConstraint: c_acctbal'
                    when c_acctbal >= 0 and c_acctbal <= 1000
                         then 'XoneConstraint: c_acctbal'
                    else '' end as violation
        from customer
    """,
    # sh:lessThan fires when commit !< receipt; sh:lessThanOrEquals when
    # ship > receipt (constraint order = first-violation label order)
    "kg_validate_pairs": """
        select l_orderkey, l_linenumber,
               case when not (l_quantity < l_extendedprice) then false
                    when not (l_discount <= l_tax) then false
                    else true end as valid,
               case when not (l_quantity < l_extendedprice)
                         then 'LessThanConstraint: l_quantity'
                    when not (l_discount <= l_tax)
                         then 'LessThanOrEqualsConstraint: l_discount'
                    else '' end as violation
        from lineitem
    """,
    # minLength fires on BUILDING (8), maxLength on AUTOMOBILE (10),
    # minExclusive on non-positive balances, sh:not on the
    # Customer#00000001x name block, qualifiedMinCount on even keys
    # (whose only phone is 444-); first-violation-wins in constraint order
    "kg_validate_strings": """
        select c_custkey,
               case when length(c_mktsegment) < 9 then false
                    when length(c_mktsegment) > 9 then false
                    when not (c_acctbal > 0) then false
                    when c_name like 'Customer#00000001%' then false
                    when c_custkey % 2 = 0 then false
                    else true end as valid,
               case when length(c_mktsegment) < 9
                         then 'MinLengthConstraint: c_mktsegment'
                    when length(c_mktsegment) > 9
                         then 'MaxLengthConstraint: c_mktsegment'
                    when not (c_acctbal > 0)
                         then 'MinMaxExclusiveConstraint: c_acctbal'
                    when c_name like 'Customer#00000001%'
                         then 'NotConstraint: c_name'
                    when c_custkey % 2 = 0
                         then 'QualifiedValueShapeConstraint: phones'
                    else '' end as violation
        from customer
    """,
    "kg_validate_closed": """
        select c_custkey,
               case when c_custkey % 3 = 0 then false else true end as valid,
               case when c_custkey % 3 = 0 then 'ClosedConstraint: extra'
                    else '' end as violation
        from customer
    """,
    # zero-or-more path: recursive closure of the bounded 20-chain edges
    # UNION the zero-length identity over every graph term
    "kg_bgp_star": """
        with recursive
        e as (select 'http://example.org/doc/' || doc_id as src,
                     'http://example.org/doc/' || (doc_id + 1) as dst
              from documents where doc_id % 20 != 19),
        terms as (select src as n from e union select dst from e),
        closure as (select src, dst from e
                    union
                    select c.src, e.dst from closure c
                    join e on c.dst = e.src),
        star as (select n as a, n as b from terms
                 union
                 select src as a, dst as b from closure)
        select distinct a, b from star
    """,
    # grouped property path (v:next/v:next)+: closure of the SQUARED chain
    # edges (two-hop composition first, then recursive closure)
    "kg_bgp_path_group": """
        with recursive
        e as (select doc_id as src, doc_id + 1 as dst
              from documents where doc_id % 20 != 19),
        e2 as (select a.src, b.dst from e a join e b on a.dst = b.src),
        closure as (select src, dst from e2
                    union
                    select c.src, e2.dst from closure c
                    join e2 on c.dst = e2.src)
        select distinct 'http://example.org/doc/' || src as a,
                        'http://example.org/doc/' || dst as b
        from closure
    """,
    # ((next/next)|next)+ over 20-chains: step sums over {1,2} reach every
    # strictly-forward pair within a chain — arithmetic, no recursion
    "kg_bgp_path_nested": """
        select 'http://example.org/doc/' || a.doc_id as a,
               'http://example.org/doc/' || b.doc_id as b
        from documents a join documents b
          on a.doc_id // 20 = b.doc_id // 20 and b.doc_id > a.doc_id
    """,
    "kg_bgp_alt": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d, obj as x from t
        where pred in ('http://example.org/vocab/mentions',
                       'http://example.org/vocab/lang')
    """,
    # subquery: per-doc mention counts join back to the outer lang binding
    "kg_bgp_subquery": f"""
        with {_KG_TRIPLES_CTE},
        mc as (select subj as d, count(*)::bigint as n from t
               where pred = 'http://example.org/vocab/mentions'
               group by subj)
        select lt.subj as d, lt.obj as l, mc.n
        from t lt join mc on mc.d = lt.subj
        where lt.pred = 'http://example.org/vocab/lang' and mc.n >= 3
    """,
    "kg_bgp_filter_in": f"""
        with {_KG_TRIPLES_CTE}
        select lt.subj as d, lt.obj as l, mt.obj as e
        from t lt join t mt on lt.subj = mt.subj
        where lt.pred = 'http://example.org/vocab/lang'
          and mt.pred = 'http://example.org/vocab/mentions'
          and lt.obj in ('en', 'de')
          and starts_with(mt.obj, 'http://example.org/entity/s')
    """,
    "kg_bgp_negpath": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d, obj as x from t
        where pred != 'http://example.org/vocab/lang'
    """,
    # zero-or-one: direct mentions edges + identity over every graph term
    "kg_bgp_zeroone": f"""
        with {_KG_TRIPLES_CTE},
        terms as (select subj as n from t union select obj from t)
        select distinct d, x from (
            select subj as d, obj as x from t
            where pred = 'http://example.org/vocab/mentions'
            union all
            select n, n from terms)
    """,
    # branch-scoped FILTER: the lang comparison applies to branch 1 only
    "kg_bgp_union_scoped": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d from t
        where pred = 'http://example.org/vocab/lang' and obj > 'en'
        union all
        select subj as d from t
        where pred = 'http://example.org/vocab/mentions'
          and obj = 'http://example.org/entity/query'
    """,
    "kg_actions_summary": """
        with v as (
            select case when c_name is null or c_name = '' then false
                        when c_mktsegment not in
                             ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                             then false
                        when c_acctbal < 0 then false else true end as succeeded,
                   case when c_name is null or c_name = '' then 'MinCountConstraint: c_name'
                        when c_mktsegment not in
                             ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                             then 'InConstraint: c_mktsegment'
                        when c_acctbal < 0 then 'MinMaxInclusiveConstraint: c_acctbal'
                        else '' end as error
            from customer)
        select 'validate' as operation, succeeded, error, count(*) as n
        from v group by 1, 2, 3
    """,
    "lang_id_pred": f"""
        with c as (
            select doc_id,
                   {_LANG_COUNTS}
            from documents)
        select doc_id,
               {_LANG_ARGMAX} as lang_pred
        from c
    """,
    "doc_quality": f"""
        with t as (
            select doc_id, text,
                   case when trim(text) = '' then 0
                        else length(string_split_regex(trim(text), '\\s+')) end
                   ::bigint as n_tokens,
                   length(text)::bigint as n_chars,
                   (length(text) - length(regexp_replace(text,
                        '[\\.,;:!\\?''"\\(\\)\\[\\]\\{{\\}}-]', '', 'g')))::bigint
                   as n_punct,
                   len(regexp_extract_all(text, '{_EN_STOP_PATTERN}'))::bigint
                   as n_stop
            from documents)
        select doc_id, n_tokens,
               round(n_chars / greatest(n_tokens, 1)::double, 4) as mean_token_len,
               round(n_punct / greatest(n_chars, 1)::double, 4) as punct_ratio,
               round(n_stop / greatest(n_tokens, 1)::double, 4) as stopword_ratio
        from t
    """,
    "doc_mixture": """
        select doc_id, source from documents
        where doc_id % 100 <
              case when cast(substr(source, 4) as int) < 5 then 100
                   when cast(substr(source, 4) as int) < 10 then 50
                   else 20 end
    """,
    "doc_vocab": """
        select tok as token, count(*)::bigint as n
        from (select unnest(string_split(text, ' ')) as tok from documents)
        group by tok having count(*) >= 10
    """,
    "doc_tfidf": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as token
                      from documents),
             tf as (select doc_id, token, count(*)::bigint as tf
                    from toks group by 1, 2),
             dfreq as (select token, count(*) as df from tf group by 1),
             n as (select count(*)::double as n_docs from documents),
             scored as (select tf.doc_id, tf.token, tf.tf,
                               tf.tf * ln(n.n_docs / dfreq.df) as tfidf_raw
                        from tf join dfreq using (token) cross join n)
        select doc_id, token, tf, round(tfidf_raw, 4) as tfidf
        from scored
        qualify row_number() over (partition by doc_id
                                   order by tfidf_raw desc, token) <= 3
    """,
    # the facade's "similarity": "bm25" match scorer — same Lucene formula
    # as doc_bm25, reached through the ES-DSL body (page of 15, doc_id
    # tiebreak; ordering on the unrounded score)
    "q_es_bm25": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as token
                      from documents),
             stats as (select (select count(*) from documents)::double as n,
                              (select count(*) from toks)::double as nt),
             tf as (select doc_id, token, count(*)::double as tf from toks
                    where token in ('vector', 'stream', 'query')
                    group by 1, 2),
             dl as (select doc_id, count(*)::double as dl
                    from toks group by 1),
             dfreq as (select token, count(*)::double as df
                       from tf group by 1),
             parts as (select tf.doc_id,
                              ln((s.n - dfreq.df + 0.5)
                                 / (dfreq.df + 0.5) + 1)
                              * tf.tf * (1.2 + 1)
                              / (tf.tf + 1.2 * (1 - 0.75
                                                + 0.75 * dl.dl
                                                  / (s.nt / s.n))) as p
                       from tf
                       join dfreq using (token)
                       join dl using (doc_id)
                       cross join stats s)
        select doc_id, round(sum(p), 4) as score
        from parts group by doc_id
        order by sum(p) desc, doc_id limit 15
    """,
    "doc_bm25": """
        with toks as (select doc_id, unnest(string_split(text, ' ')) as token
                      from documents),
             stats as (select (select count(*) from documents)::double as n,
                              (select count(*) from toks)::double as nt),
             dl as (select doc_id, count(*)::double as dl
                    from toks group by 1),
             tf as (select doc_id, token, count(*)::double as tf from toks
                    where token in ('spark', 'vector', 'stream')
                    group by 1, 2),
             dfreq as (select token, count(*)::double as df
                       from tf group by 1),
             parts as (select tf.doc_id,
                              ln((s.n - dfreq.df + 0.5)
                                 / (dfreq.df + 0.5) + 1)
                              * tf.tf * (1.2 + 1)
                              / (tf.tf + 1.2 * (1 - 0.75
                                                + 0.75 * dl.dl
                                                  / (s.nt / s.n))) as p
                       from tf
                       join dfreq using (token)
                       join dl using (doc_id)
                       cross join stats s)
        select doc_id, round(sum(p), 4) as score
        from parts group by doc_id
        order by sum(p) desc, doc_id limit 10
    """,
    # the oracle computes the gradient image's statistics analytically;
    # the engine must recover them from a real PNG encode/decode roundtrip
    "mm_image_stats": """
        with dims as (select doc_id,
                             8 + (doc_id % 24) as w,
                             8 + (length(text) % 24) as h
                      from documents),
        px as (select d.doc_id, d.w, d.h,
                      (x.x * 7 + y.y * 13 + d.doc_id) % 256 as v
               from dims d,
                    unnest(generate_series(0, d.w - 1)) as x(x),
                    unnest(generate_series(0, d.h - 1)) as y(y))
        select doc_id, any_value(w)::bigint as width,
               any_value(h)::bigint as height,
               round(avg(v), 4) as mean_luma
        from px group by doc_id
    """,
    # mixed PNG/BMP containers: grey replicates to RGB in the BMP leg, so
    # both codecs must report the SAME analytic gradient statistics
    "mm_image_formats": """
        with dims as (select doc_id,
                             8 + (doc_id % 24) as w,
                             8 + (length(text) % 24) as h
                      from documents),
        px as (select d.doc_id, d.w, d.h,
                      (x.x * 7 + y.y * 13 + d.doc_id) % 256 as v
               from dims d,
                    unnest(generate_series(0, d.w - 1)) as x(x),
                    unnest(generate_series(0, d.h - 1)) as y(y))
        select doc_id,
               case when doc_id % 2 = 0 then 'png' else 'bmp' end as fmt,
               any_value(w)::bigint as width,
               any_value(h)::bigint as height,
               round(avg(v), 4) as mean_luma
        from px group by doc_id
    """,
    # the oracle states the signal physics; the engine must recover it
    # from real WAV bytes via decode + rfft (exact-bin sines, zero leakage)
    "mm_audio_spectral": """
        select doc_id,
               (100 + (doc_id % 37) * 20)::double as dominant_hz,
               floor((100 + (doc_id % 37) * 20) / 250.0)::bigint as top_band
        from documents
    """,
    # winnowing: 3-gram md5 hashes, min per 4-hash window, pairs >= 2 shared
    "doc_winnowing": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        g as (select doc_id, i,
                     md5_number_lower(toks[i] || ' ' || toks[i+1]
                                      || ' ' || toks[i+2]) as h
              from (select doc_id, toks,
                           unnest(generate_series(1, len(toks) - 2)) as i
                    from t)),
        m as (select doc_id, count(*) as m from g group by 1),
        ws as (select doc_id,
                      unnest(generate_series(1, greatest(m - 3, 1)))
                          as wstart
               from m),
        w as (select g.doc_id, ws.wstart, min(g.h) as fp
              from ws join g on g.doc_id = ws.doc_id
                            and g.i between ws.wstart and ws.wstart + 3
              group by 1, 2),
        fps as (select distinct doc_id, fp from w),
        pairs as (select a.doc_id as doc_a, b.doc_id as doc_b,
                         count(*)::bigint as n_shared
                  from fps a join fps b on a.fp = b.fp
                                       and a.doc_id < b.doc_id
                  group by 1, 2)
        select doc_a, doc_b, n_shared from pairs where n_shared >= 2
    """,
    "doc_inverted_index": """
        with pairs as (select distinct doc_id, tok as token
                       from (select doc_id,
                                    unnest(string_split(text, ' ')) as tok
                             from documents))
        select token, count(*)::bigint as df,
               string_agg(doc_id::varchar, ',' order by doc_id) as postings
        from pairs group by token
    """,
    "kg_bgp_optional": f"""
        with {_KG_TRIPLES_CTE}
        select la.subj as d, la.obj as l, coalesce(mm.obj, '') as e
        from t la
        left join t mm on la.subj = mm.subj
                      and mm.pred = 'http://example.org/vocab/mentions'
        where la.pred = 'http://example.org/vocab/lang'
    """,
    # the OPTIONAL-local filter is the left join's ON predicate
    "kg_bgp_optional_filter": f"""
        with {_KG_TRIPLES_CTE}
        select la.subj as d, la.obj as l, coalesce(mm.obj, '') as e
        from t la
        left join t mm on la.subj = mm.subj
                      and mm.pred = 'http://example.org/vocab/mentions'
                      and mm.obj > 'http://example.org/entity/s'
        where la.pred = 'http://example.org/vocab/lang'
    """,
    # NOT EXISTS / EXISTS inside UNION branches: anti/semi joins per branch
    "kg_bgp_union_minus": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d from t
        where pred = 'http://example.org/vocab/lang' and obj = 'fr'
          and subj not in (
            select subj from t
            where pred = 'http://example.org/vocab/mentions'
              and obj = 'http://example.org/entity/spark')
        union all
        select subj as d from t
        where pred = 'http://example.org/vocab/mentions'
          and obj = 'http://example.org/entity/query'
          and subj in (
            select subj from t
            where pred = 'http://example.org/vocab/lang' and obj = 'en')
    """,
    # OPTIONAL inside UNION branches: per-branch left joins, then UNION ALL
    "kg_bgp_union_optional": f"""
        with {_KG_TRIPLES_CTE}
        select b.subj as d, coalesce(m.obj, '') as e
        from (select subj from t
              where pred = 'http://example.org/vocab/lang'
                and obj = 'fr') b
        left join (select subj, obj from t
                   where pred = 'http://example.org/vocab/mentions'
                     and obj = 'http://example.org/entity/spark') m
          on m.subj = b.subj
        union all
        select b.subj as d, coalesce(l.obj, '') as e
        from (select subj from t
              where pred = 'http://example.org/vocab/mentions'
                and obj = 'http://example.org/entity/query') b
        left join (select subj, obj from t
                   where pred = 'http://example.org/vocab/lang') l
          on l.subj = b.subj
    """,
    "kg_bgp_union": f"""
        with {_KG_TRIPLES_CTE}
        select subj as d from t
        where pred = 'http://example.org/vocab/lang' and obj = 'fr'
        union all
        select subj as d from t
        where pred = 'http://example.org/vocab/mentions'
          and obj = 'http://example.org/entity/query'
    """,
    # GLOBAL-scope OPTIONAL + MINUS beside the UNION: the left join and
    # anti-join apply to the UNIONED rows, not per-branch
    "kg_bgp_union_global": f"""
        with {_KG_TRIPLES_CTE},
        base as (
          select subj as d from t
          where pred = 'http://example.org/vocab/lang' and obj = 'fr'
          union all
          select subj as d from t
          where pred = 'http://example.org/vocab/mentions'
            and obj = 'http://example.org/entity/query')
        select b.d, coalesce(m.obj, '') as e
        from base b
        left join (select subj, obj from t
                   where pred = 'http://example.org/vocab/mentions'
                     and obj = 'http://example.org/entity/spark') m
          on m.subj = b.d
        where b.d not in (
          select subj from t
          where pred = 'http://example.org/vocab/mentions'
            and obj = 'http://example.org/entity/hash')
    """,
    # subquery INSIDE each UNION branch: per-branch aggregate join, then
    # UNION ALL (zero-mention docs drop — inner-join semantics)
    "kg_bgp_union_subquery": f"""
        with {_KG_TRIPLES_CTE},
        mc as (select subj as d, count(*)::bigint as n from t
               where pred = 'http://example.org/vocab/mentions'
               group by subj)
        select lt.subj as d, mc.n
        from t lt join mc on mc.d = lt.subj
        where lt.pred = 'http://example.org/vocab/lang' and lt.obj = 'en'
        union all
        select lt.subj as d, mc.n
        from t lt join mc on mc.d = lt.subj
        where lt.pred = 'http://example.org/vocab/lang' and lt.obj = 'fr'
    """,
    "kg_pagerank": f"""
        with {_KG_TRIPLES_CTE},
        e as (select subj as src, obj as dst from t
              where pred = 'http://example.org/vocab/mentions'),
        nodes as (select distinct node from
                  (select src as node from e union all select dst from e)),
        nn as (select count(*)::double as n from nodes),
        deg as (select src, count(*)::double as outd from e group by 1),
        r0 as (select node, 1.0 / nn.n as r from nodes cross join nn),
        {_PR_ITERS}
        select node, round(r, 8) as rank from {_PR_LAST}
    """,
    "kg_pagerank_weighted": f"""
        with {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2,
                   count(*)::double as w
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        e as (select e1 as src, e2 as dst, w from cooc
              union all select e2, e1, w from cooc),
        nodes as (select distinct node from
                  (select src as node from e union all select dst from e)),
        nn as (select count(*)::double as n from nodes),
        deg as (select src, sum(w)::double as outd from e group by 1),
        r0 as (select node, 1.0 / nn.n as r from nodes cross join nn),
        {_PRW_ITERS}
        select node, round(r, 8) as rank from {_PRW_LAST}
    """,
    "kg_random_walks": f"""
        with {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        e as (select e1 as src, e2 as dst from cooc
              union all select e2, e1 from cooc),
        w0 as (select distinct src as walk_id, src as node, 0 as step
               from e),
        {_WALK_CTES}
        select walk_id, step::bigint as step, node
        from (select * from w0 union all select * from w1
              union all select * from w2 union all select * from w3)
        order by walk_id, step
    """,
    "kg_sssp": f"""
        with recursive {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2,
                   count(*)::bigint as w
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        e as (select e1 as src, e2 as dst, w from cooc
              union all select e2, e1, w from cooc),
        walk(node, dist, hops) as (
            select 'http://example.org/entity/spark', 0::bigint, 0
            union
            select e.dst, wk.dist + e.w, wk.hops + 1
            from e join walk wk on e.src = wk.node
            where wk.hops < 4),
        best as (select node, min(dist)::bigint as dist
                 from walk group by node)
        select node, dist from best order by node
    """,
    "kg_mis": f"""
        with {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        ae0 as (select e1 as src, e2 as dst from cooc
                union all select e2, e1 from cooc),
        alive0 as (select distinct src as node from ae0),
        {_MIS_CTES}
        select node, round::bigint as round from ({_MIS_UNION})
        order by node
    """,
    "kg_link_prediction": f"""
        with {_KG_TRIPLES_CTE},
        cooc as materialized (
            select 'http://example.org/entity/' || a.tok as e1,
                   'http://example.org/entity/' || b.tok as e2
            from m a join m b on a.doc_id = b.doc_id and a.tok < b.tok
            group by 1, 2),
        split as (select e1, e2,
                         md5_number_lower(e1 || ' ' || e2) % 5 = 0 as held
                  from cooc),
        train as (select e1, e2 from split where not held),
        test as (select e1, e2 from split where held),
        adj as (select e1 as u, e2 as z from train
                union all select e2, e1 from train),
        deg as (select z, count(*)::double as d from adj group by 1),
        w as (select u, z, 1.0 / ln(deg.d) as w from adj
              join deg using (z)),
        wedge as (select x.u as e1, y.u as e2, x.w
                  from w x join w y on x.z = y.z and x.u < y.u),
        sc as (select e1, e2, sum(w) as aa, count(*)::bigint as n_common
               from wedge group by 1, 2),
        cand as (select sc.* from sc anti join train using (e1, e2))
        select c.e1, c.e2, round(c.aa, 6) as aa_score, c.n_common,
               (t.e1 is not null) as is_heldout
        from cand c left join test t on c.e1 = t.e1 and c.e2 = t.e2
        order by c.e1, c.e2
    """,
    "kg_pagerank_personalized": f"""
        with {_KG_TRIPLES_CTE},
        e as (select subj as src, obj as dst from t
              where pred = 'http://example.org/vocab/mentions'),
        nodes as (select distinct node from
                  (select src as node from e union all select dst from e)),
        deg as (select src, count(*)::double as outd from e group by 1),
        pv as (select node,
                      case when node = 'http://example.org/entity/spark'
                           then 1.0 else 0.0 end as p
               from nodes),
        r0 as (select node, p as r from pv),
        {_PPR_ITERS}
        select node, round(r, 8) as rank from {_PPR_LAST}
    """,
    "kg_hits": f"""
        with {_KG_TRIPLES_CTE},
        e as (select subj as src, obj as dst from t
              where pred = 'http://example.org/vocab/mentions'),
        nodes as (select distinct node from
                  (select src as node from e union all select dst from e)),
        {_HITS_ITERS}
        select nodes.node,
               round(coalesce(h.x, 0), 8) as hub,
               round(coalesce(a.x, 0), 8) as auth
        from nodes
        left join {_HITS_H} h on nodes.node = h.node
        left join {_HITS_A} a on nodes.node = a.node
    """,
    "kg_degree_dist": f"""
        with {_KG_TRIPLES_CTE},
             d as (select subj, count(*)::bigint as degree from t group by 1)
        select degree, count(*)::bigint as n_subjects from d group by 1
    """,
    "q_events_pivot": """
        select date_trunc('hour', ts) as window_start,
               sum(case when event_type = 'click' then 1 else 0 end)::bigint as n_click,
               sum(case when event_type = 'error' then 1 else 0 end)::bigint as n_error,
               sum(case when event_type = 'purchase' then 1 else 0 end)::bigint as n_purchase,
               sum(case when event_type = 'signup' then 1 else 0 end)::bigint as n_signup,
               sum(case when event_type = 'view' then 1 else 0 end)::bigint as n_view
        from events group by 1
    """,
    "q_revenue_rollup": """
        select coalesce(c_mktsegment, 'ALL') as c_mktsegment,
               coalesce(o_orderpriority, 'ALL') as o_orderpriority,
               round(sum(o_totalprice), 2) as revenue,
               count(*)::bigint as n_orders
        from orders join customer on o_custkey = c_custkey
        group by rollup(c_mktsegment, o_orderpriority)
    """,
    "q_events_gap": """
        with g as (select user_id,
                          epoch(ts - lag(ts) over (partition by user_id
                                                   order by ts)) as gap
                   from events)
        select user_id, count(gap)::bigint as n_gaps,
               round(avg(gap), 2) as avg_gap_s,
               round(max(gap), 2) as max_gap_s
        from g where gap is not null group by 1
    """,
    "q_es_should": """
        select doc_id, source, n_chars from documents
        where n_chars >= 400 or source = 'src1'
    """,
    "q_es_match_phrase": r"""
        select doc_id from documents
        where regexp_matches(text, '(^|\s)spark\s+join(\s|$)')
    """,
    # _score ranking: constant-score-per-clause should (term boost 2,
    # range boost 1.5, match 0.5/term), ES bool rule (>=1 should matches),
    # top-50 by (_score desc, doc_id asc)
    "q_es_score": r"""
        with s as (
          select doc_id,
            2.0 * (case when source = 'src1' then 1 else 0 end)
            + 1.5 * (case when n_chars >= 400 then 1 else 0 end)
            + 0.5 * ((case when regexp_matches(text, '(^|\s)vector(\s|$)')
                      then 1 else 0 end)
                   + (case when regexp_matches(text, '(^|\s)stream(\s|$)')
                      then 1 else 0 end)
                   + (case when regexp_matches(text, '(^|\s)spark(\s|$)')
                      then 1 else 0 end)) as score,
            (source = 'src1' or n_chars >= 400
             or regexp_matches(text,
                               '(^|\s)(vector|stream|spark)(\s|$)'))
              as matched
          from documents)
        select doc_id, score as "_score" from s where matched
        order by score desc, doc_id asc limit 50
    """,
    # dense_vector script_score: cosine(query_vec, embedding) + 1.0,
    # top-20 by (_score desc, vec_id asc); rounded like similarity_topk
    "q_es_vector_score": """
        with q as (select embedding from embeddings where vec_id = 0)
        select e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[])
                     + 1.0, 4) as "_score"
        from embeddings e cross join q
        where e.vec_id >= 1
        order by list_cosine_similarity(e.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]) desc,
                 e.vec_id asc
        limit 20
    """,
    "q_es_terms": """
        select doc_id, lang, source from documents
        where lang in ('fr', 'de') and source not in ('src3', 'src4')
    """,
    # multi_match most_fields: per-field per-term constant scores add;
    # text^2, source^1; ES bool rule (at least one field-term matches)
    "q_es_multi_match": r"""
        with s as (
          select doc_id,
            2.0 * ((case when regexp_matches(text, '(^|\s)spark(\s|$)')
                    then 1 else 0 end)
                 + (case when regexp_matches(text, '(^|\s)src1(\s|$)')
                    then 1 else 0 end))
            + 1.0 * ((case when regexp_matches(source, '(^|\s)spark(\s|$)')
                      then 1 else 0 end)
                   + (case when regexp_matches(source, '(^|\s)src1(\s|$)')
                      then 1 else 0 end)) as score
          from documents)
        select doc_id, score as "_score" from s where score > 0
        order by score desc, doc_id asc limit 40
    """,
    "q_es_match": r"""
        select doc_id from documents
        where (regexp_matches(text, '(^|\s)vector(\s|$)')
               or regexp_matches(text, '(^|\s)stream(\s|$)'))
          and regexp_matches(text, '(^|\s)spark(\s|$)')
          and regexp_matches(text, '(^|\s)join(\s|$)')
    """,
    "q_es_agg": """
        select source as key, count(*)::bigint as doc_count,
               round(avg(n_chars), 2) as avg_chars
        from documents where n_chars >= 200
        group by 1 order by doc_count desc, key limit 5
    """,
    "doc_filter_pass": f"""
        with q as (
            select doc_id,
                   case when trim(text) = '' then 0
                        else length(string_split_regex(trim(text), '\\s+')) end
                   ::bigint as n_tokens,
                   round((length(text) - length(regexp_replace(text,
                        '[\\.,;:!\\?''"\\(\\)\\[\\]\\{{\\}}-]', '', 'g')))
                        / greatest(length(text), 1)::double, 4) as punct_ratio
            from documents),
        t as (select doc_id, string_split(text, ' ') as toks from documents),
        tok as (select doc_id, unnest(toks) as tok from t),
        cnt as (select doc_id, tok, count(*) as c from tok group by 1, 2),
        top as (select doc_id,
                       round(max(c) / sum(c)::double, 4) as top_token_frac
                from cnt group by 1),
        c as (select doc_id, {_LANG_COUNTS}
              from documents),
        lang as (select doc_id, {_LANG_ARGMAX} as lang_pred from c)
        select q.doc_id, q.n_tokens, lang.lang_pred
        from q join top on q.doc_id = top.doc_id
        join lang on q.doc_id = lang.doc_id
        where q.n_tokens >= 5 and q.punct_ratio <= 0.3
          and top.top_token_frac < 0.5 and lang.lang_pred != 'und'
    """,
    "doc_repetition": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        tok as (select doc_id, unnest(toks) as tok from t),
        cnt as (select doc_id, tok, count(*) as c from tok group by 1, 2),
        top as (select doc_id, max(c) as mx, sum(c) as n from cnt group by 1),
        idx as (select doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) as i
                from t where len(toks) >= 2),
        bg as (select doc_id, toks[i] || ' ' || toks[i+1] as g from idx),
        bgs as (select doc_id, count(*) as total,
                       count(distinct g) as uniq
                from bg group by 1)
        select t.doc_id,
               round(top.mx / top.n::double, 4) as top_token_frac,
               round(coalesce(1 - bgs.uniq / bgs.total::double, 0), 4)
                   as dup_bigram_frac
        from t
        left join top on t.doc_id = top.doc_id
        left join bgs on t.doc_id = bgs.doc_id
    """,
    "simhash_signatures": f"""
        with {_SIMHASH_SIG}
        select doc_id, simhash from sig
    """,
    "simhash_near_dup": f"""
        with {_SIMHASH_SIG}
        select a.doc_id as id_a, b.doc_id as id_b,
               bit_count(xor(a.simhash, b.simhash))::bigint as hamming
        from sig a join sig b on a.doc_id < b.doc_id
        where bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "doc_span_dedup": """
        with d as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        c as (select doc_id,
                     unnest(range(cast(ceil(len(toks) / 8.0) as bigint)))
                         as chunk_no,
                     toks
              from d),
        ct as (select doc_id, chunk_no,
                      array_to_string(toks[chunk_no * 8 + 1 : chunk_no * 8 + 8],
                                      ' ') as chunk_text
               from c),
        w as (select doc_id, chunk_no, chunk_text,
                     row_number() over (partition by chunk_text
                                        order by doc_id, chunk_no) = 1 as keep
              from ct)
        select doc_id,
               md5(coalesce(string_agg(chunk_text, ' ' order by chunk_no)
                            filter (where keep), '')) as dedup_md5
        from w group by doc_id
    """,
    # deterministic epoch shuffle: seed-keyed md5 order, 8 hash shards,
    # row_number within shard
    "doc_epoch_shuffle": """
        with h as (select doc_id,
                          md5_number_lower('epoch1:' || doc_id) as h
                   from documents)
        select doc_id, (h % 8)::bigint as shard,
               row_number() over (partition by h % 8
                                  order by h, doc_id) as pos
        from h
    """,
    # exact substring dedup, overlapping 8-token windows: rn>1 occurrences
    # (global (doc_id, pos) order per gram) cover their 8 positions; kept
    # tokens reassemble in order
    "doc_substring_dedup": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        p as (select doc_id, toks,
                     unnest(generate_series(1, len(toks) - 7)) as pos
              from t where len(toks) >= 8),
        g as (select doc_id, pos,
                     array_to_string(toks[pos:pos+7], ' ') as gram from p),
        d as (select doc_id, pos from (
                select doc_id, pos,
                       row_number() over (partition by gram
                                          order by doc_id, pos) as rn
                from g)
              where rn > 1),
        cov as (select distinct doc_id,
                       unnest(generate_series(pos, pos + 7)) as i from d),
        tok as (select doc_id, toks,
                       unnest(generate_series(1, len(toks))) as i from t),
        kept as (select tok.doc_id,
                        string_agg(tok.toks[tok.i], ' ' order by tok.i)
                            as txt
                 from tok left join cov on tok.doc_id = cov.doc_id
                                       and tok.i = cov.i
                 where cov.doc_id is null
                 group by tok.doc_id)
        select t.doc_id, md5(coalesce(kept.txt, '')) as dedup_md5
        from t left join kept using (doc_id)
    """,
    "doc_heavy_tokens": """
        select t as token, count(*)::bigint as est_count
        from (select unnest(string_split_regex(trim(text), '\\s+')) as t
              from documents where trim(text) != '')
        group by t
    """,
    "q_events_distinct_users": """
        select date_trunc('hour', ts) as window_start,
               count(distinct user_id)::bigint as n_users
        from events group by 1
    """,
    "q_events_top_users": """
        with s as (select date_trunc('hour', ts) as window_start, user_id,
                          sum(value) as sv
                   from events group by 1, 2)
        select window_start, user_id, round(sv, 2) as sum_value
        from s
        qualify row_number() over (partition by window_start
                                   order by sv desc, user_id) <= 3
    """,
    "q_events_median": """
        select event_type,
               round(quantile_cont(value, 0.5), 2) as median_value
        from events group by event_type
    """,
    "q_events_percentiles": """
        select event_type,
               round(quantile_cont(value, 0.25), 2) as p25,
               round(quantile_cont(value, 0.50), 2) as p50,
               round(quantile_cont(value, 0.90), 2) as p90
        from events group by event_type
    """,
    "q_events_first_n": """
        select user_id, ts, event_type, rn from (
            select user_id, ts, event_type,
                   row_number() over (partition by user_id order by ts)
                   ::bigint as rn
            from events) where rn <= 3
    """,
    "q_events_running": """
        select user_id, ts,
               round(sum(value) over (partition by user_id order by ts
                                      rows unbounded preceding), 2) as run_sum
        from events
    """,
    "doc_pii_redact": """
        with aug as (
            select doc_id,
                   text || ' Contact user' || doc_id || '@example.com or 10.'
                        || (doc_id % 250) || '.0.1 tel +1 555-01'
                        || lpad((doc_id % 100)::varchar, 2, '0') || ' now.'
                   as t0
            from documents),
        e as (select doc_id,
                     len(regexp_extract_all(t0,
                         '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'
                         ))::bigint as n_emails,
                     regexp_replace(t0,
                         '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g') as t1
              from aug),
        i as (select doc_id, n_emails,
                     len(regexp_extract_all(t1,
                         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'
                         ))::bigint as n_ipv4,
                     regexp_replace(t1,
                         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                         '<IP>', 'g') as t2
              from e),
        p as (select doc_id, n_emails, n_ipv4,
                     len(regexp_extract_all(t2, '\\+\\d[\\d\\- ]{7,}\\d'
                         ))::bigint as n_phones,
                     regexp_replace(t2, '\\+\\d[\\d\\- ]{7,}\\d',
                         '<PHONE>', 'g') as t3
              from i)
        select doc_id, n_emails, n_ipv4, n_phones, md5(t3) as clean_md5
        from p
    """,
    # Gopher rules (Rae et al. 2021 A1.1): published thresholds; ratios are
    # compared UNROUNDED, displayed rounded (half-away, matching the engine's
    # half_towards_infinity on positives)
    "doc_gopher_rules": """
        with g as (
            select doc_id,
                   len(regexp_extract_all(text, '\\S+'))::bigint as n_words,
                   length(regexp_replace(text, '\\s', '', 'g'))::bigint
                       as n_chars_ns,
                   len(list_filter(regexp_extract_all(text, '\\S+'),
                       x -> regexp_matches(x, '[A-Za-z]')))::bigint as n_alpha,
                   len(regexp_extract_all(text,
                       '\\b(the|be|to|of|and|that|have|with)\\b'))::bigint
                       as n_stop,
                   (len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\\.\\.\\.'))
                    + len(regexp_extract_all(text, '…')))::bigint as n_sym
            from documents)
        select doc_id, n_words,
               round(n_chars_ns * 1.0 / greatest(n_words, 1), 4)
                   as mean_word_len,
               round(n_alpha * 1.0 / greatest(n_words, 1), 4) as alpha_frac,
               round(n_sym * 1.0 / greatest(n_words, 1), 4) as symbol_ratio,
               n_stop,
               (case when n_words between 50 and 100000
                      and n_chars_ns * 1.0 / greatest(n_words, 1)
                          between 3 and 10
                      and n_sym * 1.0 / greatest(n_words, 1) <= 0.1
                      and n_alpha * 1.0 / greatest(n_words, 1) >= 0.8
                      and n_stop >= 2
                then 1 else 0 end)::bigint as passes
        from g
    """,
    "doc_normalize": """
        with n as (select doc_id,
                          trim(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                               ' ') as norm
                   from documents)
        select doc_id, md5(norm) as norm_md5,
               length(norm)::bigint as n_chars_norm
        from n
    """,
    "doc_decontaminate": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        idx as (select doc_id, toks,
                       unnest(generate_series(1, greatest(len(toks) - 2, 1)))
                       as i
                from t),
        sh0 as (select doc_id,
                       case when len(toks) <= 3 then array_to_string(toks, ' ')
                            else toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       end as sh
                from idx),
        ds as (select distinct doc_id, sh from sh0),
        bench as (select distinct sh from ds where doc_id % 17 = 0)
        select d.doc_id, count(*)::bigint as n_overlap
        from ds d join bench b using (sh)
        where d.doc_id % 17 != 0
        group by d.doc_id
    """,
    "doc_top_per_lang": """
        select doc_id, lang, n_chars from documents
        qualify row_number() over (partition by lang
                                   order by n_chars desc, doc_id) <= 3
    """,
    "minhash_near_dup": f"""
        with {_SHINGLE_PAIRS}
        select id_a, id_b, round(j, 4) as jaccard
        from jpairs where j >= 0.5
    """,
    # doc_ngram_jaccard is EXACT at the threshold (prefix-filtered all-pairs
    # join), so the same true-Jaccard oracle applies with no recall caveat
    "doc_ngram_jaccard": f"""
        with {_SHINGLE_PAIRS}
        select id_a, id_b, round(j, 4) as jaccard
        from jpairs where j >= 0.5
    """,
    "kg_components": f"""
        with recursive {_SHINGLE_PAIRS},
        sym as (select id_a as a, id_b as b from jpairs where j >= 0.5
                union
                select id_b, id_a from jpairs where j >= 0.5
                union
                select id_a, id_a from jpairs where j >= 0.5
                union
                select id_b, id_b from jpairs where j >= 0.5),
        reach(a, b) as (
            select a, b from sym
            union
            select r.a, s.b from reach r join sym s on r.b = s.a)
        select a as doc_id, min(b) as component
        from reach group by a
    """,
    "embedding_near_dup": """
        with all_v as (
            select vec_id, embedding from embeddings
            union all
            select vec_id + 10000 as vec_id, embedding from embeddings)
        select a.vec_id as id_a, b.vec_id as id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) as cosine
        from all_v a join all_v b on a.vec_id < b.vec_id
        where list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.95
    """,
    "similarity_topk": """
        with q as (select vec_id as query_id, embedding from embeddings where vec_id < 3)
        select q.query_id, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 4) as score
        from embeddings e cross join q
        qualify row_number() over (
            partition by q.query_id
            order by list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]) desc, e.vec_id
        ) <= 5
    """,
    # same semantics as dedup_exact: shards arrive in id order and earlier
    # shards take precedence, so min-id-per-text is the incremental result
    "doc_dedup_incremental": """
        select doc_id, text, lang, source, n_chars from documents
        qualify row_number() over (partition by text order by doc_id) = 1
    """,
    "q_smb_join": """
        select c.c_nationkey, count(*)::bigint as n_orders
        from orders o join customer c on o.o_custkey = c.c_custkey
        group by c.c_nationkey
    """,
    "q_profile_lineitem": """
        select 'l_discount' as col, count(*)::bigint as n_rows,
               sum(case when l_discount is null then 1 else 0 end)::bigint
                   as n_nulls,
               count(distinct l_discount)::bigint as n_distinct,
               min(l_discount)::double as min_val,
               max(l_discount)::double as max_val
        from lineitem
        union all
        select 'l_extendedprice', count(*)::bigint,
               sum(case when l_extendedprice is null then 1 else 0
                   end)::bigint,
               count(distinct l_extendedprice)::bigint,
               min(l_extendedprice)::double, max(l_extendedprice)::double
        from lineitem
        union all
        select 'l_quantity', count(*)::bigint,
               sum(case when l_quantity is null then 1 else 0 end)::bigint,
               count(distinct l_quantity)::bigint,
               min(l_quantity)::double, max(l_quantity)::double
        from lineitem
        union all
        select 'l_tax', count(*)::bigint,
               sum(case when l_tax is null then 1 else 0 end)::bigint,
               count(distinct l_tax)::bigint,
               min(l_tax)::double, max(l_tax)::double
        from lineitem
    """,
    "q_events_moving_avg": """
        with h as (
            select event_type, date_trunc('hour', ts) as hour,
                   count(*)::bigint as n
            from events group by 1, 2)
        select event_type, hour, n,
               round(avg(n) over (partition by event_type order by hour
                                  rows between 1 preceding and 1 following),
                     2) as ma3
        from h
    """,
    "q_es_range_agg": """
        with f as (select value from events where event_type = 'click')
        select '*-10' as key,
               count(*)::bigint as doc_count,
               round(avg(value), 2) as avg_value,
               max(value) as max_value
        from f where value < 10
        union all
        select '10-50', count(*)::bigint, round(avg(value), 2), max(value)
        from f where value >= 10 and value < 50
        union all
        select '50-*', count(*)::bigint, round(avg(value), 2), max(value)
        from f where value >= 50
    """,
    "doc_splits": """
        select doc_id,
               case when h < 90 then 'train'
                    when h < 95 then 'valid'
                    else 'test' end as split
        from (select doc_id,
                     md5_number_lower(doc_id::varchar) % 100 as h
              from documents)
    """,
    "emb_class_centroids": """
        select label, dim, round(avg(embedding[dim]), 6) as val
        from embeddings,
             unnest(generate_series(1, len(embedding))) as t(dim)
        group by 1, 2
    """,
    # train (per-dimension AVG centroids) + predict (argmin squared
    # distance, ties toward the smaller label) — the full nearest-centroid
    # loop in SQL
    "emb_nearest_centroid": """
        with c as (
            select label, dim, avg(embedding[dim]) as val
            from embeddings,
                 unnest(generate_series(1, len(embedding))) as t(dim)
            group by 1, 2),
        d as (
            select e.vec_id, c.label,
                   sum((e.embedding[c.dim] - c.val) ^ 2) as dist
            from embeddings e, c
            group by 1, 2)
        select vec_id, label as pred from d
        qualify row_number() over (partition by vec_id
                                   order by dist, label) = 1
        order by vec_id
    """,
    "emb_centroid_confusion": """
        with c as (
            select label, dim, avg(embedding[dim]) as val
            from embeddings,
                 unnest(generate_series(1, len(embedding))) as t(dim)
            group by 1, 2),
        d as (
            select e.vec_id, c.label,
                   sum((e.embedding[c.dim] - c.val) ^ 2) as dist
            from embeddings e, c
            group by 1, 2),
        p as (
            select vec_id, label as pred from d
            qualify row_number() over (partition by vec_id
                                       order by dist, label) = 1)
        select e.label, p.pred, count(*)::bigint as n
        from embeddings e join p using (vec_id)
        group by 1, 2
    """,
    "doc_classifier_pr": """
        with t as (
            select doc_id,
                   case when trim(text) = '' then 0
                        else length(string_split_regex(trim(text), '\\s+')) end
                   ::bigint as n_tokens,
                   length(text)::bigint as n_chars,
                   (length(text) - length(regexp_replace(text,
                        '[\\.,;:!\\?''"\\(\\)\\[\\]\\{\\}-]', '', 'g')))::bigint
                   as n_punct,
                   (lang = 'en')::int::double as y
            from documents),
        f as (
            select doc_id, y,
                   n_tokens / 100.0 as f1,
                   round(n_chars / greatest(n_tokens, 1)::double, 4) as f2,
                   round(n_punct / greatest(n_chars, 1)::double, 4) as f3
            from t),
        w1 as (
            select avg(y - 0.5)        as b,
                   avg(f1 * (y - 0.5)) as a1,
                   avg(f2 * (y - 0.5)) as a2,
                   avg(f3 * (y - 0.5)) as a3
            from f),
        p as (
            select f.*,
                   1.0 / (1.0 + exp(-(w1.b + w1.a1 * f1 + w1.a2 * f2
                                      + w1.a3 * f3))) as p1
            from f, w1),
        w2 as (
            select any_value(w1.b)  - avg(p1 - y)        as b,
                   any_value(w1.a1) - avg(f1 * (p1 - y)) as a1,
                   any_value(w1.a2) - avg(f2 * (p1 - y)) as a2,
                   any_value(w1.a3) - avg(f3 * (p1 - y)) as a3
            from p, w1),
        s as (
            select f.y,
                   round(1.0 / (1.0 + exp(-(w2.b + w2.a1 * f1 + w2.a2 * f2
                                            + w2.a3 * f3))), 4) as score
            from f, w2)
        select th.threshold,
               count(*) filter (score >= th.threshold and y >= 0.5)
                   ::bigint as tp,
               count(*) filter (score >= th.threshold and y < 0.5)
                   ::bigint as fp,
               count(*) filter (score < th.threshold and y >= 0.5)
                   ::bigint as fn,
               count(*) filter (score < th.threshold and y < 0.5)
                   ::bigint as tn
        from s cross join (values (0.3), (0.5), (0.7)) th(threshold)
        group by 1
    """,
    # the full kNN loop in SQL: pairwise distances (cast to double so the
    # comparison basis equals the engine's float64 math), top-5 per query
    # with id tie-break, majority vote with smaller-label tie-break
    "emb_knn_predict": """
        with d as (
            select a.vec_id as qid, b.vec_id as nid, b.label as nlab,
                   list_distance(a.embedding::double[],
                                 b.embedding::double[]) as dist
            from embeddings a join embeddings b
              on a.vec_id != b.vec_id),
        nn as (
            select qid, nlab from (
                select qid, nlab,
                       row_number() over (partition by qid
                                          order by dist, nid) as rn
                from d) where rn <= 5),
        v as (select qid, nlab, count(*) as c from nn group by 1, 2)
        select qid as vec_id, nlab as pred from v
        qualify row_number() over (partition by qid
                                   order by c desc, nlab) = 1
        order by vec_id
    """,
    "doc_snapshot_diff": """
        with old as (
            select doc_id, n_chars from documents where doc_id % 5 != 0),
        new as (
            select doc_id,
                   n_chars + (case when doc_id % 7 = 0 then 1 else 0 end)
                   as n_chars
            from documents where doc_id % 3 != 0)
        select coalesce(old.doc_id, new.doc_id) as doc_id,
               case when old.doc_id is null then 'added'
                    when new.doc_id is null then 'removed'
                    when old.n_chars != new.n_chars then 'changed'
                    else 'unchanged' end as status,
               old.n_chars as n_chars_old,
               new.n_chars as n_chars_new
        from old full outer join new on old.doc_id = new.doc_id
    """,
    # mirror of ops/text.normalize_urls rule-for-rule (same regexes, same
    # order; capture-group port rule because RE2 has no lookahead)
    "doc_url_normalize": """
        with u as (
            select doc_id,
                   case doc_id % 3
                     when 0 then 'HTTP://WWW.Site' || (doc_id % 7)
                                 || '.COM:80/A/' || doc_id || '/'
                     when 1 then 'https://Host' || (doc_id % 7)
                                 || '.Example.com:443/p/' || doc_id
                                 || '#frag'
                     else 'HTTPS://CDN' || (doc_id % 7)
                          || '.example.COM/x/' || doc_id || '?a=B'
                   end as url
            from documents),
        n1 as (select doc_id, regexp_replace(url, '#.*$', '') as u from u),
        n2 as (select doc_id,
                      lower(regexp_extract(u,
                            '^([a-zA-Z][\\w+.-]*://[^/?#]*)', 1))
                      || regexp_replace(u,
                            '^[a-zA-Z][\\w+.-]*://[^/?#]*', '') as u
               from n1),
        n3 as (select doc_id,
                      regexp_replace(regexp_replace(u,
                          '^(http://[^/?#]*):80($|[/?#])', '\\1\\2'),
                          '^(https://[^/?#]*):443($|[/?#])', '\\1\\2') as u
               from n2)
        select doc_id, regexp_replace(u, '/+$', '') as url_norm from n3
    """,
    "doc_host_cap": """
        select doc_id, source, rn from (
            select doc_id, source,
                   row_number() over (partition by source
                                      order by doc_id) as rn
            from documents)
        where rn <= 20
    """,
    "q_es_stats_agg": """
        select event_type as key,
               count(*)::bigint as doc_count,
               count(value)::bigint as value_stats_count,
               min(value) as value_stats_min,
               max(value) as value_stats_max,
               round(avg(value), 2) as value_stats_avg,
               round(sum(value), 2) as value_stats_sum,
               round(quantile_cont(value, 0.50), 2) as value_pct_p50,
               round(quantile_cont(value, 0.95), 2) as value_pct_p95
        from events
        group by 1
        order by 1
    """,
    "q_events_retention": """
        with act as (
            select distinct user_id, date_trunc('day', ts)::date as day
            from events),
        fd as (select user_id, min(day) as cohort from act group by 1)
        select strftime(fd.cohort, '%Y-%m-%d') as cohort,
               datediff('day', fd.cohort, act.day)::bigint as "offset",
               count(*)::bigint as n_users
        from act join fd using (user_id)
        group by 1, 2
    """,
    "q_es_search_page": """
        select event_id, event_type, value from events
        where event_type = 'click'
        order by value desc, event_id
        limit 5 offset 2
    """,
    "q_es_top_hits": """
        select event_type as key, rank, event_id, value from (
            select event_type, event_id, value,
                   row_number() over (partition by event_type
                                      order by value desc, event_id)
                   as rank
            from events where event_type = 'click')
        where rank <= 2
    """,
    "q_events_outliers": """
        with th as (
            select event_type, quantile_cont(value, 0.99) as p99
            from events group by event_type)
        select e.event_type, round(th.p99, 2) as p99,
               sum(case when e.value > th.p99 then 1 else 0 end)::bigint
                   as n_outliers
        from events e join th using (event_type)
        group by e.event_type, th.p99
    """,
    "q_integrity_check": """
        select 'lineitem->orders' as relation,
               (select count(*) from lineitem)::bigint as n_rows,
               (select count(*) from lineitem l where not exists (
                    select 1 from orders o
                    where o.o_orderkey = l.l_orderkey))::bigint as n_orphans
        union all
        select 'lineitem->part',
               (select count(*) from lineitem)::bigint,
               (select count(*) from lineitem l where not exists (
                    select 1 from part p
                    where p.p_partkey = l.l_partkey))::bigint
        union all
        select 'lineitem->supplier',
               (select count(*) from lineitem)::bigint,
               (select count(*) from lineitem l where not exists (
                    select 1 from supplier s
                    where s.s_suppkey = l.l_suppkey))::bigint
        union all
        select 'orders->customer',
               (select count(*) from orders)::bigint,
               (select count(*) from orders o where not exists (
                    select 1 from customer c
                    where c.c_custkey = o.o_custkey))::bigint
    """,
    "doc_length_deciles": """
        with th as (
            select quantile_cont(n_chars, 0.1) as q1,
                   quantile_cont(n_chars, 0.2) as q2,
                   quantile_cont(n_chars, 0.3) as q3,
                   quantile_cont(n_chars, 0.4) as q4,
                   quantile_cont(n_chars, 0.5) as q5,
                   quantile_cont(n_chars, 0.6) as q6,
                   quantile_cont(n_chars, 0.7) as q7,
                   quantile_cont(n_chars, 0.8) as q8,
                   quantile_cont(n_chars, 0.9) as q9
            from documents)
        select d.doc_id,
               (1 + (d.n_chars > th.q1)::int + (d.n_chars > th.q2)::int
                  + (d.n_chars > th.q3)::int + (d.n_chars > th.q4)::int
                  + (d.n_chars > th.q5)::int + (d.n_chars > th.q6)::int
                  + (d.n_chars > th.q7)::int + (d.n_chars > th.q8)::int
                  + (d.n_chars > th.q9)::int)::bigint as decile
        from documents d cross join th
    """,
    # k-means unrolled: init = vectors of the 10 smallest vec_ids; one
    # update round (avg of members, empty cluster keeps its init centroid);
    # final assignment = argmin distance with ties toward the smaller cid —
    # exactly ops/clustering.kmeans_assign(k=10, iters=2).
    "emb_kmeans": """
        with init as (
            select row_number() over (order by vec_id) - 1 as cid,
                   embedding::DOUBLE[] as cent
            from (select vec_id, embedding from embeddings
                  order by vec_id limit 10)
        ),
        m1 as (
            select vec_id, cid from (
                select e.vec_id, c.cid,
                       row_number() over (
                           partition by e.vec_id
                           order by list_distance(e.embedding::DOUBLE[],
                                                  c.cent), c.cid) as rn
                from embeddings e cross join init c) where rn = 1
        ),
        upd as (
            select cid, ord, avg(val) as v
            from (select m1.cid,
                         generate_subscripts(e.embedding, 1) as ord,
                         unnest(e.embedding::DOUBLE[]) as val
                  from m1 join embeddings e using (vec_id))
            group by cid, ord
        ),
        c1 as (
            select i.cid, coalesce(u.cent, i.cent) as cent
            from init i left join (
                select cid, list(v order by ord) as cent
                from upd group by cid) u using (cid)
        )
        select vec_id, cluster from (
            select e.vec_id, c.cid::bigint as cluster,
                   row_number() over (
                       partition by e.vec_id
                       order by list_distance(e.embedding::DOUBLE[],
                                              c.cent), c.cid) as rn
            from embeddings e cross join c1 c) where rn = 1
    """,
    # same unrolled 2-iteration kmeans as emb_kmeans, but over the
    # dup-augmented table, then within-cluster cosine pruning (SemDeDup)
    "emb_semdedup": """
        with all_v as (
            select vec_id, embedding from embeddings
            union all
            select vec_id + 10000 as vec_id, embedding from embeddings),
        init as (
            select row_number() over (order by vec_id) - 1 as cid,
                   embedding::DOUBLE[] as cent
            from (select vec_id, embedding from all_v
                  order by vec_id limit 10)
        ),
        m1 as (
            select vec_id, cid from (
                select e.vec_id, c.cid,
                       row_number() over (
                           partition by e.vec_id
                           order by list_distance(e.embedding::DOUBLE[],
                                                  c.cent), c.cid) as rn
                from all_v e cross join init c) where rn = 1
        ),
        upd as (
            select cid, ord, avg(val) as v
            from (select m1.cid,
                         generate_subscripts(e.embedding, 1) as ord,
                         unnest(e.embedding::DOUBLE[]) as val
                  from m1 join all_v e using (vec_id))
            group by cid, ord
        ),
        c1 as (
            select i.cid, coalesce(u.cent, i.cent) as cent
            from init i left join (
                select cid, list(v order by ord) as cent
                from upd group by cid) u using (cid)
        ),
        asg as (
            select vec_id, cluster, embedding from (
                select e.vec_id, c.cid::bigint as cluster, e.embedding,
                       row_number() over (
                           partition by e.vec_id
                           order by list_distance(e.embedding::DOUBLE[],
                                                  c.cent), c.cid) as rn
                from all_v e cross join c1 c) where rn = 1
        ),
        pairs as (
            select a.vec_id as removed_id, b.vec_id as kept_id, a.cluster,
                   list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) as cosine
            from asg a join asg b on a.cluster = b.cluster
                                 and b.vec_id < a.vec_id
            where list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.95)
        select removed_id, kept_id, cluster, round(cosine, 4) as cosine
        from pairs
        qualify row_number() over (partition by removed_id
                                   order by kept_id) = 1
    """,
    "q10_returned_revenue": """
        select c.c_custkey, c.c_name, c.c_acctbal,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue
        from lineitem l
        join orders o on l.l_orderkey = o.o_orderkey
        join customer c on o.o_custkey = c.c_custkey
        where l.l_returnflag = 'R'
        group by c.c_custkey, c.c_name, c.c_acctbal
        order by revenue desc, c.c_custkey
        limit 20
    """,
    "q17_small_quantity_revenue": """
        select round(sum(l.l_extendedprice) / 7.0, 2) as avg_yearly
        from lineitem l
        join (select l_partkey,
                     0.2::double * (sum(l_quantity) / count(l_quantity)) as thr
              from lineitem group by l_partkey) t
          on l.l_partkey = t.l_partkey
        where l.l_quantity < t.thr
    """,
    "q18_large_orders": """
        select c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, t.sum_qty
        from (select l_orderkey, sum(l_quantity) as sum_qty
              from lineitem group by l_orderkey
              having sum(l_quantity) > 200) t
        join orders o on t.l_orderkey = o.o_orderkey
        join customer c on o.o_custkey = c.c_custkey
        order by o.o_totalprice desc, o.o_orderkey
        limit 100
    """,
    "q_price_corr": """
        select round(corr(l_quantity, l_extendedprice), 6) as corr_qty_price
        from lineitem
    """,
    "q_price_histogram": """
        select cast(floor(o_totalprice / 50000.0) as bigint) as bucket,
               count(*) as n,
               round(min(o_totalprice), 2) as min_price,
               round(max(o_totalprice), 2) as max_price
        from orders group by 1
    """,
    "doc_sample": """
        select doc_id, lang from documents
        where md5_number_lower(cast(doc_id as varchar)) % 100 < 10
    """,
    "doc_sample_stratified": """
        select doc_id, lang from documents
        where md5_number_lower(cast(doc_id as varchar)) % 100 <
              case lang when 'en' then 5 when 'zh' then 80 else 50 end
    """,
    "q_es_date_histogram": """
        select date_trunc('hour', ts) as key,
               count(*) as doc_count,
               round(sum(value), 2) as revenue,
               count(distinct user_id) as users
        from events where event_type = 'purchase'
        group by 1
    """,
    "doc_unigram_logprob": """
        with tok as (select doc_id, unnest(string_split(text, ' ')) as token
                     from documents where coalesce(trim(text), '') != ''),
             tot as (select count(*) as n from tok),
             f as (select token, count(*) as c from tok group by token)
        select doc_id,
               round(avg(ln(c::double / (select n from tot))), 4) as avg_logprob
        from tok join f using (token)
        group by doc_id
    """,
    "doc_bigram_logprob": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        prs as (select doc_id, toks[i] as w1, toks[i+1] as w2
                from (select doc_id, toks,
                             unnest(generate_series(1, len(toks) - 1)) as i
                      from t)),
        c12 as (select w1, w2, count(*)::double as c12 from prs group by 1, 2),
        c1 as (select w1, count(*)::double as c1 from prs group by 1),
        c2 as (select w2, count(*)::double as c2 from prs group by 1),
        tot as (select count(*)::double as t from prs)
        select doc_id,
               round(avg(ln(0.7 * c12.c12 / c1.c1
                            + 0.3 * c2.c2 / tot.t)), 4) as avg_logprob
        from prs
        join c12 using (w1, w2)
        join c1 using (w1)
        join c2 using (w2)
        cross join tot
        group by doc_id
    """,
    # CCNet head/middle/tail buckets: same bigram-LM CTE as
    # doc_bigram_logprob, then an NTILE(3) window in
    # (avg_logprob DESC, doc_id) order
    "doc_ppl_buckets": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        prs as (select doc_id, toks[i] as w1, toks[i+1] as w2
                from (select doc_id, toks,
                             unnest(generate_series(1, len(toks) - 1)) as i
                      from t)),
        c12 as (select w1, w2, count(*)::double as c12 from prs group by 1, 2),
        c1 as (select w1, count(*)::double as c1 from prs group by 1),
        c2 as (select w2, count(*)::double as c2 from prs group by 1),
        tot as (select count(*)::double as t from prs),
        scores as (
            select doc_id,
                   round(avg(ln(0.7 * c12.c12 / c1.c1
                                + 0.3 * c2.c2 / tot.t)), 4) as avg_logprob
            from prs
            join c12 using (w1, w2)
            join c1 using (w1)
            join c2 using (w2)
            cross join tot
            group by doc_id),
        b as (select doc_id,
                     ntile(3) over (order by avg_logprob desc, doc_id) as t3
              from scores)
        select doc_id,
               case t3 when 1 then 'head' when 2 then 'middle'
                       else 'tail' end as bucket
        from b order by doc_id
    """,
    # 32-token windows at stride 24; toks[a:b] is inclusive, chunk_id is
    # the 0-based window index
    "doc_chunk_windows": """
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents),
        s as (select doc_id, toks, len(toks) as n from t),
        c as (select doc_id, toks, n,
                     unnest(generate_series(1, n::bigint, 24)) as start
              from s)
        select doc_id,
               ((start - 1) / 24)::bigint as chunk_id,
               array_to_string(toks[start:least(start + 31, n)], ' ')
                   as chunk_text,
               (least(start + 31, n) - start + 1)::bigint as n_tokens
        from c order by doc_id, chunk_id
    """,
    # temperature-flattened language mixture: tau=0.5, target half the
    # corpus; accept iff md5(doc_id)/2^64 < min(1, q_l * T / n_l)
    "doc_temperature_mixture": """
        with c as (select lang, count(*)::double as n
                   from documents group by 1),
        t as (select sum(n) as nt,
                     sum(pow(n / (select sum(n) from c), 0.5)) as qsum
              from c),
        r as (select c.lang,
                     least(1.0, (pow(c.n / t.nt, 0.5) / t.qsum)
                                * (0.5 * t.nt) / c.n) as a
              from c cross join t)
        select d.doc_id, d.lang
        from documents d join r on d.lang = r.lang
        where md5_number_lower(cast(d.doc_id as varchar))
              / 18446744073709551616.0 < r.a
        order by d.doc_id
    """,
    "doc_sample_per_lang": """
        select lang, doc_id from documents
        qualify row_number() over (
            partition by lang
            order by md5_number_lower(cast(doc_id as varchar)), doc_id) <= 10
    """,
    # DSIR importance weights: hashed-bigram (md5_number_lower % 256)
    # target/raw log-ratio with add-1 smoothing; target = curated slice
    # (lang='en', doc_id%10==0), raw = 1/7 hash sample of the pool
    "dsir_weights": """
        with t as (select doc_id, lang, string_split(text, ' ') as toks
                   from documents),
        i as (select doc_id, lang, toks,
                     unnest(generate_series(1, len(toks) - 1)) as i from t),
        b as (select doc_id, lang,
                     (md5_number_lower(toks[i] || ' ' || toks[i+1])
                      % 256)::bigint as bucket from i),
        ct as (select bucket, count(*)::double as n from b
               where lang = 'en' and doc_id % 10 = 0 group by 1),
        cr as (select bucket, count(*)::double as n from b
               where doc_id % 7 = 3 group by 1),
        lam as (select k.bucket,
                       ln((coalesce(ct.n, 0) + 1)
                          / ((select coalesce(sum(n), 0) from ct) + 256))
                     - ln((coalesce(cr.n, 0) + 1)
                          / ((select coalesce(sum(n), 0) from cr) + 256))
                       as lam
                from (select unnest(generate_series(0, 255)) as bucket) k
                left join ct on k.bucket = ct.bucket
                left join cr on k.bucket = cr.bucket)
        select b.doc_id, round(sum(lam.lam), 4) as dsir_weight
        from b join lam using (bucket)
        group by b.doc_id
    """,
    "doc_bigrams": """
        with t as (select string_split(text, ' ') as toks from documents),
             i as (select toks,
                          unnest(generate_series(1, len(toks) - 1)) as i
                   from t),
             b as (select toks[i] || ' ' || toks[i+1] as bigram from i)
        select bigram, count(*) as n from b group by 1
        order by n desc, bigram limit 20
    """,
    "doc_collocations": """
        with t as (select string_split(text, ' ') as toks from documents),
        i as (select toks, unnest(generate_series(1, len(toks) - 1)) as i
              from t),
        b as (select toks[i] as w1, toks[i + 1] as w2 from i),
        bc as (select w1, w2, count(*)::bigint as n from b group by 1, 2),
        u as (select unnest(toks) as token from t),
        uc as (select token, count(*)::bigint as c from u group by 1)
        select bc.w1 || ' ' || bc.w2 as bigram, bc.n,
               round(ln((bc.n::double
                         * (select count(*) from u)::double)
                        / (u1.c::double * u2.c::double)), 4) as pmi
        from bc
        join uc u1 on bc.w1 = u1.token
        join uc u2 on bc.w2 = u2.token
        where bc.n >= 5
        order by pmi desc, bigram
        limit 20
    """,
    "q_events_json": """
        select event_type, count(*) as n,
               round(avg(cast(json_extract_string(props, '$.k') as bigint)), 2)
                   as avg_k
        from events group by event_type
    """,
    "q_balance_buckets": """
        with c as (select cast(floor(c_acctbal / 1000.0) as bigint) as bucket,
                          count(*) as n_cust from customer group by 1),
             s as (select cast(floor(s_acctbal / 1000.0) as bigint) as bucket,
                          count(*) as n_supp from supplier group by 1)
        select coalesce(c.bucket, s.bucket) as bucket,
               coalesce(n_cust, 0) as n_cust,
               coalesce(n_supp, 0) as n_supp
        from c full outer join s on c.bucket = s.bucket
    """,
    "q_events_late": """
        with wm as (select max(ts) - interval 24 hours as w from events)
        select date_trunc('hour', ts) as window_start,
               sum(case when date_trunc('hour', ts) + interval 1 hour
                        < (select w from wm) then 0 else 1 end)::bigint
                   as n_on_time,
               sum(case when date_trunc('hour', ts) + interval 1 hour
                        < (select w from wm) then 1 else 0 end)::bigint
                   as n_late
        from events group by 1
    """,
    "q_events_zscore": """
        select event_id,
               round((value - avg(value) over (partition by event_type))
                     / stddev_pop(value) over (partition by event_type), 4)
                   as z
        from events
    """,
    "q_events_funnel": """
        with fv as (select user_id, min(ts) as t from events
                    where event_type = 'view' group by 1),
             conv as (select distinct f.user_id from fv f
                      join events e on e.user_id = f.user_id
                       and e.event_type = 'purchase' and e.ts > f.t)
        select (select count(*) from fv)::bigint as n_viewed,
               (select count(*) from conv)::bigint as n_converted
    """,
    "q_supplier_best": """
        select n.n_name, s.s_suppkey, s.s_name, s.s_acctbal
        from supplier s join nation n on s.s_nationkey = n.n_nationkey
        qualify row_number() over (
            partition by s.s_nationkey
            order by s.s_acctbal desc, s.s_suppkey) = 1
    """,
}

# IVF with nprobe = n_centroids prunes nothing, so it must reproduce the
# exact brute-force result — the same oracle gates both paths
ORACLES["similarity_topk_ivf_full"] = ORACLES["similarity_topk"]
