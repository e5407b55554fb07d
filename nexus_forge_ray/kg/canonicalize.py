"""Canonicalization: connected components over candidate near-duplicate pairs.

Not present in the reference (it resolves each mention independently); this is
the scalable replacement demanded by the north rule: MinHash-LSH blocking
(ops.dedup.minhash_candidate_pairs) produces candidate edges; distributed
graph contraction computes connected components; every member maps to the
component's minimum id (the canonical representative).

Scale properties:
- each contraction level = one bucketed groupby (closed-neighborhood min)
  + two bucketed joins (endpoint relabel) + one distinct; components at
  least halve per level, so levels ≤ log2(n) on ANY topology (long chains
  included — min-label propagation would need diameter rounds there).
- level tables shrink geometrically: total exchange volume is O(E).
- head-entity skew: the join/groupby keys are node ids, pre-bucketed by hash;
  a giant component stays distributed because we only ship (node, label) pairs.

For candidate sets that are provably small (blocking output ≪ corpus) the
driver-side union-find `union_find_local` is also provided and used by tests
as the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def union_find_local(edges: pd.DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b") -> dict:
    """Driver-side union-find (path compression) — oracle + small-case path."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges[id_a], edges[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def _components_bounded(edges: ray.data.Dataset, *,
                        local_edge_limit: int = 2_000_000) -> dict | None:
    """Collect edges for a local union-find ONLY while under the limit;
    return None on overflow (caller falls back to the distributed
    min-label propagation). Streaming iter_batches — never materializes an
    unbounded edge set on the driver."""
    batches, n = [], 0
    for b in edges.iter_batches(batch_size=65536, batch_format="pandas"):
        batches.append(b)
        n += len(b)
        if n > local_edge_limit:
            return None
    if n == 0:
        return {}
    return union_find_local(pd.concat(batches, ignore_index=True))


def _attach_components(exact: ray.data.Dataset, comp_ds: ray.data.Dataset,
                       id_col: str) -> ray.data.Dataset:
    """LEFT-join member rows (node=rep, id_b=member) onto rep components;
    unmatched reps are their own component. Ships the component column as
    object dtype through the join: ids are full-range int64 hashes and a
    left join's NaN fill would coerce int64 to float64, corrupting every
    value above 2^53 (matched rows included)."""
    from nexus_forge_ray.ops.joins import partitioned_join
    comp_obj = comp_ds.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"].to_numpy(),
             "component": df["component"].to_numpy(dtype=object)}),
        batch_format="pandas")
    joined = partitioned_join(exact, comp_obj, on="node", how="left",
                              lcols=["node", "id_b"],
                              rcols=["node", "component"])

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        c = df["component"].to_numpy(dtype=object)
        miss = pd.isna(c)
        c[miss] = df["node"].to_numpy()[miss]
        return pd.DataFrame({id_col: df["id_b"].to_numpy().astype("int64"),
                             "component": c.astype("int64")})

    members = joined.map_batches(resolve, batch_format="pandas")
    rep_rows = comp_ds.map_batches(
        lambda df: df.rename(columns={"node": id_col}),
        batch_format="pandas")
    return members.union(rep_rows)


def connected_components(edges: ray.data.Dataset, *, id_a: str = "id_a",
                         id_b: str = "id_b", max_iters: int = 64,
                         num_buckets: int = 32) -> ray.data.Dataset:
    """Distributed connected components by graph contraction.
    Returns (node, component) for every node appearing in an edge.

    Per level: (1) label every node with the min of its CLOSED neighborhood
    — one bucketed groupby over the edge rows plus self rows, no join;
    (2) build the quotient graph by relabeling both edge endpoints (two
    bucketed joins) and dropping self-loops/duplicates; recurse on the
    quotient. No two adjacent nodes can both be closed-neighborhood minima,
    so every level at least halves each component's node count — ≤ log2(n)
    levels on ANY topology (a 10^6-node path contracts in ~20 levels, where
    plain min-label propagation needs 10^6 rounds). Finally unwind with one
    LEFT join per level (isolated quotient nodes keep themselves,
    fillna(p)). Raises rather than returning silently-unconverged labels if
    max_iters levels are exceeded (impossible below 2^64 nodes).

    Scale: each level's tables shrink geometrically, so total exchange
    volume is O(E) and no stage holds more than one level's edges.
    """
    from nexus_forge_ray.ops.agg import distinct_rows, hash_groupby_agg
    from nexus_forge_ray.ops.joins import partitioned_join

    # symmetrize once: (src, dst) both directions
    def sym(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[id_a].to_numpy()
        b = batch[id_b].to_numpy()
        return pd.DataFrame({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

    # materialize: the candidate-edge set is small (blocking output ≪
    # corpus) and is re-read by the label groupby and both relabel joins —
    # without this each consumer re-executes the upstream blocking pipeline.
    cur = edges.map_batches(sym, batch_format="pandas").materialize()
    if cur.count() == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "component": pd.Series(dtype="int64")}))

    levels: list[ray.data.Dataset] = []
    for _ in range(max_iters):
        # closed-neighborhood min: min(self, neighbors) per node. The self
        # row rides along as (src, src) so isolated-after-dedup nodes and
        # local minima keep their own id.
        def with_self(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": np.concatenate([batch["src"].to_numpy(),
                                        batch["src"].to_numpy()]),
                "label": np.concatenate([batch["dst"].to_numpy(),
                                         batch["src"].to_numpy()])})

        labels = hash_groupby_agg(
            cur.map_batches(with_self, batch_format="pandas"),
            "node", {"label": ("label", "min")},
            num_buckets=num_buckets).repartition(num_buckets).materialize()
        levels.append(labels)

        # quotient edges: relabel both endpoints, drop self-loops, dedupe.
        lab_src = labels.map_batches(
            lambda df: df.rename(columns={"node": "src", "label": "lsrc"}),
            batch_format="pandas")
        e1 = partitioned_join(cur, lab_src, on="src",
                              num_buckets=num_buckets,
                              lcols=["src", "dst"], rcols=["src", "lsrc"])
        lab_dst = labels.map_batches(
            lambda df: df.rename(columns={"node": "dst", "label": "ldst"}),
            batch_format="pandas")
        e2 = partitioned_join(e1, lab_dst, on="dst",
                              num_buckets=num_buckets,
                              lcols=["src", "dst", "lsrc"],
                              rcols=["dst", "ldst"])
        nxt = e2.map_batches(
            lambda df: df.loc[df["lsrc"] != df["ldst"],
                              ["lsrc", "ldst"]].rename(
                columns={"lsrc": "src", "ldst": "dst"}),
            batch_format="pandas")
        cur = distinct_rows(nxt, ["src", "dst"], num_buckets=num_buckets,
                            keep_cols=[]).repartition(
            num_buckets).materialize()
        if cur.count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not contract in {max_iters} levels "
            "(components at least halve per level — this indicates a "
            "relabeling bug, not a data property)")

    # unwind: the last level's labels ARE final components (no edges remain
    # between them). Going up, a level-k node n resolves to comp(label_k(n));
    # labels absent from the finer comp table (isolated quotient nodes) are
    # their own component — LEFT join + fillna(p).
    comp = levels[-1].map_batches(
        lambda df: df.rename(columns={"label": "component"}),
        batch_format="pandas")
    for lab in reversed(levels[:-1]):
        child = lab.map_batches(
            lambda df: df.rename(columns={"label": "p"}),
            batch_format="pandas")
        # component -> object dtype BEFORE the left join: ids are full-range
        # int64 hashes, and a left join's NaN fill coerces int64 to float64,
        # silently corrupting every value above 2^53 (matched rows included)
        parent = comp.map_batches(
            lambda df: pd.DataFrame(
                {"p": df["node"].to_numpy(),
                 "component": df["component"].to_numpy(dtype=object)}),
            batch_format="pandas")
        joined = partitioned_join(child, parent, on="p", how="left",
                                  num_buckets=num_buckets,
                                  lcols=["node", "p"],
                                  rcols=["p", "component"])

        def resolve(df: pd.DataFrame) -> pd.DataFrame:
            c = df["component"].to_numpy(dtype=object)
            miss = pd.isna(c)
            c[miss] = df["p"].to_numpy()[miss]
            # restore int64 for integer ids (exact — no float intermediate);
            # string node ids (IRIs) stay object
            comp = pd.Series(c).infer_objects()
            return pd.DataFrame({"node": df["node"].to_numpy(),
                                 "component": comp.to_numpy()})

        comp = joined.map_batches(
            resolve,
            batch_format="pandas").repartition(num_buckets).materialize()
    return comp


def _tiered_candidate_edges(sig: ray.data.Dataset, *, id_col: str,
                            num_perm: int, num_bands: int) -> ray.data.Dataset:
    """Exact-signature collapse (tier 1) + banded LSH over representatives
    (tier 2). Returns candidate edges (id_a, id_b)."""
    import pyarrow as pa

    from nexus_forge_ray.ops.dedup import (_BAND_MIX, _sig_matrix,
                                           minhash_candidate_pairs)

    def hash_rows(t: pa.Table) -> pd.DataFrame:
        ids, m = _sig_matrix(t, id_col)
        h = np.zeros(len(ids), dtype=np.uint64)
        for j in range(m.shape[1] if m.size else 0):
            h ^= (m[:, j] + np.uint64(j * 1315423911)) \
                * _BAND_MIX[j % len(_BAND_MIX)]
        return pd.DataFrame({
            id_col: ids, "sig_hash": h,
            "mh": [r.tobytes() for r in m],
            "__bkt": (h % np.uint64(64)).astype("int32"),
        })

    hr = sig.map_batches(hash_rows, batch_format="pyarrow")

    def collapse(group: pd.DataFrame) -> pd.DataFrame:
        edge_a, edge_b, rep_rows = [], [], []
        for _, sub in group.groupby("sig_hash", sort=False):
            ids = np.sort(sub[id_col].unique())
            rep = ids[0]
            rep_rows.append((rep, sub["mh"].iloc[0]))
            if len(ids) > 1:
                edge_a.append(np.full(len(ids) - 1, rep))
                edge_b.append(ids[1:])
        frames = []
        if edge_a:
            frames.append(pd.DataFrame({
                "id_a": np.concatenate(edge_a), "id_b": np.concatenate(edge_b),
                "mh": b"", "kind": np.int8(0)}))
        if rep_rows:
            frames.append(pd.DataFrame({
                "id_a": [r[0] for r in rep_rows],
                "id_b": np.int64(0),
                "mh": [r[1] for r in rep_rows], "kind": np.int8(1)}))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64"),
                          "mh": pd.Series(dtype=object),
                          "kind": pd.Series(dtype="int8")})

    tier1 = hr.groupby("__bkt").map_groups(collapse, batch_format="pandas")
    tier1 = tier1.materialize()  # consumed twice (edges + reps); ≤ corpus size
    exact_edges = tier1.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["id_a", "id_b"]],
        batch_format="pandas")
    # exact edges are already (representative -> member): no union-find needed
    # for them — only the (tiny) rep-level LSH edges get merged on the driver

    def rep_sigs(df: pd.DataFrame) -> pa.Table:
        reps = df[df["kind"] == 1]
        if not len(reps):
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "minhash": pa.array([], type=pa.list_(pa.uint64(),
                                                                   num_perm))})
        m = np.frombuffer(b"".join(reps["mh"]), dtype=np.uint64) \
            .reshape(len(reps), -1)
        mh = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.uint64()), num_perm)
        return pa.table({id_col: pa.array(reps["id_a"].to_numpy()),
                         "minhash": mh})

    reps = tier1.map_batches(rep_sigs, batch_format="pandas")
    lsh_edges = minhash_candidate_pairs(sig=reps, num_perm=num_perm,
                                        num_bands=num_bands, id_col=id_col)
    return exact_edges, lsh_edges


def _tiered_components(sig: ray.data.Dataset, *, id_col: str, num_perm: int,
                       num_bands: int) -> ray.data.Dataset:
    """(id, component) for every doc in a duplicate cluster — the tier-aware
    fast path. Only rep-level LSH edges touch the driver (union-find on a set
    that is ≤ the number of DISTINCT signatures sharing a band — tiny); the
    member->rep mapping stays distributed (one broadcast dict of merged reps).
    """
    import ray as _ray
    exact_edges, lsh_edges = _tiered_candidate_edges(
        sig, id_col=id_col, num_perm=num_perm, num_bands=num_bands)
    lsh_edges = lsh_edges.materialize()
    rep_comp = _components_bounded(lsh_edges)
    if rep_comp is not None:
        rep_ref = _ray.put(rep_comp)

        def member_rows(df: pd.DataFrame) -> pd.DataFrame:
            rc = _ray.get(rep_ref)
            comp = df["id_a"].map(lambda r: rc.get(r, r)) if rc else df["id_a"]
            return pd.DataFrame({id_col: df["id_b"].to_numpy(),
                                 "component": comp.to_numpy()})

        members = exact_edges.map_batches(member_rows, batch_format="pandas")
        rep_rows = ray.data.from_pandas(pd.DataFrame({
            id_col: list(rep_comp), "component": list(rep_comp.values())})) \
            if rep_comp else None
        return members.union(rep_rows) if rep_rows is not None else members

    # overflow fallback: distributed rep components + bucketed member join
    comp_ds = connected_components(lsh_edges, num_buckets=64)
    return _attach_components(
        exact_edges.map_batches(
            lambda df: df.rename(columns={"id_a": "node"}),
            batch_format="pandas"),
        comp_ds, id_col)


def components_from_compact(sig_rows: ray.data.Dataset, *,
                            id_col: str = "page_nid",
                            num_bands: int = 8,
                            rep_edge_limit: int = 2_000_000
                            ) -> ray.data.Dataset:
    """Two-tier components over COMPACT signature rows
    (id, sig_hash, b0..b7) — the fused flagship path (kg/fused.py):
    tier 1 groups by sig_hash (exact collapse, star edges, one shuffle of
    ~80 B/doc); tier 2 explodes the representatives' 8 precomputed band
    hashes and groups by band. Returns (id, component) for duplicate-cluster
    members; union-find runs only on rep-level band edges.
    """
    import ray as _ray

    bcols = [f"b{i}" for i in range(num_bands)]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bkt"] = (df["sig_hash"] % np.uint64(64)).astype("int32")
        return df

    def collapse(group: pd.DataFrame) -> pd.DataFrame:
        edge_a, edge_b, reps = [], [], []
        for _, sub in group.groupby("sig_hash", sort=False):
            ids = np.sort(sub[id_col].unique())
            reps.append(sub.iloc[0:1].assign(**{id_col: ids[0]}))
            if len(ids) > 1:
                edge_a.append(np.full(len(ids) - 1, ids[0]))
                edge_b.append(ids[1:])
        frames = []
        if edge_a:
            e = pd.DataFrame({"id_a": np.concatenate(edge_a),
                              "id_b": np.concatenate(edge_b)})
            e["kind"] = np.int8(0)
            for c in bcols:
                e[c] = np.uint64(0)
            frames.append(e[["kind", "id_a", "id_b"] + bcols])
        if reps:
            r = pd.concat(reps, ignore_index=True)
            rr = pd.DataFrame({"kind": np.int8(1),
                               "id_a": r[id_col].to_numpy(),
                               "id_b": np.int64(0)})
            for c in bcols:
                rr[c] = r[c].to_numpy()
            frames.append(rr)
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"kind": pd.Series(dtype="int8"),
                          "id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64"),
                          **{c: pd.Series(dtype="uint64") for c in bcols}})

    tier1 = sig_rows.map_batches(bucket, batch_format="pandas") \
        .groupby("__bkt").map_groups(collapse, batch_format="pandas")
    tier1 = tier1.materialize()

    # tier 2: explode rep band hashes -> star edges per band bucket
    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        reps = df[df["kind"] == 1]
        if not len(reps):
            return pd.DataFrame({"rid": pd.Series(dtype="int64"),
                                 "band_hash": pd.Series(dtype="uint64"),
                                 "__bkt": pd.Series(dtype="int32")})
        parts = []
        for c in bcols:
            bh = reps[c].to_numpy(dtype=np.uint64)
            parts.append(pd.DataFrame({"rid": reps["id_a"].to_numpy(),
                                       "band_hash": bh}))
        out = pd.concat(parts, ignore_index=True)
        out["__bkt"] = (out["band_hash"] % np.uint64(64)).astype("int32")
        return out

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, sub in group.groupby("band_hash", sort=False):
            ids = np.sort(sub["rid"].unique())
            if len(ids) > 1:
                out_a.append(np.full(len(ids) - 1, ids[0]))
                out_b.append(ids[1:])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    lsh_edges = tier1.map_batches(band_rows, batch_format="pandas") \
        .groupby("__bkt").map_groups(band_pairs, batch_format="pandas")
    # rep-level edges are tiny by construction (distinct signatures sharing a
    # band); collect is BOUNDED — on overflow (adversarial corpora) the
    # distributed min-label propagation takes over, and rep components attach
    # to members via a bucketed join instead of a broadcast dict.
    lsh_edges = lsh_edges.materialize()
    rep_comp = _components_bounded(lsh_edges,
                                   local_edge_limit=rep_edge_limit)
    if rep_comp is not None:
        rep_ref = _ray.put(rep_comp)

        def member_rows(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df["kind"] == 0]
            rc = _ray.get(rep_ref)
            comp = e["id_a"].map(lambda r: rc.get(r, r)) if rc \
                else e["id_a"]
            return pd.DataFrame({id_col: e["id_b"].to_numpy(),
                                 "component": np.asarray(comp,
                                                         dtype=np.int64)})

        members = tier1.map_batches(member_rows, batch_format="pandas")
        if rep_comp:
            rep_rows = ray.data.from_pandas(pd.DataFrame(
                {id_col: list(rep_comp),
                 "component": list(rep_comp.values())}))
            return members.union(rep_rows)
        return members

    comp_ds = connected_components(lsh_edges, num_buckets=64)
    exact = tier1.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["id_a", "id_b"]]
        .rename(columns={"id_a": "node"}), batch_format="pandas")
    return _attach_components(exact, comp_ds, id_col)


def canonical_map(docs: ray.data.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.7,
                  num_perm: int = 64, num_bands: int = 16,
                  concurrency: int | None = None, verify: str = "minhash",
                  local_edge_limit: int = 2_000_000) -> ray.data.Dataset:
    """Full canonicalization: MinHash blocking -> verify -> components.
    Returns (doc_id, component) for every doc in a near-dup cluster; docs not
    listed are their own canonical representative.

    verify="minhash" (default): signature-agreement estimate via fully
    distributed bucketed joins — the scale path (nothing O(corpus) on the
    driver). verify="exact": true n-gram Jaccard — adaptive since round 5
    (small candidate sets broadcast once, bounded; larger sets verify
    through bucketed (pair, shingle-hash) joins, also nothing driver-side).
    verify="none": two-tier blocking only (exact collapse + rep-level LSH).

    Component path is chosen by measured edge count: the verified candidate
    set is ≪ corpus by construction, so when it fits comfortably on the
    driver (< local_edge_limit) a local union-find is strictly faster than
    iterated shuffles; above the limit the distributed min-label propagation
    runs. Both produce identical components (tests assert equality).
    """
    from nexus_forge_ray.ops.dedup import (jaccard_verify_pairs,
                                           minhash_candidate_pairs,
                                           minhash_signatures_ds,
                                           minhash_verify_pairs)
    sig = minhash_signatures_ds(docs, num_perm=num_perm, text_col=text_col,
                                id_col=id_col, concurrency=concurrency)
    if verify == "minhash":
        # signatures are consumed twice (banding + verification): checkpoint
        sig = sig.materialize()
    if verify == "none":
        # Two-tier scale path: (1) exact-signature duplicates collapse via ONE
        # shuffle of (sig_hash, id) — on web corpora the mass of duplicates is
        # exact or near-exact, so this removes them before any band explosion;
        # (2) banded LSH runs only over the distinct signature representatives
        # (b bands × r rows: P(candidate|j) = 1-(1-j^r)^b acts as the
        # threshold). Candidate edges are stars — sufficient connectivity for
        # components, O(cluster) not O(cluster^2).
        return _tiered_components(sig, id_col=id_col, num_perm=num_perm,
                                  num_bands=num_bands)
    pairs = minhash_candidate_pairs(sig=sig, num_perm=num_perm,
                                    num_bands=num_bands, id_col=id_col)
    if verify == "exact":
        verified = jaccard_verify_pairs(pairs, docs, threshold=threshold,
                                        text_col=text_col, id_col=id_col)
    else:  # "minhash": signature-agreement estimate (bucketed joins)
        verified = minhash_verify_pairs(pairs, sig, threshold=threshold,
                                        id_col=id_col)
    # one execution: stream the candidate edges to the driver, sized-checked.
    # limit()+count() probes whether the local union-find path is safe without
    # materializing twice; the edge set is ≪ corpus by construction.
    import pandas as pd
    edge_batches, n_edges, overflow = [], 0, False
    for b in verified.iter_batches(batch_size=65536, batch_format="pandas"):
        edge_batches.append(b)
        n_edges += len(b)
        if n_edges > local_edge_limit:
            overflow = True
            break
    if not overflow:
        if n_edges == 0:
            return ray.data.from_pandas(pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "component": pd.Series(dtype="int64")}))
        edges_df = pd.concat(edge_batches, ignore_index=True)
        comp = union_find_local(edges_df)
        out = pd.DataFrame({id_col: list(comp), "component": list(comp.values())})
        return ray.data.from_pandas(out)
    comp = connected_components(verified.materialize())
    return comp.map_batches(
        lambda df: df.rename(columns={"node": id_col}), batch_format="pandas")
