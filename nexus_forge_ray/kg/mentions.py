"""Mention detection — the NER-ish stage of the flagship pipeline.

Two tiers:
- `detect_mentions`: vectorized token-match against a label set (split +
  explode + isin — pure pandas C paths). One output row per (doc, mention)
  with a count. The per-batch partial groupby keeps the downstream shuffle
  tiny (combiner pattern).
- `MentionDetector`: actor-pool stage with a compiled alternation regex for
  multi-word labels (the general case; setup once per actor).
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data


def detect_mentions_batch(batch: pd.DataFrame, labels: frozenset,
                          id_col: str, text_col: str) -> pd.DataFrame:
    s = batch[[id_col, text_col]].copy()
    s["token"] = s[text_col].str.split(" ")
    ex = s[[id_col, "token"]].explode("token")
    hits = ex[ex["token"].isin(labels)]
    out = hits.groupby([id_col, "token"], as_index=False).size()
    out.columns = [id_col, "mention", "n_mentions"]
    return out


def detect_mentions(ds: ray.data.Dataset, labels, *, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """(id, text) -> (id, mention, n_mentions); exact per-(doc,mention) counts.

    Batches are partial counts already aggregated per doc within the batch; a
    doc never spans batches after read (row granularity), so no global groupby
    is needed — the per-batch result is final.
    """
    lbl = frozenset(labels)
    return ds.map_batches(
        lambda df: detect_mentions_batch(df, lbl, id_col, text_col),
        batch_format="pandas",
    )


class MentionDetector:
    """Actor-pool detector for arbitrary (multi-word) labels.

    The alternation regex is compiled ONCE per actor (longest label first so
    overlapping labels match greedily); per batch: str.findall (C regex) +
    explode + count.
    """

    def __init__(self, labels: list[str], id_col: str = "doc_id",
                 text_col: str = "text"):
        ordered = sorted(labels, key=len, reverse=True)
        self.rx = re.compile(
            r"\b(" + "|".join(re.escape(l) for l in ordered) + r")\b")
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        found = batch[self.text_col].str.findall(self.rx)
        ex = pd.DataFrame({self.id_col: batch[self.id_col],
                           "mention": found}).explode("mention")
        ex = ex.dropna(subset=["mention"])
        out = ex.groupby([self.id_col, "mention"], as_index=False).size()
        out.columns = [self.id_col, "mention", "n_mentions"]
        return out


def detect_mentions_regex(ds: ray.data.Dataset, labels, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency is None:
        return ds.map_batches(
            MentionDetector(list(labels), id_col=id_col, text_col=text_col),
            batch_format="pandas")
    return ds.map_batches(
        MentionDetector,
        fn_constructor_kwargs=dict(labels=list(labels), id_col=id_col,
                                   text_col=text_col),
        batch_format="pandas", concurrency=concurrency,
    )
