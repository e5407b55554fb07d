"""Actions/LazyAction + misc scalar utils (context merge, uri rewrite, as_term)."""

import pandas as pd
import ray.data

from nexus_forge_ray.core.actions import LazyAction, resolve_lazy, with_actions
from nexus_forge_ray.core.conversions import as_term, merge_contexts, rewrite_uri


def test_lazy_action_deferred_and_resolved():
    calls = []

    def upload(path):
        calls.append(path)
        return f"http://store/{path}"

    rec = {"id": "r1",
           "distribution": {"contentUrl": LazyAction(upload, "file.txt")}}
    assert calls == []  # deferred
    resolved = resolve_lazy(rec)
    assert calls == ["file.txt"]
    assert resolved["distribution"]["contentUrl"] == "http://store/file.txt"


def test_with_actions_captures_failures_not_job_abort():
    ds = ray.data.from_pandas(pd.DataFrame({"v": [1, 0, 3]}))

    def op(rec):
        if rec["v"] == 0:
            raise ValueError("zero not allowed")
        return {"doubled": rec["v"] * 2}

    out = with_actions(ds, op, "double").to_pandas()
    assert out["succeeded"].tolist() == [True, False, True]
    assert out.loc[1, "error"].startswith("ValueError")
    assert (out["operation"] == "double").all()
    # actions summary over the outcome columns
    from nexus_forge_ray.state.lineage import actions_summary
    summary = actions_summary(
        ray.data.from_pandas(out[["operation", "succeeded", "error"]])
    ).to_pandas()
    assert summary["count()"].sum() == 3


def test_merge_contexts_union_later_wins():
    a = {"name": "http://a/name", "x": "http://a/x"}
    b = {"name": "http://b/name"}
    merged = merge_contexts(a, b, None)
    assert merged["name"] == "http://b/name"
    assert merged["x"] == "http://a/x"
    assert merge_contexts("http://vocab/", a)["@vocab"] == "http://vocab/"
    assert merge_contexts([a, b])["name"] == "http://b/name"


def test_rewrite_uri():
    assert rewrite_uri("http://old/base/x/1", "http://old/base", "https://new") \
        == "https://new/x/1"
    assert rewrite_uri("http://other/x", "http://old/base", "https://new") \
        == "http://other/x"


def test_as_term():
    assert as_term("http://www.w3.org/1999/02/22-rdf-syntax-ns#type") == "type"
    assert as_term("http://example.org/entity/spark") == "spark"
    assert as_term("http://example.org/entity/spark/") == "spark"
