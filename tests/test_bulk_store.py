"""Bulk update/deprecate/tag semantics vs the interactive CRUD rules
(reference _update_many/_deprecate_many/_tag_many, bluebrain_nexus.py:126-164;
per-record outcomes, not batch aborts)."""

import pandas as pd
import ray.data

from nexus_forge_ray.store.bulk import bulk_deprecate, bulk_tag, bulk_update


def _store():
    return ray.data.from_pandas(pd.DataFrame({
        "id": ["a", "b", "c", "d"],
        "name": ["A", "B", "C", "D"],
        "version": [1, 2, 1, 1],
        "deprecated": [False, False, True, False],
    }))


def test_bulk_update_rules():
    updates = ray.data.from_pandas(pd.DataFrame({
        "id": ["a", "c", "zz"], "name": ["A2", "C2", "Z"]}))
    rec, arch, act = bulk_update(_store(), updates)
    r = rec.to_pandas().set_index("id").sort_index()
    # a updated (v2), b untouched, c deprecated -> unchanged, d untouched
    assert r.loc["a", "name"] == "A2" and r.loc["a", "version"] == 2
    assert r.loc["b", "version"] == 2 and r.loc["b", "name"] == "B"
    assert r.loc["c", "name"] == "C" and r.loc["c", "version"] == 1
    assert len(r) == 4  # zz not inserted
    a = arch.to_pandas()
    assert a["id"].tolist() == ["a"] and a["version"].tolist() == [1]
    ac = act.to_pandas().set_index("id")
    assert bool(ac.loc["a", "succeeded"]) and ac.loc["a", "error"] == ""
    assert not bool(ac.loc["c", "succeeded"])
    assert ac.loc["c", "error"] == "RecordDeprecated"
    assert ac.loc["zz", "error"] == "RecordMissing"


def test_bulk_deprecate_rules():
    ids = ray.data.from_pandas(pd.DataFrame({"id": ["b", "c", "nope"]}))
    rec, arch, act = bulk_deprecate(_store(), ids)
    r = rec.to_pandas().set_index("id").sort_index()
    assert bool(r.loc["b", "deprecated"]) and r.loc["b", "version"] == 3
    assert r.loc["c", "version"] == 1  # already deprecated: unchanged
    assert not bool(r.loc["a", "deprecated"])
    ac = act.to_pandas().set_index("id")
    assert bool(ac.loc["b", "succeeded"])
    assert ac.loc["c", "error"] == "RecordDeprecated"
    assert ac.loc["nope", "error"] == "RecordMissing"
    assert arch.to_pandas()["id"].tolist() == ["b"]


def test_bulk_tag_rules():
    tags = ray.data.from_pandas(pd.DataFrame({
        "id": ["a", "a", "b", "nope"], "tag": ["v1", "v1", "rel", "x"]}))
    existing = ray.data.from_pandas(pd.DataFrame({
        "id": ["b"], "tag": ["old"], "version": [1]}))
    tags_out, act = bulk_tag(_store(), tags, existing)
    t = tags_out.to_pandas()
    got = set(zip(t["id"], t["tag"], t["version"]))
    assert got == {("a", "v1", 1), ("b", "rel", 2)}
    ac = act.to_pandas()
    # duplicate (a, v1) within the batch -> second one fails
    assert (ac[(ac["id"] == "a")]["succeeded"]).sum() == 1
    assert "TagExists" in ac[(ac["id"] == "a")
                             & ~ac["succeeded"]]["error"].iloc[0]
    assert ac[ac["id"] == "nope"]["error"].iloc[0] == "RecordMissing"


def test_bulk_tag_duplicate_against_existing():
    tags = ray.data.from_pandas(pd.DataFrame({"id": ["b"], "tag": ["old"]}))
    existing = ray.data.from_pandas(pd.DataFrame({
        "id": ["b"], "tag": ["old"], "version": [1]}))
    tags_out, act = bulk_tag(_store(), tags, existing)
    assert len(tags_out.to_pandas()) == 0
    assert not bool(act.to_pandas()["succeeded"].iloc[0])


def test_write_snapshot_roundtrip(tmp_path):
    from nexus_forge_ray.store.bulk import bulk_update, write_snapshot
    updates = ray.data.from_pandas(pd.DataFrame({"id": ["a"], "name": ["A2"]}))
    rec, arch, act = bulk_update(_store(), updates)
    out = write_snapshot(rec, arch, str(tmp_path / "snap"))
    back = pd.read_parquet(f"{out}/records").set_index("id")
    assert back.loc["a", "name"] == "A2" and back.loc["a", "version"] == 2
    assert pd.read_parquet(f"{out}/archives")["id"].tolist() == ["a"]
