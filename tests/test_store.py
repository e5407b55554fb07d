"""Store versioning invariants vs demo_store.feature / demo_store.py:225-337
(FIXTURES.md F5 table)."""

import pytest

from nexus_forge_ray.store import (DeprecationError, ParquetStore,
                                   RegistrationError, RetrievalError,
                                   TaggingError, UpdatingError)


@pytest.fixture()
def store(tmp_path):
    return ParquetStore(str(tmp_path / "store"))


def test_register_new_gets_version_1(store):
    rec = store.register({"id": "r1", "p": "v"})
    assert rec["metadata"] == {"version": 1, "deprecated": False}


def test_register_existing_id_raises(store):
    store.register({"id": "r1"})
    with pytest.raises(RegistrationError):
        store.register({"id": "r1"})


def test_register_without_id_mints_deterministic(store):
    r1 = store.register({"p": "v"})
    assert r1["data"]["id"].startswith("urn:hash:")
    s2 = ParquetStore(store.base + "2")
    r2 = s2.register({"p": "v"})
    assert r1["data"]["id"] == r2["data"]["id"]  # content-derived, resumable


def test_update_bumps_version_and_archives(store):
    store.register({"id": "r1", "p": "v1"})
    rec = store.update({"id": "r1", "p": "v2"})
    assert rec["metadata"]["version"] == 2
    old = store.retrieve("r1", version=1)
    assert old["data"]["p"] == "v1"
    cur = store.retrieve("r1")
    assert cur["data"]["p"] == "v2" and cur["metadata"]["version"] == 2


def test_update_missing_raises(store):
    with pytest.raises(UpdatingError):
        store.update({"id": "nope", "p": "v"})


def test_deprecate_and_double_deprecate(store):
    store.register({"id": "r1", "p": "v"})
    rec = store.deprecate("r1")
    assert rec["metadata"] == {"version": 2, "deprecated": True}
    with pytest.raises(DeprecationError):
        store.deprecate("r1")
    with pytest.raises(UpdatingError):
        store.update({"id": "r1", "p": "v2"})


def test_tag_and_retrieve_by_tag(store):
    store.register({"id": "r1", "p": "v1"})
    store.tag("r1", 1, "release")
    store.update({"id": "r1", "p": "v2"})
    got = store.retrieve("r1", version="release")
    assert got["data"]["p"] == "v1" and got["metadata"]["version"] == 1


def test_duplicate_tag_raises(store):
    store.register({"id": "r1"})
    store.tag("r1", 1, "t")
    with pytest.raises(TaggingError):
        store.tag("r1", 1, "t")


def test_tag_missing_record_raises(store):
    with pytest.raises(TaggingError):
        store.tag("ghost", 1, "t")


def test_retrieve_missing_raises(store):
    with pytest.raises(RetrievalError):
        store.retrieve("ghost")
    store.register({"id": "r1"})
    with pytest.raises(RetrievalError):
        store.retrieve("r1", version=9)


def test_freeze_rewrites_nested_ids(store):
    store.register({"id": "r1", "p": "v"})
    store.register({"id": "r2", "q": "w"})
    store.update({"id": "r2", "q": "w2"})
    frozen = store.freeze({"id": "r1", "child": {"id": "r2"},
                           "others": [{"id": "r1"}]})
    assert frozen["id"] == "r1?_version=1"
    assert frozen["child"]["id"] == "r2?_version=2"
    assert frozen["others"][0]["id"] == "r1?_version=1"


def test_persistence_across_instances(store):
    store.register({"id": "r1", "p": "v"})
    store.update({"id": "r1", "p": "v2"})
    store.tag("r1", 2, "cur")
    reopened = ParquetStore(store.base)
    assert reopened.retrieve("r1", version="cur")["data"]["p"] == "v2"
    assert reopened.retrieve("r1", version=1)["data"]["p"] == "v"
