"""Driver-contract consistency: every oracle key has a query, entry() runs."""

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__
    return importlib.reload(__ray_entry__)


def test_every_oracle_key_has_a_query():
    e = _entry_module()
    qs, oracles = e.queries(), e.oracle_sql()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracles without queries: {missing}"


def test_queries_are_callable_and_named():
    e = _entry_module()
    qs = e.queries()
    assert len(qs) >= 25
    assert all(callable(fn) for fn in qs.values())


def test_entry_returns_rows(sf_dir):
    e = _entry_module()
    res = e.entry()
    import ray.data
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n > 0


def test_bulk_register_dataset(sf_dir, tmp_path):
    """Scale sink: dedup-by-id + version stamping + partitioned write."""
    import pandas as pd
    import ray.data

    from nexus_forge_ray.store.parquet_store import ParquetStore
    rows = pd.DataFrame({
        "id": ["a", "b", "a", "c"],         # duplicate id 'a'
        "payload": ["1", "2", "3", "4"],
    })
    out = str(tmp_path / "bulk")
    ParquetStore.register_dataset(ray.data.from_pandas(rows), out)
    got = pd.read_parquet(out).sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == ["a", "b", "c"]     # deduped
    assert (got["version"] == 1).all()
    assert (~got["deprecated"]).all()


def test_bulk_register_mints_ids(tmp_path):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.store.parquet_store import ParquetStore
    rows = pd.DataFrame({"payload": ["x", "y"]})
    out = str(tmp_path / "mint")
    ParquetStore.register_dataset(ray.data.from_pandas(rows), out)
    got = pd.read_parquet(out)
    assert got["id"].str.startswith("urn:hash:").all()
    assert got["id"].nunique() == 2
