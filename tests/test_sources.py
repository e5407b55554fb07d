"""JSONL/CSV source readers: round-trip vs the parquet source of truth."""

import pandas as pd
import ray.data

from nexus_forge_ray.sources.records import from_records, read_csv, read_jsonl


def test_jsonl_roundtrip(ray_session, sf_dir, tmp_path):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "jsonl")
    docs.write_json(out)
    back = read_jsonl(out, columns=["doc_id", "lang", "n_chars"]).to_pandas()
    want = docs.to_pandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        back.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True))


def test_csv_roundtrip(ray_session, sf_dir, tmp_path):
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name", "c_acctbal"])
    out = str(tmp_path / "csv")
    cust.write_csv(out)
    back = read_csv(out, columns=["c_custkey", "c_name", "c_acctbal"]).to_pandas()
    want = cust.to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values("c_custkey").reset_index(drop=True),
        want.sort_values("c_custkey").reset_index(drop=True))


def test_from_records(ray_session):
    ds = from_records([{"id": "a", "v": 1}, {"id": "b", "v": 2}])
    assert sorted(ds.to_pandas()["id"]) == ["a", "b"]
