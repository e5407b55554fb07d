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


def test_ntriples_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.sources.ntriples import (read_ntriples,
                                                  write_ntriples)
    tri = pd.DataFrame({
        "subj": ["http://ex/d1", "http://ex/d1", "http://ex/d2"],
        "pred": ["http://v/name", "http://v/age", "http://v/knows"],
        "obj": ['Ada "the first"\nprogrammer\t!', "36", "http://ex/d1"],
        "obj_is_iri": [False, False, True],
        "obj_datatype": [None, "http://www.w3.org/2001/XMLSchema#integer",
                         None],
    })
    out = str(tmp_path / "nt")
    write_ntriples(ray.data.from_pandas(tri), out)
    back = read_ntriples(out).to_pandas()
    key = ["subj", "pred", "obj"]
    got = back.sort_values(key).reset_index(drop=True)
    want = tri.sort_values(key).reset_index(drop=True)
    for c in ("subj", "pred", "obj"):
        assert got[c].tolist() == want[c].tolist()
    assert got["obj_is_iri"].tolist() == want["obj_is_iri"].tolist()
    assert [d or None for d in got["obj_datatype"]] == \
        [d or None for d in want["obj_datatype"]]


def test_ntriples_parses_standard_lines(ray_session):
    import pandas as pd

    from nexus_forge_ray.sources.ntriples import parse_lines
    lines = pd.DataFrame({"line": [
        '<http://ex/s> <http://ex/p> "lit with \\"esc\\"" .',
        '<http://ex/s> <http://ex/p> <http://ex/o> .',
        '_:b0 <http://ex/p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '# a comment',
        '',
        'garbage line that is not a triple',
    ]})
    out = parse_lines(lines)
    assert len(out) == 3
    assert out.loc[0, "obj"] == 'lit with "esc"'
    assert out.loc[1, "obj_is_iri"]
    assert out.loc[2, "subj"] == "_:b0"
    assert out.loc[2, "obj_datatype"].endswith("integer")


def test_ntriples_export_of_exploded_records(ray_session, tmp_path):
    import ray.data

    from nexus_forge_ray.kg.triples import explode_dataset
    from nexus_forge_ray.sources.ntriples import (read_ntriples,
                                                  write_ntriples)
    recs = ray.data.from_items([
        {"id": "http://ex/r1", "type": "Doc", "n": 5, "label": "a,b\tc"},
        {"id": "http://ex/r2", "type": "Doc", "ok": True},
    ])
    tri = explode_dataset(recs)
    out = str(tmp_path / "nt2")
    write_ntriples(tri, out)
    back = read_ntriples(out).to_pandas()
    orig = tri.to_pandas()
    assert len(back) == len(orig)
    k = ["subj", "pred", "obj"]
    assert sorted(map(tuple, back[k].to_numpy())) == \
        sorted(map(tuple, orig[k].to_numpy()))


def test_ntriples_literal_containing_datatype_marker(ray_session):
    """A literal containing '^^<' must not be split as a datatype."""
    import pandas as pd

    from nexus_forge_ray.sources.ntriples import parse_lines, serialize_batch
    df = pd.DataFrame({
        "subj": ["http://ex/s"], "pred": ["http://v/p"],
        "obj": ["x^^<y>"], "obj_is_iri": [False], "obj_datatype": [None]})
    back = parse_lines(serialize_batch(df))
    assert back["obj"].tolist() == ["x^^<y>"]
    assert back["obj_datatype"].tolist() == [None]
