"""Whitespace-tokenization parity: pandas `str.split()` (the fused pass's
tokenizer, kg/fused.py) vs Arrow `pc.utf8_split_whitespace`.

VERDICT r4 asked for this proof before any switch of the fused pass to
Arrow-side tokenization. Result (recorded in BASELINE.md): parity HOLDS —
Arrow's splitter agrees with Python `str.split()` on every whitespace
class once leading/trailing empty tokens are stripped — but the switch is
a measured NO-GO: the Arrow kernel alone is ~2.4x faster, yet the fused
pass must hand every token to SipHash as a Python string, and
`to_pylist()` makes the end-to-end Arrow path ~5x slower than
`str.split()`. These tests pin the semantic half so the option stays
open if hashing ever moves onto Arrow buffers."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

# every char class Python str.split() treats as whitespace, plus lookalikes
WS = " \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0    　"


def _arrow_tokens(texts: list[str]) -> list[list[str]]:
    a = pc.utf8_split_whitespace(pa.array(texts, type=pa.large_string()))
    # Arrow keeps leading/trailing empty tokens; Python str.split() strips
    return [[t for t in lst if t != ""] for lst in a.to_pylist()]


def test_whitespace_class_parity():
    cases = ["a b c", " a  b ", "", " ", "word", "  ",
             "a\tb\nc", "a\x0b\x0cb", "a\rb", "a\x1cb", "a\x1db",
             "a\x1eb", "a\x1fb", "a\x85b", "a\xa0b",
             " x ", "a b", "a b", "a　b",
             "\t\n mixed \xa0 runs    here \r\n"]
    assert pd.Series(cases).str.split().tolist() == _arrow_tokens(cases)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet=WS + "abcXYZ09.,€漢", max_size=40),
                max_size=20))
def test_whitespace_parity_property(texts):
    assert pd.Series(texts, dtype=object).str.split().tolist() \
        == _arrow_tokens(texts)
