"""The sweep harness's canonicalizer must accept every column type the
registry can emit — numeric arrays (rounded), string arrays, arrays with
NULLs — and keep numeric rounding stable across engines."""

from __future__ import annotations

import pandas as pd

from oracle_util import _canon


def test_numeric_arrays_round_to_5dp():
    a = pd.DataFrame({"v": [[0.1234567, 2]]})
    b = pd.DataFrame({"v": [[0.1234599, 2.0]]})
    assert _canon(a) == _canon(b)


def test_string_arrays_do_not_crash_and_compare_exactly():
    a = pd.DataFrame({"v": [["x", "y"]], "k": [1]})
    b = pd.DataFrame({"v": [["x", "y"]], "k": [1]})
    c = pd.DataFrame({"v": [["x", "z"]], "k": [1]})
    assert _canon(a) == _canon(b)
    assert _canon(a) != _canon(c)


def test_arrays_with_none_elements():
    a = pd.DataFrame({"v": [[None, 1.0, "s"]]})
    assert _canon(a) == _canon(pd.DataFrame({"v": [[None, 1, "s"]]}))
