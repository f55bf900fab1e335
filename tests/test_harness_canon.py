"""Unit tests for the oracle harness's canonicalization — the compare
logic itself must be trustworthy."""

from __future__ import annotations

from datetime import datetime

from tests.oracle_harness import _canon_rows, _canon_value, _values_match


def test_float_canonicalization_stabilizes_sort():
    # sub-tolerance noise must not reorder rows
    a = [(1.00000000001, "x"), (2.0, "y")]
    b = [(1.00000000002, "x"), (2.0, "y")]
    cols = ["v", "s"]
    _, ra = _canon_rows(cols, a)
    _, rb = _canon_rows(cols, b)
    assert all(_values_match(x, y) for row_a, row_b in zip(ra, rb)
               for x, y in zip(row_a, row_b))


def test_column_name_sorting():
    cols, rows = _canon_rows(["b", "a"], [(1, 2), (3, 4)])
    assert cols == ["a", "b"]
    # values reordered to follow sorted columns
    assert rows[0] == (("i", 2), ("i", 1))


def test_int_float_cross_typing_tolerated():
    assert _values_match(_canon_value(5), _canon_value(5.0))
    assert not _values_match(_canon_value(5), _canon_value(5.1))


def test_nan_and_null_handling():
    assert _canon_value(float("nan")) == ("f", "nan")
    assert _canon_value(None) == ("null",)
    assert _values_match(_canon_value(float("nan")), _canon_value(float("nan")))
    assert not _values_match(_canon_value(None), _canon_value(0))


def test_datetime_normalization():
    a = _canon_value(datetime(2024, 1, 1, 12, 0, 0))
    b = _canon_value(datetime(2024, 1, 1, 12, 0, 0))
    assert _values_match(a, b)
