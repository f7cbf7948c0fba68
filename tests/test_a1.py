"""Property tests for A1 math — explicitly covering the reference's broken
multi-letter cases (reference export.py:22-24 maps AA→26, AB→51; true A1 is
AA→27, AB→28 — SURVEY.md §2.A row 4)."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from flusher_spark.functions import (
    col_letters,
    col_number,
    num_columns_from_range,
    parse_a1_range,
)


@pytest.mark.parametrize(
    "letters,expected",
    [("A", 1), ("Z", 26), ("AA", 27), ("AB", 28), ("AZ", 52), ("BA", 53), ("ZZ", 702), ("AAA", 703)],
)
def test_col_number_true_base26(letters, expected):
    assert col_number(letters) == expected


def test_reference_bug_not_replicated():
    # The reference computes AA→26 and AB→51; we must not.
    assert col_number("AA") != 26 and col_number("AB") != 51


@given(st.integers(min_value=1, max_value=100_000))
def test_roundtrip(n):
    assert col_number(col_letters(n)) == n


@given(st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ", min_size=1, max_size=4))
def test_roundtrip_letters(s):
    assert col_letters(col_number(s)) == s


def test_lowercase_normalized():
    assert col_number("ab") == 28  # reference only_rangeletters uppercases (export.py:18-19)


@pytest.mark.parametrize(
    "rng,cols,rows",
    [
        ("A2:F100", 6, (2, 100)),
        ("A2:F", 6, (2, None)),  # open-ended completion case, reference export.py:47-48
        ("A:F", 6, (None, None)),
        ("B7", 1, (7, 7)),
        ("AA1:AB9", 2, (1, 9)),
    ],
)
def test_parse_ranges(rng, cols, rows):
    r = parse_a1_range(rng)
    assert r.num_columns == cols
    assert (r.row_start, r.row_end) == rows
    assert num_columns_from_range(rng) == cols


@pytest.mark.parametrize("bad", ["", ":", "1A", "F:A", "A9:A1", "A1:B2:C3", "B0", "A0:F10"])
def test_invalid_ranges(bad):
    with pytest.raises(ValueError):
        parse_a1_range(bad)


def test_col_number_rejects_non_ascii_letters():
    """str.isalpha() accepts 'É' — that must be a ValueError, not column 137."""
    for bad in ("É", "ÀB", "A1", ""):
        with pytest.raises(ValueError):
            col_number(bad)
