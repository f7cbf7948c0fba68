"""A1-notation range parsing (spreadsheet cell addressing).

The reference converts column letters with a broken base-25, reversed-digit
formula (`(ord(c) - 64) * (25 ** i)` over the string left-to-right —
reference export.py:22-24), which is only correct for single-letter columns:
it maps ``AA``→26 and ``AB``→51 where true A1 gives 27 and 28. This module
implements real bijective base-26 (the documented divergence; SURVEY.md §2.A
row 4) and round-trips letters↔index, property-tested in tests/test_a1.py.

A1 semantics supported (superset of reference export.py:18-32,46-51):
  - ``A1:F100``  bounded rectangle
  - ``A2:F``     open-ended rows (reference's "completion" case, export.py:47-48)
  - ``A:F``      whole columns
  - ``B7``       single cell
All are 1-based and inclusive, like spreadsheets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_CELL_RE = re.compile(r"^([A-Za-z]+)([0-9]*)$")


_LETTERS_RE = re.compile(r"^[A-Za-z]+$")


def col_number(letters: str) -> int:
    """Column letters → 1-based index: A→1 … Z→26, AA→27, AB→28 (bijective
    base-26). ASCII A-Z only — str.isalpha() would accept 'É' and return a
    garbage index instead of raising."""
    if not letters or not _LETTERS_RE.match(letters):
        raise ValueError(f"invalid column letters: {letters!r}")
    n = 0
    for ch in letters.upper():
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def col_letters(number: int) -> str:
    """1-based column index → letters (inverse of col_number)."""
    if number < 1:
        raise ValueError(f"invalid column number: {number}")
    out = []
    while number > 0:
        number, rem = divmod(number - 1, 26)
        out.append(chr(ord("A") + rem))
    return "".join(reversed(out))


@dataclass(frozen=True)
class A1Range:
    """Parsed inclusive 1-based rectangle; None row bounds mean open-ended."""

    col_start: int
    col_end: int
    row_start: int | None
    row_end: int | None

    @property
    def num_columns(self) -> int:
        return self.col_end - self.col_start + 1


def _parse_corner(token: str) -> tuple[int, int | None]:
    m = _CELL_RE.match(token.strip())
    if not m:
        raise ValueError(f"invalid A1 cell/column: {token!r}")
    letters, digits = m.groups()
    if digits and int(digits) < 1:
        # A1 rows are 1-based: "B0" is not an address any spreadsheet
        # accepts, and passing it through yields silently shifted slices.
        raise ValueError(f"invalid A1 row (rows are 1-based): {token!r}")
    return col_number(letters), (int(digits) if digits else None)


def parse_a1_range(cellrange: str) -> A1Range:
    """Parse ``A2:F100`` / ``A2:F`` / ``A:F`` / ``B7`` into an A1Range."""
    token = cellrange.strip()
    if not token:
        raise ValueError("empty A1 range")
    parts = token.split(":")
    if len(parts) == 1:
        col, row = _parse_corner(parts[0])
        return A1Range(col, col, row, row)
    if len(parts) != 2:
        raise ValueError(f"invalid A1 range: {cellrange!r}")
    (c1, r1), (c2, r2) = _parse_corner(parts[0]), _parse_corner(parts[1])
    if c2 < c1 or (r1 is not None and r2 is not None and r2 < r1):
        raise ValueError(f"inverted A1 range: {cellrange!r}")
    return A1Range(c1, c2, r1, r2)


def num_columns_from_range(cellrange: str) -> int:
    """Width in columns of an A1 range (reference numcolumns_from_range, export.py:27-28)."""
    return parse_a1_range(cellrange).num_columns
