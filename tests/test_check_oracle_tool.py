"""The correctness-gate tool itself: typed normalization must make
cross-TYPE collisions impossible (they previously compared equal and
masked real engine divergences as PASS)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.check_oracle import frame_to_rows, normalize


def test_normalize_distinguishes_types():
    # the collisions the untyped version allowed
    assert normalize(None) != normalize("NULL")
    assert normalize(True) != normalize("true")
    assert normalize(5) != normalize("5")
    assert normalize(float("nan")) != normalize("NaN")
    # and the unifications that must survive
    assert normalize(5) == normalize(5)
    assert normalize(1.5) == normalize(1.5)
    assert normalize("x") == normalize("x")
    assert normalize(None) == normalize(None)


def test_frame_to_rows_sorts_columns_and_rows():
    rows = [(2, "b"), (1, "a")]
    norm, cols = frame_to_rows(rows, ["num", "alpha"])
    assert cols == ["alpha", "num"]
    # column reorder applied per row, then row-sorted
    assert norm == sorted(
        [(normalize("b"), normalize(2)), (normalize("a"), normalize(1))]
    )
