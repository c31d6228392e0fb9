"""Unit tests for the pure compare functions in tools/check_queries.py.

The sweep harness is load-bearing (every never-driver-verified query's
green comes from it), so its normalization/canonicalization semantics are
pinned here: value normalization across engine type differences, the
column-name alignment the driver's compare relies on, and the
bit-exactness audit used by --exact.
"""

from __future__ import annotations

import sys
from datetime import date, datetime, timezone
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.check_queries import (  # noqa: E402
    canon, canon_raw, compare_job, norm_val, ulp_report,
)


def test_norm_val_engine_type_bridging():
    # Decimal (DuckDB DECIMAL) and float (Spark double) meet as floats
    assert norm_val(Decimal("1.5")) == norm_val(1.5)
    # floats compare under round(9); NaN is a comparable token
    assert norm_val(0.1234567894) == norm_val(0.1234567891)
    assert norm_val(float("nan")) == "NaN"
    # datetimes: tz-aware and naive meet as naive isoformat (which is
    # exactly why the DECLARED-type guard in main() is needed — value
    # compare alone cannot see tz-awareness)
    aware = datetime(2024, 6, 1, 12, 0, tzinfo=timezone.utc)
    naive = datetime(2024, 6, 1, 12, 0)
    assert norm_val(aware) == norm_val(naive)
    assert norm_val(date(2024, 6, 1)) == "2024-06-01"
    # arrays normalize element-wise into hashable tuples
    assert norm_val([1.0, None, float("nan")]) == (1.0, None, "NaN")
    assert norm_val(None) is None


def test_canon_aligns_columns_by_name():
    # Spark and the oracle may project the same columns in different
    # order; canon sorts columns by NAME before row comparison, matching
    # the driver's sort-columns-then-hash compare.
    srows = [(1, "a"), (2, "b")]
    drows = [("b", 2), ("a", 1)]
    assert canon(srows, ["n", "s"]) == canon(drows, ["s", "n"])


def test_canon_handles_null_vs_value_sorting():
    # rows containing NULLs must sort deterministically against rows with
    # values (None < anything in the sort key), not raise
    rows = [(None, 1), (0, None), (2, 2)]
    out = canon(rows, ["a", "b"])
    assert len(out) == 3


def test_compare_job_flags_value_divergence():
    problems, _ = compare_job([(1,)], ["a"], [(2,)], ["a"], exact=False)
    assert problems and "values differ" in problems[0]
    problems, _ = compare_job([(1,)], ["a"], [(1,)], ["a"], exact=False)
    assert not problems


def test_compare_job_bit_exactness_note():
    # equal under round(9) but different in the last ulp -> OK with a
    # NOT bit-exact note; identical floats -> bit-exact note
    a, b = 0.1 + 0.2, 0.3
    assert a != b  # classic IEEE ulp gap
    problems, note = compare_job([(a,)], ["x"], [(b,)], ["x"], exact=True)
    assert not problems and "NOT bit-exact" in note
    problems, note = compare_job([(a,)], ["x"], [(a,)], ["x"], exact=True)
    assert not problems and note.startswith("  [bit-exact")


def test_ulp_report_counts_float_cells():
    sc = canon_raw([(1.0, "s"), (2.0, "t")], ["x", "y"])
    dc = canon_raw([(1.0, "s"), (2.0 + 1e-15, "t")], ["x", "y"])
    n_cells, n_diff, max_d, ex = ulp_report(sc, dc)
    assert n_cells == 2 and n_diff == 1
    assert ex is not None and max_d > 0
