"""Guard for the central slow-test list (tests/conftest.py, r14): a
renamed or deleted test must not leave a silent orphan in SLOW_TESTS —
an orphan would mean a >10 s test quietly rejoined the driver's
default run (the r13 truncation class)."""

from __future__ import annotations

from pathlib import Path

from tests.conftest import SLOW_TESTS


def test_slow_list_names_exist():
    src = "".join(
        p.read_text() for p in Path(__file__).parent.glob("test_*.py")
    )
    missing = sorted(n for n in SLOW_TESTS if f"def {n}(" not in src)
    assert not missing, f"SLOW_TESTS entries with no matching test: {missing}"
