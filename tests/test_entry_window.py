"""Driver-window accounting must be MECHANICAL (VERDICT r4 item 6).

The driver's correctness gate checks the first 50 ``queries()``
entries per round. These tests pin the contract that no declared
entry can be silently left out of verification: every entry that has
never appeared in a committed CORRECTNESS_r*.json leads the window,
derived from the files themselves — never a hand-maintained list.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", ROOT / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
sys.modules.setdefault("__spark_entry__", entry_mod)
spec.loader.exec_module(entry_mod)

WINDOW = 50


def test_never_checked_entries_lead_the_window():
    q = entry_mod.queries()
    checked = entry_mod.driver_checked()
    never = [n for n in q if n not in checked]
    head = list(q)[:WINDOW]
    missing = [n for n in never if n not in head]
    assert not missing, (
        f"{len(never)} never-driver-checked entries but these fall "
        f"outside the {WINDOW}-slot window head: {missing}"
    )


def test_recheck_names_are_declared_entries():
    q = entry_mod.queries()
    unknown = [n for n in entry_mod._RECHECK if n not in q]
    assert not unknown, f"_RECHECK names not in queries(): {unknown}"


def test_queries_and_oracle_share_order():
    assert list(entry_mod.queries()) == list(entry_mod.oracle_sql())


def test_window_head_is_full_when_inventory_allows():
    q = entry_mod.queries()
    assert len(q) >= WINDOW
    # the head must contain 50 distinct real entries (dict dedupes,
    # but guard against name drift emptying the priority section)
    assert len(list(q)[:WINDOW]) == WINDOW


def test_correctness_files_only_name_declared_entries():
    """A renamed/deleted entry must not strand its history: every name
    the driver ever checked should still exist in the inventory (rename
    = the old name's green row no longer covers anything)."""
    q = entry_mod.queries()
    stranded = [n for n in entry_mod.driver_checked() if n not in q]
    assert not stranded, (
        f"driver-checked names no longer declared: {stranded} — "
        "renamed entries restart their verification history"
    )
