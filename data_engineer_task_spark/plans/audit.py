"""Plan-introspection helpers for the scale gates.

``unpartitioned_specs`` finds window specs with NO partition columns in
an analyzed logical plan string — the `WindowExec: No Partition
Defined` class that moves all data to a single task. The plan gate in
``tests/test_plans_physical.py`` keeps an explicit allowlist of
domain-bounded frames; everything else is a scale regression.
"""

from __future__ import annotations


def split_top_level(s: str) -> list[str]:
    """Split on commas at paren/bracket depth 0."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def unpartitioned_specs(plan: str) -> list[str]:
    """All ``windowspecdefinition(...)`` bodies whose first top-level
    argument is an ORDER expression — i.e. the spec declares no
    partition columns. Spark prints partition columns first, then
    ordering expressions (``expr ASC|DESC NULLS ...``), then the
    frame; a spec that LEADS with an ordered expression is
    unpartitioned.

    DELIBERATE exclusion: unpartitioned windows with NO ORDER BY
    either (``sum(x) OVER ()`` scalar totals) don't match — those are
    the house piggyback pattern for attaching a grand total to an
    already-aggregated tiny frame (VERDICT r4 accepted them as
    "scalar-total frames"), and flagging them would bury the real
    signal (rank/cumsum over an unbounded frame) under hundreds of
    benign hits. A scalar total over a NON-aggregated frame would
    still be caught by the cartesian/scan plan tests' cost profile,
    and reviewers grep `WindowExec` warnings in bench stderr for the
    full census."""
    hits: list[str] = []
    needle = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        k = j + len(needle)
        depth = 1
        while depth and k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        body = plan[j + len(needle) : k - 1]
        args = split_top_level(body)
        first = args[0] if args else ""
        if " ASC NULLS" in first or " DESC NULLS" in first:
            hits.append(body[:160])
        i = k
    return hits


def scalar_total_specs(plan: str) -> list[str]:
    """The complementary census: ``windowspecdefinition`` bodies with
    NEITHER partition columns NOR ordering — the ``sum(x) OVER ()``
    scalar-total piggybacks that ``unpartitioned_specs`` deliberately
    excludes. Useful for auditing that each rides a tiny aggregated
    frame (run via ``tools/window_audit.py --scalars``)."""
    hits: list[str] = []
    needle = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(needle, i)
        if j < 0:
            break
        k = j + len(needle)
        depth = 1
        while depth and k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        body = plan[j + len(needle) : k - 1]
        args = split_top_level(body)
        if args and args[0].startswith("specifiedwindowframe"):
            hits.append(body[:160])
        i = k
    return hits


def analyzed_plan(df) -> str:
    """The analyzed logical plan as a string (no execution)."""
    return df._jdf.queryExecution().analyzed().toString()
