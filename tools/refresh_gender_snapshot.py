"""Derive a nam_dict-exact name→gender table from gender_guesser.

The engine's gender enrichment (functions/gender.py) reads ONLY the
checked-in snapshot, so results are hermetic — independent of installed
packages (SURVEY §2.4 D6). Since r8 the CANONICAL snapshot is the
curated 1,464-name table written by ``tools/vendor_gender_names.py``
(every dataset name ≥5 occurrences is an explicit decision), and three
test suites pin exact golden labels against it — so this tool no
longer overwrites the snapshot by default: blindly replacing it with
raw nam_dict output would drop curated names nam_dict lacks and revert
curated relabels, breaking ``test_q5_golden_labels`` /
``test_q10_cohort_full`` / ``test_gender_snapshot_census``.

Default behavior: write the folded nam_dict table to a SCRATCH path
(``tempdir/gender_names_namdict.csv`` — never inside the shipped
package's resources tree, where a future glob/packaging change could
pick up the untracked artifact; ADVICE r8) and print the label diff vs
the current snapshot for review. Pass ``--overwrite`` only if you really want
nam_dict to replace the curated snapshot — then reconcile the diff
into tools/vendor_gender_names.py's lists and re-run the golden tests
(the reference's label rules, mostly_male→male / mostly_female→female
/ andy→unknown per ``task.py:34,43-51``, are folded at refresh time
either way).

Usage:  python tools/refresh_gender_snapshot.py [--overwrite]
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineer_task_spark.functions.gender import _FOLD, _SNAPSHOT  # noqa: E402


def main() -> None:
    try:
        import gender_guesser.detector as gg  # type: ignore
    except ImportError:
        sys.exit("gender_guesser is not installed; snapshot left unchanged")

    det = gg.Detector(case_sensitive=False)
    folded = {
        name.lower(): _FOLD.get(det.get_gender(name), det.get_gender(name))
        for name in det.names
    }

    current: dict[str, str] = {}
    with open(_SNAPSHOT, newline="") as f:
        for row in csv.DictReader(f):
            current[row["name_key"].lower()] = row["gender"]
    relabeled = sorted(
        k for k in current if k in folded and folded[k] != current[k]
    )
    dropped = sorted(k for k in current if k not in folded)
    print(
        f"nam_dict: {len(folded)} names; vs snapshot: "
        f"{len(relabeled)} relabeled, {len(dropped)} curated names absent"
    )
    for k in relabeled[:40]:
        print(f"  RELABEL {k}: {current[k]} -> {folded[k]}")
    if dropped:
        print(f"  ABSENT (first 20): {dropped[:20]}")

    overwrite = "--overwrite" in sys.argv
    # Review copies go to scratch, NOT next to the canonical snapshot
    # inside the package resources tree (ADVICE r8). The scratch file
    # must not be a fixed name in the world-writable tempdir either —
    # a pre-planted symlink there could redirect the write or tamper
    # with the artifact before review (ADVICE r9) — so mint it with
    # mkstemp (O_CREAT|O_EXCL, mode 0600, unpredictable suffix).
    import os
    import tempfile

    if overwrite:
        out = Path(_SNAPSHOT)
        fh = open(out, "w", newline="")
    else:
        fd, name = tempfile.mkstemp(
            prefix="gender_names_namdict_", suffix=".csv"
        )
        out = Path(name)
        fh = os.fdopen(fd, "w", newline="")
    with fh as f:
        w = csv.writer(f)
        w.writerow(["name_key", "gender"])
        for k in sorted(folded):
            w.writerow([k, folded[k]])
    print(f"wrote {len(folded)} names to {out}")
    if overwrite:
        print(
            "NOTE: the curated snapshot was replaced — reconcile "
            "tools/vendor_gender_names.py and re-run "
            "tests/test_netflix.py's golden-label tests"
        )


if __name__ == "__main__":
    main()
