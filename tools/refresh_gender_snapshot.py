"""Regenerate resources/gender_names.csv from gender_guesser's nam_dict.

The engine's gender enrichment (functions/gender.py) reads ONLY the
checked-in snapshot, so results are hermetic — independent of installed
packages (SURVEY §2.4 D6). When exact parity with a specific
gender_guesser release matters (reference ``task.py:34,43-51`` calls it
per row), run this tool in an environment where the lib is installed;
it folds the reference's label rules (mostly_male→male,
mostly_female→female, andy→unknown) at refresh time and rewrites the
snapshot sorted for stable diffs.

Usage:  python tools/refresh_gender_snapshot.py
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
    with open(_SNAPSHOT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name_key", "gender"])
        for k in sorted(folded):
            w.writerow([k, folded[k]])
    print(f"wrote {len(folded)} names to {_SNAPSHOT}")


if __name__ == "__main__":
    main()
