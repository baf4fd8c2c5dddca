"""Cross-check _TOUCHED_THIS_ROUND against git (VERDICT r15 item 7).

_TOUCHED_THIS_ROUND in __spark_entry__.py is the one hand-maintained
link in the gate-rotation chain: a forgotten edit silently skips
re-gating a changed code path.  This script derives the set of QUERY
MODULES changed since a base commit (default: the previous round's
verdict commit, i.e. the last commit touching VERDICT.md) and prints

  * every registry entry DEFINED in a changed query module, and
  * every changed operators/ / mv/ / catalyst/ / etl/ module (whose
    entries the human must map by hand -- operator modules fan out to
    many entries, so automation here would front half the registry),

marking which are already in _TOUCHED_THIS_ROUND.  It is a REVIEW aid,
not an oracle: the human decides which changed-module entries are
behavior-identical (covered by the suite) vs needing a driver re-gate.

Usage: python scripts/touched_check.py [BASE_COMMIT]
"""

from __future__ import annotations

import inspect
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    if len(sys.argv) > 1:
        base = sys.argv[1]
    else:
        base = subprocess.check_output(
            ["git", "log", "-1", "--format=%H", "--", "VERDICT.md"],
            cwd=_ROOT, text=True,
        ).strip()
        if not base:
            sys.exit("no VERDICT.md commit found; pass BASE_COMMIT")
    changed = subprocess.check_output(
        ["git", "diff", "--name-only", base, "HEAD"], cwd=_ROOT, text=True
    ).split()
    pkg = "postgresql_datawarehouse_excercise_spark"
    changed_pkg = [f for f in changed if f.startswith(pkg + "/")]
    changed_queries = {
        os.path.basename(f) for f in changed_pkg if f"{pkg}/queries/" in f
    }
    other = [f for f in changed_pkg if f"{pkg}/queries/" not in f]

    import __spark_entry__ as e
    from postgresql_datawarehouse_excercise_spark.queries import load_all

    touched = set(e._TOUCHED_THIS_ROUND)
    registry = load_all()
    print(f"base commit: {base[:12]}  ({len(changed_pkg)} package files changed)")
    print("\nnon-query package modules changed (map to entries by hand):")
    for f in sorted(other):
        print(f"  {f}")
    print("\nentries defined in changed query modules:")
    flagged = 0
    for name, q in registry.items():
        mod = os.path.basename(inspect.getfile(q.fn))
        if mod in changed_queries:
            mark = "TOUCHED" if name in touched else "-"
            if name not in touched:
                flagged += 1
            print(f"  {mark:8s} {name}  ({mod})")
    stale = touched - set(registry)
    if stale:
        print(f"\nWARNING: _TOUCHED_THIS_ROUND names unknown entries: {sorted(stale)}")
    print(
        f"\n{flagged} changed-module entries NOT in _TOUCHED_THIS_ROUND "
        "(fine if behavior-identical or fronting as never-green -- "
        "review, don't auto-add)"
    )


if __name__ == "__main__":
    main()
