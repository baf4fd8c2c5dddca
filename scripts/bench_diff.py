"""Diff two bench snapshots: spot per-entry regressions/improvements.

Usage: python scripts/bench_diff.py [OLD] [NEW] [--ratio=1.3]
  OLD default BENCH_r07.json (driver snapshot: {"parsed": {...}} shape or
  the raw one-line {"queries": {...}} shape -- both accepted), NEW default
  BENCH_full.json.  Prints entries whose time changed by more than the
  ratio in either direction, plus added/removed entries and totals.
  NOTE: driver BENCH_r*.json carry only the compact headline+family map;
  for a full per-entry diff pull the prior round's full map from git:
    git show <round-commit>:BENCH_full.json > /tmp/old.json
    python scripts/bench_diff.py /tmp/old.json
Exit code 0 always -- this is a reporting tool, the judgment of whether a
swing is host noise or a real regression stays with the reader (BENCH.md
tracks the known noisy entries).
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict:
    with open(path if os.path.isabs(path) else os.path.join(_ROOT, path)) as fh:
        d = json.load(fh)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map (unrecognized bench shape)")
    return d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ratio = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--ratio="):
            ratio = float(a.split("=", 1)[1])
    old_path = args[0] if len(args) > 0 else "BENCH_r07.json"
    new_path = args[1] if len(args) > 1 else "BENCH_full.json"
    old, new = load(old_path), load(new_path)
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    print(f"old {old_path}: total {old.get('value')}  ({len(qo)} entries)")
    print(f"new {new_path}: total {new.get('value')}  ({len(qn)} entries)")
    moved = [
        (k, qo[k], qn[k])
        for k in shared
        if qo[k] > 0 and (qn[k] > qo[k] * ratio or qo[k] > qn[k] * ratio)
    ]
    if moved:
        print(f"\nmoved more than {ratio}x ({len(moved)}):")
        for k, a, b in sorted(moved, key=lambda t: t[2] / t[1], reverse=True):
            print(f"  {k}: {a:.3f} -> {b:.3f}  ({b / a:.2f}x)")
    added = sorted(set(qn) - set(qo))
    if added:
        print(f"\nadded ({len(added)}, {sum(qn[k] for k in added):.1f}s):")
        for k in added:
            print(f"  {k}: {qn[k]:.3f}")
    removed = sorted(set(qo) - set(qn))
    if removed:
        print(f"\nremoved ({len(removed)}):")
        for k in removed:
            print(f"  {k}: was {qo[k]:.3f}")
    shared_delta = sum(qn[k] for k in shared) - sum(qo[k] for k in shared)
    print(f"\nshared-surface delta: {shared_delta:+.1f}s over {len(shared)} entries")


if __name__ == "__main__":
    main()
