#!/usr/bin/env python3
"""Cross-round physical-plan regression triage.

Usage:
    python3 tools/plan_diff.py <old_bench_full.json> <new_bench_full.json>

Compares the normalized per-query `plan_sha` maps two Bench runs
recorded (round 11+) and prints, for every query whose plan fingerprint
changed, the old/new sha plus the per-query min timing delta — a lost
broadcast, a new shuffle, or a codegen fallback shows up here as a
one-line diff instead of a close manual plan read. Queries present on
only one side are listed as added/removed. Dev-only tooling.
"""
import sys, json


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    osha, nsha = old.get("plan_sha", {}), new.get("plan_sha", {})
    oq, nq = old.get("queries", {}), new.get("queries", {})
    if not osha:
        print(f"{old_path}: no plan_sha map (pre-round-11 record?) — "
              "nothing to diff against")
        return 0
    added = sorted(set(nsha) - set(osha))
    removed = sorted(set(osha) - set(nsha))
    changed = sorted(q for q in set(osha) & set(nsha) if osha[q] != nsha[q])
    for q in added:
        print(f"ADDED    {q}  sha={nsha[q]}  t={nq.get(q)}")
    for q in removed:
        print(f"REMOVED  {q}  sha={osha[q]}")
    for q in changed:
        dt = (f"{oq[q]:.2f}->{nq[q]:.2f}s"
              if q in oq and q in nq else "n/a")
        print(f"CHANGED  {q}  {osha[q]} -> {nsha[q]}  min {dt}")
    same = len(set(osha) & set(nsha)) - len(changed)
    print(f"\n{same} unchanged, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
