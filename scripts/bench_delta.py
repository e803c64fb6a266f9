"""Compare two bench.py runs (JSON summary + stderr detail), canary-
normalized. Usage:
  python scripts/bench_delta.py before.json before_detail.json \
      after.json after_detail.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    bj, bd, aj, ad = (json.load(open(p)) for p in sys.argv[1:5])
    bc = (bj["canary_sec"] + bj["canary_sec_end"]) / 2
    ac = (aj["canary_sec"] + aj["canary_sec_end"]) / 2
    print(
        f"canary before: {bj['canary_sec']}->{bj['canary_sec_end']} "
        f"(mid {bc:.3f}); after: {aj['canary_sec']}->"
        f"{aj['canary_sec_end']} (mid {ac:.3f})"
    )
    for key in ("value", "cold_total", "extended_total", "sf1_total"):
        if key in bj and key in aj:
            r = aj[key] / bj[key]
            print(f"{key}: {bj[key]} -> {aj[key]}  ({r:.2f}x raw)")
    print("\nheadline per-query (warm):")
    rows = []
    for q, tb in bj["queries"].items():
        ta = aj["queries"].get(q)
        if ta:
            rows.append((ta - tb, q, tb, ta))
    for d, q, tb, ta in sorted(rows):
        print(f"  {q:35s} {tb:7.3f} -> {ta:7.3f}  ({ta/tb:.2f}x)")
    print("\nextended per-query (warm), biggest deltas:")
    rows = []
    for q, tb in bd["queries_extended"].items():
        ta = ad["queries_extended"].get(q)
        if ta is not None:
            rows.append((ta - tb, q, tb, ta))
    for d, q, tb, ta in sorted(rows)[:20]:
        print(f"  {q:35s} {tb:7.3f} -> {ta:7.3f}  ({ta/tb:.2f}x)")
    for d, q, tb, ta in sorted(rows)[-8:]:
        print(f"  {q:35s} {tb:7.3f} -> {ta:7.3f}  ({ta/tb:.2f}x)")


if __name__ == "__main__":
    main()
