"""Round certification sweep: every registry query vs its DuckDB
oracle, per scale factor, under BOTH canonicalizations — the
``fetchall`` path (Python scalars) and the driver-parity ``pandas``
path (``rel.df()``, where DuckDB's HUGEINT silently widens to float64;
see VERDICT r11 #1). Rows-only queries count-check.

Usage: python scripts/certify.py [sf_dir ...] [--canons fetchall,pandas]
Prints one line per (sf, canon): ok/total, then any failures verbosely.
Exit 0 only if everything passed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    canons = ["fetchall", "pandas"]
    for a in sys.argv[1:]:
        if a.startswith("--canons"):
            canons = a.split("=", 1)[1].split(",")
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from gcp_datalake_pipeline_spark.plans.compare import run_all
    from gcp_datalake_pipeline_spark.session import get_spark

    spark = get_spark(app_name="certify", shuffle_partitions=32)
    failures = []
    for sf in sf_dirs:
        for canon in canons:
            t0 = time.time()
            results = run_all(spark, sf, pandas_canon=(canon == "pandas"))
            bad = [r for r in results if not r.ok]
            print(
                f"{sf} canon={canon}: {len(results) - len(bad)}/"
                f"{len(results)} ok in {time.time() - t0:.0f}s",
                flush=True,
            )
            for r in bad:
                print(f"  FAIL {r.name}: {r.detail[:500]}", flush=True)
            failures += [(sf, canon, r.name) for r in bad]
    print("CERTIFY", "PASS" if not failures else f"FAIL {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
