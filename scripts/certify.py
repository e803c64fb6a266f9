"""Round certification sweep: every registry query vs its DuckDB
oracle, per scale factor, under BOTH canonicalizations — the
``fetchall`` path (Python scalars) and the driver-parity ``pandas``
path (``rel.df()``, where DuckDB's HUGEINT silently widens to float64;
see VERDICT r11 #1). Rows-only queries count-check.

Large derived scale factors (sf1) add two hazards the sweep must
survive: a handful of VERIFICATION oracles are intentionally written
as pairwise joins (exact-Jaccard, brute-force ANN ground truth) whose
DuckDB side is O(n²) in corpus size — fine at the driver's sf0.01,
unbounded at 10× sf0.1 — and an unbounded DuckDB spill can fill the
host disk and take unrelated processes down with it. So: the
connection gets a temp-directory cap and a memory cap, and every
query runs under a watchdog that interrupts BOTH engines at
``--budget`` seconds. RESOURCE exhaustion (interrupt, OOM/cap, an
operator's own volume refusal) records as a skip; any OTHER
exception is a FAILURE — the sweep must never let a broken query
masquerade as over-budget.

Usage: python scripts/certify.py [sf_dir ...]
           [--canons=fetchall,pandas] [--budget=SECONDS] [--skip=a,b]
Prints one line per query, then one summary line per (sf, canon).
Exit 0 only if no query FAILED (skips are reported, not failures).
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    canons = ["fetchall", "pandas"]
    budget = 300.0
    skip: set[str] = set()
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--canons"):
            canons = a.split("=", 1)[1].split(",")
        elif a.startswith("--budget"):
            budget = float(a.split("=", 1)[1])
        elif a.startswith("--skip"):
            skip = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from gcp_datalake_pipeline_spark.plans import QUERIES
    from gcp_datalake_pipeline_spark.plans.compare import (
        compare_query,
        duckdb_connection,
    )
    from gcp_datalake_pipeline_spark.session import get_spark

    spark = get_spark(app_name="certify", shuffle_partitions=32)
    failures = []
    for sf in sf_dirs:
        con = duckdb_connection(sf, cached=True)
        # contain oracle spills: a runaway pairwise join must die on its
        # own cap, never fill the host disk under everyone else
        con.execute("SET max_temp_directory_size='24GB'")
        con.execute("SET memory_limit='48GB'")
        for canon in canons:
            t0 = time.time()
            ok = skipped = 0
            for qname, q in QUERIES.items():
                if only is not None and qname not in only:
                    continue
                tq = time.time()
                # watchdog guards BOTH sides past the budget: the
                # oracle via con.interrupt(), a Spark-side bomb via
                # cancelAllJobs — either way the query downgrades
                # instead of hanging or killing the sweep
                done = threading.Event()

                def _watch():
                    if not done.wait(budget):
                        try:
                            con.interrupt()
                        except Exception:
                            pass
                        try:
                            spark.sparkContext.cancelAllJobs()
                        except Exception:
                            pass

                w = threading.Thread(target=_watch, daemon=True)
                w.start()
                try:
                    df = q.fn(spark, sf)
                    if q.oracle is None or qname in skip:
                        n = df.count()
                        if q.oracle is None:
                            print(
                                f"  {qname}: rows-only n={n} "
                                f"({time.time() - tq:.1f}s)",
                                flush=True,
                            )
                            ok += 1
                        else:
                            print(
                                f"  {qname}: skip-listed n={n} "
                                f"({time.time() - tq:.1f}s)",
                                flush=True,
                            )
                            skipped += 1
                        continue
                    r = compare_query(
                        spark, con, qname, df, q.oracle,
                        pandas_canon=(canon == "pandas"),
                    )
                except Exception as e:
                    # only RESOURCE exhaustion downgrades to a skip:
                    # the watchdog's interrupts/cancels, the DuckDB
                    # temp/memory caps, and the operators' own loud
                    # volume refusals. Anything else is a REAL failure
                    # — counting a broken query as "skipped" would let
                    # CERTIFY PASS mask a regression.
                    msg = f"{type(e).__name__}: {e}"
                    budget_like = any(
                        pat in msg
                        for pat in (
                            "InterruptException",
                            "INTERRUPT Error",
                            "OutOfMemoryException",
                            "Out of Memory Error",
                            "OutOfMemoryError",
                            "cancelled",
                            "SparkException: Job",  # cancelAllJobs
                            "max_candidates",
                            "max_temp_directory_size",
                        )
                    )
                    if budget_like:
                        print(
                            f"  {qname}: skipped at this sf "
                            f"({msg[:140]}) ({time.time() - tq:.1f}s)",
                            flush=True,
                        )
                        skipped += 1
                    else:
                        failures.append((sf, canon, qname))
                        print(
                            f"  FAIL {qname}: {msg[:400]} "
                            f"({time.time() - tq:.1f}s)",
                            flush=True,
                        )
                    continue
                finally:
                    done.set()
                    # release per-query caches and localCheckpoints:
                    # 163 heavy queries in one JVM otherwise accumulate
                    # into a driver-heap OOM two queries later
                    import gc

                    spark.catalog.clearCache()
                    gc.collect()
                if r.ok:
                    ok += 1
                    print(
                        f"  {qname}: ok ({time.time() - tq:.1f}s)",
                        flush=True,
                    )
                else:
                    failures.append((sf, canon, qname))
                    print(f"  FAIL {qname}: {r.detail[:500]}", flush=True)
            n_run = len(QUERIES) if only is None else len(
                [q for q in QUERIES if q in only]
            )
            print(
                f"{sf} canon={canon}: {ok}/{n_run} ok, "
                f"{skipped} skipped (over budget/cap at this sf), "
                f"{n_run - ok - skipped} FAILED "
                f"in {time.time() - t0:.0f}s",
                flush=True,
            )
    print("CERTIFY", "PASS" if not failures else f"FAIL {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
