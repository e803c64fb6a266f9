"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the noop sink (full compute, no driver transfer, no
disk write) so timings measure the plan, not collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

from gcp_datalake_pipeline_spark.plans import QUERIES
from gcp_datalake_pipeline_spark.session import get_spark

# Headline set: scan-agg, join-heavy, window, JSON, sessionization, text,
# dedup (LSH scale path), similarity. The quadratic exact-jaccard verifier
# is excluded from the headline (it exists for correctness, not throughput).
# Round-2 operators, timed separately so the headline list stays stable
# round-over-round (reported under "queries_extended").
EXTENDED = [
    "chunk_boilerplate",
    "embedding_near_dup_lsh",
    "ann_ivf_topk",
    "pii_redaction",
    "fuzzy_join_qgram",
    "doc_tfidf_topk",
    "doc_bigram_fluency",
    "train_val_test_split",
    # round 3
    "q8_nation_market_share",
    "q11_part_value_concentration",
    "q12_priority_by_returnflag",
    "q16_part_supplier_variety",
    "q20_excess_shippers",
    "benchmark_contamination",
    "pack_sequences_map",
    "stratified_sample_by_lang",
    "ann_ivf_kmeans_topk",
]

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_with_late_items",
    "q5_local_supplier_volume",
    "q10_top_returning_customers",
    "q14_red_part_revenue_share",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "orders_by_month",
    "latest_order_per_customer",
    "customer_running_revenue",
    "lineitem_distinct_parts",
    "events_hourly",
    "events_json_props",
    "events_moving_avg",
    "user_sessions",
    "doc_text_stats",
    "doc_fingerprint",
    "doc_lang_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_name_match",
    "ann_topk",
    "ann_lsh_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")

    # Warm the JVM/codegen with one tiny action so q1 doesn't pay startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    def canary() -> float:
        """Host-speed calibration kernel: a FIXED pure-codegen arithmetic
        sum over range(5e8) — no I/O, no shuffle, no engine code — so
        round-over-round BENCH comparisons can be normalized against the
        machine's speed window (+/-30% host swings have repeatedly
        masqueraded as regressions). Median of 3."""
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(500_000_000).selectExpr("sum(id * 3 + 7)").collect()
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 3)

    canary_start = canary()
    print(f"# canary(start): {canary_start}s", file=sys.stderr)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Two passes per suite: the first (cold) pass absorbs parquet-footer /
    # codegen / shuffle-service warmup, the second (warm) pass is the
    # round-over-round comparable number.
    cold: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = run(name)
        print(f"# cold {name}: {cold[name]}s", file=sys.stderr)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = run(name)
        print(f"# warm {name}: {timings[name]}s", file=sys.stderr)

    # Full-registry coverage: every registry query not already timed runs
    # in the extended suite too, so a regression anywhere in the full registry
    # surface is visible round-over-round (not just in the headline 25).
    rest = [n for n in QUERIES if n not in HEADLINE and n not in EXTENDED]
    extended: dict[str, float] = {}
    for name in EXTENDED + rest:
        run(name)  # cold
        extended[name] = run(name)
        print(f"# warm(ext) {name}: {extended[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # Optional decade-up section: derive a 10x key-shifted copy of the
    # bench SF (cached) and run the headline suite once cold + once warm.
    # Skippable via SPARK_GRAFT_SF1=0 for quick local iterations.
    sf1: dict[str, float] = {}
    sf1_total = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        from gcp_datalake_pipeline_spark.benchdata import derive_scaled_dir

        cache = os.environ.get(
            "SPARK_GRAFT_BENCH_CACHE", os.path.join(os.path.dirname(__file__), ".benchdata")
        )
        sf1_dir = derive_scaled_dir(
            spark, sf_dir, os.path.join(cache, "sf1"), factor=10
        )
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf1_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            print(
                f"# sf1 cold {name}: {round(time.perf_counter() - t0, 3)}s",
                file=sys.stderr,
            )
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf1_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            sf1[name] = round(time.perf_counter() - t0, 3)
            print(f"# sf1 warm {name}: {sf1[name]}s", file=sys.stderr)
        sf1_total = round(sum(sf1.values()), 3)

    # Full detail goes to stderr (human/CI log); stdout carries ONE
    # compact JSON line. The driver records only a bounded tail of
    # stdout, so the final line must stay well under that window —
    # per-query detail for the extended suite would truncate it (r04's
    # stored bench line was cut mid-JSON for exactly this reason).
    detail = {
        "cold": cold,
        "queries_extended": extended,
        "sf1_queries": sf1,
    }
    print("# detail " + json.dumps(detail), file=sys.stderr)
    canary_end = canary()
    print(f"# canary(end): {canary_end}s", file=sys.stderr)
    summary = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "extended_total": round(sum(extended.values()), 3),
        "canary_sec": canary_start,
        "canary_sec_end": canary_end,
        "sf": float(sf),
    }
    if sf1_total is not None:
        summary["sf1_total"] = sf1_total
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
