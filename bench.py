"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed with a count()/collect-free action (write to a noop
sink would be ideal; we use count() on the final DataFrame so results
materialize through the whole plan but never land on the driver).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.session import get_spark

import __spark_entry__ as entrymod

#: FIXED headline workload — the reported "value" is the sum over THIS
#: list only, so the metric stays comparable round over round even as
#: queries() grows. Do not change membership between rounds; newly added
#: queries still appear (timed) in the per-query map.
HEADLINE = [
    "star_join",
    "star_join_wide",
    "star_join_agg",
    "pricing_summary",
    "rollup_agg",
    "dedup_latest_per_key",
    "topk_per_group",
    "events_tumbling_window",
    "scd1_upsert",
    "scd2_history",
    "scd2_incremental",
    "dedup_minhash_lsh",
    "simhash_neardup",
    "ann_cosine_topk",
    "text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE
    ]

    # untimed warmup: JIT/codegen compilation and the parquet footer reads
    # otherwise land entirely on the first measured query
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("g")).count().count()
    entrymod._cat(spark, sf_dir)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # the variance-prone heavy family gets extra samples: identical-code
    # rounds showed up to 4x per-query swings at 3 samples, which made
    # round-over-round comparisons unfalsifiable for exactly these queries
    heavy_runs = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_RUNS", "5"))
    heavy = {"dedup_minhash_lsh", "simhash_neardup", "ann_ivf_topk",
             "dedup_clusters", "simhash_fingerprints", "dedup_ngram_jaccard"}
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # warm run (untimed): whole-stage-codegen compiles each query's
        # unique generated code on first execution — a 4-6x one-off that
        # would otherwise dominate sub-second queries. Steady-state is the
        # comparable number. clearCache between runs drops operator-level
        # persist()s so timings stay order-independent. The reported
        # per-query number is the MEDIAN of warm executions —
        # single warm runs showed ±2x JIT/GC variance round-to-round,
        # which would swamp real plan regressions.
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()
        samples = []
        for _ in range(heavy_runs if name in heavy else runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        # dispersion: interquartile range of the warm samples — a
        # round-over-round delta smaller than the IQR is noise, not signal
        if len(samples) >= 2:
            q1, _, q3 = statistics.quantiles(samples, n=4)
            spreads[name] = round(q3 - q1, 4)
        else:  # single-sample runs have no measurable dispersion
            spreads[name] = 0.0

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 4)
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs": runs,
        "heavy_runs": heavy_runs,
        "agg": "median",
        "iqr": spreads,
    }
    # Complete per-query data lands in a repo file; the PRINTED line must
    # parse from the driver's 2000-char stdout-tail capture (the r4 full
    # map was ~2.2k chars -> BENCH_r04 recorded parsed: null). The line
    # keeps the slowest queries individually (>= 10ms, and drops the
    # fastest of those too if the line still exceeds the budget), folds
    # everything else into the "folded" {n, total_sec} bucket, and
    # carries IQR for the variance-prone heavy family only.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(full, f, indent=1)
    slow = {n: t for n, t in timings.items() if t >= 0.01}
    fast = {n: t for n, t in timings.items() if t < 0.01}
    line = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": full["sf"],
        "runs": runs,
        "heavy_runs": heavy_runs,
        "agg": "median",
        "n_queries": len(timings),
        "folded": {"n": len(fast), "total_sec": round(sum(fast.values()), 4)},
        "iqr_heavy": {n: spreads[n] for n in sorted(heavy) if n in spreads},
        "queries": dict(sorted(slow.items(), key=lambda kv: -kv[1])),
    }
    out = json.dumps(line, separators=(",", ":"))
    if len(out) > 1950:  # hard guard: drop the fastest entries until it fits
        items = sorted(slow.items(), key=lambda kv: -kv[1])
        while len(out) > 1950 and items:
            dropped = items.pop()
            line["folded"]["n"] += 1
            line["folded"]["total_sec"] = round(
                line["folded"]["total_sec"] + dropped[1], 4
            )
            line["queries"] = dict(items)
            out = json.dumps(line, separators=(",", ":"))
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
