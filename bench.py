"""Benchmark harness — runs the full query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

## Measurement protocol (committed r8 — docs/BENCH_NOTES.md)

Four rounds of bench-anomaly adjudications (minhash-r4, range_join-r6,
headline-r7) all resolved the same way: the committed number did not
reproduce under a controlled rerun — local sf0.1 medians are
host-state dominated (ambient load swings same-code queries ±2×).
The protocol below is what makes a BENCH_rN line interpretable:

- **Fresh process per invocation.** Run ``python bench.py`` as its own
  process (the driver already does); never reuse a warm session across
  "runs" you intend to compare — JIT state and GC history leak.
- **Host load is recorded** (`load_1m` at start/end, plus cpu count)
  in both outputs. A round-over-round comparison where either side ran
  at elevated load is void — rerun it, don't adjudicate it.
- **Warm medians only.** Each query gets one untimed warm execution
  (whole-stage-codegen compiles per-query generated code — a 4-6×
  one-off), then N timed runs with `clearCache` between; the reported
  number is the MEDIAN, with IQR kept as the noise band. A delta
  smaller than the IQR is noise, not signal.
- **Adaptive sample counts.** Sub-second queries (warm run < 1s) get
  SPARK_GRAFT_BENCH_FAST_RUNS (default 5) samples — their relative
  noise is largest; the variance-prone heavy dedup family gets
  SPARK_GRAFT_BENCH_HEAVY_RUNS (default 5); everything else
  SPARK_GRAFT_BENCH_RUNS (default 3).
- **Two totals, both printed.** ``value`` is the FIXED 15-query
  headline (comparable since r1 — membership never changes);
  ``total_all_sec`` is the sum over every query measured this run (the
  shared-basis anchor — compare rounds on the intersection of their
  per-query maps via bench_compare.py, not on the headline alone).
- **Anomaly adjudication.** Before reading any round-over-round delta
  as a regression: same-host interleaved A/B (8 warm samples per arm,
  round-robin across the queries under test, fresh process per arm) —
  the BENCH_NOTES "interleaved A/B" tables are the committed form.

Each query is executed with a count() action so results materialize
through the whole plan but never land on the driver.
"""

from __future__ import annotations

import gc
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


def _load1m() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except (OSError, AttributeError):
        # OSError: getloadavg unavailable at runtime; AttributeError:
        # platforms (Windows) where os has no getloadavg at all
        return -1.0


def _cpu_ticks() -> "tuple[int, int]":
    """(steal_ticks, total_ticks) from /proc/stat's aggregate cpu line.

    The r11 adjudications proved guest load_1m is BLIND to the noise
    source that actually moves the numbers — hypervisor steal (the
    host running other guests): pagerank swung 9.7→15.7s at load_1m
    ≈ 0. Steal is the 8th jiffies field; bracketing a run makes the
    bench self-certifying where the r11 analysis had to be done by
    hand (docs/BENCH_NOTES.md "hypervisor steal")."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return -1, -1


def _steal_pct(t0: "tuple[int, int]", t1: "tuple[int, int]") -> float:
    """Steal as % of all cpu ticks elapsed between two brackets."""
    if t0[0] < 0 or t1[0] < 0 or t1[1] <= t0[1]:
        return -1.0
    return round(100.0 * (t1[0] - t0[0]) / (t1[1] - t0[1]), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = _load1m()
    ticks_start = _cpu_ticks()
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE
    ]
    # SPARK_GRAFT_BENCH_QUERIES=a,b,c measures a subset — short steal
    # exposure for adjudications (r12); unknown names fail loudly. The
    # driver's per-round run never sets it. Subset runs cannot be a
    # committed baseline: the headline would silently cover only the
    # subset's members.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        want = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [w for w in want if w not in qs]
        if unknown:
            raise SystemExit(f"unknown bench queries: {unknown}")
        if "--commit" in sys.argv[1:]:
            raise SystemExit(
                "--commit with SPARK_GRAFT_BENCH_QUERIES would commit a "
                "partial-catalog baseline; drop one of the two"
            )
        names = [n for n in names if n in set(want)]

    # untimed warmup: JIT/codegen compilation and the parquet footer reads
    # otherwise land entirely on the first measured query
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("g")).count().count()
    entrymod._cat(spark, sf_dir)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # the variance-prone heavy family gets extra samples: identical-code
    # rounds showed up to 4x per-query swings at 3 samples, which made
    # round-over-round comparisons unfalsifiable for exactly these queries
    heavy_runs = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_RUNS", "5"))
    # sub-second queries carry the largest RELATIVE noise (r7 headline
    # drift post-mortem): give them extra samples too
    fast_runs = int(os.environ.get("SPARK_GRAFT_BENCH_FAST_RUNS", "5"))
    heavy = {"dedup_minhash_lsh", "simhash_neardup", "ann_ivf_topk",
             "dedup_clusters", "simhash_fingerprints", "dedup_ngram_jaccard",
             # r11: the long-warmup family — iterative/multi-stage
             # queries whose generated code + checkpoint page cache keep
             # warming over several samples (measured on an idle host:
             # pagerank 15.7 -> 9.7s monotonically over 6 samples), so
             # 3-sample medians carry the warmup tail as fake IQR
             "pagerank_central_docs", "semantic_dedup",
             "event_attribution", "nb_threshold_sweep", "dsir_select",
             "dedup_embedding_cosine", "pca_project"}
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    steal_q: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        q_ticks = _cpu_ticks()
        # warm run (untimed, but measured to pick the sample count):
        # whole-stage-codegen compiles each query's unique generated
        # code on first execution. clearCache between runs drops
        # operator-level persist()s so timings stay order-independent.
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()
        # the fast/slow classification uses the FIRST TIMED sample, not
        # the warm run: warm time includes the documented 4-6x codegen
        # compile one-off, which would deny exactly the sub-second
        # steady-state queries the extra FAST_RUNS samples exist for
        samples = []
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
        if name in heavy:
            n_samples = heavy_runs
        elif samples[0] < 1.0:
            n_samples = max(runs, fast_runs)
        else:
            n_samples = runs
        for _ in range(n_samples - 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        # session-aging guard (r11): clearCache drops persisted DF
        # blocks but NOT localCheckpoint RDD blocks, which several
        # operators create and which are only released when the Python
        # DataFrame objects are garbage-collected. Over a 133-query
        # session those blocks accumulate executor memory and the
        # late-session heavy queries pay GC/spill storms that looked
        # like host noise (IQR > median on the same late-session
        # family, rounds 9-11). One gc.collect() per query lets the
        # ContextCleaner release them between queries.
        gc.collect()
        # dispersion: interquartile range of the warm samples — a
        # round-over-round delta smaller than the IQR is noise, not signal
        if len(samples) >= 2:
            q1, _, q3 = statistics.quantiles(samples, n=4)
            spreads[name] = round(q3 - q1, 4)
        else:  # single-sample runs have no measurable dispersion
            spreads[name] = 0.0
        # per-query steal bracket: a spike whose own window shows high
        # steal is host-attributed without a separate A/B
        steal_q[name] = _steal_pct(q_ticks, _cpu_ticks())

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 4)
    total_all = round(sum(timings.values()), 4)
    load_end = _load1m()
    ticks_end = _cpu_ticks()
    steal_pct = _steal_pct(ticks_start, ticks_end)
    steal = {
        "start_ticks": ticks_start[0],
        "end_ticks": ticks_end[0],
        "delta": (
            ticks_end[0] - ticks_start[0]
            if ticks_start[0] >= 0 and ticks_end[0] >= 0
            else -1
        ),
        "pct_of_cpu": steal_pct,
    }
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "total_all_sec": total_all,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs": runs,
        "heavy_runs": heavy_runs,
        "fast_runs": fast_runs,
        "agg": "median",
        "iqr": spreads,
        "load_1m": [load_start, load_end],
        "cpus": os.cpu_count(),
        "steal": steal,
        "steal_pct_per_query": steal_q,
    }
    # Complete per-query data lands in a repo file; the PRINTED line must
    # parse from the driver's 2000-char stdout-tail capture (the r4 full
    # map was ~2.2k chars -> BENCH_r04 recorded parsed: null). The line
    # keeps the slowest queries individually (>= 10ms, and drops the
    # fastest of those too if the line still exceeds the budget), folds
    # everything else into the "folded" {n, total_sec} bucket, and
    # carries IQR for the variance-prone heavy family only.
    #
    # The COMMITTED baseline (BENCH_DETAIL.json) is only written under
    # an explicit --commit flag: the overwrite hazard actually fired in
    # r9 (an elevated-load sf0.01 side-effect run swept into a commit,
    # making every comparison against it read a phantom +33%). Default
    # runs — including the driver's — write the gitignored .local file.
    #
    # r12: --commit additionally self-certifies on hypervisor steal —
    # a run whose bracketed /proc/stat steal exceeds the threshold
    # (default 0.5% of cpu ticks; SPARK_GRAFT_BENCH_MAX_STEAL_PCT)
    # is demoted to the .local file with a stderr note, because a
    # stolen-host baseline poisons every later comparison and load_1m
    # cannot see it (proved by hand in r11, BENCH_NOTES "hypervisor
    # steal"). steal_pct = -1 means /proc/stat is unavailable: commit
    # proceeds but the JSON carries the -1 so the reader knows the
    # run is uncertified.
    max_steal = float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_STEAL_PCT", "0.5")
    )
    commit = "--commit" in sys.argv[1:]
    steal_refused = commit and steal_pct > max_steal
    if steal_refused:
        print(
            f"bench --commit REFUSED: run steal {steal_pct}% of cpu "
            f"ticks exceeds {max_steal}% — rerun on a quiet host "
            "(detail written to BENCH_DETAIL.local.json instead)",
            file=sys.stderr,
        )
        commit = False
        full["commit_refused_steal"] = True
    detail_name = "BENCH_DETAIL.json" if commit else "BENCH_DETAIL.local.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           detail_name), "w") as f:
        json.dump(full, f, indent=1)
    slow = {n: t for n, t in timings.items() if t >= 0.01}
    fast = {n: t for n, t in timings.items() if t < 0.01}
    line = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "total_all_sec": total_all,
        "unit": "sec",
        "sf": full["sf"],
        "runs": runs,
        "heavy_runs": heavy_runs,
        "fast_runs": fast_runs,
        "agg": "median",
        "load_1m": [load_start, load_end],
        "steal_pct": steal_pct,
        "steal_ticks": steal["delta"],
        "n_queries": len(timings),
        "folded": {"n": len(fast), "total_sec": round(sum(fast.values()), 4)},
        "iqr_heavy": {n: spreads[n] for n in sorted(heavy) if n in spreads},
        "queries": dict(sorted(slow.items(), key=lambda kv: -kv[1])),
    }
    if steal_refused:
        line["commit_refused_steal"] = True
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
