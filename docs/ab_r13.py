"""r13 optimization-round A/B runner — one fresh-process arm.

Runs $AB_QUERIES (comma-separated, default pagerank_central_docs) from
THIS checkout's `__spark_entry__.py` with the bench warm-median
discipline and prints one JSON line with per-sample (seconds, steal%).
The driver loop interleaves invocations from two checkouts (the
pre-change worktree vs the working tree) so host storms land on both
arms; a sample whose own steal bracket is hot is discarded at analysis
time (the r12 per-query steal-bracket discipline).

    cd <checkout> && AB_QUERIES=q1,q2 AB_SAMPLES=3 python docs/ab_r13.py
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench  # steal-bracket helpers (r12)
    import __spark_entry__ as entrymod
    from dataeng_azure_spotify_spark.session import get_spark

    queries = [
        q.strip()
        for q in os.environ.get("AB_QUERIES", "pagerank_central_docs").split(",")
        if q.strip()
    ]
    n_samples = int(os.environ.get("AB_SAMPLES", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_r13")
    qs = entrymod.queries()
    entrymod._cat(spark, sf_dir)
    samples: dict[str, list] = {q: [] for q in queries}
    for q in queries:  # untimed warm: codegen compile + footer reads
        spark.catalog.clearCache()
        qs[q](spark, sf_dir).count()
        gc.collect()
    for _ in range(n_samples):
        for q in queries:  # interleaved round-robin within the arm too
            spark.catalog.clearCache()
            t_steal = bench._cpu_ticks()
            t0 = time.perf_counter()
            qs[q](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[q].append(
                (round(dt, 3), bench._steal_pct(t_steal, bench._cpu_ticks()))
            )
            gc.collect()  # the r11 localCheckpoint-block guard
    out = {
        "arm": os.path.basename(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "cwd": os.getcwd(),
        "samples": samples,
        "medians": {
            q: round(statistics.median(t for t, _ in v), 3)
            for q, v in samples.items()
        },
        "max_steal": {
            q: max(s for _, s in v) for q, v in samples.items()
        },
    }
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
