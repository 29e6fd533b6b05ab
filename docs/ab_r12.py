"""r12 adjudication of the three unadjudicated r11 driver-line spikes
(verdict Next #2): funnel_one_pass (1.43s vs quiet baseline 0.33±0.14,
4.3x — flagged weak), knn_label_accuracy (5.22 vs 3.55±0.21), and
pagerank_central_docs (13.91 vs 8.72±0.80).

None of these query paths changed between the r11 tree and r12 HEAD
(operators/analytics.py funnel plan, the entry-file knn certificate
slice, operators/graph.py pagerank — all untouched this round), so the
valid design is same-tree repeated measurement with PER-SAMPLE steal
brackets (the r12 bench self-certification primitive): if the spikes
fail to reproduce at ~zero steal, they are host-attributed; if a
sample does spike, its own bracket shows whether steal was present in
that exact window.

Run 2-4 fresh-process arms (one invocation each) and paste the JSON
lines into docs/BENCH_NOTES.md:

    python docs/ab_r12.py          # sf0.1, 8 interleaved rounds
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["funnel_one_pass", "knn_label_accuracy", "pagerank_central_docs"]
ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))


def main() -> None:
    import bench  # steal-bracket helpers (r12)
    import __spark_entry__ as entrymod
    from dataeng_azure_spotify_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_r12")
    qs = entrymod.queries()
    entrymod._cat(spark, sf_dir)
    samples: dict[str, list] = {q: [] for q in QUERIES}
    for q in QUERIES:  # untimed warm: codegen compile + footer reads
        qs[q](spark, sf_dir).count()
    for _ in range(ROUNDS):
        for q in QUERIES:  # interleaved round-robin
            spark.catalog.clearCache()
            t_steal = bench._cpu_ticks()
            t0 = time.perf_counter()
            qs[q](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples[q].append(
                (round(dt, 3), bench._steal_pct(t_steal, bench._cpu_ticks()))
            )
        import gc

        gc.collect()  # the r11 localCheckpoint-block guard
    out = {
        "sf_dir": sf_dir,
        "rounds": ROUNDS,
        "load_1m": round(os.getloadavg()[0], 2),
        "queries": {
            q: {
                "median": round(
                    statistics.median(s for s, _ in samples[q]), 3
                ),
                "samples": samples[q],  # (sec, steal_pct_in_window)
            }
            for q in QUERIES
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
