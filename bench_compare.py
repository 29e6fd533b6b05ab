"""Mechanical round-over-round bench comparison.

Reads two BENCH_DETAIL.json files (the per-query median + IQR maps
``bench.py`` writes alongside its one-line summary) and prints, per
query, the delta classified against measurement noise: a delta is a
REGRESSION/IMPROVEMENT only if it exceeds both IQRs and a relative
floor — everything inside the noise band is reported as noise and
summarized, not listed. This is the tooling answer to the round-4
adjudication cost (docs/BENCH_NOTES.md): cross-round per-query calls
must be mechanical, not judgment.

Usage::

    python bench_compare.py OLD_DETAIL.json NEW_DETAIL.json [--all]

Exit code 0 always (reporting, not gating); `--all` lists every query
instead of only the significant ones.
"""

from __future__ import annotations

import json
import sys


def classify(old: float, new: float, iqr: float, rel_floor: float = 0.25):
    """noise | regression | improvement, by IQR band + relative floor."""
    delta = new - old
    band = max(iqr, rel_floor * old, 0.05)
    if abs(delta) <= band:
        return "noise", delta
    return ("regression", delta) if delta > 0 else ("improvement", delta)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        print(__doc__)
        raise SystemExit(2)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    oq, nq = old["queries"], new["queries"]
    oiqr, niqr = old.get("iqr", {}), new.get("iqr", {})

    rows = []
    for q in sorted(set(oq) & set(nq)):
        iqr = max(oiqr.get(q, 0.0), niqr.get(q, 0.0))
        kind, delta = classify(oq[q], nq[q], iqr)
        rows.append((q, oq[q], nq[q], delta, iqr, kind))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    sig = [r for r in rows if r[5] != "noise"]
    listed = rows if show_all else sig
    if listed:
        print(f"{'query':34} {'old':>8} {'new':>8} {'delta':>8} {'iqr':>7}  verdict")
        for q, o, n, d, iqr, kind in sorted(
            listed, key=lambda r: -abs(r[3])
        ):
            print(f"{q:34} {o:8.3f} {n:8.3f} {d:+8.3f} {iqr:7.3f}  {kind}")
    n_noise = sum(1 for r in rows if r[5] == "noise")
    print(
        f"\n{len(rows)} shared queries: "
        f"{sum(1 for r in rows if r[5] == 'regression')} regressions, "
        f"{sum(1 for r in rows if r[5] == 'improvement')} improvements, "
        f"{n_noise} within noise"
        + (f"; new: {', '.join(added)}" if added else "")
        + (f"; removed: {', '.join(removed)}" if removed else "")
    )
    ot, nt = sum(oq.values()), sum(nq.values())
    print(f"total (shared basis): {sum(oq[q] for q in set(oq) & set(nq)):.2f}s -> "
          f"{sum(nq[q] for q in set(oq) & set(nq)):.2f}s; full totals {ot:.2f}s -> {nt:.2f}s")


if __name__ == "__main__":
    main()
