"""Summarize BENCH_HISTORY.jsonl: per-rev sample pools, merged per-query
minima, and a rev-vs-rev comparison table.

Usage:
    python tools/bench_report.py              # pool overview
    python tools/bench_report.py REV          # merged minima for REV
    python tools/bench_report.py REV_A REV_B  # A (baseline) vs B table

Multiple revs may be merged into one side with '+': `c94bc2d+db49922`
(the r9 protocol: same plans across both revs, minima merged).
Pure stdlib; never touches Spark, safe to run during a bench campaign.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def load(path: str) -> list[dict]:
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def pool(entries: list[dict], revs: list[str]) -> list[dict]:
    return [e for e in entries if e.get("rev") in revs]


def med_noise(samples: list[dict]) -> float:
    """Median noise_factor over only the samples that carry one
    (legacy records predate the calibration probe)."""
    vals = [
        float(s["noise_factor"])
        for s in samples
        if isinstance(s.get("noise_factor"), (int, float))
    ]
    return statistics.median(vals) if vals else float("nan")


def minima(samples: list[dict]) -> dict[str, float]:
    out: dict[str, float] = {}
    for s in samples:
        for q, t in (s.get("queries") or {}).items():
            if q not in out or t < out[q]:
                out[q] = t
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entries = load(os.path.join(root, "BENCH_HISTORY.jsonl"))
    # Pools are per-core-count: low-core $SPARK_GRAFT_CPUS scaling runs
    # are slower by design and must not mix with local[32] minima.
    # Legacy records without a cpus field were all local[32] runs.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    entries = [e for e in entries if int(e.get("cpus", 32)) == cpus]
    args = sys.argv[1:]

    if not args:
        by_rev: dict[str, list[dict]] = {}
        for e in entries:
            by_rev.setdefault(str(e.get("rev")), []).append(e)
        print(f"{'rev':>10} {'n':>3} {'min_total':>9} {'med_noise':>9}")
        for rev, samples in by_rev.items():
            tot = min(s.get("value", float("inf")) for s in samples)
            print(
                f"{rev:>10} {len(samples):>3} {tot:>9.3f} "
                f"{med_noise(samples):>9.3f}"
            )
        return

    sides = [a.split("+") for a in args]
    pools = [pool(entries, revs) for revs in sides]
    for revs, p in zip(sides, pools):
        print(
            f"# {'+'.join(revs)}: {len(p)} samples, "
            f"median noise {med_noise(p):.3f}"
        )
    mins = [minima(p) for p in pools]

    if len(mins) == 1:
        m = mins[0]
        for q in sorted(m, key=m.get, reverse=True):
            print(f"{q:>36} {m[q]:>7.3f}")
        print(f"{'TOTAL (all queries)':>36} {sum(m.values()):>7.3f}")
        return

    a, b = mins[0], mins[1]
    print(f"{'query':>36} {'base':>7} {'new':>7} {'ratio':>6}")
    for q in sorted(set(a) | set(b), key=lambda q: -b.get(q, a.get(q, 0))):
        av, bv = a.get(q), b.get(q)
        ratio = f"{bv / av:.2f}" if av and bv else "-"
        print(
            f"{q:>36} "
            f"{av if av is not None else float('nan'):>7.3f} "
            f"{bv if bv is not None else float('nan'):>7.3f} {ratio:>6}"
        )
    shared = [q for q in a if q in b]
    ta, tb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    print(
        f"{'TOTAL (shared queries)':>36} {ta:>7.3f} {tb:>7.3f} "
        f"{tb / ta:>6.2f}"
    )


if __name__ == "__main__":
    main()
