#!/usr/bin/env python3
"""Wall-clock timeline analysis of a BENCH_FULL.json record.

The r18 driver bench left one open question: 19 queries >1.5x their
committed values sat in three CONTIGUOUS stretches of the sorted
execution order with healthy memo/canary telemetry -- transient host
slowdown was the obvious read but unprovable from durations alone.
The record now carries per-query `started` epoch-millis; this tool
does the join that closes the question: flag queries inflated vs a
baseline record, cluster them by OVERLAPPING WALL-CLOCK windows, and
report each cluster as a time interval. A genuine host slowdown shows
as few clusters with tight time spans covering many queries; code
regressions scatter (each inflated query sits alone, keyed to its own
operator, at unrelated times).

Usage:
  python3 tools/bench_timeline.py CURRENT.json [BASELINE.json] [RATIO]

BASELINE defaults to BENCH_BASELINE.json next to the current record's
repo copy; RATIO defaults to 1.5. Exit code 0 always -- diagnostic.
"""
import json
import sys
from pathlib import Path


def main() -> None:
    cur_path = Path(sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json")
    base_path = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        cur_path.parent / "BENCH_BASELINE.json")
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    cur = json.loads(cur_path.read_text())
    started = cur.get("started")
    if not started:
        print("record carries no `started` map (pre-r19 layout) -- "
              "nothing to analyze")
        return
    base = {}
    if base_path.exists():
        base = json.loads(base_path.read_text()).get("queries", {})

    qs = cur["queries"]
    samples = cur.get("samples", {})
    retries = cur.get("retries", {})

    def span(name):
        """(start_ms, end_ms): first rep start + all reps' duration,
        retry runs included -- a retried query occupies the wall clock
        for its retries too (and its committed min may come from one),
        so excluding them undercounts the span and can split one host
        window into two or miss healthy-inside queries (r19 advice)."""
        s = started[name]
        dur = sum(x for x in samples.get(name, [qs[name]]) if x >= 0)
        dur += sum(x for x in retries.get(name, []) if x >= 0)
        return s, s + int(dur * 1000)

    inflated = sorted(
        (name for name, v in qs.items()
         if name in started and v >= 0 and base.get(name, -1) > 0
         and v > ratio * base[name]),
        key=lambda n: started[n])
    healthy = [n for n in qs if n in started and n not in inflated]
    print(f"{len(inflated)} queries > {ratio}x baseline "
          f"(of {len(qs)}; baseline keys: {len(base)})")
    if not inflated:
        return

    # cluster inflated queries whose wall-clock spans overlap or abut
    # within 60s -- one cluster == one candidate host-slowdown window
    clusters, cluster = [], [inflated[0]]
    for name in inflated[1:]:
        if started[name] - span(cluster[-1])[1] <= 60_000:
            cluster.append(name)
        else:
            clusters.append(cluster)
            cluster = [name]
    clusters.append(cluster)

    t0 = min(started[n] for n in started)
    for c in clusters:
        s = (span(c[0])[0] - t0) / 1000
        e = (span(c[-1])[1] - t0) / 1000
        # how many HEALTHY queries ran inside the same window? a true
        # host window inflates everything in it; a lone slow query with
        # fast neighbors is the query's own behavior
        inside = [n for n in healthy
                  if span(n)[0] >= span(c[0])[0] - 5_000
                  and span(n)[1] <= span(c[-1])[1] + 5_000]
        print(f"  window +{s:7.1f}s .. +{e:7.1f}s  "
              f"({len(c)} inflated, {len(inside)} healthy inside): "
              f"{', '.join(c[:6])}{' ...' if len(c) > 6 else ''}")
    n1 = sum(len(c) for c in clusters if len(c) > 1)
    print(f"verdict: {len(clusters)} window(s); "
          f"{n1}/{len(inflated)} inflated queries sit in multi-query "
          f"windows ({'host-slowdown shaped' if n1 > len(inflated) / 2 else 'scattered -- operator-shaped'})")


if __name__ == "__main__":
    main()
