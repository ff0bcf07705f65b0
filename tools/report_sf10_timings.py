#!/usr/bin/env python3
"""Turn a Verify spark_secs.json (the sf10 sweep's engine-side per-query
timings) into the round's committed artifacts:

  python3 tools/report_sf10_timings.py /tmp/scale_out_100/spark_secs.json \
      BENCH_sf10.json [bench_sf01.json]

* writes BENCH_sf10.json — the spark_secs payload verbatim (it already
  carries per-query seconds, the three window canaries per query, raw
  canary samples, and run minima; min-of-1-with-write is the documented
  aggregation).
* prints a markdown table of the N slowest queries with their window
  canaries and, when an sf0.1 bench JSON is given, the sf10/sf0.1 ratio —
  at 100x data a ratio far above ~100 marks a super-linear suspect, far
  below marks fixed-cost-dominated. The plan-shape justification column
  is left to the author (BASELINE.md).
"""
import json
import sys

src = sys.argv[1]
dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10.json"
bench01 = sys.argv[3] if len(sys.argv) > 3 else None
N = int(sys.argv[4]) if len(sys.argv) > 4 else 15

j = json.load(open(src))
json.dump(j, open(dst, "w"), indent=1)
print(f"wrote {dst}: {j['n_queries']} queries, total {j['total']:.1f}s, "
      f"canary_min {j['canary_min']}")

ratios = {}
if bench01:
    line = open(bench01).read().split("\n")[0]
    b = json.loads(line)
    ratios = b.get("queries", {})

rows = sorted(j["queries"].items(), key=lambda kv: -kv[1])[:N]
print("\n| query | sf10 s | window canaries (single/par32/mem) | sf0.1 s | ratio @100x |")
print("|---|---|---|---|---|")
for k, v in rows:
    w = j["window_canaries"].get(k, ["?"] * 3)
    r01 = ratios.get(k)
    ratio = f"{v / r01:.0f}x" if r01 else "-"
    r01s = f"{r01:.2f}" if r01 else "-"
    print(f"| {k} | {v:.1f} | {w[0]}/{w[1]}/{w[2]} | {r01s} | {ratio} |")
