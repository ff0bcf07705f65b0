#!/usr/bin/env python3
"""Aggregate a Bench JSON (bench_out.json / BENCH_r{N}.json) into
per-family subtotals, optionally diffing two runs (e.g. sf0.1 vs sf1)
into a scaling table for BASELINE.md.

Usage: python3 tools/bench_families.py bench_sf01.json [bench_sf1.json]
"""
import json
import sys


FAMILIES = [
    ("stream_", "streaming"),
    ("dedup_", "dedup"),
    ("sim_", "similarity"),
    ("text_", "text"),
    ("events_", "events"),
    ("mm_", "multimodal"),
    ("pipeline_", "pipeline"),
    ("graph_", "graph"),
    ("dq_", "quality"),
    ("sink_", "sinks"),
    ("q_s", "dwca"),
    ("q_a", "validator"),
    ("q_o", "validator"),
    ("q_e", "validator"),
    ("q_p", "validator"),
]


def family(name: str) -> str:
    for prefix, fam in FAMILIES:
        if name.startswith(prefix):
            return fam
    return "relational/tpch"  # q1..q22, q_* scale ops


def load(path: str) -> dict:
    # bench_out.json is JSON-lines (full record first); BENCH_r{N}.json is
    # a driver wrapper whose `tail` holds the same one-line record
    with open(path) as f:
        first = f.readline()
    d = json.loads(first)
    if "tail" in d and "queries" not in d:
        # driver wrapper: the tail is a bounded capture and may start
        # mid-record — prefer the engine-written bench_out.json
        for line in d["tail"].strip().splitlines():
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                d = cand
                break
        else:
            sys.exit(f"{path}: driver tail holds no parseable bench line — "
                     "use the engine-written bench_out.json instead")
    return d["queries"] if "queries" in d else d


def subtotal(qs: dict) -> dict:
    out = {}
    for name, sec in qs.items():
        fam = family(name)
        ent = out.setdefault(fam, [0.0, 0])
        ent[0] += sec
        ent[1] += 1
    return out


def main():
    a = subtotal(load(sys.argv[1]))
    b = subtotal(load(sys.argv[2])) if len(sys.argv) > 2 else None
    hdr = f"{'family':<18}{'n':>4}{'sec_a':>9}"
    if b:
        hdr += f"{'sec_b':>9}{'ratio':>7}"
    print(hdr)
    tot_a = tot_b = 0.0
    for fam in sorted(a, key=lambda f: -a[f][0]):
        sec_a, n = a[fam]
        tot_a += sec_a
        line = f"{fam:<18}{n:>4}{sec_a:>9.2f}"
        if b and fam in b:
            sec_b = b[fam][0]
            tot_b += sec_b
            line += f"{sec_b:>9.2f}{sec_b / sec_a:>7.2f}"
        print(line)
    line = f"{'TOTAL':<18}{sum(v[1] for v in a.values()):>4}{tot_a:>9.2f}"
    if b:
        line += f"{tot_b:>9.2f}{tot_b / tot_a:>7.2f}"
    print(line)


if __name__ == "__main__":
    main()
