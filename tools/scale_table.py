#!/usr/bin/env python3
"""Build the SCALE_r{N} growth table from two Bench JSON lines.

Usage: tools/scale_table.py <sf001.json> <sf01.json> <out.md> <round>

Each input is one Bench JSON line (the per-query number of record =
min(chunk, solo)). The table reports t(sf0.1)/t(sf0.01) against the 10x
data-volume ratio; anything super-linear needs a plan explanation.
"""
import json
import sys


def main():
    small, big, out, rnd = sys.argv[1:5]
    qs_s = json.load(open(small))["queries"]
    qs_b = json.load(open(big))["queries"]
    names = sorted(set(qs_s) & set(qs_b))
    lines = [
        f"# SCALE_r{rnd} — sf0.01 -> sf0.1 growth (10x data)",
        "",
        "Per-query wall seconds are each run's number of record",
        "(min of chunk and solo forks, two shuffled passes each).",
        "A ratio at or under ~10 is at-worst-linear in data volume;",
        "fixed per-query overhead (job scheduling, codegen, tiny",
        "frames) makes most ratios land well under the data ratio.",
        "",
        "| query | sf0.01 s | sf0.1 s | ratio |",
        "|---|---|---|---|",
    ]
    worst = (None, 0.0)
    for n in names:
        r = qs_b[n] / qs_s[n]
        if r > worst[1]:
            worst = (n, r)
        lines.append(f"| {n} | {qs_s[n]:.2f} | {qs_b[n]:.2f} | {r:.2f} |")
    tot_s = sum(qs_s[n] for n in names)
    tot_b = sum(qs_b[n] for n in names)
    lines += [
        f"| **total** | {tot_s:.2f} | {tot_b:.2f} | "
        f"{tot_b / tot_s:.2f} |",
        "",
        f"Worst ratio: {worst[0]} at {worst[1]:.2f}x (10x data).",
    ]
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}; worst {worst[0]} {worst[1]:.2f}")


if __name__ == "__main__":
    main()
