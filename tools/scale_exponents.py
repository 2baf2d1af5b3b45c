#!/usr/bin/env python3
"""Compute measured scaling exponents from two graft.Bench vectors.

Usage: python3 tools/scale_exponents.py <small.json> <big.json> <data_ratio>

Prints a markdown table: query | t_small | t_big | ratio | exponent
where exponent = log(t_big/t_small) / log(data_ratio). Exponent 1.0 =
perfectly linear scaling; <1 = fixed overhead amortizing; >1 =
super-linear (needs an explanation in SCALE.md).
"""
import sys, json, math

def main(small_path, big_path, ratio):
    with open(small_path) as f: small = json.load(f)
    with open(big_path) as f: big = json.load(f)
    r = float(ratio)
    rows = []
    for q, t0 in sorted(small["queries"].items()):
        t1 = big["queries"].get(q)
        if t0 is None or t1 is None or t0 <= 0:
            rows.append((q, t0, t1, None, None))
            continue
        rows.append((q, t0, t1, t1 / t0, math.log(t1 / t0) / math.log(r)))
    print(f"| query | t@1x (s) | t@{ratio}x (s) | runtime ratio | exponent |")
    print("|---|---|---|---|---|")
    for q, t0, t1, rr, e in rows:
        if rr is None:
            print(f"| {q} | {t0} | {t1} | FAILED | — |")
        else:
            print(f"| {q} | {t0:.2f} | {t1:.2f} | {rr:.2f}× | **{e:.2f}** |")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
