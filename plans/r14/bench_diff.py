#!/usr/bin/env python
"""Diff two bench detail/summary JSON files: per-query delta, sorted.

Usage: python plans/r14/bench_diff.py before.json after.json [min_abs]
Accepts bench.py stdout lines, BENCH_DETAIL.json, or BENCH_r*.json
(with a `parsed` wrapper).
"""
from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        txt = fh.read().strip()
    d = json.loads(txt.splitlines()[-1] if txt.startswith("{") is False else txt)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d.get("queries_min") or d.get("queries") or {}
    return {k: float(v) for k, v in q.items()}


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    min_abs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    names = sorted(set(a) | set(b))
    rows = []
    for n in names:
        va, vb = a.get(n), b.get(n)
        if va is None or vb is None:
            rows.append((0.0, n, va, vb))
            continue
        rows.append((vb - va, n, va, vb))
    rows.sort()
    ta = sum(v for v in a.values())
    tb = sum(v for v in b.values())
    for d, n, va, vb in rows:
        if va is None or vb is None:
            print(f"{n:>36}  {va} -> {vb}  (MISSING SIDE)")
        elif abs(d) >= min_abs:
            print(f"{n:>36}  {va:7.3f} -> {vb:7.3f}  {d:+7.3f}")
    print(f"{'TOTAL':>36}  {ta:7.2f} -> {tb:7.2f}  {tb - ta:+7.2f}")


if __name__ == "__main__":
    main()
