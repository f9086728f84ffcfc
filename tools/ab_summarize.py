#!/usr/bin/env python3
"""Summarize /tmp/ab_r19_<tag>.log mins lines per arm per query."""
import json, re, sys
from collections import defaultdict

path = sys.argv[1]
vals = defaultdict(lambda: defaultdict(list))  # q -> arm -> [sec]
for line in open(path):
    m = re.match(r"([AB]) (\{.*\})", line.strip())
    if not m:
        continue
    arm, js = m.group(1), json.loads(m.group(2))
    for pair in js["q"].split(","):
        q, cs = pair.split(":")
        vals[q][arm].append(int(cs) / 100)
for q in sorted(vals):
    a = vals[q].get("A", [])
    b = vals[q].get("B", [])
    fa = ",".join(f"{v:.2f}" for v in a)
    fb = ",".join(f"{v:.2f}" for v in b)
    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else -1
    print(f"{q:6s} A[{fa}] med={med(a):.2f} min={min(a) if a else -1:.2f} | "
          f"B[{fb}] med={med(b):.2f} min={min(b) if b else -1:.2f}")
