#!/usr/bin/env python
"""Diff the last two BENCH_TREND.jsonl entries: per-query delta table.

Usage: python tools/bench_trend.py [--threshold 0.6]
Exit 1 if any query regressed by more than --threshold, so a round
driver or CI step can gate on it mechanically. Default is 60%: two
back-to-back runs of IDENTICAL code on this box differ by up to ~50%
per query (single-node, shared CPU), so anything tighter flags noise.
A consistent >60% jump is a real plan change — investigate with
.explain("formatted") on the flagged key.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

THRESHOLD = 0.6
if "--threshold" in sys.argv:
    THRESHOLD = float(sys.argv[sys.argv.index("--threshold") + 1])

trend_path = Path(__file__).resolve().parent.parent / "BENCH_TREND.jsonl"
lines = [
    json.loads(ln)
    for ln in trend_path.read_text().splitlines()
    if ln.strip()
]
if len(lines) < 2:
    print(f"{len(lines)} entries in {trend_path.name} — nothing to diff")
    sys.exit(0)

prev, cur = lines[-2], lines[-1]
print(
    f"prev={prev.get('commit')} total={prev['total_sec']}s  ->  "
    f"cur={cur.get('commit')} total={cur['total_sec']}s  (sf={cur['sf']})"
)
print(f"{'query':<28}{'prev':>8}{'cur':>8}{'delta':>9}")
regressed = []
for key in cur["queries"]:
    c = cur["queries"][key]
    p = prev["queries"].get(key)
    if p is None:
        print(f"{key:<28}{'--':>8}{c:>8.3f}{'new':>9}")
        continue
    pct = (c - p) / p if p else 0.0
    flag = " <-- REGRESSED" if pct > THRESHOLD else ""
    print(f"{key:<28}{p:>8.3f}{c:>8.3f}{pct:>+8.0%}{flag}")
    if pct > THRESHOLD:
        regressed.append(key)
sys.exit(1 if regressed else 0)
