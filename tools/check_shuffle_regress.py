#!/usr/bin/env python3
"""Shuffle-bytes regression gate — the contention-immune bench signal.

Usage: check_shuffle_regress.py <old_BENCH_DETAIL.json> <new_BENCH_DETAIL.json>

Wall time on a contended host lies; shuffle write bytes do not (a lost
broadcast, a new exchange, a widened scan all show up here even when
local wall time barely moves). Flags any common query whose shuffle
write grew >10% AND >1 MB between the two runs; exits nonzero if any.
"""
import sys, json

old = json.load(open(sys.argv[1]))["shuffle_write_bytes"]
new = json.load(open(sys.argv[2]))["shuffle_write_bytes"]
common = sorted(set(old) & set(new))
bad = []
for q in common:
    a, b = old[q], new[q]
    if b > a * 1.10 and b - a > 1_000_000:
        bad.append((q, a, b))
for q, a, b in sorted(bad, key=lambda t: t[1] and -t[2] / t[1]):
    print(f"REGRESS {q}: {a:,} -> {b:,} ({b / a:.2f}x)" if a
          else f"REGRESS {q}: 0 -> {b:,}")
tot_a = sum(old[q] for q in common)
tot_b = sum(new[q] for q in common)
print(f"[shuffle-gate] {len(common)} common queries, {len(bad)} "
      f"regressions; total {tot_a:,} -> {tot_b:,} "
      f"({tot_b / tot_a:.3f}x)" if tot_a else "[shuffle-gate] empty")
sys.exit(1 if bad else 0)
