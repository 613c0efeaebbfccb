#!/usr/bin/env python3
"""Slice a same-sitting bench pair the way BASELINE.md reads it.

Usage: python3 tools/pairstats.py <spark.json> <duck.json> [head_cutoff_s]

Prints co-finishing total/ratio (queries BOTH engines finished), the
head slice (>= cutoff seconds in EITHER engine), the floor slice, and
the per-query outliers (ratio > 2 in either direction) for review.
"""
import sys, json

def main(spark_path, duck_path, cutoff=0.6):
    sp = json.load(open(spark_path))
    du = json.load(open(duck_path))
    sq, dq = sp["queries"], du["queries"]
    both = sorted(set(sq) & {k for k, v in dq.items() if v is not None})
    missing = sorted(set(sq) - set(both))
    s_tot = sum(sq[k] for k in both)
    d_tot = sum(dq[k] for k in both)
    head = [k for k in both if sq[k] >= cutoff or dq[k] >= cutoff]
    floor = [k for k in both if k not in head]
    sh, dh = sum(sq[k] for k in head), sum(dq[k] for k in head)
    sf_, df_ = sum(sq[k] for k in floor), sum(dq[k] for k in floor)
    print(f"spark total {sp['value']:.1f}s / {len(sq)} queries; "
          f"duck finished {len(both)}")
    print(f"loadavg spark boot={sp.get('loadavg_boot')} end={sp.get('loadavg_end')}")
    print(f"loadavg duck  start={du.get('loadavg_start')} end={du.get('loadavg_end')}")
    # guard the ratios: an all-DNF (or all-zero) DuckDB side must still
    # print the totals and the DNF list instead of dying on the division
    co_ratio = f" = {s_tot/d_tot:.2f}x" if d_tot > 0 else ""
    print(f"co-finishing ({len(both)}q): {s_tot:.1f} vs {d_tot:.1f} s{co_ratio}")
    head_ratio = f" = {sh/dh:.2f}x" if dh > 0 else ""
    print(f"head >= {cutoff}s either ({len(head)}q): {sh:.1f} vs {dh:.1f} s"
          f"{head_ratio}" if head else "no head")
    print(f"floor ({len(floor)}q): {sf_:.1f} vs {df_:.1f} s")
    if missing:
        print(f"duck DNF: {missing}")
    slow = sorted((sq[k]/max(dq[k],1e-3), k) for k in head if sq[k] > 2*dq[k])
    for r, k in reversed(slow[-12:]):
        print(f"  spark-slow {k}: {sq[k]:.2f} vs {dq[k]:.2f} ({r:.1f}x)")
    fast = sorted((dq[k]/max(sq[k],1e-3), k) for k in head if dq[k] > 2*sq[k])
    for r, k in reversed(fast[-8:]):
        print(f"  spark-fast {k}: {sq[k]:.2f} vs {dq[k]:.2f} (duck {r:.1f}x slower)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.6)
