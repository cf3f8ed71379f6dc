#!/usr/bin/env python3
"""Per-key bench comparison: shared-key totals + movers between two
bench records (BENCH_LAST.json / BENCH_r<N>.json shapes).

Usage: bench_diff.py <old.json> <new.json> [ratio_flag=1.3] [abs_flag=0.15]

Prints the shared-key totals (the round-over-round comparable number),
new/removed keys with their costs, and every shared key that moved more
than BOTH the ratio and absolute thresholds in either direction —
the movers BENCH_NOTES must adjudicate.
"""
import json
import sys


def main():
    def load(p):
        d = json.load(open(p))
        # driver-side BENCH_r<N>.json wraps the builder record in
        # {"parsed": {...}}; BENCH_LAST.json is the record itself
        return d.get("parsed", d)

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    absf = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    so, sn = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"shared keys: {len(shared)}  old={so:.2f}s  new={sn:.2f}s  "
          f"ratio={sn / so:.2f}x")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"new keys ({len(added)}, +{sum(nq[k] for k in added):.2f}s): "
              + ", ".join(f"{k}={nq[k]:.2f}" for k in added))
    if removed:
        print(f"removed keys ({len(removed)}): " + ", ".join(removed))
    movers = [(k, oq[k], nq[k]) for k in shared
              if (nq[k] > oq[k] * ratio and nq[k] - oq[k] > absf)
              or (oq[k] > nq[k] * ratio and oq[k] - nq[k] > absf)]
    movers.sort(key=lambda t: -(t[2] - t[1]))
    for k, a, b in movers:
        print(f"  {'REGRESS' if b > a else 'improve':<8} {k:<28} "
              f"{a:.2f} -> {b:.2f}  ({b / a:.2f}x, {b - a:+.2f}s)")
    if not movers:
        print("  no shared key moved beyond the thresholds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
