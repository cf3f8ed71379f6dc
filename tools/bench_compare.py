#!/usr/bin/env python3
"""Round-over-round bench trend: compare two graft.Bench JSON outputs.

Usage:
  python3 tools/bench_compare.py BENCH_r01.json /tmp/bench_now.json

Accepts either a raw one-line Bench JSON ({"metric":...,"queries":{...}})
or the driver's wrapper ({"tail": "...<bench json>..."}). Co-tenant noise
on this box is ~10x, so treat single-run deltas under 3x as weather, not
signal (see graft Bench's own outlier re-run logic).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    tail = doc.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail)
    if m:
        return json.loads(m.group(0))
    # driver wrappers sometimes truncate the head of the bench line —
    # recover just the queries map (and errors list if present)
    m = re.search(r'"queries":(\{[^{}]*\})', tail)
    if m:
        out = {"queries": json.loads(m.group(1))}
    else:
        # truncation can even cut MID-map (r3/r4 tails start mid-key):
        # scrape every "name":seconds pair — query keys are the only
        # snake_case:number pairs in the bench line
        pairs = re.findall(r'"([a-z][a-z0-9_]+)":(-?[0-9.]+)', tail)
        qs = {k: float(v) for k, v in pairs
              if k not in ("value", "sf", "n", "rc", "cpus")}
        if not qs:
            raise SystemExit(f"{path}: no bench JSON found")
        out = {"queries": qs, "partial": True}
    e = re.search(r'"errors":(\[[^\]]*\])', tail)
    if e:
        out["errors"] = json.loads(e.group(1))
    return out


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    for label, doc in (("old", old), ("new", new)):
        if doc.get("partial"):
            print(f"WARNING: {label} file was head-truncated — its query map "
                  f"(and any total derived from it) is PARTIAL; trust only "
                  f"per-query ratios on shared keys")
    # boot provenance (VERDICT r15 #5): a reboot shifts every wall
    # 1.2-1.4x uniformly — label the comparison instead of letting the
    # raw ratio read as a regression
    ob, nb = old.get("boot_id"), new.get("boot_id")
    if ob and nb and ob != nb:
        print(f"CROSS-BOOT comparison (boot {ob[:8]}... -> {nb[:8]}...): "
              "wall ratios below are host weather, not plan signal — "
              "adjudicate on shuffle BYTES (shuffle_gate) instead")
    tot_o = sum(v for v in oq.values() if v > 0)
    tot_n = sum(v for v in nq.values() if v > 0)
    shared = [k for k in nq if k in oq and oq[k] > 0 and nq[k] > 0]
    sh_o, sh_n = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({(tot_n - tot_o) / tot_o * 100:+.0f}%)")
    if sh_o > 0:
        print(f"shared {len(shared)} keys: {sh_o:.1f}s -> {sh_n:.1f}s "
              f"({(sh_n - sh_o) / sh_o * 100:+.0f}%)")
    errs = new.get("errors", [])
    if errs:
        print(f"ERRORS: {errs}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added: {added}")
    if removed:
        print(f"removed: {removed}")
    rows = []
    for k in sorted(set(nq) & set(oq)):
        if oq[k] > 0 and nq[k] > 0:
            rows.append((nq[k] / oq[k], oq[k], nq[k], k))
    rows.sort(reverse=True)
    print(f"{'query':<24}{'old':>8}{'new':>8}{'ratio':>7}")
    for ratio, o, n, k in rows[:10]:
        print(f"{k:<24}{o:>8.2f}{n:>8.2f}{ratio:>6.1f}x")
    print("...")
    for ratio, o, n, k in rows[-5:]:
        print(f"{k:<24}{o:>8.2f}{n:>8.2f}{ratio:>6.1f}x")


if __name__ == "__main__":
    main()
