#!/usr/bin/env python3
"""Soft scale gate over ShuffleAudit output: compare per-key
shuffle-write bytes across two scale factors and flag super-linear
growth — the load-insensitive tripwire for a reintroduced corpus-sized
exchange (SCALE.md's capacity model extrapolates exactly these bytes).

Usage: shuffle_gate.py <sf_small.json> <sf_big.json> [merged_out.json]
                       [--expect <prior_or_audit.json>]

--expect takes a prior merged SHUFFLE_r*.json (or a raw audit json) and
flags any of its keys absent from BOTH inputs — a key erroring at both
SFs would otherwise produce no ratio and vanish without a trace.

Rule: the biggest fixture growth sf0.01->sf0.1 is 10x (lineitem/events;
documents 10x, embeddings 4x), so a key is flagged when
    shufW(big) > RATIO_CAP * shufW(small)   [default 12 = 10x + headroom]
and shufW(small) >= MIN_BYTES (1 MB — below that, constant-overhead
partition framing dominates and ratios are noise). Exit 1 on flags so
the caller can surface a warning; the round gate treats this stage as
soft (warn, don't red).
"""
import json
import sys

RATIO_CAP = 12.0
MIN_BYTES = 1 << 20


def main():
    argv = sys.argv[1:]
    expect_path = None
    if "--expect" in argv:
        i = argv.index("--expect")
        expect_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    small = json.load(open(argv[0]))
    big = json.load(open(argv[1]))
    out_path = argv[2] if len(argv) > 2 else None
    flags, merged = [], {}
    # a key that ERRORS at one SF vanishes from its JSON (ShuffleAudit
    # skips erroring keys) — exactly the shape a corpus-sized-exchange OOM
    # takes, so a silent drop here would hide the regression this gate
    # exists for; flag missing keys in BOTH directions (small-only AND
    # big-only), and — given --expect — keys absent from both inputs
    missing = sorted(set(small["keys"]) - set(big["keys"]))
    for k in missing:
        flags.append((k, small["keys"][k]["shuffle_write_b"], -1, float("inf")))
    for k in sorted(set(big["keys"]) - set(small["keys"])):
        flags.append((k, -1, big["keys"][k]["shuffle_write_b"], float("inf")))
    if expect_path:
        expected = set(json.load(open(expect_path))["keys"])
        for k in sorted(expected - set(small["keys"]) - set(big["keys"])):
            flags.append((k, -1, -1, float("inf")))
    for k, b in sorted(big["keys"].items()):
        s = small["keys"].get(k)
        row = {"shuffle_write_b": b["shuffle_write_b"],
               "input_b": b["input_b"],
               "shuffle_read_b": b["shuffle_read_b"],
               "peak_task_b": b["peak_task_b"],
               "sec": b["sec"], "rows": b["rows"]}
        if s:
            sw_s, sw_b = s["shuffle_write_b"], b["shuffle_write_b"]
            row["shuffle_write_b_small"] = sw_s
            row["growth"] = round(sw_b / sw_s, 2) if sw_s else None
            if sw_s >= MIN_BYTES and sw_b > RATIO_CAP * sw_s:
                flags.append((k, sw_s, sw_b, sw_b / sw_s))
        merged[k] = row
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_small": small["sf"], "sf_big": big["sf"],
                       "ratio_cap": RATIO_CAP, "min_bytes": MIN_BYTES,
                       "n_keys": len(merged),
                       "flagged": [k for k, *_ in flags],
                       "keys": merged}, f, indent=1)
    mb = lambda v: f"{v / 1048576:.1f}MB"
    top = sorted(merged.items(), key=lambda kv: -kv[1]["shuffle_write_b"])[:8]
    print(f"shuffle_gate: {len(merged)} keys, "
          f"{sum(1 for v in merged.values() if v.get('growth') is not None)} "
          f"with two-SF ratios, {len(flags)} flagged (cap {RATIO_CAP}x)")
    print("  top shuffle writers at", big["sf"] + ":")
    for k, v in top:
        g = v.get("growth")
        print(f"    {k:<26} shufW={mb(v['shuffle_write_b']):>9} "
              f"growth={'%.1fx' % g if g is not None else 'n/a':>6} "
              f"peak={mb(v['peak_task_b'])}")
    for k, sw_s, sw_b, r in flags:
        if sw_s < 0 and sw_b < 0:
            print(f"  FLAG {k}: expected (per --expect) but MISSING from "
                  f"BOTH {small['sf']} and {big['sf']} — errored at both "
                  f"SFs or dropped from the catalog; re-run it standalone")
        elif sw_b < 0:
            print(f"  FLAG {k}: present at {small['sf']} but MISSING from "
                  f"{big['sf']} (errored at the big SF — the OOM shape a "
                  f"corpus-sized exchange takes); re-run it standalone")
        elif sw_s < 0:
            print(f"  FLAG {k}: present at {big['sf']} but MISSING from "
                  f"{small['sf']} (errored at the small SF — no growth "
                  f"ratio possible); re-run it standalone")
        else:
            print(f"  FLAG {k}: shuffle-write {mb(sw_s)} -> {mb(sw_b)} "
                  f"({r:.1f}x > {RATIO_CAP}x cap) — super-linear, "
                  f"check for a corpus-sized exchange")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
