#!/usr/bin/env python3
"""Per-query scaling exponents from two bench snapshots (VERDICT r6 item 1).

Usage: scaling_report.py <bench_lo.json> <bench_hi.json> <scale_ratio> [out_md]

For each query present in both snapshots, the scaling exponent is
    alpha = log(t_hi / t_lo) / log(scale_ratio)
so alpha = 1.0 is perfectly linear, alpha <= ~1.2 is within n log n
tolerance, and anything materially above that at a 10x ratio indicates a
super-linear plan. Queries whose low-SF time is under FLOOR_SEC are
dominated by fixed per-query overhead (scheduling, plan build, codegen
cache lookups), not data volume, so their ratio understates throughput
scaling; they are reported but exempt from the outlier gate unless the
high-SF time is also material.
"""
import json
import math
import sys

FLOOR_SEC = 0.35   # below this, fixed overhead dominates the measurement
HI_MATERIAL = 3.5  # ...unless the high-SF time grew past this
ALPHA_GATE = 1.2   # n log n tolerance at 10x

def main():
    lo_path, hi_path, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    out_md = sys.argv[4] if len(sys.argv) > 4 else None
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    qlo, qhi = lo["queries"], hi["queries"]
    rows = []
    for name in sorted(set(qlo) & set(qhi)):
        tl, th = qlo[name], qhi[name]
        if tl <= 0 or th <= 0:
            rows.append((name, tl, th, None, "ERR"))
            continue
        alpha = math.log(th / tl) / math.log(ratio)
        if tl < FLOOR_SEC and th < HI_MATERIAL:
            flag = "overhead-bound"
        elif alpha > ALPHA_GATE:
            flag = "SUPER-LINEAR"
        else:
            flag = "ok"
        rows.append((name, tl, th, alpha, flag))

    bad = [r for r in rows if r[4] == "SUPER-LINEAR"]
    gated = [r for r in rows if r[4] in ("ok", "SUPER-LINEAR")]
    lines = []
    lines.append("# SCALING — measured sf0.1 -> sf1 exponents")
    lines.append("")
    def ld(d, k):
        v = d.get(k)
        return f"{v:.1f}" if isinstance(v, (int, float)) else "?"
    lines.append(
        f"Inputs: `{lo_path}` (total {lo['value']:.1f}s, load "
        f"{ld(lo, 'load_avg_start')}->{ld(lo, 'load_avg_end')}) vs "
        f"`{hi_path}` (total {hi['value']:.1f}s, load "
        f"{ld(hi, 'load_avg_start')}->{ld(hi, 'load_avg_end')}), "
        f"median-of-{lo.get('passes', '?')} vs median-of-"
        f"{hi.get('passes', '?')} on the same box, "
        f"scale ratio {ratio:g}x. Exponent = log(t_hi/t_lo)/log({ratio:g}); "
        f"1.0 = linear; gate at {ALPHA_GATE} (n log n tolerance). Queries "
        f"under {FLOOR_SEC}s at sf0.1 are overhead-bound (fixed per-query "
        f"cost dominates) and exempt unless sf1 exceeds {HI_MATERIAL}s."
    )
    lines.append("")
    lines.append(
        f"**Result: {len(bad)} super-linear outliers / {len(gated)} gated "
        f"queries ({len(rows)} total).**"
    )
    lines.append("")
    lines.append("| query | sf0.1 s | sf1 s | exponent | flag |")
    lines.append("|---|---|---|---|---|")
    for name, tl, th, alpha, flag in sorted(
            rows, key=lambda r: -(r[3] if r[3] is not None else 99)):
        a = f"{alpha:.2f}" if alpha is not None else "-"
        lines.append(f"| {name} | {tl:.3f} | {th:.3f} | {a} | {flag} |")
    text = "\n".join(lines) + "\n"
    if out_md:
        open(out_md, "w").write(text)
    print(f"gated={len(gated)} superlinear={len(bad)}")
    for name, tl, th, alpha, flag in bad:
        print(f"  SUPER-LINEAR {name}: {tl:.3f}s -> {th:.3f}s alpha={alpha:.2f}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
