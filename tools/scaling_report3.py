#!/usr/bin/env python3
"""Per-query scaling exponents from THREE bench snapshots (VERDICT r8
item 3): a least-squares fit of log t against log sf, so a single noisy
endpoint no longer moves every exponent, and the residual tells you
when a query's timing is too noisy to trust at all.

Usage:
    scaling_report3.py lo.json:0.1 mid.json:1 hi.json:3 [out_md]

For each query present in all snapshots, fit  log t = alpha·log sf + c.
alpha = 1.0 is perfectly linear, <= ~1.2 within n log n tolerance at
these ratios. Queries whose low-SF time is under FLOOR_SEC are
overhead-bound (fixed per-query cost dominates) and exempt from the
outlier gate unless the high-SF time is material.
"""
import json
import math
import sys

FLOOR_SEC = 0.35   # below this at the LOW point, fixed overhead dominates
HI_MATERIAL = 8.0  # ...unless the HIGH-SF time grew past this
ALPHA_GATE = 1.2   # n log n tolerance


def fit(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    alpha = sxy / sxx
    c = my - alpha * mx
    resid = math.sqrt(sum((y - (alpha * x + c)) ** 2 for x, y in zip(xs, ys)) / n)
    return alpha, resid


def main():
    specs = []
    for arg in sys.argv[1:]:
        if ":" not in arg:
            break
        path, sf = arg.rsplit(":", 1)
        specs.append((json.load(open(path)), float(sf)))
    out_md = next((a for a in sys.argv[1 + len(specs):]), None)
    assert len(specs) >= 3, "need three bench.json:sf arguments"
    specs.sort(key=lambda p: p[1])
    names = set(specs[0][0]["queries"])
    for d, _ in specs[1:]:
        names &= set(d["queries"])
    rows = []
    for q in names:
        ts = [d["queries"][q] for d, _ in specs]
        xs = [math.log(sf) for _, sf in specs]
        ys = [math.log(t) for t in ts]
        alpha, resid = fit(xs, ys)
        lo, hi = ts[0], ts[-1]
        exempt = lo < FLOOR_SEC and hi < HI_MATERIAL
        flag = ("SUPER-LINEAR" if alpha > ALPHA_GATE and not exempt
                else "overhead-bound" if exempt else "ok")
        rows.append((q, ts, alpha, resid, flag))
    rows.sort(key=lambda r: -r[2])
    bad = [r for r in rows if r[4] == "SUPER-LINEAR"]
    gated = [r for r in rows if r[4] != "overhead-bound"]

    sfs = [sf for _, sf in specs]
    totals = [d["value"] for d, _ in specs]
    lines = [
        "# SCALING — 3-point fit (sf%s)" % " / sf".join(str(s) for s in sfs),
        "",
        "Inputs: %s. Exponent = least-squares slope of log t vs log sf over "
        "all three points; 1.0 = linear; gate at %.1f (n log n tolerance). "
        "resid is the RMS log-residual of the fit — small means the three "
        "points actually lie on a power law, large means noise. Queries under "
        "%.2fs at the lowest scale are overhead-bound and exempt unless the "
        "top scale exceeds %.1fs." % (
            ", ".join("%.1fs total @ sf%s" % (t, s) for t, s in zip(totals, sfs)),
            ALPHA_GATE, FLOOR_SEC, HI_MATERIAL),
        "",
        "**Result: %d super-linear outliers / %d gated queries (%d total).**" % (
            len(bad), len(gated), len(rows)),
        "",
        "| query | " + " | ".join("sf%s s" % s for s in sfs) +
        " | exponent | resid | flag |",
        "|---|" + "---|" * (len(sfs) + 3),
    ]
    for q, ts, alpha, resid, flag in rows:
        lines.append("| %s | %s | %.2f | %.3f | %s |" % (
            q, " | ".join("%.3f" % t for t in ts), alpha, resid, flag))
    text = "\n".join(lines) + "\n"
    if out_md:
        open(out_md, "w").write(text)
    else:
        print(text)
    print("super-linear: %d / gated %d / total %d" %
          (len(bad), len(gated), len(rows)), file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
