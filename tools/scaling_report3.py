#!/usr/bin/env python3
"""Per-query scaling exponents from THREE bench snapshots.

Two exponents per query (VERDICT r9 item 1):

  * fitted   — least-squares slope of log t vs log sf over all three
    points. Robust to one noisy endpoint, but at sf0.1–sf1 most queries
    are dominated by ~0.1–1s fixed cost, so the fit DILUTES the only
    segment that measures variable cost.
  * marginal — log(t_hi/t_mid) / log(sf_hi/sf_mid) over the top two
    points only. This is the segment where variable cost dominates and
    is therefore THE gate: a query whose marginal exponent exceeds the
    gate while its top-scale time is material is flagged MARGINAL until
    an isolated-JVM re-measurement adjudicates it (the shared-JVM bench
    chain inflates heavy-memory queries via GC/pass interactions).

Usage:
    scaling_report3.py lo.json:0.1 mid.json:1 hi.json:3 [out_md] [adjudications.json]

adjudications.json maps query -> {"iso_mid": sec, "iso_hi": sec,
"note": "..."} from isolated `runMain graft.RunOne` re-measurements;
the isolated marginal exponent then replaces the in-bench one for the
gate, and the note lands in the table. A flagged query with no
adjudication keeps the MARGINAL flag — the report refuses to average
it away.
"""
import json
import math
import sys

FLOOR_SEC = 0.35    # below this at the LOW point, fixed overhead dominates
HI_MATERIAL = 8.0   # ...unless the HIGH-SF time grew past this
ALPHA_GATE = 1.2    # n log n tolerance (fitted exponent)
MARGINAL_GATE = 1.2 # gate on the top-segment exponent
MARGINAL_FLOOR = 2.0  # top-scale seconds below which the marginal gate is moot
EPS = 1e-3          # clamp for zero-rounded timings (log would abort)


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
        if ":" not in arg or not arg.rsplit(":", 1)[1].replace(".", "").isdigit():
            break
        path, sf = arg.rsplit(":", 1)
        specs.append((json.load(open(path)), float(sf)))
    rest = sys.argv[1 + len(specs):]
    out_md = rest[0] if rest else None
    adj = json.load(open(rest[1])) if len(rest) > 1 else {}
    assert len(specs) >= 3, "need three bench.json:sf arguments"
    specs.sort(key=lambda p: p[1])
    names = set(specs[0][0]["queries"])
    for d, _ in specs[1:]:
        names &= set(d["queries"])
    sfs = [sf for _, sf in specs]
    seg = math.log(sfs[-1] / sfs[-2])
    rows = []
    for q in names:
        ts = [max(d["queries"][q], EPS) for d, _ in specs]
        xs = [math.log(sf) for _, sf in specs]
        ys = [math.log(t) for t in ts]
        alpha, resid = fit(xs, ys)
        marg = math.log(ts[-1] / ts[-2]) / seg
        lo, hi = ts[0], ts[-1]
        a = adj.get(q)
        iso_marg = (math.log(max(a["iso_hi"], EPS) / max(a["iso_mid"], EPS)) / seg
                    if a and "iso_mid" in a and "iso_hi" in a else None)
        note = a.get("note", "") if a else ""
        exempt = lo < FLOOR_SEC and hi < HI_MATERIAL
        # gate on the effective (adjudicated if available) marginal exponent
        eff_marg = iso_marg if iso_marg is not None else marg
        eff_hi = max(a["iso_hi"], EPS) if iso_marg is not None else hi
        if a and a.get("resolved"):
            # adjudicated with cause recorded (e.g. output-bound growth
            # proven by exact candidate/output counts) — the note is
            # the evidence, the flag records that someone looked
            flag = "adjudicated"
        elif alpha > ALPHA_GATE and not exempt:
            flag = "SUPER-LINEAR"
        elif eff_marg > MARGINAL_GATE and eff_hi > MARGINAL_FLOOR:
            flag = "MARGINAL"
        elif exempt:
            flag = "overhead-bound"
        else:
            flag = "ok"
        rows.append((q, ts, alpha, marg, iso_marg, resid, flag, note))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))
    bad = [r for r in rows if r[6] in ("SUPER-LINEAR", "MARGINAL")]
    gated = [r for r in rows if r[6] != "overhead-bound"]

    totals = [d["value"] for d, _ in specs]
    lines = [
        "# SCALING — 3-point fit + top-segment marginal (sf%s)" %
        " / sf".join(str(s) for s in sfs),
        "",
        "Inputs: %s." % ", ".join(
            "%.1fs total @ sf%s" % (t, s) for t, s in zip(totals, sfs)),
        "",
        "Two exponents per query: **fitted** = least-squares slope of log t "
        "vs log sf over all three points (robust to one noisy endpoint, but "
        "diluted by the fixed-overhead-dominated low end); **marginal** = "
        "the top-segment slope log(t_sf%s/t_sf%s)/log(%s/%s) — the segment "
        "where variable cost dominates, and therefore THE gate. A query "
        "with marginal > %.1f and top-scale > %.1fs is flagged MARGINAL "
        "until an isolated-JVM RunOne re-measurement adjudicates it; the "
        "iso-marginal column is that adjudicated exponent (shared-JVM "
        "GC/pass interactions inflate heavy-memory queries, so in-bench "
        "spikes are re-measured before being believed). Queries under "
        "%.2fs at the lowest scale are overhead-bound and exempt unless "
        "the top scale exceeds %.1fs." % (
            sfs[-1], sfs[-2], sfs[-1], sfs[-2],
            MARGINAL_GATE, MARGINAL_FLOOR, FLOOR_SEC, HI_MATERIAL),
        "",
        "**Result: %d unadjudicated outliers (super-linear or marginal) / "
        "%d gated queries (%d total).**" % (len(bad), len(gated), len(rows)),
        "",
        "| query | " + " | ".join("sf%s s" % s for s in sfs) +
        " | fitted | marginal | iso-marginal | resid | flag | note |",
        "|---|" + "---|" * (len(sfs) + 5),
    ]
    for q, ts, alpha, marg, iso, resid, flag, note in rows:
        lines.append("| %s | %s | %.2f | %.2f | %s | %.3f | %s | %s |" % (
            q, " | ".join("%.3f" % t for t in ts), alpha, marg,
            "%.2f" % iso if iso is not None else "", resid, flag, note))
    # ---- exact-count evidence (observe() metrics) --------------------
    # Candidate counts published by the LSH channels: their growth
    # exponent is the linearity PROOF the wall-clock fit can only
    # suggest. A count exponent is immune to GC/co-tenant noise.
    obs = [d.get("queries_observed", {}) for d, _ in specs]
    cnames = set(obs[0]) if obs[0] else set()
    for o in obs[1:]:
        cnames &= set(o)
    crows = []
    for qn in sorted(cnames):
        metrics = set(obs[0][qn])
        for o in obs[1:]:
            metrics &= set(o[qn])
        series = {m: [max(int(o[qn][m]), 1) for o in obs] for m in metrics}
        for mname in sorted(metrics):
            cs = series[mname]
            cmarg = math.log(cs[-1] / cs[-2]) / seg
            cfit, _ = fit([math.log(sf) for _, sf in specs],
                          [math.log(cv) for cv in cs])
            if cmarg <= MARGINAL_GATE:
                cflag = "linear-ok"
            elif mname.startswith("cand_"):
                # candidates can never be fewer than the true pairs
                # they carry: if the VERIFIED-pair series grows at
                # least as fast, the growth is the corpus's own pair
                # mass (output-bound), not bucket degradation —
                # precision (verify/cand) staying flat is the proof
                vname = "verify_" + mname[len("cand_"):]
                vs = series.get(vname)
                vmarg = (math.log(vs[-1] / vs[-2]) / seg) if vs else None
                cflag = ("output-driven (precision %.1f%% at top scale)" %
                         (100.0 * vs[-1] / cs[-1])
                         if vmarg is not None and vmarg >= cmarg - 0.15
                         else "COUNT-SUPER-LINEAR")
            elif mname.startswith("verify_"):
                # unique TRUE pairs — growth here is the dataset's own
                # near-dup mass; the time-side adjudication records it
                cflag = "output-growth"
            else:
                cflag = "COUNT-SUPER-LINEAR"
            crows.append((qn, mname, cs, cfit, cmarg, cflag))
    if crows:
        cbad = [r for r in crows if r[5] == "COUNT-SUPER-LINEAR"]
        lines += [
            "",
            "## Candidate-count evidence (exact observe() counts)",
            "",
            "Counts recorded by the operators themselves (CollectMetrics "
            "over the candidate flow — opt-in via SPARK_GRAFT_OBSERVE=1, "
            "this chain had it on; bench.json `queries_observed`). The "
            "LSH design claim — candidates ≈ nTables·n·targetBucketRows/2, "
            "LINEAR in n plus the corpus's own true-pair mass — is graded "
            "here by exact integers. A candidate series that grows faster "
            "than linear but no faster than its VERIFIED-pair series is "
            "output-driven (precision flat: the bucketing isn't degrading, "
            "the data holds more real near-dups at scale): "
            "**%d of %d count series super-linear beyond output growth.**"
            % (len(cbad), len(crows)),
            "",
            "| query | metric | " + " | ".join("sf%s" % s for s in sfs) +
            " | fitted | marginal | flag |",
            "|---|---|" + "---|" * (len(sfs) + 3),
        ]
        for qn, mname, cs, cfit, cmarg, cflag in crows:
            lines.append("| %s | %s | %s | %.2f | %.2f | %s |" % (
                qn, mname, " | ".join(str(cv) for cv in cs), cfit, cmarg, cflag))

    text = "\n".join(lines) + "\n"
    if out_md:
        open(out_md, "w").write(text)
    else:
        print(text)
    print("outliers: %d / gated %d / total %d" %
          (len(bad), len(gated), len(rows)), file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
