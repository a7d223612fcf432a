#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/operators/PslData.scala from the
OS-shipped Public Suffix List (publicsuffix.org — public,
volunteer-maintained data; Debian ships it at
/usr/share/publicsuffix/public_suffix_list.dat).

Rule taxonomy emitted (PSL wire format, https://publicsuffix.org/list/):
  - exact rules, bucketed by label count 2..5
    (1-label exact rules are DROPPED: a 1-label match ties the
    implicit `*` default rule, so they can never change the
    longest-match outcome)
  - wildcard rules `*.base`, bucketed by BASE label count 1..4
  - exception rules `!rule`, bucketed by label count 2..3

The generator asserts the bucket bounds so a future list refresh that
introduces e.g. a 6-label exact rule or a 4-label exception fails the
build loudly instead of silently mis-matching.

Non-ASCII (IDN) rules are emitted in BOTH forms: the list's Unicode
form AND the IDNA/punycode (xn--) form, because crawl hosts normally
arrive punycode-encoded — a Unicode-only table silently falls every
IDN registry back to the implicit `*` rule (ADVICE r16). Per-label
ToASCII, so each added form lands in the same label-count bucket as
its source rule; ASCII rules are unaffected.

Usage: python3 tools/gen_psl.py [src.dat] [out.scala]
"""
import encodings.idna as _idna
import idna
import sys
from collections import defaultdict

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/usr/share/publicsuffix/public_suffix_list.dat"
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    "src/main/scala/graft/operators/PslData.scala"

CHUNK = 300  # entries per private def (keeps every method far under 64KB)


def scala_escape(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if 32 <= o < 127 and ch not in ('"', '\\'):
            out.append(ch)
        elif o <= 0xFFFF:
            out.append("\\u%04x" % o)
        else:  # UTF-16 surrogate pair (Scala string escapes are code units)
            o -= 0x10000
            out.append("\\u%04x\\u%04x" % (0xD800 + (o >> 10),
                                           0xDC00 + (o & 0x3FF)))
    return '"' + "".join(out) + '"'


def _puny_label(l: str) -> str:
    """One label's wire (xn--) form. UTS46 (the `idna` package) is the
    encoding real crawl hosts arrive in — IDNA2003 (encodings.idna)
    diverges on sharp-s, final sigma, ZWJ/ZWNJ (ADVICE r17). Prefer
    UTS46; where BOTH encoders succeed they must AGREE, so a future
    list refresh that introduces a divergent label fails loudly here
    instead of silently shipping a twin that misses wire-format hosts.
    """
    a = idna.encode(l, uts46=True).decode("ascii")
    try:
        b = _idna.ToASCII(l).decode("ascii")
    except (UnicodeError, ValueError):
        b = None
    if b is not None and a != b:
        raise AssertionError(
            "UTS46/IDNA2003 divergence on label %r: %s vs %s "
            "(decide which form the matcher should ship)" % (l, a, b))
    return a


def puny(rule: str):
    """Wire (UTS46/punycode) form of a rule, or None when the rule is
    already all-ASCII or a label refuses to encode (the rule then
    ships Unicode-only, same as before)."""
    if all(ord(c) < 128 for c in rule):
        return None
    try:
        labs = [l if all(ord(c) < 128 for c in l)
                else _puny_label(l)
                for l in rule.split(".")]
        return ".".join(labs)
    except (idna.IDNAError, UnicodeError, ValueError):
        return None


def main():
    exact = defaultdict(list)
    wild = defaultdict(list)
    exc = defaultdict(list)
    n_exact1 = 0
    n_puny = 0

    def add(bucket, rule):
        nonlocal n_puny
        n = rule.count(".") + 1
        bucket[n].append(rule)
        p = puny(rule)
        if p is not None:
            bucket[n].append(p)  # same label count by construction
            n_puny += 1

    for raw in open(SRC, encoding="utf-8"):
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            add(exc, line[1:])
        elif line.startswith("*."):
            add(wild, line[2:])
        else:
            n = line.count(".") + 1
            if n == 1:
                # ties the implicit default; dropped (in either form —
                # a 1-label punycode twin would tie it just the same)
                n_exact1 += 1
            else:
                add(exact, line)
    assert set(exact) <= {2, 3, 4, 5}, f"exact label counts {set(exact)}"
    assert set(wild) <= {1, 2, 3, 4}, f"wildcard base counts {set(wild)}"
    assert set(exc) <= {2, 3}, f"exception label counts {set(exc)}"

    defs, vals = [], []

    def emit(name, entries):
        entries = sorted(set(entries))
        parts = []
        for ci in range(0, max(len(entries), 1), CHUNK):
            chunk = entries[ci:ci + CHUNK]
            dn = f"{name}_{ci // CHUNK}"
            parts.append(dn)
            body = ",\n    ".join(scala_escape(e) for e in chunk)
            defs.append(
                f"  private def {dn}: Seq[String] = Seq(\n    {body})\n")
        concat = " ++ ".join(parts) if parts else "Seq.empty[String]"
        vals.append(f"  val {name}: Seq[String] = {concat}\n")
        return len(entries)

    counts = {}
    for n in (2, 3, 4, 5):
        counts[f"exact{n}"] = emit(f"exact{n}", exact.get(n, []))
    for n in (1, 2, 3, 4):
        counts[f"wildcard{n}"] = emit(f"wildcard{n}", wild.get(n, []))
    for n in (2, 3):
        counts[f"exception{n}"] = emit(f"exception{n}", exc.get(n, []))

    stats = ", ".join(f"{k}={v}" for k, v in counts.items())
    header = f'''package graft.operators

/** GENERATED — do not edit. `python3 tools/gen_psl.py` regenerates
  * this file from the OS-shipped Public Suffix List
  * (publicsuffix.org — public, volunteer-maintained DATA; the
  * matching ALGORITHM lives in [[Psl]]/[[Web.registrableDomain]] and
  * is implemented from the published spec). Swapping in a newer list
  * is exactly this regeneration: a data refresh, not a code change.
  *
  * Buckets ({stats}; 1-label exact rules dropped — they tie the
  * implicit `*` default and can never change the longest match).
  * Non-ASCII (IDN) rules appear in BOTH their Unicode and their
  * IDNA/punycode (xn--) forms so punycode crawl hosts match the IDN
  * registries instead of falling back to the implicit `*` rule.
  * Entries are sorted and deduplicated so the generated SQL and the
  * broadcast sets are deterministic across regenerations.
  */
object PslData {{
'''
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(header)
        f.write("\n")
        for d in defs:
            f.write(d + "\n")
        for v in vals:
            f.write(v + "\n")
        f.write("}\n")
    print(f"wrote {OUT}: {stats} (dropped {n_exact1} 1-label exact rules; "
          f"added {n_puny} punycode twins for IDN rules)")


if __name__ == "__main__":
    main()
