package graft.operators

/** The COMPLETE Public Suffix List (publicsuffix.org) embedded as data
  * — the broadcast lookup table behind [[Web.registrableDomain]]. The
  * PSL is public, volunteer-maintained data; [[PslData]] is generated
  * verbatim from the OS-shipped copy by `tools/gen_psl.py` (ICANN +
  * private sections, ~8k non-redundant rules), so refreshing the list
  * is a regeneration, not a code change — the r15 "representative
  * subset" made that claim; this proves it. The matcher only reads
  * these Seqs: at 8k entries they still ship inside the plan as
  * codegen'd `InSet` hash lookups — O(1) per row, zero shuffle,
  * exactly the "broadcast suffix table" shape (PlanAuditSpec pins
  * the InSet plan shape at full-list size).
  *
  * Matching algorithm (PSL spec, publicsuffix.org/list/): a rule
  * matches when its labels are a suffix of the host's labels; an
  * exception rule beats all others (its own labels are the
  * registrable domain); otherwise the LONGEST matching rule is the
  * public suffix and the registrable domain is that suffix plus one
  * more label; a host with no matching rule uses the implicit `*`
  * rule (the bare TLD is the suffix — which is also why 1-label
  * exact rules are dropped at generation: they tie the default). A
  * host that IS a public suffix has no registrable domain — this
  * engine returns the host itself (documented convention, keeps the
  * rollup key total).
  *
  * IDN rules are embedded in BOTH forms — the list's Unicode form
  * and the IDNA/punycode (xn--) form the generator derives — so
  * punycode crawl hosts (the normal wire encoding) match their IDN
  * registry rules instead of silently falling back to the implicit
  * `*` rule (ADVICE r16). Hosts are expected lowercase (the
  * canonicalizer's output); no IDNA mapping happens at match time.
  */
object Psl {

  /** Exact rules by label count (`co.uk`-class registries, private
    * hosting suffixes, AWS/GOV service trees up to 5 labels).
    */
  val suffix2: Seq[String] = PslData.exact2
  val suffix3: Seq[String] = PslData.exact3
  val suffix4: Seq[String] = PslData.exact4
  val suffix5: Seq[String] = PslData.exact5

  /** Wildcard rule BASES by base label count: every next label under
    * a base is itself a public suffix (`*.ck`, `*.kawasaki.jp`,
    * `*.compute.amazonaws.com`, ...).
    */
  val wildcard1: Seq[String] = PslData.wildcard1
  val wildcard2: Seq[String] = PslData.wildcard2
  val wildcard3: Seq[String] = PslData.wildcard3
  val wildcard4: Seq[String] = PslData.wildcard4

  /** Exception rules (`!rule`): the rule's own labels ARE the
    * registrable domain, overriding any wildcard that would otherwise
    * swallow them (`!www.ck`, the `!city.*.jp` designated cities).
    */
  val exception2: Seq[String] = PslData.exception2
  val exception3: Seq[String] = PslData.exception3

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString(", ")

  private def lastN(hl: String, n: Int): String =
    (n to 1 by -1).map(i => s"$hl[-$i]").mkString(" || '.' || ")

  /** The same longest-match + wildcard + exception lookup as a DuckDB
    * CASE over `hl` (the host's label list) and `host` — generated
    * from the SAME Seqs the Spark side probes, so the two engines
    * cannot drift (a list refresh regenerates both sides at once).
    * The inner CASE yields the matched public-suffix label count
    * (longest rule first, wildcard base length + 1 alongside the
    * equal-length exact tier); the outer CASE applies exception
    * short-circuits and slices the last (sufLen+1) labels.
    */
  def domainCaseSql(hl: String, host: String): String = {
    val sufTiers = Seq(
      5 -> (s"(${lastN(hl, 5)}) IN (${sqlList(suffix5)})"
        + s" OR (${lastN(hl, 4)}) IN (${sqlList(wildcard4)})"),
      4 -> (s"(${lastN(hl, 4)}) IN (${sqlList(suffix4)})"
        + s" OR (${lastN(hl, 3)}) IN (${sqlList(wildcard3)})"),
      3 -> (s"(${lastN(hl, 3)}) IN (${sqlList(suffix3)})"
        + s" OR (${lastN(hl, 2)}) IN (${sqlList(wildcard2)})"),
      2 -> (s"(${lastN(hl, 2)}) IN (${sqlList(suffix2)})"
        + s" OR $hl[-1] IN (${sqlList(wildcard1)})"))
    val sufCase = sufTiers.map { case (n, cond) =>
      s"WHEN len($hl) >= $n AND ($cond) THEN $n"
    }.mkString("\n            ", "\n            ", "\n            ELSE 1 END")
    s"""CASE
        WHEN len($hl) <= 1 THEN $host
        WHEN len($hl) >= 2 AND (${lastN(hl, 2)})
          IN (${sqlList(exception2)}) THEN ${lastN(hl, 2)}
        WHEN len($hl) >= 3 AND (${lastN(hl, 3)})
          IN (${sqlList(exception3)})
          THEN ${lastN(hl, 3)}
        ELSE array_to_string(
          $hl[greatest(1, len($hl) - (CASE$sufCase)) : len($hl)], '.')
        END"""
  }
}
