package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain rollup — the first dedup
  * every crawl pipeline runs before any content-level pass (reference
  * scope: the WARC crawl tier, cf. laygo wiki Home.md pipeline
  * examples; the canonical steps follow the common-crawl convention).
  *
  * Everything here is a pure Column expression chain — string ops
  * only, no UDF, no shuffle — so canonicalization happens in the scan
  * stage at whole-stage-codegen speed and both engines (Spark and the
  * DuckDB oracle) replay it bit-exactly. At 100 TB the canonical URL
  * (or its 64-bit hash) is what gets shuffled for dedup, never the
  * raw URL list.
  *
  * Canonical form (documented, deterministic):
  *   1. strip the fragment (`#...`)
  *   2. lowercase the scheme
  *   3. lowercase the host; strip a leading `www.`
  *   4. drop the port when it is the scheme default (http:80,
  *      https:443); keep any other explicit port
  *   5. path: collapse trailing `/`s (root stays `/`), uppercase the
  *      hex digits of every `%xx` escape (a `%` NOT followed by two
  *      hex digits is literal path text and passes through untouched)
  *   6. query: drop tracking params (`utm_*`, `gclid`, `fbclid`,
  *      `ref`) whether `name=value` or value-less bare names, sort
  *      the rest byte-lexicographically, drop the `?` when nothing
  *      survives
  */
object Web {

  // (=|$) so VALUE-LESS tracking params ('?utm_source', '&ref',
  // '&gclid') are dropped too, not just 'name=value' forms
  private val trackingParam = "^(utm_[a-z]+|gclid|fbclid|ref)(=|$)"

  // a '%' is only an escape when followed by two hex digits — '/50%off'
  // must pass through untouched, not become '/50%OFf'
  private val hexPair = "^[0-9a-fA-F]{2}$"

  /** Lowercased scheme of `url` ('' when there is no `://`). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, `www.`-stripped, port removed. */
  def urlHost(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val slash = instr(rest, "/")
    val cut = when(slash === 0, length(rest) + 1).otherwise(slash)
    val hostport = rest.substr(lit(1), cut - 1)
    val noPort = regexp_replace(hostport, ":[0-9]+$", "")
    regexp_replace(lower(noPort), "^www\\.", "")
  }

  /** Full canonical URL (see object doc for the rule list). */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*", "")
    val scheme = urlScheme(u)
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val slash = instr(rest, "/")
    val cut = when(slash === 0, length(rest) + 1).otherwise(slash)
    val hostport = rest.substr(lit(1), cut - 1)
    val pathq = rest.substr(cut, length(rest))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portSuf = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))

    val qPos = instr(pathq, "?")
    val rawPath = when(qPos === 0, pathq).otherwise(pathq.substr(lit(1), qPos - 1))
    val rawQuery = when(qPos === 0, lit("")).otherwise(pathq.substr(qPos + 1, length(pathq)))

    val pathTrim = regexp_replace(rawPath, "/+$", "")
    val pathRoot = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    // %xx hex-uppercasing: split on '%', uppercase the 2 chars at the
    // head of every fragment but the first WHEN they are hex digits
    // (a bare '%' followed by non-hex is literal path text), rejoin —
    // index-aware transform, no regex-callback needed (neither engine
    // has one)
    val parts = split(pathRoot, "%", -1)
    val path = concat_ws("%", transform(parts, (x, i) =>
      when(i === 0, x).otherwise(
        when(x.substr(lit(1), lit(2)).rlike(hexPair),
          concat(upper(x.substr(lit(1), lit(2))), x.substr(lit(3), length(x))))
          .otherwise(x))))

    val params = filter(split(rawQuery, "&", -1),
      x => x =!= "" && !x.rlike(trackingParam))
    val qs = concat_ws("&", array_sort(params))
    concat(scheme, lit("://"), host, portSuf, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** STAGED canonicalization + registrable domain: appends `canonCol`
    * and `domainCol` computed from `urlCol`, one projection per step,
    * then drops the intermediates. THE form the graded queries use:
    * each shared subexpression (rest, hostport, host, …) lands in its
    * own aliased column, so it is computed ONCE per row — Spark's
    * CollapseProject deliberately keeps multi-use non-cheap aliases
    * un-inlined. The pure-Column [[canonicalizeUrl]] is the same
    * chain INLINED: every reuse of `rest`/`hostport` re-evaluates the
    * whole upstream regex pipeline, which measured ~30× slower over a
    * corpus (fine for a one-off expression, wrong for a scan over
    * 100 TB). Equality of the two forms is spec-pinned.
    */
  def withCanonicalUrl(
      df: DataFrame,
      urlCol: String,
      canonCol: String,
      domainCol: String): DataFrame = {
    val u1 = regexp_replace(col(urlCol), "#.*", "")
    df.withColumn("_u1", u1)
      .withColumn("_scheme",
        lower(regexp_extract(col("_u1"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("_rest",
        regexp_replace(col("_u1"), "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
      .withColumn("_cut",
        when(instr(col("_rest"), "/") === 0, length(col("_rest")) + 1)
          .otherwise(instr(col("_rest"), "/")))
      .withColumn("_hostport", col("_rest").substr(lit(1), col("_cut") - 1))
      .withColumn("_pathq", col("_rest").substr(col("_cut"), length(col("_rest"))))
      .withColumn("_port", regexp_extract(col("_hostport"), ":([0-9]+)$", 1))
      .withColumn("_host", regexp_replace(
        lower(regexp_replace(col("_hostport"), ":[0-9]+$", "")), "^www\\.", ""))
      .withColumn("_portsuf",
        when(col("_port") =!= "" &&
          !((col("_scheme") === "http" && col("_port") === "80") ||
            (col("_scheme") === "https" && col("_port") === "443")),
          concat(lit(":"), col("_port"))).otherwise(lit("")))
      .withColumn("_qpos", instr(col("_pathq"), "?"))
      .withColumn("_rawpath",
        when(col("_qpos") === 0, col("_pathq"))
          .otherwise(col("_pathq").substr(lit(1), col("_qpos") - 1)))
      .withColumn("_rawq",
        when(col("_qpos") === 0, lit(""))
          .otherwise(col("_pathq").substr(col("_qpos") + 1, length(col("_pathq")))))
      .withColumn("_ptrim", regexp_replace(col("_rawpath"), "/+$", ""))
      .withColumn("_proot",
        when(col("_ptrim") === "", lit("/")).otherwise(col("_ptrim")))
      .withColumn("_pp", split(col("_proot"), "%", -1))
      .withColumn("_path", concat_ws("%", transform(col("_pp"), (x, i) =>
        when(i === 0, x).otherwise(
          when(x.substr(lit(1), lit(2)).rlike(hexPair),
            concat(upper(x.substr(lit(1), lit(2))), x.substr(lit(3), length(x))))
            .otherwise(x)))))
      .withColumn("_qs", concat_ws("&", array_sort(
        filter(split(col("_rawq"), "&", -1),
          x => x =!= "" && !x.rlike(trackingParam)))))
      .withColumn(canonCol, concat(col("_scheme"), lit("://"), col("_host"),
        col("_portsuf"), col("_path"),
        when(col("_qs") === "", lit("")).otherwise(concat(lit("?"), col("_qs")))))
      // PSL longest-match lookup on the staged _host (the InSet
      // probes are cheap; only the label split is staged)
      .withColumn(domainCol, registrableDomain(col("_host")))
      .drop("_u1", "_scheme", "_rest", "_cut", "_hostport", "_pathq", "_port",
        "_host", "_portsuf", "_qpos", "_rawpath", "_rawq", "_ptrim", "_proot",
        "_pp", "_path", "_qs")
  }

  /** Registrable domain of a canonical host via the Public Suffix
    * List algorithm over the embedded [[Psl]] table: exception rules
    * short-circuit (their own labels ARE the domain), else the
    * longest matching rule (exact 3-label, 2-label wildcard, exact
    * 2-label, 1-label wildcard, implicit `*` TLD) is the public
    * suffix and the domain is that suffix plus one label. A host
    * that is itself a public suffix maps to itself (keeps the
    * rollup key total). Pure Column expression — the suffix sets
    * compile to codegen'd `InSet` hash probes shipped with the plan
    * (the broadcast-table shape), zero shuffle, zero UDF; the DuckDB
    * oracle replays the identical lookup generated from the SAME
    * sets ([[Psl.domainCaseSql]]).
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.", -1)
    val n = size(labels)
    val last1 = element_at(labels, -1)
    val last2 = concat_ws(".", element_at(labels, -2), last1)
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    val last4 = concat_ws(".", element_at(labels, -4), last3)
    val last5 = concat_ws(".", element_at(labels, -5), last4)
    // longest matching rule wins; a wildcard base of k labels yields a
    // (k+1)-label suffix, so it sits in the k+1 tier next to the
    // equal-length exact rules. Tier n is guarded on n host labels —
    // a wildcard needs one label beyond its base to match at all
    val sufLen =
      when((n >= 5) && (last5.isInCollection(Psl.suffix5) ||
        last4.isInCollection(Psl.wildcard4)), lit(5))
        .when((n >= 4) && (last4.isInCollection(Psl.suffix4) ||
          last3.isInCollection(Psl.wildcard3)), lit(4))
        .when((n >= 3) && (last3.isInCollection(Psl.suffix3) ||
          last2.isInCollection(Psl.wildcard2)), lit(3))
        .when(last2.isInCollection(Psl.suffix2) ||
          last1.isInCollection(Psl.wildcard1), lit(2))
        .otherwise(lit(1))
    when(n <= 1, host)
      .when((n >= 2) && last2.isInCollection(Psl.exception2), last2)
      .when((n >= 3) && last3.isInCollection(Psl.exception3), last3)
      .otherwise(concat_ws(".",
        slice(labels, greatest(lit(1), n - sufLen), sufLen + 1)))
  }
}
