package graft.operators

import org.apache.spark.sql.Column
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
  *      hex digits of every `%xx` escape
  *   6. query: drop tracking params (`utm_*`, `gclid`, `fbclid`,
  *      `ref`), sort the rest byte-lexicographically, drop the `?`
  *      when nothing survives
  */
object Web {

  private val trackingParam = "^(utm_[a-z]+|gclid|fbclid|ref)="

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
    // %xx hex-uppercasing: split on '%', uppercase the 2 hex chars at
    // the head of every fragment but the first, rejoin — index-aware
    // transform, no regex-callback needed (neither engine has one)
    val parts = split(pathRoot, "%", -1)
    val path = concat_ws("%", transform(parts, (x, i) =>
      when(i === 0, x).otherwise(
        concat(upper(x.substr(lit(1), lit(2))), x.substr(lit(3), length(x))))))

    val params = filter(split(rawQuery, "&", -1),
      x => x =!= "" && !x.rlike(trackingParam))
    val qs = concat_ws("&", array_sort(params))
    concat(scheme, lit("://"), host, portSuf, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Suffixes that take a third label for the registrable domain — a
    * deterministic approximation of the Public Suffix List's dominant
    * rule (`<sld>.<cc>` where sld is a generic second-level). The full
    * PSL would be a broadcast lookup table at this exact spot; the
    * rollup shape (group by a scan-computed key) is identical.
    */
  private val genericSld = Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** Registrable domain of a canonical host: last two labels, or last
    * three when the second-level label is a generic SLD (`bbc.co.uk`).
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.", -1)
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n <= 2, host)
      .when(element_at(labels, -2).isInCollection(genericSld), last3)
      .otherwise(last2)
  }
}
