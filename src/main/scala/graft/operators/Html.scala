package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the step between the WARC fetch tier
  * and line/near-dup dedup in every crawl corpus build (C4, Gopher,
  * RefinedWeb all run a variant; reference scope: the crawl pipeline
  * examples in the laygo wiki Home.md). jusText/C4-style block
  * scoring, reduced to two deterministic rules both engines replay
  * bit-exactly:
  *
  *   1. kill non-content containers outright: `<script>`, `<style>`,
  *      `<title>` bodies are removed before any text is read
  *   2. segment on block-level tags, then keep a block iff
  *        - its tag-stripped, whitespace-collapsed text has
  *          >= `minChars` characters (C4's short-line rule), and
  *        - its link-text share is <= 1/3 (jusText's link-density
  *          rule, integer form `3*link_chars <= text_chars` so both
  *          engines compare exactly)
  *
  * Navigation bars and footers die by link density, button/caption
  * fragments by length — no tag whitelist, so the rules transfer to
  * arbitrary markup.
  *
  * Scale shape: one projection, zero shuffle, zero UDF — the whole
  * extraction is row-local regex + array Column work that runs inside
  * the scan stage at whole-stage-codegen speed, exactly where a
  * 100 TB crawl wants it (extraction output, not raw HTML, is what
  * downstream dedup shuffles). Regex subset is Java∩RE2 (no
  * backreferences, no lookaround) so the DuckDB oracle replays the
  * identical patterns.
  */
object Html {

  /** Block-level tag boundary. `(\s[^>]*)?/?>` requires the tag name
    * to end at whitespace, `/` or `>`, so `<a>`/`<link>` never match
    * a `li`/`p` prefix.
    */
  private val blockTag =
    "(?i)</?(p|div|h[1-6]|ul|ol|li|table|tr|td|nav|header|footer|article|section|br|body|html|head)(\\s[^>]*)?/?>"

  private def killContainer(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", " ")

  private def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** Appends `n_blocks`, `n_content`, `main_chars`, `text_main`
    * extracted from `htmlCol`. STAGED via withColumn (each regex pass
    * lands in its own aliased column, computed once per row — the
    * Web.withCanonicalUrl lesson); the per-block scoring runs inside
    * one array `transform`.
    */
  def extract(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minChars: Int = 30): DataFrame = {
    df.withColumn("_h1", killContainer(col(htmlCol), "script"))
      .withColumn("_h2", killContainer(col("_h1"), "style"))
      .withColumn("_h3", killContainer(col("_h2"), "title"))
      .withColumn("_h4", regexp_replace(col("_h3"), blockTag, "\u0001"))
      .withColumn("_bl", split(col("_h4"), "\u0001", -1))
      .withColumn("_st", transform(col("_bl"), b => {
        val links = regexp_extract_all(b,
          lit("(?is)<a(\\s[^>]*)?>(.*?)</a>"), lit(2))
        val txt = cleanText(b)
        struct(
          txt.as("t"),
          length(txt).as("n"),
          length(cleanText(array_join(links, " "))).as("l"))
      }))
      .withColumn("n_blocks",
        size(filter(col("_st"), s => s.getField("n") > 0)).cast("long"))
      .withColumn("_ct", filter(col("_st"), s =>
        s.getField("n") >= minChars &&
          s.getField("l") * 3 <= s.getField("n")))
      .withColumn("n_content", size(col("_ct")).cast("long"))
      .withColumn("text_main",
        concat_ws("\n", transform(col("_ct"), s => s.getField("t"))))
      .withColumn("main_chars", length(col("text_main")).cast("long"))
      .drop("_h1", "_h2", "_h3", "_h4", "_bl", "_st", "_ct")
  }
}
