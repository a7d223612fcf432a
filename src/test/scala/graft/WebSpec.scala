package graft

import org.apache.spark.sql.functions._
import graft.operators.Web

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Web.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: each documented rule, hand-checked") {
    assert(canon("HTTP://WWW.Example.COM:80/a#frag") == Seq("http://example.com/a"))
    assert(canon("https://example.com:443/a") == Seq("https://example.com/a"))
    // non-default and cross-scheme ports are kept
    assert(canon("http://example.com:8080/a") == Seq("http://example.com:8080/a"))
    assert(canon("https://example.com:80/a") == Seq("https://example.com:80/a"))
    // tracking params drop, survivors sort, '?' drops when empty
    assert(canon("http://e.com/p?b=2&utm_source=x&a=1") == Seq("http://e.com/p?a=1&b=2"))
    assert(canon("http://e.com/p?utm_campaign=c&gclid=g&fbclid=f&ref=r")
      == Seq("http://e.com/p"))
    // %xx hex uppercased, trailing slashes collapse, root path restored
    assert(canon("http://e.com/a%2fb%a/") == Seq("http://e.com/a%2Fb%A"))
    assert(canon("http://e.com///") == Seq("http://e.com/"))
    assert(canon("http://e.com") == Seq("http://e.com/"))
  }

  test("canonicalizeUrl is idempotent on already-canonical urls") {
    val messy = Seq(
      "HTTP://WWW.A.CO.UK:80/x%2f/?utm_source=s&b=1&a=2#f",
      "https://B.com:443/Docs/%aa?gclid=1",
      "http://c.net:9090/", "https://www.d.org")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once, s"not idempotent: $once -> ${canon(once: _*)}")
  }

  test("withCanonicalUrl (staged) equals the Column-expression form on messy urls") {
    val messy = Seq(
      "HTTP://WWW.A.CO.UK:80/x%2f/?utm_source=s&b=1&a=2#f",
      "https://B.com:443/Docs/%aa?gclid=1&z=9",
      "http://c.net:9090//deep//", "https://www.d.org",
      "http://e.com/p?b=2&utm_source=x&a=1#Top")
    val df = messy.toDF("u")
    val staged = Web.withCanonicalUrl(df, "u", "c", "d")
      .select(col("c"), col("d")).collect().map(r => (r.getString(0), r.getString(1)))
    val exprForm = df.select(
      Web.canonicalizeUrl(col("u")).as("c"),
      Web.registrableDomain(Web.urlHost(Web.canonicalizeUrl(col("u")))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(staged.toSeq == exprForm.toSeq,
      s"staged ${staged.toSeq} != expression ${exprForm.toSeq}")
  }

  test("registrableDomain: generic-SLD hosts take three labels") {
    val hosts = Seq("news.bbc.co.uk", "a.b.example.com", "example.com",
      "localhost", "x.gov.au", "deep.sub.tree.org")
    val got = hosts.toDF("h")
      .select(Web.registrableDomain(col("h"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("bbc.co.uk", "example.com", "example.com",
      "localhost", "x.gov.au", "tree.org"))
  }
}
