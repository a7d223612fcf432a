package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String) =
    Html.extract(Seq((1L, html)).toDF("id", "html"), "id", "html").head()

  test("html extract: containers die, nav/footer die by link density, CTA by length") {
    val page =
      """<html><head><title>My Title Words</title>
        |<style>p { margin: 0 }</style>
        |<script>var x = 1 < 2; if (x) { alert("hi"); }</script></head><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<div><p>This is the real article body with plenty of characters in it.</p></div>
        |<p>Buy now!</p>
        |<footer><a href="/p">Privacy policy overview page</a> | <a href="/t">Terms of service agreement</a></footer>
        |</body></html>""".stripMargin
    val r = extract(page)
    val text = r.getAs[String]("text_main")
    assert(text == "This is the real article body with plenty of characters in it.")
    assert(r.getAs[Long]("n_content") == 1L)
    // script/style/title content never leaks into any block
    assert(!text.contains("alert") && !text.contains("margin") &&
      !text.contains("My Title"))
  }

  test("html extract: link-density rule is the integer 3*link <= chars compare") {
    // 2/3 link text -> dropped; 1/4 link text -> kept
    val heavy = "<body><p><a href=\"/x\">" + ("w " * 20).trim +
      "</a> tail words here that do not reach a third</p></body>"
    val light = "<body><p><a href=\"/x\">tiny link</a> " + ("plain " * 12).trim +
      "</p></body>"
    assert(extract(heavy).getAs[Long]("n_content") +
      extract(light).getAs[Long]("n_content") == 1L)
    assert(extract(light).getAs[String]("text_main").startsWith("tiny link plain"))
  }

  test("html extract: whitespace collapses, blocks join with newline, counts are exact") {
    val page = "<body><p>first   block\n with \t messy    spacing padded to length</p>" +
      "<p>second block also long enough to survive the minimum rule</p>" +
      "<p>short</p></body>"
    val r = extract(page)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("n_content") == 2L)
    assert(r.getAs[String]("text_main") ==
      "first block with messy spacing padded to length\n" +
        "second block also long enough to survive the minimum rule")
    assert(r.getAs[Long]("main_chars") ==
      r.getAs[String]("text_main").length.toLong)
  }

  test("html extract: <a>/<link> never match a block-tag prefix; <br/> segments") {
    // '<a ...>' must not be eaten as a block boundary ('a' is no block
    // tag), and self-closing <br/> is one
    val page = "<body><p>alpha beta gamma delta epsilon zeta eta theta iota" +
      "<br/>kappa lambda mu nu xi omicron pi rho sigma tau upsilon</p></body>"
    val r = extract(page)
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("n_content") == 2L)
  }

  test("html extract: pathological pages degrade safely") {
    assert(extract("").getAs[Long]("n_blocks") == 0L)
    assert(extract("no tags at all but still a long enough plain line of text")
      .getAs[Long]("n_content") == 1L)
    // unclosed script: the container kill needs a closing tag, so the
    // body degrades to visible text (tag-strip still eats the open tag)
    val unclosed = extract("<script>never closed so everything after is suspect")
    assert(unclosed.getAs[String]("text_main") ==
      "never closed so everything after is suspect")
  }
}
