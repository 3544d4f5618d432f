package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pinned golden behavior for [[TextAnalysis.htmlExtract]] — each case is
  * a hand-derived expectation, so a regex or heuristic change that shifts
  * the extraction contract fails here before it reaches the oracle gate. */
class HtmlExtractSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String, minLen: Int = 25): String =
    Seq(html).toDF("h")
      .select(TextAnalysis.htmlExtract(col("h"), minLen).as("t"))
      .as[String].head()

  test("keeps long low-link blocks, joins with newlines in order") {
    val html =
      "<html><body>" +
        "<p>the first paragraph carries enough characters to pass</p>" +
        "<p>and the second paragraph also clears the length bar</p>" +
        "</body></html>"
    assert(extract(html) ==
      "the first paragraph carries enough characters to pass\n" +
        "and the second paragraph also clears the length bar")
  }

  test("drops nav by link density and chrome by length") {
    val html =
      "<html><head><title>Site</title></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/a\">about the company</a></nav>" +
        "<h1>Tiny</h1>" +
        "<p>actual article body text that is plainly long enough</p>" +
        "<footer>copyright</footer></body></html>"
    assert(extract(html) ==
      "actual article body text that is plainly long enough")
  }

  test("link density is 2*linkLen < textLen on canonicalized text") {
    // text len 38, anchor text len 32 -> 64 < 38 is false -> dropped
    val ad = "<div><a href=\"/b\">buy now before the offer expires</a> today</div>"
    assert(extract(ad) == "")
    // same block with enough surrounding prose survives
    val ok = "<div><a href=\"/b\">one link</a> but mostly ordinary running prose " +
      "that dilutes the anchor well below half</div>"
    assert(extract(ok) ==
      "one link but mostly ordinary running prose that dilutes the anchor " +
        "well below half")
  }

  test("script/style/comment content never leaks, even with nested tags") {
    val html =
      "<body><script>if (a < b) { x(\"<div>not text</div>\"); }</script>" +
        "<style>p > em { color: red }</style>" +
        "<!-- hidden <p>comment paragraph that is long enough</p> -->" +
        "<p>visible paragraph content that is long enough to keep</p></body>"
    assert(extract(html) ==
      "visible paragraph content that is long enough to keep")
  }

  test("entity decode: nbsp collapses, amp decodes LAST") {
    val html = "<p>ten&nbsp;&nbsp;green bottles &amp; a wall, plus &amp;lt; stays literal</p>"
    assert(extract(html) ==
      "ten green bottles & a wall, plus &lt; stays literal")
  }

  test("whitespace collapses across inline tags and newlines") {
    val html = "<p>spread   over\n\n lines with <em>inline</em>\t<b>tags</b> kept inline</p>"
    assert(extract(html) ==
      "spread over lines with inline tags kept inline")
    // vertical tab (U+000B) is IN the pinned class — Java \s has it,
    // RE2 \s does not, so the spec spells the class out on both engines
    assert(extract("<p>vertical\u000Btab collapses like other whitespace</p>") ==
      "vertical tab collapses like other whitespace")
  }

  test("empty extraction is the empty string, not null") {
    assert(extract("<p>too short</p>") == "")
    assert(extract("") == "")
  }

  test("minLen is a parameter") {
    assert(extract("<p>nine char</p>", minLen = 5) == "nine char")
  }

  test("property: total on tag soup — never null, every kept line is " +
    "trimmed, run-free, and at least minLen chars") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // adversarial fragments: unclosed tags, orphan entities, raw
    // angle brackets, comment/script openers with no closer, unicode
    val fragment = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("<p>", "</p>", "<div", ">", "<", "&amp;", "&nbsp;", "&",
        "<script>", "</script>", "<style>", "<!--", "-->", "<a href=x>",
        "</a>", "", "\t", "\n", "é🙂", "<br/>", "<P >", "</ p>"),
      Gen.listOfN(3, Gen.choose(Char.MinValue, Char.MaxValue))
        .map(_.mkString).map(_.replaceAll("\\p{Cs}", "x")))
    val soup = Gen.listOf(fragment).map(_.mkString)
    val prop = Prop.forAll(Gen.listOf(soup)) { htmls =>
      val out = htmls.toDF("h")
        .select(TextAnalysis.htmlExtract(col("h"), 10).as("t"),
          TextAnalysis.htmlExtract(col("h"), 10).as("t2"))
        .as[(String, String)].collect()
      out.length == htmls.length && out.forall { case (t, t2) =>
        t != null && t == t2 &&
          t.split("\n", -1).filter(_.nonEmpty).forall { line =>
            // NOT java trim(): the pinned collapse class is exactly
            // [ \t\n\r\f\x0B] — other control chars are content
            line.length >= 10 &&
              !line.startsWith(" ") && !line.endsWith(" ") &&
              !line.exists(c => c == '\t' || c == '\u000B' || c == '\f' ||
                c == '\r') && !line.contains("  ")
          }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
