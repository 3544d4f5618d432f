package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkTestBase

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("parseListings extracts templates, handles lon alias + dirty floats") {
    val text =
      """Intro text.
        |{{see|name=Stephansdom|lat=48.2085|long=16.3721|content=Gothic cathedral}}
        |{{eat|name=Figlmüller|lat=48.2°N|lon=16.37|address=Wollzeile 5}}
        |{{listing|name=|lat=1|long=2}}
        |{{infobox|name=NotAListing}}
        |""".stripMargin
    val ls = Sources.parseListings("Vienna", text)
    assert(ls.map(_.name) == Seq("Stephansdom", "Figlmüller"))
    assert(ls.head.lat.contains(48.2085))
    assert(ls.head.content.contains("Gothic cathedral"))
    assert(ls(1).lat.contains(48.2))   // dirty "48.2°N"
    assert(ls(1).lon.contains(16.37))  // lon alias
    assert(ls(1).address.contains("Wollzeile 5"))
  }

  test("listingsFromPages skips non-main namespaces and redirects") {
    val pages = Seq(
      ("Vienna", 0, null.asInstanceOf[java.lang.Boolean],
        "{{see|name=Stephansdom|lat=48.2|long=16.4}}"),
      ("Talk:Vienna", 1, null.asInstanceOf[java.lang.Boolean],
        "{{see|name=ShouldSkip|lat=1|long=2}}"),
      ("Wien", 0, java.lang.Boolean.TRUE,
        "{{see|name=RedirectSkip|lat=1|long=2}}")
    ).toDF("title", "ns", "redirect", "text")
    val out = Sources.listingsFromPages(pages).collect()
    assert(out.map(_.name).toSeq == Seq("Stephansdom"))
  }

  test("CSV repair fixes broken quote-comma and CR, then parses") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "reviews.csv")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.print("listing_id,id,comments\r\n")
    w.print("10,1,\"nice stay\"\r\n")
    w.print("11,2,\"broken quote\" ,\r\n") // the '" ,' pattern
    w.close()
    val schema = new StructType()
      .add("listing_id", LongType).add("id", LongType).add("comments", StringType)
    val out = Sources.repairedCsv(spark, f.getAbsolutePath, schema)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((10L, "nice stay"), (11L, "broken quote")))
  }

  test("jsonl drops malformed lines") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "rows.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"a": 1, "b": "x"}""")
    w.println("""not json at all""")
    w.println("""{"a": 2, "b": "y"}""")
    w.close()
    val schema = new StructType().add("a", LongType).add("b", StringType)
    val out = Sources.jsonl(spark, f.getAbsolutePath, Some(schema))
      .na.drop("all").collect()
    assert(out.length == 2)
  }

  test("dirtyFloat parses first float token") {
    assert(Sources.dirtyFloat("48.2°N").contains(48.2))
    assert(Sources.dirtyFloat("-16.37 E").contains(-16.37))
    assert(Sources.dirtyFloat("no digits").isEmpty)
    assert(Sources.dirtyFloat(null).isEmpty)
  }
}
