package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
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

  private val xmlDump =
    """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
      |<siteinfo><sitename>Wikivoyage</sitename></siteinfo>
      |<page>
      |  <title>Vienna</title>
      |  <ns>0</ns>
      |  <revision><text bytes="99">{{see
      || name=Cafe &amp; Bar | lat=48.2 | long=16.37 | content=Nice &lt;b&gt;spot&lt;/b&gt;}}</text></revision>
      |</page>
      |<page>
      |  <title>Wikivoyage:About</title>
      |  <ns>4</ns>
      |  <revision><text>{{see| name=NotMain | lat=1 | long=2}}</text></revision>
      |</page>
      |<page>
      |  <title>Wien</title>
      |  <ns>0</ns>
      |  <redirect title="Vienna"/>
      |  <revision><text>#REDIRECT [[Vienna]]</text></revision>
      |</page>
      |<page>
      |  <title>Graz</title>
      |  <ns>0</ns>
      |  <revision><text>{{listing| name=Uhrturm | lat=47.0735 | long=15.4377 | address=Schlossberg}}
      |{{do | name=Walk}}</text></revision>
      |</page>
      |</mediawiki>""".stripMargin

  /** Golden expectations mirror the reference parse row-for-row
    * (`wikivoyage_xml.py:154-211`): ns!=0 and redirect pages skipped,
    * wikitext entity-unescaped before template extraction. */
  private def assertXmlListings(pages: org.apache.spark.sql.DataFrame): Unit = {
    assert(pages.count() == 4)
    val got = Sources.listingsFromPages(pages).collect()
      .map(l => (l.pageTitle, l.template, l.name, l.lat, l.lon, l.address,
        l.content)).toList.sortBy(t => (t._1, t._3))
    assert(got == List(
      ("Graz", "listing", "Uhrturm", Some(47.0735), Some(15.4377),
        Some("Schlossberg"), None),
      ("Graz", "do", "Walk", None, None, None, None),
      ("Vienna", "see", "Cafe & Bar", Some(48.2), Some(16.37), None,
        Some("Nice <b>spot</b>"))
    ).sortBy(t => (t._1, t._3)))
  }

  test("readXmlPages splits a multi-page dump distributed and unescapes") {
    val dir = Files.createTempDirectory("graft_xml")
    val f = dir.resolve("dump.xml")
    Files.writeString(f, xmlDump)
    assertXmlListings(Sources.readXmlPages(spark, f.toString))
  }

  test("readXmlPages reads .bz2 dumps through the codec layer") {
    val dir = Files.createTempDirectory("graft_xml_bz2")
    val f = new java.io.File(dir.toFile, "dump.xml.bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val os = codec.createOutputStream(new java.io.FileOutputStream(f))
    os.write(xmlDump.getBytes("UTF-8"))
    os.close()
    assertXmlListings(Sources.readXmlPages(spark, f.getAbsolutePath))
  }

  test("xmlUnescape is a single decoding pass (&amp;lt; -> &lt;)") {
    import org.apache.spark.sql.functions._
    val out = Seq(Tuple1("&amp;lt; &lt; &gt; &quot; &apos; &amp;amp;"))
      .toDF("s").select(Sources.xmlUnescape(col("s")).as("u")).as[String].head
    assert(out == "&lt; < > \" ' &amp;")
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

  test("jdbc reads a real database with partitioned parallel scans + pushdown") {
    // embedded Derby stands in for the reference's SQLite: same JDBC wiring
    // a user would point at a real DB
    val dbDir = Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE businesses (id BIGINT, name VARCHAR(64), " +
      "lat DOUBLE, lon DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO businesses VALUES (?,?,?,?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i); ins.setString(2, s"biz$i")
      ins.setDouble(3, 48.0 + i * 0.001); ins.setDouble(4, 16.0)
      ins.executeUpdate()
    }
    conn.close()

    val df = Sources.jdbc(spark, url, "businesses",
      partitioning = Some(("id", 1L, 101L, 4)))
    assert(df.rdd.getNumPartitions == 4) // chunking via range predicates
    assert(df.count() == 100)
    // projection + filter push into the database (the reference hand-wrote
    // its WHERE clauses; here the plan drives them)
    val filtered = df.where(col("id") > 90).select("id", "name")
    assert(filtered.count() == 10)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      scan.take(2000))
  }

  test("parquetWithDirSlug recovers the partition value from the folder name") {
    val root = Files.createTempDirectory("graft_dirslug").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .write.parquet(s"$root/vienna")
    Seq((3L, "c")).toDF("id", "x")
      .write.parquet(s"$root/graz")
    val out = Sources.parquetWithDirSlug(spark, root)
      .select("id", "city_slug").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "vienna"), (2L, "vienna"), (3L, "graz")))
  }

  test("compactParquet rewrites a many-tiny-files layout into few files " +
    "with identical contents") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    // 24 single-row files
    spark.range(24).repartition(24).write.parquet(in)
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inFiles = fs.listStatus(new org.apache.hadoop.fs.Path(in))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(inFiles > 10) // AQE may drop a few empty partitions' files
    val outFiles = Sources.compactParquet(spark, in, out,
      targetFileBytes = 1L * 1024 * 1024)
    assert(outFiles == 1) // 24 tiny files are far below one 1 MB target
    val got = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 24L))
  }

  test("csvWithHeader writes a header-only file for empty frames") {
    val out = Files.createTempDirectory("graft_csv_empty")
      .resolve("links").toString
    val empty = Seq.empty[(String, String, Double)]
      .toDF("a", "b", "name_sim")
    Sources.csvWithHeader(empty, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.toSeq == Seq("a", "b", "name_sim"))
    assert(back.count() == 0)
    // non-empty frames roundtrip normally
    val out2 = Files.createTempDirectory("graft_csv_nonempty")
      .resolve("links").toString
    Sources.csvWithHeader(Seq(("x", "y", 0.9)).toDF("a", "b", "name_sim"), out2)
    val back2 = spark.read.option("header", "true").csv(out2)
    assert(back2.count() == 1 && back2.columns.length == 3)
  }

  test("dirtyFloat parses first float token") {
    assert(Sources.dirtyFloat("48.2°N").contains(48.2))
    assert(Sources.dirtyFloat("-16.37 E").contains(-16.37))
    assert(Sources.dirtyFloat("no digits").isEmpty)
    assert(Sources.dirtyFloat(null).isEmpty)
  }
}
