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

  // ---- reference fallback-parser parity (wikivoyage_xml.py:82-99,171-197) ----

  /** Transliteration of the reference's fallback regex parse + loader field
    * rules, used as the parity oracle: `_parse_wikitext_regex`
    * (`wikivoyage_xml.py:88-98`: `\{\{([^\{\}\|]+)\|([^\}]*)\}\}` with
    * IGNORECASE|DOTALL, `re.split(r"\s*\|\s*")`, dict last-wins) composed
    * with the loader's field fallback chains
    * (`wikivoyage_xml.py:173-197`, Python truthiness). */
  private def referenceParse(title: String, text: String): Seq[Sources.WvListing] = {
    import java.util.regex.Pattern
    val tpl = Pattern.compile("\\{\\{([^\\{\\}\\|]+)\\|([^\\}]*)\\}\\}",
      Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    val floatRx = Pattern.compile("[-+]?\\d+(?:\\.\\d+)?")
    val listingSet = Set("see", "do", "eat", "drink", "sleep", "buy", "listing", "marker")
    def toFloat(s: Option[String]): Option[Double] = s.flatMap { t =>
      val m = floatRx.matcher(t.trim)
      if (m.find()) Some(m.group(0).toDouble) else None
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Sources.WvListing]
    val m = tpl.matcher(text)
    while (m.find()) {
      val tname = m.group(1).trim.toLowerCase
      if (listingSet(tname)) {
        val fields = scala.collection.mutable.HashMap.empty[String, String]
        m.group(2).split("\\s*\\|\\s*", -1).foreach { part =>
          if (part.contains("=")) {
            val kv = part.split("=", 2)
            fields(kv(0).trim.toLowerCase) = kv(1).trim
          }
        }
        def get(keys: String*): Option[String] =
          keys.iterator.flatMap(k => fields.get(k).filter(_.nonEmpty)).nextOption()
        get("name", "alt", "title").foreach { nm =>
          out += Sources.WvListing(title, tname, nm,
            toFloat(fields.get("lat")), toFloat(get("long", "lon")),
            get("address", "addr", "street", "directions"),
            get("content", "description", "desc", "summary", "alt"))
        }
      }
    }
    out.toSeq
  }

  test("parseListings nested-template semantics match the reference fallback") {
    // A nested {{marker}} inside a param: the outer match terminates at the
    // INNER `}}`, the inner params bleed into the outer field map (name
    // last-wins -> "B"), and the inner template is NOT emitted on its own.
    val nested = "{{see|name=A|content=has {{marker|name=B}} tail}}"
    val got = Sources.parseListings("P", nested)
    assert(got == referenceParse("P", nested))
    assert(got.map(_.name) == Seq("B"))
    assert(got.head.content.contains("has {{marker"))

    // A stray single `}` inside params kills the whole match (param group
    // refuses `}`): listing dropped, exactly like the reference.
    val stray = "{{see|name=A}b|lat=1|long=2}}"
    assert(Sources.parseListings("P", stray) == referenceParse("P", stray))
    assert(Sources.parseListings("P", stray).isEmpty)

    // Template names match case-insensitively (re.IGNORECASE + lower()).
    val upper = "{{See|name=X|lat=1|long=2}} {{EAT|name=Y}}"
    assert(Sources.parseListings("P", upper) == referenceParse("P", upper))
    assert(Sources.parseListings("P", upper).map(_.template) == Seq("see", "eat"))

    // Non-listing names (incl. ones with listing-word prefixes) are skipped.
    val other = "{{see also|name=N}} {{infobox|name=M}} {{do|name=Walk}}"
    assert(Sources.parseListings("P", other) == referenceParse("P", other))
    assert(Sources.parseListings("P", other).map(_.name) == Seq("Walk"))

    // Extra braces around a well-formed template still match at the inner
    // opener (the name group refuses `{`).
    val braces = "{{{{see|name=Z|lat=3|long=4}}}}"
    assert(Sources.parseListings("P", braces) == referenceParse("P", braces))
    assert(Sources.parseListings("P", braces).map(_.name) == Seq("Z"))

    // Python-truthiness fallbacks: empty name falls to alt, empty long to
    // lon, content chain to description.
    val fb = "{{sleep|name=|alt=Alt Inn|lat=+48.2|long=|lon=16.3°E|description=d}}"
    assert(Sources.parseListings("P", fb) == referenceParse("P", fb))
    val l = Sources.parseListings("P", fb).head
    assert(l.name == "Alt Inn" && l.lat.contains(48.2) &&
      l.lon.contains(16.3) && l.content.contains("d"))
  }

  test("parseListings property: parity with reference on random nested wikitext") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val tplName = Gen.oneOf("see", "See", "DO", "eat", "drink", "sleep", "buy",
      "listing", "Marker", "infobox", "see also", "flag", "Listing ")
    val key = Gen.oneOf("name", "alt", "title", "lat", "long", "lon",
      "address", "addr", "street", "content", "desc", "summary", "note", "Name")
    val value = Gen.oneOf("", "A", "Café X", "48.2°N", "+16.37", "-3.5 east",
      "no digits", "a=b", "  padded  ", "multi word value", "12")
    val param = Gen.zip(key, value).map { case (k, v) => s"$k=$v" }
    val flatTpl = for {
      n <- tplName
      ps <- Gen.listOfN(4, param)
    } yield s"{{$n|${ps.mkString("|")}}}"
    // values that embed a nested template or stray braces
    val nastyTpl = for {
      n <- tplName
      inner <- flatTpl
      ps <- Gen.listOfN(2, param)
      glue <- Gen.oneOf(s"content=has $inner tail", s"note=brace } here",
        s"content=open {{ only", s"desc=$inner")
    } yield s"{{$n|${ps.mkString("|")}|$glue}}"
    val chunk = Gen.frequency(3 -> flatTpl, 2 -> nastyTpl,
      1 -> Gen.oneOf(" filler text ", "}}", "{{", " {not a template} "))
    val page = Gen.listOf(chunk).map(_.mkString("\n"))
    val prop = Prop.forAll(page) { text =>
      Sources.parseListings("P", text) == referenceParse("P", text)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("parseListingsNested: mwparserfromhell-style recursive semantics") {
    // nested template: BOTH emitted, outer keeps the nested source verbatim
    val nested = "{{see|name=A|content=has {{marker|name=B}} tail}}"
    val got = Sources.parseListingsNested("P", nested)
    assert(got.map(l => (l.template, l.name)) == Seq("see" -> "A", "marker" -> "B"))
    assert(got.head.content.contains("has {{marker|name=B}} tail"))

    // a nested template's `=`/`|` never fragments the outer param list
    val inVal = "{{see|name={{flag|a=b|c}} Cafe|lat=1|long=2}}"
    val v = Sources.parseListingsNested("P", inVal)
    assert(v.map(_.template) == Seq("see")) // flag is not a listing template
    assert(v.head.name == "{{flag|a=b|c}} Cafe" && v.head.lat.contains(1.0))

    // a lone `}` is plain text (fallback drops the listing; mwph keeps it)
    val stray = "{{see|name=A}b|lat=1|long=2}}"
    assert(Sources.parseListingsNested("P", stray).map(_.name) == Seq("A}b"))

    // unclosed outer is text, but its closed inner template still emits
    val unclosed = "{{see|name=Lost {{eat|name=Inner|lat=3|long=4}}"
    assert(Sources.parseListingsNested("P", unclosed)
      .map(l => (l.template, l.name)) == Seq("eat" -> "Inner"))

    // positional params get keys "1","2",... (mwph Template.params)
    val positional = "{{see|Foo|name=X|Bar}}"
    assert(Sources.parseListingsNested("P", positional).map(_.name) == Seq("X"))

    // three levels deep, document order of opening braces
    val deep = "{{see|name=L1|content={{eat|name=L2|content={{buy|name=L3}}}}}}"
    assert(Sources.parseListingsNested("P", deep).map(_.name) == Seq("L1", "L2", "L3"))
  }

  test("parseListingsNested property: agrees with the fallback on flat wikitext") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // On brace-free well-formed templates the two reference paths coincide.
    val tplName = Gen.oneOf("see", "See", "DO", "eat", "sleep", "listing",
      "marker", "infobox", "see also")
    val key = Gen.oneOf("name", "alt", "title", "lat", "long", "lon",
      "address", "content", "desc", "note")
    val value = Gen.oneOf("", "A", "Café X", "48.2°N", "+16.37", "a=b",
      "  padded  ", "multi word value")
    val param = Gen.zip(key, value).map { case (k, v) => s"$k=$v" }
    val flatTpl = for {
      n <- tplName
      ps <- Gen.listOfN(4, param)
    } yield s"{{$n|${ps.mkString("|")}}}"
    val chunk = Gen.frequency(3 -> flatTpl,
      1 -> Gen.oneOf(" filler ", " {not a template} "))
    val page = Gen.listOf(chunk).map(_.mkString("\n"))
    val prop = Prop.forAll(page) { text =>
      Sources.parseListingsNested("P", text) == Sources.parseListings("P", text)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
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

  test("snapshotDiff classifies keys and compares nulls null-safely") {
    val oldS = Seq((1L, Option("a")), (2L, None: Option[String]),
      (3L, Option("c")), (4L, Option("d"))).toDF("k", "v")
    val newS = Seq((1L, Option("a")), (2L, None: Option[String]),
      (3L, Option("x")), (5L, Option("e"))).toDF("k", "v")
    val got = Sources.snapshotDiff(oldS, newS, "k")
      .select("k", "change").as[(Long, String)].collect().toMap
    // null -> null is UNCHANGED (null-safe struct compare), not changed
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "removed", 5L -> "added"))
    // new/old values surface on the change rows
    val row3 = Sources.snapshotDiff(oldS, newS, "k")
      .where(col("k") === 3).select("old_v", "new_v")
      .as[(String, String)].collect().head
    assert(row3 == ("c", "x"))
    // duplicate snapshot keys are rejected, not silently joined
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    intercept[IllegalArgumentException](
      Sources.snapshotDiff(dup, newS, "k"))
  }

  test("scd2Apply: versions chain in ts order, no-ops drop, reverts " +
    "version, backfills re-thread closed intervals without overlap, " +
    "ties order deterministically, nulls compare null-safely") {
    // key 1: open at 0 with v=a; change to b at 10; no-op b at 15;
    //        revert to a at 20 (a REAL new version)
    // key 2: closed row [0,5) then open at 5; no updates
    // key 3: new key arriving at 7, then a null attr at 12 (a change),
    //        then null again at 14 (a no-op — null-safe compare)
    val hist = Seq(
      (1L, Option("a"), 0L, Option.empty[Long]),
      (2L, Option("x"), 0L, Option(5L)),
      (2L, Option("y"), 5L, Option.empty[Long]),
      (4L, Option("p"), 0L, Option(5L)),
      (4L, Option("q"), 5L, Option.empty[Long]),
      (5L, Option("a"), 5L, Option.empty[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val upd = Seq(
      (1L, Option("b"), 10L), (1L, Option("b"), 15L), (1L, Option("a"), 20L),
      (3L, Option("n"), 7L), (3L, Option.empty[String], 12L),
      (3L, Option.empty[String], 14L),
      // backfill INSIDE key 4's closed interval: history re-threads
      // without overlap — p[0,3), r[3,5), q[5,null)
      (4L, Option("r"), 3L),
      // tie at key 5's valid_from: deterministic attr-order tiebreak
      (5L, Option("b"), 5L))
      .toDF("k", "v", "ts")
    val got = Sources.scd2Apply(hist, upd, "k", "ts", Seq("v"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, Some("a"), 0L, Some(10L), false),
      (1L, Some("b"), 10L, Some(20L), false),
      (1L, Some("a"), 20L, None, true),
      (2L, Some("x"), 0L, Some(5L), false),
      (2L, Some("y"), 5L, None, true),
      (3L, Some("n"), 7L, Some(12L), false),
      (3L, None, 12L, None, true),
      (4L, Some("p"), 0L, Some(3L), false),
      (4L, Some("r"), 3L, Some(5L), false),
      (4L, Some("q"), 5L, None, true),
      (5L, Some("a"), 5L, Some(5L), false), // zero-width, deterministic
      (5L, Some("b"), 5L, None, true)), got.toString)
    // the non-overlap invariant holds across every key
    val intervals = Sources.scd2Apply(hist, upd, "k", "ts", Seq("v"))
      .select("k", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect()
      .groupBy(_._1).values
    for (rows <- intervals) {
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(t0)), (_, f1, _)) => assert(t0 == f1)
        case _ =>
      }
      assert(sorted.init.forall(_._3.isDefined) &&
        sorted.last._3.isEmpty)
    }
  }

  test("scd2Apply property: on random histories + updates the output is " +
    "per-key contiguous, non-overlapping, exactly one open row, no " +
    "consecutive equal attrs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val histGen = Gen.listOf(for {
      k <- Gen.choose(1L, 5L)
      v <- Gen.option(Gen.oneOf("a", "b", "c"))
      from <- Gen.choose(0L, 20L)
    } yield (k, v, from)).map { rows =>
      // well-formed history: per key, distinct version starts, the last
      // one open (valid_to values are derived state and ignored anyway)
      rows.groupBy(_._1).values.flatMap { ks =>
        val distinct = ks.distinctBy(_._3).sortBy(_._3)
        distinct.zipWithIndex.map { case ((k, v, f), i) =>
          (k, v, f,
            if (i == distinct.size - 1) Option.empty[Long]
            else Option(distinct(i + 1)._3))
        }
      }.toSeq
    }.suchThat(_.nonEmpty)
    val updGen = Gen.listOf(for {
      k <- Gen.choose(1L, 6L)
      v <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
      ts <- Gen.choose(0L, 25L)
    } yield (k, v, ts)).map(_.distinctBy(r => (r._1, r._3)))
    val prop = Prop.forAll(histGen, updGen) { (h, u) =>
      val out = Sources.scd2Apply(
          h.toDF("k", "v", "valid_from", "valid_to"),
          u.toDF("k", "v", "ts"), "k", "ts", Seq("v"))
        .as[(Long, Option[String], Long, Option[Long], Boolean)]
        .collect()
      out.groupBy(_._1).values.forall { rows =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val contiguous = sorted.sliding(2).forall {
          case Array(a, b) => a._4.contains(b._3)
          case _ => true
        }
        val oneOpen = sorted.count(_._4.isEmpty) == 1 &&
          sorted.last._4.isEmpty
        val flags = sorted.forall(r => r._5 == r._4.isEmpty)
        val noConsecEqual = sorted.sliding(2).forall {
          case Array(a, b) => a._2 != b._2 || a._3 == b._3
          case _ => true
        }
        contiguous && oneOpen && flags && noConsecEqual
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("mergeParquet: never-clobber-with-null upsert semantics") {
    val base = Files.createTempDirectory("graft_merge").toString
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("id", "name", "bal")
      .write.parquet(s"$base/t")
    val updates = Seq(
      (1L, null.asInstanceOf[String], 99.0), // matched: bal updates, name KEPT
      (3L, "carol", 30.0)                    // new key: inserted
    ).toDF("id", "name", "bal")
    val n = Sources.mergeParquet(spark, s"$base/t", updates, "id", s"$base/out")
    assert(n == 3)
    val got = spark.read.parquet(s"$base/out")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "alice", 99.0), (2L, "bob", 20.0),
      (3L, "carol", 30.0)))
    // nondeterministic duplicate update keys are rejected, not last-wins
    val dup = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "name", "bal")
    intercept[IllegalArgumentException](
      Sources.mergeParquet(spark, s"$base/t", dup, "id", s"$base/out2"))
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

  test("deletePropagate rewrites only hit partitions, drops emptied " +
    "ones, leaves others byte-untouched, and is idempotent") {
    val dir = Files.createTempDirectory("graft_delprop").resolve("t").toString
    // partition a: keys 1,2,3; partition b: 4,5; partition c: ONLY 6
    Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("k", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(part: String): Seq[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/p=$part"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getModificationTime).toSeq.sorted
    val bBefore = mtimes("b")
    // delete keys 2 (part of a) and 6 (all of c); b is untouched
    val audit = Sources.deletePropagate(spark, dir, "p", "k",
      Seq(2L, 6L).toDF("k")).as[(Long, Long, Long, Long)].head()
    assert(audit == ((2L, 1L, 1L, 4L)), audit.toString)
    val back = spark.read.parquet(dir).select("k").as[Long]
      .collect().toSet
    assert(back == Set(1L, 3L, 4L, 5L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=c")))
    assert(mtimes("b") == bBefore, "untouched partition was rewritten")
    // idempotent: a second call deletes nothing and rewrites nothing
    val again = Sources.deletePropagate(spark, dir, "p", "k",
      Seq(2L, 6L).toDF("k")).as[(Long, Long, Long, Long)].head()
    assert(again == ((0L, 0L, 0L, 4L)), again.toString)
  }

  test("deletePropagate handles NULL partition values (on disk as " +
    "__HIVE_DEFAULT_PARTITION__): hit rows are rewritten, not silently " +
    "left behind") {
    val dir = Files.createTempDirectory("graft_delprop_null")
      .resolve("t").toString
    // null partition holds keys 1,2; partition a holds 3,4
    Seq((1L, null), (2L, null), (3L, "a"), (4L, "a"))
      .toDF("k", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    // delete key 1 (null partition, partial) and 3 (a, partial)
    val audit = Sources.deletePropagate(spark, dir, "p", "k",
      Seq(1L, 3L).toDF("k")).as[(Long, Long, Long, Long)].head()
    assert(audit == ((2L, 2L, 0L, 2L)), audit.toString)
    val back = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(back == Set(2L, 4L), back.toString)
    // delete the null partition's last survivor: the partition empties
    // and its directory is dropped
    val audit2 = Sources.deletePropagate(spark, dir, "p", "k",
      Seq(2L).toDF("k")).as[(Long, Long, Long, Long)].head()
    assert(audit2 == ((1L, 0L, 1L, 1L)), audit2.toString)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/p=__HIVE_DEFAULT_PARTITION__")))
  }
}
