package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source readers: schema-forced CSV, CSV repair pre-pass, JSONL, and the
  * wikitext listing extractor (SURVEY §2.1 S4-S9).
  */
object Sources {

  /** Schema-forced CSV scan with required-column validation
    * (reference `etl/airbnb/staging.py:16-47`). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          required: Seq[String] = Nil): DataFrame = {
    val df = spark.read.option("header", "true").schema(schema).csv(path)
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: $missing")
    df
  }

  /** The per-line CSV repair itself (reference
    * `etl/airbnb/reviews_jsonl.py:44-57`): rewrite `'" ,'` -> `'",'` and
    * strip a trailing CR. */
  def repairCsvValue(c: Column): Column =
    regexp_replace(regexp_replace(c, "\r$", ""), "\" ,", "\",")

  /** CSV repair pre-pass for the reference's broken Airbnb quoting,
    * line by line, fully distributed (spark.read.text + regexp, no
    * driver-side temp file). */
  def repairedCsvLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("value", repairCsvValue(col("value")))

  /** Parse repaired lines with from_csv against an explicit schema. */
  def repairedCsv(spark: SparkSession, path: String,
                  schema: StructType): DataFrame = {
    val ddl = schema.toDDL
    val header = schema.fieldNames.mkString(",")
    repairedCsvLines(spark, path)
      .where(col("value") =!= header)
      .select(from_csv(col("value"), schema,
        Map("mode" -> "PERMISSIVE")).as("r"))
      .select(col("r.*"))
  }

  /** S1-S3: JDBC table scan with partitioned parallel reads — the
    * Spark-native replacement for the reference's SQLite cursor loop with
    * manual 100k-row chunking (`etl/sources/yelp_sqlite.py:5-33`,
    * `etl/reviews_jsonl.py:75-77`). `partitioning = (column, lower, upper,
    * n)` splits the scan into n range predicates executed in parallel;
    * projection and filter pushdown into the database are automatic
    * (DataSource JDBC pushdown), like the reference's hand-written WHERE
    * clauses but driven by the query plan. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitioning: Option[(String, Long, Long, Int)] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val part = partitioning.fold(base) { case (column, lower, upper, n) =>
      base.option("partitionColumn", column)
        .option("lowerBound", lower).option("upperBound", upper)
        .option("numPartitions", n)
    }
    options.foldLeft(part) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** K3 export discipline: CSV with header, emitting a header-only file
    * when the frame is empty — the reference writes the header
    * unconditionally (`etl/er.py:317-327`) but Spark's csv writer emits
    * nothing for empty partitions, which breaks downstream LOAD CSV
    * consumers expecting the schema line. */
  def csvWithHeader(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    if (df.isEmpty) {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path, "part-00000-header.csv")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      out.write((df.columns.mkString(",") + "\n").getBytes("UTF-8"))
      out.close()
    }
  }

  /** S8 fallback layout: per-directory parquet files where the partition
    * value lives only in the FOLDER NAME (`<root>/<slug>/data.parquet`,
    * deliberately non-Hive — reference `etl/er.py:253-291`,
    * `etl/staging.py:68-77`). The slug is recovered per row from
    * `input_file_name()`; reading stays one distributed scan over the glob
    * (no per-directory loop). */
  def parquetWithDirSlug(spark: SparkSession, root: String,
                         slugCol: String = "city_slug"): DataFrame =
    spark.read.parquet(s"$root/*/*.parquet")
      .withColumn(slugCol,
        regexp_extract(input_file_name(), "/([^/]+)/[^/]+$", 1))

  /** JSONL scan with malformed-line drop (reference
    * `scripts/run_airbnb.py:116-122`). */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "DROPMALFORMED")
    schema.map(r.schema).getOrElse(r).json(path)
  }

  // ---------------------------------------------------- S4: XML page ingest

  /** XML entity unescape for the five predefined entities, as a column
    * chain. `&amp;` is decoded LAST so literal text like `&amp;lt;`
    * round-trips to `&lt;` (one decoding pass, like an XML parser). */
  def xmlUnescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&apos;", "'"),
      "&amp;", "&")

  /** Split a MediaWiki dump into one raw segment per `<page>` element,
    * fully distributed: `spark.read.text` with lineSep `</page>` lets the
    * text source split the file at arbitrary byte offsets (and `.bz2`
    * dumps decompress through the codec layer), so no single task ever
    * holds the whole dump — the Spark-native equivalent of the reference's
    * lxml `iterparse` + element eviction
    * (`/root/reference/etl/sources/wikivoyage_xml.py:28-55`). */
  def xmlPageSegments(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</page>").text(path)

  /** Parse raw page segments into pages(title, ns, redirect, text).
    * Segments without a `<page>` element (the siteinfo header / trailing
    * footer) are dropped; fields are regex-extracted and entity-unescaped
    * (wikitext arrives XML-escaped inside `<text>`). A missing `<ns>`
    * counts as 0 and a self-closed/missing `<text>` as "", mirroring
    * `wikivoyage_xml.py:154-169`. */
  def pagesFromSegments(segments: DataFrame): DataFrame = {
    val v = col("value")
    segments
      .where(v.contains("<page>"))
      .select(
        xmlUnescape(regexp_extract(v, "(?s)<title>(.*?)</title>", 1)).as("title"),
        coalesce(regexp_extract(v, "<ns>(-?\\d+)</ns>", 1).cast("int"), lit(0))
          .as("ns"),
        v.contains("<redirect").as("redirect"),
        // a self-closed <text/> has no closing tag, so the match fails and
        // the extract yields "" — no lookbehind needed (the oracle's RE2
        // engine has none)
        xmlUnescape(regexp_extract(v, "(?s)<text[^>]*>(.*?)</text>", 1))
          .as("text"))
  }

  /** End-to-end S4 entry: dump file -> pages DataFrame. */
  def readXmlPages(spark: SparkSession, path: String): DataFrame =
    pagesFromSegments(xmlPageSegments(spark, path))

  /** A parsed Wikivoyage-style listing (reference
    * `etl/sources/wikivoyage_xml.py:171-211`). */
  case class WvListing(pageTitle: String, template: String, name: String,
                       lat: Option[Double], lon: Option[Double],
                       address: Option[String], content: Option[String])

  /** Byte-for-byte the reference fallback regex
    * (`wikivoyage_xml.py:88`: `\{\{([^\{\}\|]+)\|([^\}]*)\}\}`). The
    * param group REFUSES `}`, so a stray single `}` inside params kills
    * the whole match (listing dropped), and a nested `{{inner|...}}`
    * template terminates the outer match at the INNER `}}` — the inner
    * params bleed into the outer field map and the inner template is
    * never emitted on its own. Property-tested against a transliteration
    * of the reference algorithm in `SourcesSpec`. The name group accepts
    * any case; filtering happens after lowercase, like the reference's
    * `strip().lower() in LISTING_TEMPLATES` (`wikivoyage_xml.py:89-91`). */
  private val TemplateRe = """(?s)\{\{([^{}|]+)\|([^}]*)\}\}""".r
  private val ListingTemplates =
    Set("see", "do", "eat", "drink", "sleep", "buy", "listing", "marker")
  private val FloatRe = """-?\d+(?:\.\d+)?""".r

  /** First float-looking token in a dirty string, e.g. "48.2°N"
    * (reference `wikivoyage_xml.py:58-69`). */
  def dirtyFloat(s: String): Option[Double] =
    Option(s).flatMap(v => FloatRe.findFirstIn(v)).map(_.toDouble)

  /** Column form of [[dirtyFloat]]: pure regexp_extract + cast, identical
    * match semantics, null when no float-looking token exists. */
  def dirtyFloatCol(c: Column): Column = {
    val m = regexp_extract(c, "-?\\d+(\\.\\d+)?", 0)
    when(m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** Extract listing templates from one page's wikitext: 1 page -> N rows
    * (the UDTF shape, SURVEY §2.11). Pure JVM kernel; wrap with flatMap.
    *
    * Field semantics mirror the reference extraction + loader
    * (`wikivoyage_xml.py:92-98,171-197`): duplicate keys last-wins (dict
    * assignment), name falls back name→alt→title, lon prefers `long` over
    * `lon`, address falls back address→addr→street→directions, content
    * takes the first non-blank of content→description→desc→summary→alt —
    * all with Python truthiness, so an EMPTY value falls through to the
    * next key in the chain. Rows without lat/lon are KEPT here (that
    * filter is the loader's, `wikivoyage_xml.py:176-177`, applied by
    * callers that need reference-loader parity). */
  def parseListings(pageTitle: String, text: String): Seq[WvListing] = {
    if (text == null) return Seq.empty
    TemplateRe.findAllMatchIn(text).flatMap { m =>
      val template = m.group(1).trim.toLowerCase
      if (!ListingTemplates(template)) None
      else {
        val kv = m.group(2).split("\\|", -1).iterator.flatMap { part =>
          part.split("=", 2) match {
            case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
            case _ => None
          }
        }.toMap // Iterator.toMap: later duplicates overwrite, like dict assignment
        listingFromFields(pageTitle, template, kv)
      }
    }.toSeq
  }

  /** The loader's field fallback chains (`wikivoyage_xml.py:171-197`),
    * shared by both parse paths. */
  private def listingFromFields(pageTitle: String, template: String,
                                kv: Map[String, String]): Option[WvListing] = {
    def first(keys: String*): Option[String] =
      keys.iterator.flatMap(k => kv.get(k).filter(_.nonEmpty)).nextOption()
    first("name", "alt", "title").map { name =>
      WvListing(pageTitle, template, name,
        kv.get("lat").flatMap(dirtyFloat),
        first("long", "lon").flatMap(dirtyFloat),
        first("address", "addr", "street", "directions"),
        first("content", "description", "desc", "summary", "alt"))
    }
  }

  /** The reference's PRIMARY wikitext path, re-derived: mwparserfromhell's
    * recursive template walk (`wikivoyage_xml.py:102-115`,
    * `filter_templates(recursive=True)`), where [[parseListings]] is its
    * regex FALLBACK. Differences that matter:
    *
    *   - a template nested inside a param value is emitted AS ITS OWN
    *     listing and the outer param keeps the nested source text verbatim
    *     (the fallback bleeds the inner params into the outer map and
    *     drops the inner template);
    *   - params split on TOP-LEVEL `|` only and key/value on the first
    *     top-level `=`, so nested `{{…|…=…}}` text never fragments the
    *     outer param list;
    *   - a lone `}` inside a value is plain text (the fallback's param
    *     group refuses `}` and drops the whole listing);
    *   - an unclosed `{{` is plain text, but closed templates nested
    *     under it still emit (same as mwparserfromhell);
    *   - unnamed params get positional keys "1", "2", … like
    *     mwparserfromhell `Template.params`.
    *
    * Templates are emitted in document order of their OPENING braces.
    * `{{{…}}}` parameter nodes are out of scope (never used by listing
    * markup); a brace-run prefix simply fails the template-name filter. */
  def parseListingsNested(pageTitle: String, text: String): Seq[WvListing] = {
    if (text == null) return Seq.empty
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val open = scala.collection.mutable.Stack.empty[Int]
    var i = 0
    val n = text.length
    while (i < n) {
      if (i + 1 < n && text.charAt(i) == '{' && text.charAt(i + 1) == '{') {
        open.push(i); i += 2
      } else if (i + 1 < n && text.charAt(i) == '}' && text.charAt(i + 1) == '}'
                 && open.nonEmpty) {
        val start = open.pop()
        found += ((start, text.substring(start + 2, i)))
        i += 2
      } else i += 1
    }
    // stack leftovers are unclosed `{{` -> plain text, not emitted
    found.sortBy(_._1).iterator.flatMap { case (_, body) =>
      val segs = splitTopLevel(body, '|')
      val template = segs.head.trim.toLowerCase
      if (!ListingTemplates(template)) None
      else {
        var pos = 0
        var kv = Map.empty[String, String]
        segs.tail.foreach { part =>
          val eq = topLevelIndexOf(part, '=')
          if (eq >= 0)
            kv += part.substring(0, eq).trim.toLowerCase -> part.substring(eq + 1).trim
          else { pos += 1; kv += pos.toString -> part.trim }
        }
        listingFromFields(pageTitle, template, kv)
      }
    }.toSeq
  }

  /** Split on `sep` at brace depth 0 (nested `{{…}}` stays intact). */
  private def splitTopLevel(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s.charAt(i) == '{' && s.charAt(i + 1) == '{') {
        depth += 1; cur.append("{{"); i += 2
      } else if (i + 1 < s.length && s.charAt(i) == '}' && s.charAt(i + 1) == '}'
                 && depth > 0) {
        depth -= 1; cur.append("}}"); i += 2
      } else if (s.charAt(i) == sep && depth == 0) {
        out += cur.result(); cur.clear(); i += 1
      } else { cur.append(s.charAt(i)); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** First index of `c` at brace depth 0, or -1. */
  private def topLevelIndexOf(s: String, c: Char): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s.charAt(i) == '{' && s.charAt(i + 1) == '{') {
        depth += 1; i += 2
      } else if (i + 1 < s.length && s.charAt(i) == '}' && s.charAt(i + 1) == '}'
                 && depth > 0) {
        depth -= 1; i += 2
      } else if (s.charAt(i) == c && depth == 0) return i
      else i += 1
    }
    -1
  }

  /** Dataset-level wrapper: pages(title, ns, redirect, text) -> listings.
    * Skips non-main-namespace and redirect pages
    * (reference `wikivoyage_xml.py:154-169`). `nested = true` selects the
    * mwparserfromhell-equivalent recursive kernel (the reference's primary
    * path); default is the regex-fallback kernel. */
  def listingsFromPages(pages: DataFrame,
                        nested: Boolean = false): Dataset[WvListing] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val kernel: (String, String) => Seq[WvListing] =
      if (nested) parseListingsNested else parseListings
    pages
      .where(coalesce(col("ns"), lit(0)) === 0)
      .where(col("redirect").isNull || !col("redirect"))
      .select(col("title"), col("text")).as[(String, String)]
      .flatMap { case (title, text) => kernel(title, text) }
  }

  /** Copy-on-write MERGE (upsert) into a parquet dataset — the batch
    * analogue of the reference's Cypher `MERGE … ON MATCH SET x =
    * coalesce(new.x, old.x)` upserts (`neo4j_cypher/02_load_cities
    * .cypher:27-38`, `03_load_places_and_canonical.cypher:13-14`), i.e.
    * the SURVEY §2 G5 extension point. Semantics per key:
    *
    *   - matched: every column takes `coalesce(update, existing)` — the
    *     reference's never-clobber-with-null discipline;
    *   - update-only keys: inserted as-is;
    *   - target-only keys: carried unchanged.
    *
    * One full-outer shuffle join on the key; writes a NEW directory
    * (copy-on-write — atomic swap is the caller's/catalog's concern, as
    * with [[compactParquet]]). Updates must be unique per key (pre-
    * aggregate them first); enforced because a duplicate silently winning
    * by join order would be nondeterministic.
    * Returns the merged row count. */
  def mergeParquet(spark: SparkSession, targetDir: String, updates: DataFrame,
                   keyCol: String, outDir: String): Long = {
    val target = spark.read.parquet(targetDir)
    require(updates.columns.sameElements(target.columns),
      s"update schema ${updates.columns.mkString(",")} must match target " +
        s"${target.columns.mkString(",")}")
    val dupKeys = updates.groupBy(col(keyCol)).count().where(col("count") > 1)
    require(dupKeys.isEmpty, "updates contain duplicate keys")
    val t = target.alias("t")
    val u = updates.alias("u")
    val merged = t.join(u, t(keyCol) === u(keyCol), "full_outer")
      .select(target.columns.map(c => coalesce(u(c), t(c)).as(c)).toSeq: _*)
    merged.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Snapshot diff (CDC extraction): classify every key across two
    * snapshot frames of the same schema as `added` / `removed` /
    * `changed` / `unchanged` — the change-data-capture companion to
    * [[mergeParquet]] (MERGE applies a delta; this RECOVERS the delta
    * between two full snapshots, e.g. for incremental downstream
    * refresh or audit). One full-outer shuffle join on the key; the
    * row-equality check compares the non-key columns as a struct, so
    * any column count works and nulls compare positionally (null-safe).
    * Keys must be unique per snapshot (same discipline as MERGE).
    * @param checkUnique when true (default), eagerly asserts key
    *        uniqueness on both snapshots — two extra aggregate scans.
    *        Pass false at scale when uniqueness is already guaranteed by
    *        the writer (e.g. both snapshots are MERGE outputs, whose key
    *        discipline is enforced on write): the diff itself never
    *        needs the check, it only guards against garbage-in.
    * @return (keyCol, change) plus both sides' non-key columns
    *         prefixed old_/new_ */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, checkUnique: Boolean = true): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      "snapshots must share a schema")
    val others = oldSnap.columns.filterNot(_ == keyCol).toSeq
    def unique(df: DataFrame) =
      df.groupBy(col(keyCol)).count().where(col("count") > 1).isEmpty
    require(!checkUnique || (unique(oldSnap) && unique(newSnap)),
      "snapshot keys must be unique")
    // string-qualified refs: both snapshots usually share lineage (one
    // derived from the other), so df("col") hits the ambiguous-self-join
    // guard — alias-path resolution doesn't
    val oc = (c: String) => col(s"__diff_o.$c")
    val nc = (c: String) => col(s"__diff_n.$c")
    val oStruct = struct(others.map(oc): _*)
    val nStruct = struct(others.map(nc): _*)
    oldSnap.alias("__diff_o")
      .join(newSnap.alias("__diff_n"), oc(keyCol) === nc(keyCol),
        "full_outer")
      .select(
        coalesce(nc(keyCol), oc(keyCol)).as(keyCol) +:
        when(oc(keyCol).isNull, "added")
          .when(nc(keyCol).isNull, "removed")
          .when(oStruct <=> nStruct, "unchanged")
          .otherwise("changed").as("change") +:
        (others.map(c => oc(c).as(s"old_$c")) ++
          others.map(c => nc(c).as(s"new_$c"))): _*)
  }

  /** SCD Type-2 apply — the warehouse dimension-history operator
    * completing the MERGE family ([[mergeParquet]] overwrites in place,
    * [[snapshotDiff]] reports what changed; SCD2 KEEPS every version):
    * given the dimension history (`valid_from`/`valid_to`, null
    * `valid_to` = the open row) and an update batch (key, attrs, event
    * ts), emit the new history — each key's prevailing row closes at
    * the first differing update's ts, chained updates version in ts
    * order, and updates equal to the prevailing attrs are no-ops.
    *
    * Shape: EVERY history row re-enters as a pseudo-update at its own
    * valid_from and the whole per-key timeline rebuilds in one window
    * pass (lag drops no-ops — null-safe struct compare — then lead sets
    * the interval ends). Rebuilding closed rows too is what makes
    * backfilled updates (ts inside an already-closed interval) re-thread
    * history as-if replayed WITHOUT overlapping intervals — the
    * invariant a pass-through of closed rows would violate. Consequence:
    * input `valid_to` values are derived state and are ignored
    * (intervals are contiguous per key; explicit gaps/deletes are
    * outside this operator's contract). Nothing touches the driver; the
    * shuffle is one hash partition by key.
    *
    * Determinism: ties on (key, ts) — e.g. an update stamped exactly at
    * a version's valid_from — order by the attr struct ascending, so
    * the output is a pure function of the input SET. Attr columns may
    * be null (ordered/compared null-safely).
    *
    * @return (key, attrs..., valid_from, valid_to, is_current). */
  def scd2Apply(history: DataFrame, updates: DataFrame, keyCol: String,
                tsCol: String, attrCols: Seq[String]): DataFrame = {
    val outCols = (keyCol +: attrCols) ++
      Seq("valid_from", "valid_to", "is_current")
    val hist = history.select(col(keyCol) +: attrCols.map(col) :+
      col("valid_from").as("__ts"): _*)
    val upd = updates.select(col(keyCol) +: attrCols.map(col) :+
      col(tsCol).as("__ts"): _*)
    val attrs = struct(attrCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("__ts") +: attrCols.map(col): _*)
    hist.unionByName(upd)
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(outCols.map(col): _*)
  }

  /** Small-files compaction: rewrite a parquet dataset into files of
    * roughly `targetFileBytes` each. Streaming sinks and fine-grained
    * partitioned writes accumulate thousands of tiny files whose per-file
    * open cost dominates scans and whose single row groups cap scan
    * parallelism (see SCALE.md); periodic compaction is part of operating
    * any 100 TB parquet layout. Sizing comes from the source file listing
    * (no data pass); the rewrite is one round-robin repartition. Writes to
    * a NEW directory — atomic swap is the caller's (catalog's) concern.
    * Returns the output file count. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) /
      targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Right-to-be-forgotten deletion against a PARTITIONED parquet
    * table, rewriting ONLY the partitions that contain deleted keys —
    * at 100 TB the difference between touching a handful of partitions
    * and rewriting the table. Three phases:
    *
    *  1. one column-pruned pass over (key, partition) finds the hit
    *     partitions and per-partition delete counts (partition-count-
    *     sized driver traffic — the k-means model rule);
    *  2. survivors of ONLY those partitions are localCheckpoint-
    *     materialized (the write targets the same location it read —
    *     an unmaterialized plan would re-scan files mid-overwrite),
    *     then written with dynamic partition overwrite scoped to this
    *     writer;
    *  3. partitions whose every row was deleted produce no survivor
    *     rows, which dynamic overwrite would silently LEAVE in place —
    *     those directories are dropped explicitly.
    *
    * @return 1-row audit (n_deleted, n_parts_rewritten, n_parts_dropped,
    *         n_rows_after) — n_rows_after re-read from disk, not derived */
  def deletePropagate(spark: SparkSession, path: String, partCol: String,
                      keyCol: String, deleteKeys: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = deleteKeys.select(col(keyCol)).distinct()
    val table = spark.read.parquet(path)
    // partition DIRECTORIES come from the hit rows' actual file paths
    // (input_file_name), never from rendering the partition value —
    // value.toString does not match Spark's path rendering for every
    // type (timestamps), and a mis-rendered path would silently no-op
    // the one operator whose contract is that the bytes are gone
    val hitStats = table.select(col(keyCol), col(partCol),
        input_file_name().as("__f"))
      .join(keys, Seq(keyCol), "left_semi")
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_del"),
        collect_set(expr("regexp_replace(__f, '/[^/]*$', '')"))
          .as("__dirs"))
      .collect()
    val totals = table.groupBy(col(partCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val nDeleted = hitStats.map(_.getLong(1)).sum
    val emptiedRows = hitStats
      .filter(r => totals(r.get(0)) == r.getLong(1))
    val emptied = emptiedRows.map(_.get(0))
    val rewrite = hitStats.map(_.get(0)).filterNot(emptied.contains)
    if (rewrite.nonEmpty) {
      // a NULL partition value (on disk as __HIVE_DEFAULT_PARTITION__,
      // read back as null) never matches isin() — without the explicit
      // isNull disjunct its rows would be silently left on disk while
      // the audit still counted them deleted
      val (nullHits, nonNullRewrite) = rewrite.partition(_ == null)
      val inSet =
        if (nonNullRewrite.isEmpty) lit(false)
        else col(partCol).isin(nonNullRewrite: _*)
      val hit = if (nullHits.isEmpty) inSet else inSet || col(partCol).isNull
      val survivors = table.where(hit)
        .join(keys, Seq(keyCol), "left_anti")
        .localCheckpoint(true)
      survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(path)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a failed delete must FAIL the operator — these directories came
    // from real file paths, so "didn't exist" is not a pass
    emptiedRows.foreach { r =>
      r.getSeq[String](2).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        require(fs.delete(p, true),
          s"failed to drop emptied partition dir $p")
      }
    }
    // a deletion that emptied EVERY partition leaves no data files —
    // spark.read would throw on schema inference, but the audit must
    // still report the (now zero-row) table
    val hasData = fs.exists(new org.apache.hadoop.fs.Path(path)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    val after = if (hasData) spark.read.parquet(path).count() else 0L
    // 'bytes are gone' is the contract: if a rewrite missed rows (e.g. a
    // partition-value rendering this method doesn't handle), fail loudly
    // rather than report a delete that didn't happen
    val before = totals.values.sum
    require(after == before - nDeleted,
      s"deletePropagate audit mismatch: $before rows before, $nDeleted " +
        s"deleted, but $after remain on disk — a hit partition was missed")
    import spark.implicits._
    Seq((nDeleted, rewrite.length.toLong, emptied.length.toLong, after))
      .toDF("n_deleted", "n_parts_rewritten", "n_parts_dropped",
        "n_rows_after")
  }
}
