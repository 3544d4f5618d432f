package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** CSV repair pre-pass for the reference's broken Airbnb quoting
    * (`etl/airbnb/reviews_jsonl.py:44-57`): rewrites `'" ,'` -> `'",'` and
    * strips CR, line by line, fully distributed (spark.read.text +
    * regexp, no driver-side temp file). */
  def repairedCsvLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("value", regexp_replace(col("value"), "\r$", ""))
      .withColumn("value", regexp_replace(col("value"), "\" ,", "\","))

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

  /** JSONL scan with malformed-line drop (reference
    * `scripts/run_airbnb.py:116-122`). */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "DROPMALFORMED")
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** A parsed Wikivoyage-style listing (reference
    * `etl/sources/wikivoyage_xml.py:171-211`). */
  case class WvListing(pageTitle: String, template: String, name: String,
                       lat: Option[Double], lon: Option[Double],
                       address: Option[String], content: Option[String])

  private val TemplateRe =
    """(?s)\{\{\s*(see|do|eat|drink|sleep|buy|listing|marker)\s*\|(.*?)\}\}""".r
  private val FloatRe = """-?\d+(?:\.\d+)?""".r

  /** First float-looking token in a dirty string, e.g. "48.2°N"
    * (reference `wikivoyage_xml.py:58-69`). */
  def dirtyFloat(s: String): Option[Double] =
    Option(s).flatMap(v => FloatRe.findFirstIn(v)).map(_.toDouble)

  /** Extract listing templates from one page's wikitext: 1 page -> N rows
    * (the UDTF shape, SURVEY §2.11). Pure JVM kernel; wrap with flatMap. */
  def parseListings(pageTitle: String, text: String): Seq[WvListing] = {
    if (text == null) return Seq.empty
    TemplateRe.findAllMatchIn(text).flatMap { m =>
      val template = m.group(1)
      val kv = m.group(2).split("\\|").iterator.flatMap { part =>
        part.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _ => None
        }
      }.toMap
      kv.get("name").filter(_.nonEmpty).map { name =>
        WvListing(pageTitle, template, name,
          kv.get("lat").flatMap(dirtyFloat),
          kv.get("long").orElse(kv.get("lon")).flatMap(dirtyFloat),
          kv.get("address").filter(_.nonEmpty),
          kv.get("content").filter(_.nonEmpty))
      }
    }.toSeq
  }

  /** Dataset-level wrapper: pages(title, ns, redirect, text) -> listings.
    * Skips non-main-namespace and redirect pages
    * (reference `wikivoyage_xml.py:154-169`). */
  def listingsFromPages(pages: DataFrame): Dataset[WvListing] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .where(coalesce(col("ns"), lit(0)) === 0)
      .where(col("redirect").isNull || !col("redirect"))
      .select(col("title"), col("text")).as[(String, String)]
      .flatMap { case (title, text) => parseListings(title, text) }
  }
}
