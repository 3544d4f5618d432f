package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.er.EntityResolution
import graft.staging.CityAssignment

/** End-to-end KG pipeline golden test (SURVEY §3 lifecycle): raw places
  * with dirty coords -> city-assignment cascade -> distance guard -> ER ->
  * canonical map -> per-canonical review lift + capped nested "POI card"
  * export — the full reference dataflow composed from the library pieces,
  * on one fixture, asserting the final export contents. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cities = {
    val schema = new StructType()
      .add("slug", StringType).add("name", StringType)
      .add("center_lat", DoubleType).add("center_lon", DoubleType)
      .add("radius_km", DoubleType)
      .add("min_lat", DoubleType).add("min_lon", DoubleType)
      .add("max_lat", DoubleType).add("max_lon", DoubleType)
      .add("polygon", ArrayType(new StructType()
        .add("lat", DoubleType).add("lon", DoubleType)))
      .add("aliases", ArrayType(StringType))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("vienna", "Vienna", 48.20, 16.37, 25.0,
        48.10, 16.20, 48.30, 16.50, null, Seq("wien")),
      Row("graz", "Graz", 47.07, 15.44, 20.0,
        47.00, 15.35, 47.15, 15.55, null, null))), schema)
  }

  private lazy val rawPlaces = Seq(
    // duplicate cafe pair in vienna (cross-source, ~55 m apart)
    ("yelp:cafe", "yelp", "Cafe Central", Some(48.2000), Some(16.3700), None),
    ("wv:cafe", "wikivoyage", "Café Central Wien", Some(48.2005), Some(16.3700), None),
    // singleton in graz
    ("yelp:uhr", "yelp", "Uhrturm", Some(47.0735), Some(15.4377), None),
    // no coords, hint resolves via alias
    ("reddit:hint", "reddit", "Prater", Option.empty[Double],
      Option.empty[Double], Some("wien")),
    // coords match no city -> dropped by the cascade
    ("yelp:lost", "yelp", "Nowhere Bar", Some(10.0), Some(10.0),
      Option.empty[String])
  ).toDF("place_id", "source", "name", "lat", "lon", "city_hint")

  private lazy val reviews = Seq(
    ("r1", "yelp:cafe", "Great coffee and cakes in a beautiful hall"),
    ("r2", "wv:cafe", "Historic coffeehouse, a classic"),
    ("r3", "yelp:uhr", "The clock tower is lovely at sunset")
  ).toDF("review_id", "place_id", "text")

  test("staging -> ER -> canonical -> review lift -> POI cards") {
    // 1. city assignment cascade + guard (G4/P6/P7)
    val assigned = CityAssignment.assign(rawPlaces, cities)
      .where(col("city_slug").isNotNull)
    val staged = CityAssignment.distanceGuard(
      assigned.where(col("lat").isNotNull), cities, maxKm = 80.0)
      .unionByName(assigned.where(col("lat").isNull))
    assert(staged.count() == 4) // yelp:lost dropped
    val bySlug = staged.select("place_id", "city_slug")
      .as[(String, String)].collect().toMap
    assert(bySlug("yelp:cafe") == "vienna" && bySlug("yelp:uhr") == "graz")
    assert(bySlug("reddit:hint") == "vienna") // alias hint, no coords

    // 2. ER over geo-located places (J4/G1/G2/A4/G3)
    val cmap = EntityResolution.canonicalMap(staged.where(col("lat").isNotNull))
    val canonOf = cmap.select("source_place_id", "canonical_id")
      .as[(String, String)].collect().toMap
    assert(canonOf("yelp:cafe") == canonOf("wv:cafe"))
    // reference norm_name drops accented chars outright (no transliteration):
    // "Café Central Wien" -> "caf-central-wien" (etl/er.py:30-34)
    assert(canonOf("yelp:cafe") == "caf-central-wien::vienna")
    assert(canonOf("yelp:uhr") == "uhrturm::graz")

    // 3. review lift to canonical (G6) + capped nested card export (A11/K5)
    val lifted = reviews.join(cmap,
      reviews("place_id") === cmap("source_place_id"))
    val w = Window.partitionBy("canonical_id")
      .orderBy(length(col("text")).desc, col("review_id").asc)
    val cards = lifted.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy("canonical_id", "canonical_name", "city_slug")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("text")))),
        x => substring(x.getField("text"), 1, 220)), " | ").as("quotes"),
        count(lit(1)).as("n_reviews"))
    val byCanon = cards.collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(byCanon.size == 2)
    val (cafeQuotes, cafeN) = byCanon("caf-central-wien::vienna")
    assert(cafeN == 2) // both member reviews lifted to the canonical place
    assert(cafeQuotes.contains("Great coffee") &&
      cafeQuotes.contains("Historic coffeehouse"))
    assert(byCanon("uhrturm::graz")._2 == 1)
  }

  test("Pipelines entry points release every cache and checkpoint they " +
    "create — zero persistent-RDD growth per materialized call") {
    val docs = (1 to 60).map { i =>
      val text =
        if (i % 3 == 0)
          "the quick brown fox jumps over the lazy dog with it and the " +
            "rest of the pack for now"
        else
          s"the number $i document is about the data and the plans for " +
            "it to be good and long enough to pass"
      (i.toLong, s"src${i % 4}", text)
    }.toDF("doc_id", "source", "text")
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = sc.getPersistentRDDs.keySet

    assert(Pipelines.cleanCorpus(docs)(_.count()) > 0)
    val leak1 = sc.getPersistentRDDs.keySet -- before
    assert(leak1.isEmpty, s"cleanCorpus leaked RDDs: $leak1")

    assert(Pipelines.trainingCorpus(docs,
      probes = docs.where(col("doc_id") < 3),
      mixWeights = Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 1.0,
        "src3" -> 1.0),
      seed = 1)(_.count()) > 0)
    val leak2 = sc.getPersistentRDDs.keySet -- before
    assert(leak2.isEmpty, s"trainingCorpus leaked RDDs: $leak2")

    val pages = docs.select(col("doc_id"), col("source"),
      concat(lit("<html><body><p>"), col("text"),
        lit("</p></body></html>")).as("html"))
    assert(Pipelines.htmlCorpus(pages)(_.count()) > 0)
    val leak3 = sc.getPersistentRDDs.keySet -- before
    assert(leak3.isEmpty, s"htmlCorpus leaked RDDs: $leak3")

    assert(Pipelines.c4Corpus(docs, minStopHits = 1)(_.count()) >= 0)
    val leak4 = sc.getPersistentRDDs.keySet -- before
    assert(leak4.isEmpty, s"c4Corpus leaked RDDs: $leak4")

    assert(Pipelines.pretrainCorpus(docs, minStopHits = 1)(_.count()) >= 0)
    val leak5 = sc.getPersistentRDDs.keySet -- before
    assert(leak5.isEmpty, s"pretrainCorpus leaked RDDs: $leak5")
  }

  test("buildC4Corpus gate at default thresholds is EXACTLY the " +
    "gopherRules keep verdict — the two conjunctions cannot drift") {
    // unique multi-line docs (no exact/LSH dup interference): half pass
    // the full Gopher gate (>=50 words, >=2 required stopwords), half
    // fail one rule each
    val docs = (1 to 12).map { i =>
      val stops = "the cat and dog have fun with all of that today\n"
      val filler = (1 to 6).map(k =>
        s"line $k of doc $i carries unique running prose").mkString("\n")
      val text =
        if (i % 2 == 0) stops + filler + s"\nclosing words for doc $i " +
          (1 to 20).map(k => s"pad$i$k").mkString(" ")
        else s"tiny doc $i" // fails the 50-word floor
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val viaPipeline = Pipelines.buildC4Corpus(docs)
      .select("doc_id").as[Long].collect().toSet
    val viaKernel = operators.Dedup.lineDedup(docs, "doc_id", "text")
      .withColumn("g", operators.TextAnalysis.gopherRules(col("text")))
      .where(col("g._8")).select("doc_id").as[Long].collect().toSet
    assert(viaPipeline == viaKernel, s"$viaPipeline vs $viaKernel")
    assert(viaKernel.nonEmpty && viaKernel.size < 12)
  }
}
