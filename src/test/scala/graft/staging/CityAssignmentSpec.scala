package graft.staging

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Pins the reference's geometry-cascade semantics (FIXTURES.md §A4):
  * polygon > bbox > radius > hint; coords-but-no-match => NULL, never hint. */
class CityAssignmentSpec extends SparkTestBase {
  import spark.implicits._

  private val polyType =
    ArrayType(new StructType().add("lat", DoubleType).add("lon", DoubleType))

  private lazy val cities = {
    val schema = new StructType()
      .add("slug", StringType).add("name", StringType)
      .add("center_lat", DoubleType).add("center_lon", DoubleType)
      .add("radius_km", DoubleType)
      .add("min_lat", DoubleType).add("min_lon", DoubleType)
      .add("max_lat", DoubleType).add("max_lon", DoubleType)
      .add("polygon", polyType).add("aliases", ArrayType(StringType))
    val rows = Seq(
      // polygon city: tight polygon inside a wide bbox
      Row("polis", "Polis", 48.20, 16.37, 25.0,
        48.10, 16.20, 48.30, 16.50,
        Seq(Row(48.18, 16.35), Row(48.18, 16.39), Row(48.22, 16.39),
          Row(48.22, 16.35)),
        Seq("pol")),
      // bbox-only city, overlapping polis's bbox from the east
      Row("boxton", "Boxton", 48.20, 16.60, 25.0,
        48.10, 16.45, 48.30, 16.75, null, Seq("box")),
      // center-only city far south
      Row("radius_city", "Radius City", 47.00, 16.37, 10.0,
        null, null, null, null, null, null)
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def assignOne(lat: java.lang.Double, lon: java.lang.Double,
                        hint: String = null): (String, Any) = {
    val rows = Seq((lat, lon, hint)).toDF("lat", "lon", "city_hint")
    val out = CityAssignment.assign(rows, cities).select("city_slug", "assign_rule")
      .head
    (out.getString(0), if (out.isNullAt(1)) null else out.getInt(1))
  }

  test("polygon beats bbox") {
    assert(assignOne(48.20, 16.37) == (("polis", 1)))
  }

  test("bbox match when outside polygon") {
    // inside polis bbox but outside its polygon -> bbox rule, still polis
    assert(assignOne(48.12, 16.25) == (("polis", 2)))
    assert(assignOne(48.20, 16.60) == (("boxton", 2)))
  }

  test("overlapping bboxes resolve by config list order (reference loop)") {
    // the reference iterates cities in config order and returns the FIRST
    // bbox that contains the point (utils.py:181-184) — polis precedes
    // boxton, so the whole 16.45..16.50 overlap strip is polis, even where
    // boxton's center is nearer
    assert(assignOne(48.20, 16.49)._1 == "polis")
    assert(assignOne(48.20, 16.46)._1 == "polis")
  }

  test("missing radius_km defaults to 25 km (reference c.get default)") {
    // a center-only city with NULL radius_km still assigns within 25 km
    val schema = cities.schema
    val noRadius = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("bare", "Bare", 47.00, 16.37, null,
        null, null, null, null, null, null))), schema)
    val out = CityAssignment.assign(
      Seq((47.05, 16.37, null: String)).toDF("lat", "lon", "city_hint"),
      noRadius).select("city_slug", "assign_rule").head
    assert(out.getString(0) == "bare" && out.getInt(1) == 3)
  }

  test("hint matches through wv_title_candidates expansion") {
    // root-before-slash and trailing parenthetical both resolve
    assert(assignOne(null, null, hint = "Polis/1st district") == (("polis", 4)))
    assert(assignOne(null, null, hint = "Boxton (Austria)") == (("boxton", 4)))
    assert(assignOne(null, null, hint = "Polís") == (("polis", 4))) // deaccented
  }

  test("radius fallback when no polygon/bbox matches") {
    assert(assignOne(47.05, 16.37) == (("radius_city", 3)))
  }

  test("coords that match nothing stay NULL even with a hint") {
    assert(assignOne(10.0, 10.0, hint = "polis") == ((null, null)))
  }

  test("hint assigns only when coords are absent; aliases count") {
    assert(assignOne(null, null, hint = "polis") == (("polis", 4)))
    assert(assignOne(null, null, hint = "BOX") == (("boxton", 4)))
    assert(assignOne(null, null, hint = "nowhere") == ((null, null)))
  }

  test("distance guard drops rows far from their assigned center") {
    // 48.35 is ~16.7 km from polis center: assigned via radius (25 km),
    // kept under a 20 km guard, dropped under a 10 km guard
    val rows = Seq((48.20, 16.37, null: String), (48.35, 16.37, null: String))
      .toDF("lat", "lon", "city_hint")
    val assigned = CityAssignment.assign(rows, cities)
      .where(col("city_slug").isNotNull)
    assert(assigned.count() == 2)
    assert(CityAssignment.distanceGuard(assigned, cities, maxKm = 20.0).count() == 2)
    assert(CityAssignment.distanceGuard(assigned, cities, maxKm = 10.0).count() == 1)
  }

  test("slug sanitization replaces path separators") {
    val out = Seq(Tuple1("a/b\\c")).toDF("s")
      .select(CityAssignment.sanitizeSlug(col("s")).as("s")).as[String].head
    assert(out == "a-b-c")
  }
}
