package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/** Point-in-region assignment cascade — the reference's core data-quality
  * semantics (`/root/reference/etl/utils.py:163-207`), encoded ONCE as a
  * shared transform (SURVEY §7.4.7: the reference has three divergent
  * copies; we deliberately have one).
  *
  * Priority: polygon ray-cast > bbox > nearest center within radius_km >
  * name hint (hint only when the row has NO coords). Rows with coords that
  * match no geometry get NULL (dropped by callers), never a hint match.
  *
  * cities schema: slug, name, center_lat, center_lon, radius_km,
  * min_lat/min_lon/max_lat/max_lon (nullable bbox),
  * polygon: array<struct<lat:double,lon:double>> (nullable),
  * aliases: array<string> (nullable).
  */
object CityAssignment {

  /** Adds `city_slug` (nullable) and `assign_rule` (1=polygon, 2=bbox,
    * 3=radius, 4=hint, null=unassigned) to `rows`.
    * `rows` needs lat/lon (nullable) and optionally `city_hint`. */
  def assign(rows: DataFrame, cities: DataFrame,
             hintCol: Option[String] = Some("city_hint")): DataFrame = {
    val spark = rows.sparkSession
    val rowId = "__row_id"
    val withId = rows.withColumn(rowId, monotonically_increasing_id())

    val cityCols = cities.columns.toSet
    def cityCol(n: String): Column =
      if (cityCols.contains(n)) col(n) else lit(null)

    val cand = withId.where(col("lat").isNotNull && col("lon").isNotNull)
      .crossJoin(broadcast(cities))
      .withColumn("in_polygon",
        when(cityCol("polygon").isNotNull,
          GeoFunctions.pointInPolygonUdf(col("lat"), col("lon"), col("polygon")))
          .otherwise(lit(false)))
      .withColumn("in_bbox",
        when(cityCol("min_lat").isNotNull,
          GeoFunctions.bboxContains(col("lat"), col("lon"), col("min_lat"),
            col("min_lon"), col("max_lat"), col("max_lon")))
          .otherwise(lit(false)))
      .withColumn("center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
        col("center_lat"), col("center_lon")))
      .withColumn("in_radius", col("center_m") <= cityCol("radius_km") * 1000.0)
      .withColumn("assign_rule",
        when(col("in_polygon"), 1).when(col("in_bbox"), 2)
          .when(col("in_radius"), 3))
      .where(col("assign_rule").isNotNull)
    val w = Window.partitionBy(rowId)
      .orderBy(col("assign_rule").asc, col("center_m").asc, col("slug").asc)
    val geoAssigned = cand.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(rowId), col("slug").as("city_slug"), col("assign_rule"))

    // hint path: ONLY rows with no coords may match by name/alias
    // (reference `etl/utils.py:203-207`)
    val hinted = hintCol.filter(h => rows.columns.contains(h)).map { h =>
      val hintNorm = lower(trim(col(h)))
      withId.where(col("lat").isNull || col("lon").isNull)
        .where(col(h).isNotNull)
        .crossJoin(broadcast(cities))
        .where(hintNorm === lower(col("slug")) ||
          hintNorm === lower(col("name")) ||
          (cityCol("aliases").isNotNull &&
            array_contains(transform(col("aliases"), a => lower(a)), hintNorm)))
        .withColumn("assign_rule", lit(4))
        .withColumn("rn", row_number().over(
          Window.partitionBy(rowId).orderBy(col("slug").asc)))
        .where(col("rn") === 1)
        .select(col(rowId), col("slug").as("city_slug"), col("assign_rule"))
    }.getOrElse(spark.emptyDataFrame
      .withColumn(rowId, lit(0L)).withColumn("city_slug", lit(""))
      .withColumn("assign_rule", lit(0)).limit(0))

    withId
      .join(geoAssigned.unionByName(hinted), Seq(rowId), "left")
      .drop(rowId)
  }

  /** Distance guard: drop rows further than maxKm from their assigned city
    * center (reference `etl/staging.py:7-16,62`). */
  def distanceGuard(assigned: DataFrame, cities: DataFrame,
                    maxKm: Double = 80.0): DataFrame =
    assigned.join(broadcast(cities.select(col("slug").as("city_slug"),
        col("center_lat"), col("center_lon"))), Seq("city_slug"), "left")
      .where(col("center_lat").isNull ||
        GeoFunctions.haversineM(col("lat"), col("lon"),
          col("center_lat"), col("center_lon")) <= maxKm * 1000.0)
      .drop("center_lat", "center_lon")

  /** Slug sanitization for partition values (reference `etl/staging.py:19-20`). */
  def sanitizeSlug(c: Column): Column = regexp_replace(c, "[/\\\\]", "-")
}
