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
    * `rows` needs lat/lon (nullable) and optionally `city_hint`; any other
    * row columns (incl. `name`) are preserved and never collide with the
    * city config's columns. */
  def assign(rows: DataFrame, cities: DataFrame,
             hintCol: Option[String] = Some("city_hint")): DataFrame = {
    val spark = rows.sparkSession
    val rowId = "__row_id"
    val withId = rows.withColumn(rowId, monotonically_increasing_id())

    // prefix every city column so the cross join can't collide with rows
    val cityCols = cities.columns.toSet
    val dims = cities.select(cities.columns.map(c =>
      col(c).as(s"__city_$c")): _*)
    def cc(n: String): Column =
      if (cityCols.contains(n)) col(s"__city_$n") else lit(null)

    val cand = withId.where(col("lat").isNotNull && col("lon").isNotNull)
      .crossJoin(broadcast(dims))
      .withColumn("__in_polygon",
        when(cc("polygon").isNotNull,
          GeoFunctions.pointInPolygonUdf(col("lat"), col("lon"), cc("polygon")))
          .otherwise(lit(false)))
      .withColumn("__in_bbox",
        when(cc("min_lat").isNotNull,
          GeoFunctions.bboxContains(col("lat"), col("lon"), cc("min_lat"),
            cc("min_lon"), cc("max_lat"), cc("max_lon")))
          .otherwise(lit(false)))
      .withColumn("__center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
        cc("center_lat"), cc("center_lon")))
      .withColumn("assign_rule",
        when(col("__in_polygon"), 1).when(col("__in_bbox"), 2)
          .when(col("__center_m") <= cc("radius_km") * 1000.0, 3))
      .where(col("assign_rule").isNotNull)
    val w = Window.partitionBy(rowId)
      .orderBy(col("assign_rule").asc, col("__center_m").asc,
        cc("slug").asc)
    val geoAssigned = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(rowId), cc("slug").as("city_slug"), col("assign_rule"))

    // hint path: ONLY rows with no coords may match by name/alias
    // (reference `etl/utils.py:203-207`)
    val hinted = hintCol.filter(h => rows.columns.contains(h)).map { h =>
      val hintNorm = lower(trim(col(h)))
      withId.where(col("lat").isNull || col("lon").isNull)
        .where(col(h).isNotNull)
        .crossJoin(broadcast(dims))
        .where(hintNorm === lower(cc("slug")) ||
          hintNorm === lower(cc("name")) ||
          (cc("aliases").isNotNull &&
            array_contains(transform(cc("aliases"), a => lower(a)), hintNorm)))
        .withColumn("assign_rule", lit(4))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(rowId).orderBy(cc("slug").asc)))
        .where(col("__rn") === 1)
        .select(col(rowId), cc("slug").as("city_slug"), col("assign_rule"))
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
        col("center_lat").as("__g_clat"), col("center_lon").as("__g_clon"))),
        Seq("city_slug"), "left")
      .where(col("__g_clat").isNull ||
        GeoFunctions.haversineM(col("lat"), col("lon"),
          col("__g_clat"), col("__g_clon")) <= maxKm * 1000.0)
      .drop("__g_clat", "__g_clon")

  /** Slug sanitization for partition values (reference `etl/staging.py:19-20`). */
  def sanitizeSlug(c: Column): Column = regexp_replace(c, "[/\\\\]", "-")
}
