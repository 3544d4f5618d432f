package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, TextFunctions}

/** Point-in-region assignment cascade — the reference's core data-quality
  * semantics (`/root/reference/etl/utils.py:163-207`), encoded ONCE as a
  * shared transform (SURVEY §7.4.7: the reference has three divergent
  * copies; we deliberately have one).
  *
  * Priority: polygon ray-cast > bbox > nearest center within radius_km
  * (missing radius_km defaults to 25 km, `utils.py:196`) > name hint
  * (hint only when the row has NO coords, matched through
  * `wv_title_candidates` expansion against deaccented name/slug/aliases,
  * `utils.py:40-50`). Rows with coords that match no geometry get NULL
  * (dropped by callers), never a hint match.
  *
  * Tie-breaks mirror the reference's cities-LIST-ORDER iteration: polygon,
  * bbox, and hint matches pick the FIRST city in config order; the radius
  * rule picks the nearest center (ties -> earlier city). Pass the order in
  * a `city_order` column; without one, config order is synthesized from
  * the frame's row order (exact for a single-partition config load).
  *
  * cities schema: slug, name, center_lat, center_lon, radius_km,
  * min_lat/min_lon/max_lat/max_lon (nullable bbox),
  * polygon: array<struct<lat:double,lon:double>> (nullable),
  * aliases: array<string> (nullable), city_order: long (optional).
  */
object CityAssignment {

  /** Default nearest-center radius when the config omits radius_km
    * (reference `utils.py:196`: `c.get("radius_km", 25)`). */
  val DefaultRadiusKm = 25.0

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

    // prefix every city column so the cross join can't collide with rows;
    // synthesize list order if the config doesn't carry one
    val ordered =
      if (cities.columns.contains("city_order")) cities
      else cities.withColumn("city_order", monotonically_increasing_id())
    val cityCols = ordered.columns.toSet
    val dims = ordered.select(ordered.columns.map(c =>
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
          .when(col("__center_m") <=
            coalesce(cc("radius_km"), lit(DefaultRadiusKm)) * 1000.0, 3))
      .where(col("assign_rule").isNotNull)
    // polygon/bbox ties -> config list order (the reference returns the
    // first containing city, not the nearest); radius ties -> distance,
    // then list order (`d < best_m` keeps the earlier city on equality)
    val w = Window.partitionBy(rowId)
      .orderBy(col("assign_rule").asc,
        when(col("assign_rule") === 3, col("__center_m")).otherwise(lit(0.0)).asc,
        cc("city_order").asc)
    val geoAssigned = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(rowId), cc("slug").as("city_slug"), col("assign_rule"))

    // hint path: ONLY rows with no coords may match by name/alias, through
    // the full wv_title_candidates expansion (reference `etl/utils.py:40-50,
    // 203-207`); first matching city in config order wins
    val hinted = hintCol.filter(h => rows.columns.contains(h)).map { h =>
      withId.where(col("lat").isNull || col("lon").isNull)
        .where(col(h).isNotNull)
        .crossJoin(broadcast(dims))
        .where(TextFunctions.hintMatchesCityUdf(col(h), cc("name"), cc("slug"),
          cc("aliases")))
        .withColumn("assign_rule", lit(4))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(rowId).orderBy(cc("city_order").asc)))
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
