package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import GeoFunctions._

class GeoFunctionsSpec extends SparkTestBase {

  private def eval(c: org.apache.spark.sql.Column): Double = {
    spark.range(1).select(c.as("v")).head.getDouble(0)
  }

  test("haversine known distances") {
    // Vienna Stephansplatz -> Karlsplatz ~ 1.05 km
    val d = eval(haversineM(lit(48.20849), lit(16.37208),
      lit(48.19843), lit(16.36989)))
    assert(d > 1000 && d < 1200)
    // zero distance
    assert(eval(haversineM(lit(10.0), lit(20.0), lit(10.0), lit(20.0))) == 0.0)
  }

  test("haversine symmetry") {
    val ab = eval(haversineM(lit(48.2), lit(16.37), lit(48.21), lit(16.38)))
    val ba = eval(haversineM(lit(48.21), lit(16.38), lit(48.2), lit(16.37)))
    assert(math.abs(ab - ba) < 1e-9)
  }

  test("equirectangular approximates haversine under 2 km") {
    val h = eval(haversineM(lit(48.2), lit(16.37), lit(48.205), lit(16.378)))
    val e = eval(equirectM(lit(48.2), lit(16.37), lit(48.205), lit(16.378)))
    assert(math.abs(h - e) / h < 0.01)
  }

  test("bboxContains inclusive bounds") {
    def in(lat: Double, lon: Double): Boolean =
      spark.range(1).select(bboxContains(lit(lat), lit(lon), lit(0.0),
        lit(10.0), lit(1.0), lit(11.0)).as("v")).head.getBoolean(0)
    assert(in(0.0, 10.0) && in(1.0, 11.0) && in(0.5, 10.5))
    assert(!in(1.0001, 10.5) && !in(0.5, 9.9999))
  }

  test("cell keys: adjacent points in neighboring cells, neighbor set covers them") {
    val df = spark.range(1).select(
      cellKey(lit(48.2001), lit(16.3701), 0.01).as("home"),
      neighborCellKeys(lit(48.2099), lit(16.3799), 0.01).as("nbrs"))
    val row = df.head
    val home = row.getLong(0)
    val nbrs = row.getSeq[Long](1)
    assert(nbrs.length == 9)
    assert(nbrs.contains(home)) // 1-cell-diagonal point still sees home cell
  }

  test("pointInPolygon ray casting") {
    val square = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0))
    assert(pointInPolygon(5.0, 5.0, square))
    assert(!pointInPolygon(15.0, 5.0, square))
    assert(!pointInPolygon(-0.1, 5.0, square))
    // concave polygon (right edge dented inward to x=5 at y=5):
    // the dent region is outside, the left half stays inside
    val concave = Seq((0.0, 0.0), (0.0, 10.0), (5.0, 5.0), (10.0, 10.0), (10.0, 0.0))
    assert(pointInPolygon(5.0, 4.0, concave))
    assert(!pointInPolygon(5.0, 6.0, concave))
    assert(!pointInPolygon(0.5, 11.0, concave))
    // degenerate polygon
    assert(!pointInPolygon(1.0, 1.0, Seq((0.0, 0.0), (1.0, 1.0))))
  }

  test("kmToDegLon clamps near the poles") {
    val atPole = eval(kmToDegLon(lit(1.0), lit(89.9999)))
    assert(atPole <= 100.0 + 1e-9) // clamped denominator 0.01
  }
}
