package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSparkSession
import graft.geo.{CellIndex, Geo}

class GeoExpressionsSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import GraftFunctions._

  test("cell_encode / tile_id / st_point match the Scala core") {
    import spark.implicits._
    val df = Seq((13.5690032, 42.7957187), (-73.9857, 40.7484), (0.0, 0.0))
      .toDF("lon", "lat")
    val got = df.select(
      cell_encode($"lon", $"lat", lit(15)).as("cell"),
      tile_id($"lon", $"lat", lit(8)).as("tile"),
      st_point($"lon", $"lat").as("wkt")).collect()
    val exp = Seq((13.5690032, 42.7957187), (-73.9857, 40.7484), (0.0, 0.0))
    for (((lon, lat), row) <- exp.zip(got)) {
      assert(row.getLong(0) === CellIndex.encode(lon, lat, 15))
      assert(row.getLong(1) === CellIndex.tileId(lon, lat, 8))
      assert(row.getString(2) === Geo.fmtPoint(lon, lat))
    }
  }

  test("st_contains_pt refines correctly; st_x/st_y extract") {
    import spark.implicits._
    val df = Seq((2.0, 1.5, true), (5.0, 1.5, false), (0.0, 0.0, true))
      .toDF("lon", "lat", "expected")
    val poly = "POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))"
    val got = df.select(st_contains_pt(lit(poly), $"lon", $"lat"), $"expected").collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
    val xy = spark.range(1).select(
      st_x(lit("POINT(13.5690032 42.7957187)")), st_y(lit("POINT(13.5690032 42.7957187)"))).head
    assert(xy.getDouble(0) === 13.5690032 && xy.getDouble(1) === 42.7957187)
  }

  test("derived geometry family over a linestring") {
    val ls = "LINESTRING(0 0, 3 0, 3 4)"
    val row = spark.range(1).select(
      st_length(lit(ls)).as("len"),
      st_envelope(lit(ls)).as("env"),
      st_centroid(lit(ls)).as("cen"),
      st_convex_hull(lit(ls)).as("hull"),
      st_obb(lit(ls)).as("obb")).head
    assert(row.getDouble(0) === 7.0)
    // corner walk matches osm2rdf (reference: tests/data/way.ttl envelope)
    assert(row.getString(1) === "POLYGON((0.0000000 0.0000000,0.0000000 4.0000000,3.0000000 4.0000000,3.0000000 0.0000000,0.0000000 0.0000000))")
    assert(row.getString(2) === "POINT(2.0000000 1.3333333)")
    assert(row.getString(3).startsWith("POLYGON(("))
  }

  test("st_area of polygon; planar_dist; haversine_m") {
    val row = spark.range(1).select(
      st_area(lit("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")),
      planar_dist(lit(0.0), lit(0.0), lit(3.0), lit(4.0)),
      haversine_m(lit(0.0), lit(0.0), lit(0.0), lit(1.0))).head
    assert(row.getDouble(0) === 12.0)
    assert(row.getDouble(1) === 5.0)
    assert(row.getDouble(2) > 110000 && row.getDouble(2) < 112000)
  }

  test("cell_kring and cell_cover_wkt produce sorted supersets") {
    import spark.implicits._
    val c = CellIndex.encode(10.0, 20.0, 10)
    val ring = spark.range(1).select(cell_kring(lit(c), lit(1))).head.getSeq[Long](0)
    assert(ring.length === 9 && ring.contains(c) && ring == ring.sorted)
    val cover = spark.range(1)
      .select(cell_cover_wkt(lit("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))"), lit(64), lit(30)))
      .head.getSeq[Long](0)
    assert(cover.nonEmpty && cover.length <= 64)
  }

  test("scalar geo expressions stay inside whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(100)
      .withColumn("lon", ($"id" % 8).cast("double"))
      .withColumn("lat", ($"id" % 5).cast("double"))
      .filter(st_contains_pt(lit("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))"), $"lon", $"lat"))
      .select(cell_encode($"lon", $"lat", lit(12)).as("c"))
    // "*(n)" is the WholeStageCodegen marker; the whole Range->Filter->Project
    // chain must live in a single codegen stage (id 1).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      s"expected one whole-stage-codegen span in:\n$plan")
  }

  test("functions are SQL-callable (extension registration)") {
    val r = spark.sql("SELECT cell_encode(10.0D, 20.0D, 12), st_point(1.0D, 2.0D)").head
    assert(r.getLong(0) === CellIndex.encode(10.0, 20.0, 12))
    assert(r.getString(1) === "POINT(1.0000000 2.0000000)")
  }
}
