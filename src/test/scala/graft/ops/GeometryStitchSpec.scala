package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

/**
 * Adversarial fixtures for the stitched multipolygon assembly
 * (GeometryBuild.buildRelPolygonsStitched): segment reversal, multi-ring
 * chain restart, bbox hole assignment to a non-first outer, and the
 * force-close degradation for open chains — each against hand-computed
 * goldens (the registered `rel_polygons_stitched` query covers the
 * DuckDB-oracle parity; this spec pins the SEMANTICS).
 */
class GeometryStitchSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  // (rel, way, node, pos-in-way, lon, lat, role, pos-in-rel) rows -> 3 tables
  private def build(rows: Seq[(Long, Long, Long, Int, Double, Double, String, Int)]) = {
    val nodes = rows.map(r => (r._3, r._5, r._6)).distinct.toDF("id", "lon", "lat")
    val ways = rows.map(r => (r._2, r._3, r._4)).distinct.toDF("way_id", "node_id", "pos")
    val rels = rows.map(r => (r._1, r._2, "way", r._7, r._8)).distinct
      .toDF("rel_id", "member_id", "member_type", "role", "pos")
    GeometryBuild.buildRelPolygonsStitched(rels, ways, nodes)
      .select("rel_id", "n_outer", "n_inner", "area", "wkt")
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
  }

  test("split ring with a reversed segment + hole: stitched, hole subtracted") {
    // outer square (0,0)-(2,2) as two ways; way 2 stored REVERSED
    // (its last node matches the chain end); inner 0.5x0.5 hole closed way
    val got = build(Seq(
      (1L, 1L, 1L, 1, 0.0, 0.0, "outer", 1),
      (1L, 1L, 2L, 2, 2.0, 0.0, "outer", 1),
      (1L, 1L, 3L, 3, 2.0, 2.0, "outer", 1),
      (1L, 2L, 1L, 1, 0.0, 0.0, "outer", 2), // reversed: runs 1 -> 4 -> 3
      (1L, 2L, 4L, 2, 0.0, 2.0, "outer", 2),
      (1L, 2L, 3L, 3, 2.0, 2.0, "outer", 2),
      (1L, 3L, 5L, 1, 0.5, 0.5, "inner", 3),
      (1L, 3L, 6L, 2, 1.0, 0.5, "inner", 3),
      (1L, 3L, 7L, 3, 1.0, 1.0, "inner", 3),
      (1L, 3L, 8L, 4, 0.5, 1.0, "inner", 3),
      (1L, 3L, 5L, 5, 0.5, 0.5, "inner", 3)))
    assert(got.length === 1)
    val (_, nOuter, nInner, area, wkt) = got(0)
    assert(nOuter === 1L && nInner === 1L)
    assert(math.abs(area - (4.0 - 0.25)) < 1e-12)
    assert(wkt === "MULTIPOLYGON(((" +
      "0.0000000 0.0000000,2.0000000 0.0000000,2.0000000 2.0000000," +
      "0.0000000 2.0000000,0.0000000 0.0000000),(" +
      "0.5000000 0.5000000,1.0000000 0.5000000,1.0000000 1.0000000," +
      "0.5000000 1.0000000,0.5000000 0.5000000)))")
  }

  test("two outers: hole assigned to the SECOND outer by bbox, not the first") {
    def square(rel: Long, way: Long, base: Long, x0: Double, y0: Double,
               s: Double, role: String, pos: Int) = Seq(
      (rel, way, base, 1, x0, y0, role, pos),
      (rel, way, base + 1, 2, x0 + s, y0, role, pos),
      (rel, way, base + 2, 3, x0 + s, y0 + s, role, pos),
      (rel, way, base + 3, 4, x0, y0 + s, role, pos),
      (rel, way, base, 5, x0, y0, role, pos))
    val got = build(
      square(2L, 1L, 10L, 0.0, 0.0, 1.0, "outer", 1) ++
        square(2L, 2L, 20L, 10.0, 0.0, 1.0, "outer", 2) ++
        square(2L, 3L, 30L, 10.25, 0.25, 0.5, "inner", 3))
    val (_, nOuter, nInner, area, wkt) = got(0)
    assert(nOuter === 2L && nInner === 1L)
    assert(math.abs(area - (1.0 + 1.0 - 0.25)) < 1e-12)
    // polygon 1 has no hole; polygon 2 carries the inner ring
    assert(wkt === "MULTIPOLYGON(((" +
      "0.0000000 0.0000000,1.0000000 0.0000000,1.0000000 1.0000000," +
      "0.0000000 1.0000000,0.0000000 0.0000000)),((" +
      "10.0000000 0.0000000,11.0000000 0.0000000,11.0000000 1.0000000," +
      "10.0000000 1.0000000,10.0000000 0.0000000),(" +
      "10.2500000 0.2500000,10.7500000 0.2500000,10.7500000 0.7500000," +
      "10.2500000 0.7500000,10.2500000 0.2500000)))")
  }

  test("open chain force-closes; non-way members ignored") {
    val rows = Seq(
      (3L, 1L, 1L, 1, 0.0, 0.0, "outer", 1),
      (3L, 1L, 2L, 2, 1.0, 0.0, "outer", 1),
      (3L, 1L, 3L, 3, 1.0, 1.0, "outer", 1))
    val nodes = rows.map(r => (r._3, r._5, r._6)).distinct.toDF("id", "lon", "lat")
    val ways = rows.map(r => (r._2, r._3, r._4)).toDF("way_id", "node_id", "pos")
    val rels = (rows.map(r => (r._1, r._2, "way", r._7, r._8)).distinct ++
      Seq((3L, 99L, "node", "", 2))) // must be ignored by stitching
      .toDF("rel_id", "member_id", "member_type", "role", "pos")
    val got = GeometryBuild.buildRelPolygonsStitched(rels, ways, nodes)
      .select("rel_id", "n_outer", "n_inner", "area", "wkt")
      .as[(Long, Long, Long, Double, String)].collect()
    assert(got.length === 1)
    val (_, nOuter, nInner, area, _) = got(0)
    assert(nOuter === 1L && nInner === 0L)
    assert(math.abs(area - 0.5) < 1e-12) // force-closed right triangle
  }

  test("non-adjacent segments break the chain into separate force-closed rings") {
    val got = build(Seq(
      (4L, 1L, 1L, 1, 0.0, 0.0, "outer", 1),
      (4L, 1L, 2L, 2, 1.0, 0.0, "outer", 1),
      (4L, 1L, 3L, 3, 1.0, 1.0, "outer", 1),
      // no shared endpoint with way 1 -> chain break, both force-closed
      (4L, 2L, 11L, 1, 5.0, 0.0, "outer", 2),
      (4L, 2L, 12L, 2, 6.0, 0.0, "outer", 2),
      (4L, 2L, 13L, 3, 6.0, 1.0, "outer", 2)))
    val (_, nOuter, _, area, _) = got(0)
    assert(nOuter === 2L)
    assert(math.abs(area - 1.0) < 1e-12) // two 0.5 triangles
  }
}
