package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

/**
 * Adversarial fixtures for the stitched multipolygon assembly
 * (GeometryBuild.buildRelPolygonsStitched): segment reversal, member-order
 * scrambling (global endpoint matching), multi-ring chain restart, exact
 * ray-cast hole nesting under overlapping bboxes, and the force-close
 * degradation + stitch_clean flag for open chains — each against
 * hand-computed goldens (the registered `rel_polygons_stitched` query covers
 * the DuckDB-oracle parity; this spec pins the SEMANTICS).
 */
class GeometryStitchSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("1000-segment scrambled+reversed ring stitches in bounded time (hash-index fold)") {
    // One giant ring of 1000 two-point segments around a circle, member
    // order scrambled by a deterministic stride permutation and every third
    // segment reversed — the coastline-relation regime the r04 O(S^2)
    // higher-order fold could not reach (VERDICT.md r04 missing #3). The
    // hash-endpoint native expression must assemble ONE clean ring of 1001
    // points, well inside a generous wall-clock bound (measured ~ms; the
    // bound only guards against an accidental quadratic regression).
    val s = 1000
    def node(i: Int): (Long, Double, Double) = {
      val a = 2.0 * math.Pi * (i % s) / s
      ((i % s).toLong + 1L, math.cos(a), math.sin(a))
    }
    // segment k connects node k -> k+1; scramble with stride 567 (coprime
    // with 1000), reverse every third segment
    val rows = (0 until s).flatMap { j =>
      val k = (j * 567) % s
      val (aId, ax, ay) = node(k)
      val (bId, bx, by) = node(k + 1)
      val pts = if (j % 3 == 0) Seq((bId, bx, by), (aId, ax, ay))
      else Seq((aId, ax, ay), (bId, bx, by))
      pts.zipWithIndex.map { case ((nId, x, y), p) =>
        (7L, k.toLong + 1L, nId, p + 1, x, y, "outer", j + 1)
      }
    }
    val t0 = System.nanoTime()
    val nodes = rows.map(r => (r._3, r._5, r._6)).distinct.toDF("id", "lon", "lat")
    val ways = rows.map(r => (r._2, r._3, r._4)).distinct.toDF("way_id", "node_id", "pos")
    val rels = rows.map(r => (r._1, r._2, "way", r._7, r._8)).distinct
      .toDF("rel_id", "member_id", "member_type", "role", "pos")
    val got = GeometryBuild.buildRelPolygonsStitched(rels, ways, nodes)
      .select("rel_id", "n_outer", "n_inner", "area", "stitch_clean")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    val wallS = (System.nanoTime() - t0) / 1e9
    assert(got.length === 1)
    val (_, nOuter, nInner, area, clean) = got(0)
    assert(nOuter === 1L && nInner === 0L && clean)
    // shoelace area of the regular 1000-gon ~= pi
    assert(math.abs(area - math.Pi) < 1e-3)
    assert(wallS < 60.0, f"1k-segment stitch took $wallS%.1f s — quadratic regression?")
  }

  // (rel, way, node, pos-in-way, lon, lat, role, pos-in-rel) rows -> 3 tables
  private def build(rows: Seq[(Long, Long, Long, Int, Double, Double, String, Int)]) = {
    val nodes = rows.map(r => (r._3, r._5, r._6)).distinct.toDF("id", "lon", "lat")
    val ways = rows.map(r => (r._2, r._3, r._4)).distinct.toDF("way_id", "node_id", "pos")
    val rels = rows.map(r => (r._1, r._2, "way", r._7, r._8)).distinct
      .toDF("rel_id", "member_id", "member_type", "role", "pos")
    GeometryBuild.buildRelPolygonsStitched(rels, ways, nodes)
      .select("rel_id", "n_outer", "n_inner", "area", "wkt", "stitch_clean")
      .as[(Long, Long, Long, Double, String, Boolean)].collect().sortBy(_._1)
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
    val (_, nOuter, nInner, area, wkt, clean) = got(0)
    assert(nOuter === 1L && nInner === 1L)
    assert(clean)
    assert(math.abs(area - (4.0 - 0.25)) < 1e-12)
    assert(wkt === "MULTIPOLYGON(((" +
      "0.0000000 0.0000000,2.0000000 0.0000000,2.0000000 2.0000000," +
      "0.0000000 2.0000000,0.0000000 0.0000000),(" +
      "0.5000000 0.5000000,1.0000000 0.5000000,1.0000000 1.0000000," +
      "0.5000000 1.0000000,0.5000000 0.5000000)))")
  }

  test("MEMBER-ORDER-SCRAMBLED ring: global endpoint matching assembles it") {
    // square of 8 nodes split into 4 ways in ring order A,B,C,D but listed
    // as A,C,B,D — consecutive members share NO endpoint, so pos-order
    // stitching would force-close A into a degenerate triangle; the global
    // matcher must find B (the lowest-indexed touching segment) and close
    // the full square. B is additionally stored REVERSED.
    val got = build(Seq(
      (5L, 1L, 1L, 1, 0.0, 0.0, "outer", 1), // A: 1-2-3
      (5L, 1L, 2L, 2, 1.0, 0.0, "outer", 1),
      (5L, 1L, 3L, 3, 2.0, 0.0, "outer", 1),
      (5L, 3L, 5L, 1, 2.0, 2.0, "outer", 2), // C: 5-6-7 (ring order third)
      (5L, 3L, 6L, 2, 1.0, 2.0, "outer", 2),
      (5L, 3L, 7L, 3, 0.0, 2.0, "outer", 2),
      (5L, 2L, 5L, 1, 2.0, 2.0, "outer", 3), // B REVERSED: 5-4-3 (= 3-4-5)
      (5L, 2L, 4L, 2, 2.0, 1.0, "outer", 3),
      (5L, 2L, 3L, 3, 2.0, 0.0, "outer", 3),
      (5L, 4L, 7L, 1, 0.0, 2.0, "outer", 4), // D: 7-8-1 closes the ring
      (5L, 4L, 8L, 2, 0.0, 1.0, "outer", 4),
      (5L, 4L, 1L, 3, 0.0, 0.0, "outer", 4)))
    assert(got.length === 1)
    val (_, nOuter, _, area, wkt, clean) = got(0)
    assert(nOuter === 1L)
    assert(clean)
    assert(math.abs(area - 4.0) < 1e-12) // the full 2x2 square, one ring
    // assembly order: seed A (1,2,3), extend B via append (4,5), extend C
    // via append (6,7), extend D closes back to 1
    assert(wkt === "MULTIPOLYGON(((" +
      "0.0000000 0.0000000,1.0000000 0.0000000,2.0000000 0.0000000," +
      "2.0000000 1.0000000,2.0000000 2.0000000,1.0000000 2.0000000," +
      "0.0000000 2.0000000,0.0000000 1.0000000,0.0000000 0.0000000)))")
  }

  test("two outers: hole nested by exact ray-cast containment") {
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
    val (_, nOuter, nInner, area, wkt, clean) = got(0)
    assert(nOuter === 2L && nInner === 1L)
    assert(clean)
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

  test("overlapping-bbox outers: ray-cast beats bbox hole assignment") {
    // outer 1 = U-shape whose BBOX contains the hole but whose interior
    // does not (the hole sits in the notch); outer 2 = small square in the
    // notch that truly contains the hole. bbox assignment would nest the
    // hole under outer 1; exact ray-cast must pick outer 2.
    val u = Seq((0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0),
      (1.0, 1.0), (1.0, 3.0), (0.0, 3.0), (0.0, 0.0))
    val sq = Seq((1.2, 1.5), (1.8, 1.5), (1.8, 2.5), (1.2, 2.5), (1.2, 1.5))
    val hole = Seq((1.4, 1.9), (1.6, 1.9), (1.6, 2.1), (1.4, 2.1), (1.4, 1.9))
    def way(rel: Long, wid: Long, base: Long, pts: Seq[(Double, Double)],
            role: String, pos: Int) =
      pts.zipWithIndex.map { case ((x, y), i) =>
        // re-use the first node id for the closing point
        val nid = if (i == pts.length - 1 && pts.head == pts.last) base
          else base + i
        (rel, wid, nid, i + 1, x, y, role, pos)
      }
    val got = build(way(7L, 1L, 100L, u, "outer", 1) ++
      way(7L, 2L, 200L, sq, "outer", 2) ++ way(7L, 3L, 300L, hole, "inner", 3))
    val (_, nOuter, nInner, area, wkt, clean) = got(0)
    assert(nOuter === 2L && nInner === 1L)
    assert(clean)
    assert(math.abs(area - (7.0 + 0.6 - 0.04)) < 1e-9)
    // the hole must appear inside the SECOND polygon (the notch square)
    val polys = wkt.stripPrefix("MULTIPOLYGON(").stripSuffix(")")
      .split("\\)\\),\\(\\(").toSeq
    assert(polys.length === 2)
    assert(!polys(0).contains("1.4000000 1.9000000")) // U carries no hole
    assert(polys(1).contains("1.4000000 1.9000000"))  // square carries it
  }

  test("PROPERTY: any segment permutation + reversal assembles the same area") {
    // two outers (3x3 with an off-center 1x1 hole, plus a disjoint 1x1) —
    // each ring split into 3 partial chains. 24 seeded-random trials permute
    // member order AND reverse a random subset of segments; assembly must be
    // invariant: 2 outer rings, 1 hole, area 9 - 1 + 1, stitch_clean. Ring
    // ORDER in the WKT may legally vary with assembly order; the invariants
    // are the counts, the area, and the clean flag. All trials ship as one
    // DataFrame (one Spark job), rel_id = trial.
    val outerA = Seq( // 8-node 3x3 square, nodes 1-8
      (1L, 0.0, 0.0), (2L, 1.5, 0.0), (3L, 3.0, 0.0), (4L, 3.0, 1.5),
      (5L, 3.0, 3.0), (6L, 1.5, 3.0), (7L, 0.0, 3.0), (8L, 0.0, 1.5))
    val hole = Seq((11L, 0.5, 0.5), (12L, 1.5, 0.5), (13L, 1.5, 1.5), (14L, 0.5, 1.5))
    val outerB = Seq((21L, 5.0, 0.0), (22L, 6.0, 0.0), (23L, 6.0, 1.0), (24L, 5.0, 1.0))
    // split a closed cycle into 3 chains (consecutive, sharing endpoints)
    def chains(cyc: Seq[(Long, Double, Double)]): Seq[Seq[(Long, Double, Double)]] = {
      val closed = cyc :+ cyc.head
      val cut1 = cyc.length / 3; val cut2 = 2 * cyc.length / 3
      Seq(closed.slice(0, cut1 + 1), closed.slice(cut1, cut2 + 1),
        closed.slice(cut2, closed.length))
    }
    val ringSegs: Seq[(String, Seq[Seq[(Long, Double, Double)]])] =
      Seq("outer" -> chains(outerA), "inner" -> chains(hole),
        "outer" -> chains(outerB))
    val rnd = new scala.util.Random(42)
    val rows = (0 until 24).flatMap { trial =>
      val segs = ringSegs.flatMap { case (role, cs) => cs.map(c => (role, c)) }
      val order = rnd.shuffle(segs.indices.toList)
      order.zipWithIndex.flatMap { case (segIdx, posInRel) =>
        val (role, seg0) = segs(segIdx)
        val seg = if (rnd.nextBoolean()) seg0.reverse else seg0
        seg.zipWithIndex.map { case ((nid, x, y), posInWay) =>
          (trial.toLong, trial * 100L + segIdx, nid, posInWay + 1, x, y,
            role, posInRel + 1)
        }
      }
    }
    val got = build(rows)
    assert(got.length === 24)
    got.foreach { case (rel, nOuter, nInner, area, wkt, clean) =>
      assert(nOuter === 2L, s"trial $rel: nOuter")
      assert(nInner === 1L, s"trial $rel: nInner")
      assert(clean, s"trial $rel: stitch_clean")
      assert(math.abs(area - 9.0) < 1e-9, s"trial $rel: area $area")
      // the hole must be nested inside SOME outer polygon in the WKT
      assert(wkt.contains("),("), s"trial $rel: hole not nested: $wkt")
    }
  }

  test("open chain force-closes with stitch_clean=false; non-way members ignored") {
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
      .select("rel_id", "n_outer", "n_inner", "area", "wkt", "stitch_clean")
      .as[(Long, Long, Long, Double, String, Boolean)].collect()
    assert(got.length === 1)
    val (_, nOuter, nInner, area, _, clean) = got(0)
    assert(nOuter === 1L && nInner === 0L)
    assert(!clean) // force-closed -> flagged for quarantine
    assert(math.abs(area - 0.5) < 1e-12) // force-closed right triangle
  }

  test("disconnected segments force-close into separate flagged rings") {
    val got = build(Seq(
      (4L, 1L, 1L, 1, 0.0, 0.0, "outer", 1),
      (4L, 1L, 2L, 2, 1.0, 0.0, "outer", 1),
      (4L, 1L, 3L, 3, 1.0, 1.0, "outer", 1),
      // no shared endpoint with way 1 -> chain break, both force-closed
      (4L, 2L, 11L, 1, 5.0, 0.0, "outer", 2),
      (4L, 2L, 12L, 2, 6.0, 0.0, "outer", 2),
      (4L, 2L, 13L, 3, 6.0, 1.0, "outer", 2)))
    val (_, nOuter, _, area, _, clean) = got(0)
    assert(nOuter === 2L)
    assert(!clean)
    assert(math.abs(area - 1.0) < 1e-12) // two 0.5 triangles
  }
}
