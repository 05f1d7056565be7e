package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for Geo.convexHull / Geo.obb (VERDICT.md r03 #5: fixed
 * goldens are weaker evidence than properties). Seeded-RNG loops (the
 * CellIndexSpec pattern — scalacheck's Gen without the scalatest bridge):
 * each property is checked over hundreds of random point sets including
 * adversarial shapes (collinear runs, duplicate points, tiny clusters).
 * The DuckDB-oracle parity of the hull is covered by the registered
 * `way_hull` query; this spec pins the geometric CONTRACT.
 */
class GeoHullPropSpec extends AnyFunSuite {

  private def cross(ox: Double, oy: Double, ax: Double, ay: Double,
                    bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  private def randomPoints(rnd: scala.util.Random): (Array[Double], Array[Double]) = {
    val n = 1 + rnd.nextInt(40)
    val shape = rnd.nextInt(4)
    val pts = (0 until n).map { _ =>
      shape match {
        case 0 => (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)
        case 1 => // collinear run with noise-free slope
          val t = rnd.nextInt(20).toDouble
          (t, 2.0 * t + 1.0)
        case 2 => // duplicate-heavy tiny cluster
          (rnd.nextInt(3).toDouble, rnd.nextInt(3).toDouble)
        case _ => // grid (many collinear subsets + duplicates)
          (rnd.nextInt(5).toDouble / 2, rnd.nextInt(5).toDouble / 2)
      }
    }
    (pts.map(_._1).toArray, pts.map(_._2).toArray)
  }

  private def forAllSeeded(n: Int = 400)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(0xC0FFEE)
    (0 until n).foreach(_ => body(rnd))
  }

  test("hull ring is closed and starts at the lexicographic minimum point") {
    forAllSeeded() { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (hx, hy) = Geo.convexHull(xs, ys)
      assert(hx.length >= 2 && hx.length === hy.length)
      assert(hx.head === hx.last && hy.head === hy.last)
      val minIdx = (0 until xs.length).minBy(i => (xs(i), ys(i)))
      assert(hx.head === xs(minIdx) && hy.head === ys(minIdx))
    }
  }

  test("hull vertices are a subset of the input points") {
    forAllSeeded() { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (hx, hy) = Geo.convexHull(xs, ys)
      val input = xs.zip(ys).toSet
      hx.zip(hy).foreach(p => assert(input.contains(p)))
    }
  }

  test("hull is convex: every interior turn is strictly CCW (collinear dropped)") {
    forAllSeeded() { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (hx, hy) = Geo.convexHull(xs, ys)
      val m = hx.length - 1 // open vertex count (ring closed)
      if (m >= 3) {
        (0 until m).foreach { i =>
          val j = (i + 1) % m; val k = (i + 2) % m
          assert(cross(hx(i), hy(i), hx(j), hy(j), hx(k), hy(k)) > 0.0,
            s"non-CCW/collinear turn at $i of ${hx.zip(hy).mkString(",")}")
        }
      }
    }
  }

  test("hull contains every input point (edge-inclusive half-plane test)") {
    forAllSeeded() { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (hx, hy) = Geo.convexHull(xs, ys)
      val m = hx.length - 1
      if (m >= 3) {
        // CCW ring: a point is inside iff it is left-of-or-on every edge.
        // Exact for these inputs: all cross products are sums of products
        // of small integers/halves — representable without rounding.
        xs.zip(ys).foreach { case (px, py) =>
          (0 until m).foreach { i =>
            assert(cross(hx(i), hy(i), hx(i + 1), hy(i + 1), px, py) >= 0.0,
              s"point ($px,$py) right of hull edge $i")
          }
        }
      }
    }
  }

  test("degenerate hulls: single point and all-collinear inputs") {
    val (hx1, hy1) = Geo.convexHull(Array(3.5, 3.5, 3.5), Array(1.0, 1.0, 1.0))
    assert(hx1.toSeq === Seq(3.5, 3.5) && hy1.toSeq === Seq(1.0, 1.0))
    val (hx2, hy2) = Geo.convexHull(Array(0.0, 1.0, 2.0, 3.0), Array(0.0, 1.0, 2.0, 3.0))
    // collinear: ring degenerates to [min, max, min]
    assert(hx2.toSeq === Seq(0.0, 3.0, 0.0) && hy2.toSeq === Seq(0.0, 3.0, 0.0))
  }

  test("obb is a closed 4-corner rectangle containing every input point") {
    forAllSeeded(200) { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (ox, oy) = Geo.obb(xs, ys)
      assert(ox.length === 5 && ox.head === ox.last && oy.head === oy.last)
      // rectangle: opposite edges equal length, adjacent edges orthogonal
      def ex(i: Int) = (ox(i + 1) - ox(i), oy(i + 1) - oy(i))
      val dots = (0 until 3).map { i =>
        val (ax, ay) = ex(i); val (bx, by) = ex(i + 1); ax * bx + ay * by
      }
      val span = (xs.max - xs.min).max(ys.max - ys.min).max(1.0)
      dots.foreach(d => assert(math.abs(d) < 1e-9 * span * span, s"non-orthogonal edges: $dots"))
      // containment via projection onto the rectangle's own edge frame —
      // robust for DEGENERATE obbs (collinear input -> zero-width
      // rectangle, where a ray-cast/on-segment test breaks on the
      // rotate/unrotate rounding): p is inside iff its u- and v-axis
      // projections sit in [0, |u|^2] / [0, |v|^2] up to FP slack
      val (ux, uy) = (ox(1) - ox(0), oy(1) - oy(0))
      val (vx, vy) = (ox(3) - ox(0), oy(3) - oy(0))
      val (u2, v2) = (ux * ux + uy * uy, vx * vx + vy * vy)
      val eps = 1e-7 * span * span
      xs.zip(ys).foreach { case (px, py) =>
        val (dx, dy) = (px - ox(0), py - oy(0))
        val pu = dx * ux + dy * uy
        val pv = dx * vx + dy * vy
        val inside = pu >= -eps && pu <= u2 + eps && pv >= -eps && pv <= v2 + eps &&
          // degenerate axes: the projection residual must itself be ~0
          (v2 > eps || math.abs(dx * uy - dy * ux) <= eps * math.max(1.0, math.sqrt(u2))) &&
          (u2 > eps || (math.abs(dx) <= eps && math.abs(dy) <= eps))
        assert(inside, s"obb misses point ($px,$py): ${ox.zip(oy).mkString(",")}")
      }
    }
  }

  test("obb area never exceeds the axis-aligned bounding-box area") {
    forAllSeeded(200) { rnd =>
      val (xs, ys) = randomPoints(rnd)
      val (ox, oy) = Geo.obb(xs, ys)
      val obbArea = Geo.Polygon(ox, oy).area
      val aabb = (xs.max - xs.min) * (ys.max - ys.min)
      assert(obbArea <= aabb + 1e-9 * (aabb + 1.0),
        s"obb area $obbArea exceeds aabb $aabb")
    }
  }
}
