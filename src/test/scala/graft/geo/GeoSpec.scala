package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  import Geo._

  // Golden fixture coordinates from the reference's node test corpus
  // (reference: tests/data/node.ttl — POINT(13.5690032 42.7957187)).
  val refLon = 13.5690032
  val refLat = 42.7957187

  test("point WKT formats fixed-point precision 7 (golden)") {
    assert(fmtPoint(refLon, refLat) === "POINT(13.5690032 42.7957187)")
    assert(fmtPoint(0.0, -1.5) === "POINT(0.0000000 -1.5000000)")
  }

  test("point WKT parse round-trips, typed-literal tolerant") {
    assert(parsePoint("POINT(13.5690032 42.7957187)") === ((refLon, refLat)))
    assert(parsePoint("POINT( 13.5690032   42.7957187 )") === ((refLon, refLat)))
    assert(parsePoint("\"POINT(13.5690032 42.7957187)\"^^<http://www.opengis.net/ont/geosparql#wktLiteral>")
      === ((refLon, refLat)))
  }

  test("malformed WKT throws") {
    intercept[Exception](parsePoint("POINT 1 2"))
    intercept[Exception](parseCoords("LINESTRING"))
  }

  test("linestring format/parse round-trip") {
    val xs = Array(1.0, 2.5, 3.0); val ys = Array(4.0, 5.0, 6.5)
    val wkt = fmtLineString(xs, ys)
    assert(wkt === "LINESTRING(1.0000000 4.0000000,2.5000000 5.0000000,3.0000000 6.5000000)")
    val (px, py) = parseCoords(wkt)
    assert(px.toSeq === xs.toSeq && py.toSeq === ys.toSeq)
  }

  test("polygon parse closes an open ring") {
    val p = parsePolygon("POLYGON((0 0, 4 0, 4 3, 0 3))")
    assert(p.xs.length === 5)
    assert(p.xs(4) === p.xs(0) && p.ys(4) === p.ys(0))
  }

  test("PIP: interior, exterior, boundary, vertex") {
    val p = parsePolygon("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")
    assert(p.contains(2, 1.5))
    assert(!p.contains(5, 1.5))
    assert(!p.contains(2, 3.5))
    assert(p.contains(0, 0))    // vertex
    assert(p.contains(2, 0))    // edge
    assert(p.contains(4, 1.5))  // right edge
  }

  test("PIP: concave polygon") {
    // L-shape
    val p = parsePolygon("POLYGON((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))")
    assert(p.contains(0.5, 2.5))
    assert(p.contains(3.5, 0.5))
    assert(!p.contains(2.5, 2.0)) // inside bbox, outside L
  }

  test("area and centroid (shoelace)") {
    val p = parsePolygon("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")
    assert(p.area === 12.0)
    assert(p.centroid === ((2.0, 1.5)))
    val tri = parsePolygon("POLYGON((0 0, 3 0, 0 3, 0 0))")
    assert(tri.area === 4.5)
    assert(tri.centroid === ((1.0, 1.0)))
  }

  test("envelope of linestring") {
    val (xs, ys) = parseCoords("LINESTRING(1 5, -2 3, 4 -1)")
    val e = envelopeOf(xs, ys)
    assert(e === Envelope(-2, -1, 4, 5))
    assert(envelopeWkt(e) ===
      "POLYGON((-2.0000000 -1.0000000,-2.0000000 5.0000000,4.0000000 5.0000000,4.0000000 -1.0000000,-2.0000000 -1.0000000))")
  }

  test("line length and centroid") {
    val xs = Array(0.0, 3.0, 3.0); val ys = Array(0.0, 0.0, 4.0)
    assert(lineLength(xs, ys) === 7.0)
    assert(lineCentroid(xs, ys) === ((2.0, 4.0 / 3.0)))
  }

  test("convex hull of square + interior points is the square") {
    val xs = Array(0.0, 4.0, 4.0, 0.0, 2.0, 1.0)
    val ys = Array(0.0, 0.0, 4.0, 4.0, 2.0, 3.0)
    val (hx, hy) = convexHull(xs, ys)
    assert(hx.length === 5) // 4 corners + closing point
    val corners = hx.zip(hy).toSet
    assert(corners === Set((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    assert((hx(0), hy(0)) === ((hx(4), hy(4)))) // closed
  }

  test("hull is convex and contains all inputs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val n = 3 + rnd.nextInt(40)
      val xs = Array.fill(n)(rnd.nextDouble() * 10)
      val ys = Array.fill(n)(rnd.nextDouble() * 10)
      val (hx, hy) = convexHull(xs, ys)
      val hull = Polygon(hx, hy)
      for (i <- xs.indices) assert(hull.contains(xs(i), ys(i)), s"input $i outside hull")
    }
  }

  test("OBB contains all points and has >= hull area") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val n = 3 + rnd.nextInt(30)
      val xs = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val ys = Array.fill(n)(rnd.nextDouble() * 6)
      val (ox, oy) = obb(xs, ys)
      assert(ox.length === 5)
      val box = Polygon(ox, oy)
      for (i <- xs.indices) {
        // tolerance: box edges are computed via rotation
        val eps = 1e-9
        val grown = Polygon(
          ox.map(x => box.centroid._1 + (x - box.centroid._1) * (1 + eps)),
          oy.map(y => box.centroid._2 + (y - box.centroid._2) * (1 + eps)))
        assert(grown.contains(xs(i), ys(i)), s"input $i outside OBB")
      }
    }
  }

  test("OBB of an axis-aligned rectangle is (nearly) the rectangle") {
    val xs = Array(0.0, 4.0, 4.0, 0.0)
    val ys = Array(0.0, 0.0, 2.0, 2.0)
    val (ox, oy) = obb(xs, ys)
    assert(math.abs(Polygon(ox, oy).area - 8.0) < 1e-9)
  }

  test("planar dist and haversine") {
    assert(dist(0, 0, 3, 4) === 5.0)
    // one degree of latitude ~= 111.2 km
    val m = haversineMeters(0, 0, 0, 1)
    assert(m > 110000 && m < 112000)
  }

  test("segment intersection") {
    assert(segmentsIntersect(0, 0, 2, 2, 0, 2, 2, 0))
    assert(!segmentsIntersect(0, 0, 1, 1, 2, 2, 3, 3))
    assert(segmentsIntersect(0, 0, 2, 0, 1, 0, 3, 0)) // collinear overlap
  }

  test("polygon intersectsBox") {
    val p = parsePolygon("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")
    assert(p.intersectsBox(-1, -1, 1, 1))    // corner overlap
    assert(p.intersectsBox(1, 1, 2, 2))      // box fully inside
    assert(p.intersectsBox(-1, -1, 5, 4))    // polygon fully inside box
    assert(!p.intersectsBox(5, 5, 6, 6))     // disjoint
    assert(!p.intersectsBox(-2, -2, -1, -1)) // disjoint diagonal
  }
}
