package graft.geo

/**
 * Pure-Scala planar geometry core: WKT parse/format and the derived-geometry
 * algorithms the reference obtains from its vendored osm2rdf converter
 * (reference: src/osm/Osm2ttl.cpp:91-112 invokes FactHandler/GeometryHandler;
 * golden outputs in tests/data/{node,way}.ttl show POINT/LINESTRING/POLYGON
 * plus centroid, envelope, convex hull, OBB, length, area).
 *
 * Coordinates are lon/lat degrees treated as a plane — consistent with the
 * reference's WKT handling (it never reprojects; lengths/areas come from
 * osm2rdf in the same coordinate space). WKT is formatted fixed-point with
 * 7 decimal digits, matching DEFAULT_WKT_PRECISION
 * (reference: include/config/Config.h:36, src/osm/Node.cpp:57-64).
 */
object Geo {

  final case class Envelope(xMin: Double, yMin: Double, xMax: Double, yMax: Double) {
    def containsPoint(x: Double, y: Double): Boolean =
      x >= xMin && x <= xMax && y >= yMin && y <= yMax
    def intersects(o: Envelope): Boolean =
      xMin <= o.xMax && o.xMin <= xMax && yMin <= o.yMax && o.yMin <= yMax
  }

  /** A simple polygon: outer shell only (closed ring; last point == first). */
  final case class Polygon(xs: Array[Double], ys: Array[Double]) {
    lazy val envelope: Envelope = {
      var x0 = Double.MaxValue; var y0 = Double.MaxValue
      var x1 = -Double.MaxValue; var y1 = -Double.MaxValue
      var i = 0
      while (i < xs.length) {
        if (xs(i) < x0) x0 = xs(i); if (xs(i) > x1) x1 = xs(i)
        if (ys(i) < y0) y0 = ys(i); if (ys(i) > y1) y1 = ys(i)
        i += 1
      }
      Envelope(x0, y0, x1, y1)
    }

    /**
     * Ray-casting point-in-polygon; boundary points count as inside
     * (edge-inclusive, matching the bbox-style `>= && <=` semantics the
     * PIP oracle uses for rectangles).
     */
    def contains(px: Double, py: Double): Boolean = {
      if (!envelope.containsPoint(px, py)) return false
      var inside = false
      var i = 0
      val n = xs.length - 1 // ring is closed
      while (i < n) {
        val x1 = xs(i); val y1 = ys(i); val x2 = xs(i + 1); val y2 = ys(i + 1)
        // on-segment check (collinear + within bbox)
        val cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (cross == 0.0 &&
            px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
            py >= math.min(y1, y2) && py <= math.max(y1, y2)) return true
        if ((y1 > py) != (y2 > py)) {
          val xInt = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
          if (px < xInt) inside = !inside
        }
        i += 1
      }
      inside
    }

    /** Conservative box-intersection test used by the cell coverer:
     * true if any polygon vertex is in the box, any box corner is in the
     * polygon, or any edges cross. */
    def intersectsBox(bx0: Double, by0: Double, bx1: Double, by1: Double): Boolean = {
      val box = Envelope(bx0, by0, bx1, by1)
      if (!envelope.intersects(box)) return false
      var i = 0
      while (i < xs.length) {
        if (box.containsPoint(xs(i), ys(i))) return true
        i += 1
      }
      if (contains(bx0, by0) || contains(bx1, by0) || contains(bx0, by1) || contains(bx1, by1)) return true
      // edge crossings
      val bxs = Array(bx0, bx1, bx1, bx0, bx0)
      val bys = Array(by0, by0, by1, by1, by0)
      i = 0
      while (i < xs.length - 1) {
        var j = 0
        while (j < 4) {
          if (segmentsIntersect(xs(i), ys(i), xs(i + 1), ys(i + 1), bxs(j), bys(j), bxs(j + 1), bys(j + 1)))
            return true
          j += 1
        }
        i += 1
      }
      false
    }

    /** Shoelace area (absolute). */
    def area: Double = {
      var a = 0.0
      var i = 0
      while (i < xs.length - 1) {
        a += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
        i += 1
      }
      math.abs(a) / 2.0
    }

    def centroid: (Double, Double) = {
      // area-weighted ring centroid; degenerate (zero-area) falls back to vertex mean
      var a = 0.0; var cx = 0.0; var cy = 0.0
      var i = 0
      while (i < xs.length - 1) {
        val f = xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
        a += f; cx += (xs(i) + xs(i + 1)) * f; cy += (ys(i) + ys(i + 1)) * f
        i += 1
      }
      if (math.abs(a) < 1e-12) {
        var sx = 0.0; var sy = 0.0
        i = 0
        while (i < xs.length - 1) { sx += xs(i); sy += ys(i); i += 1 }
        (sx / (xs.length - 1), sy / (xs.length - 1))
      } else (cx / (3 * a), cy / (3 * a))
    }
  }

  def segmentsIntersect(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                        bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean = {
    def orient(ox: Double, oy: Double, px: Double, py: Double, qx: Double, qy: Double): Int = {
      val v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
      if (v > 0) 1 else if (v < 0) -1 else 0
    }
    def onSeg(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Boolean =
      rx >= math.min(px, qx) && rx <= math.max(px, qx) && ry >= math.min(py, qy) && ry <= math.max(py, qy)
    val o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    val o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val o4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    if (o1 != o2 && o3 != o4) return true
    (o1 == 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) ||
    (o2 == 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)) ||
    (o3 == 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) ||
    (o4 == 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2))
  }

  // ---------------------------------------------------------------- WKT I/O

  /** Fixed-point 7-decimal coordinate formatting, string-golden like the
   * reference's XML/TTL fixtures (reference: tests/osm/Node.cpp:22-35). */
  def fmtCoord(v: Double): String = "%.7f".formatLocal(java.util.Locale.ROOT, v)

  def fmtPoint(lon: Double, lat: Double): String =
    s"POINT(${fmtCoord(lon)} ${fmtCoord(lat)})"

  def fmtLineString(xs: Array[Double], ys: Array[Double]): String = {
    val sb = new StringBuilder("LINESTRING(")
    var i = 0
    while (i < xs.length) {
      if (i > 0) sb.append(',')
      sb.append(fmtCoord(xs(i))).append(' ').append(fmtCoord(ys(i)))
      i += 1
    }
    sb.append(')').toString
  }

  def fmtPolygon(xs: Array[Double], ys: Array[Double]): String = {
    val sb = new StringBuilder("POLYGON((")
    var i = 0
    while (i < xs.length) {
      if (i > 0) sb.append(',')
      sb.append(fmtCoord(xs(i))).append(' ').append(fmtCoord(ys(i)))
      i += 1
    }
    sb.append("))").toString
  }

  /** Strip an RDF typed-literal wrapper: `"POINT(1 2)"^^<...wktLiteral>` ->
   * `POINT(1 2)` (reference: src/osm/Node.cpp:35-54 accepts both forms). */
  def stripLiteral(wkt: String): String = {
    var s = wkt.trim
    if (s.startsWith("\"")) {
      val end = s.indexOf('"', 1)
      if (end > 0) s = s.substring(1, end)
    }
    s
  }

  /** Parse the coordinate list of any single-geometry WKT into (xs, ys).
   * Whitespace-tolerant like the reference's parseLonLatFromWktPoint
   * (reference: src/osm/OsmObjectHelper.cpp:94-138). */
  def parseCoords(wkt: String): (Array[Double], Array[Double]) = {
    val s = stripLiteral(wkt)
    val open = s.indexOf('(')
    val close = s.lastIndexOf(')')
    require(open >= 0 && close > open, s"malformed WKT: $wkt")
    val body = s.substring(open + 1, close).replace("(", " ").replace(")", " ")
    val pairs = body.split(",").map(_.trim).filter(_.nonEmpty)
    val xs = new Array[Double](pairs.length)
    val ys = new Array[Double](pairs.length)
    var i = 0
    while (i < pairs.length) {
      val p = pairs(i).split("\\s+")
      xs(i) = java.lang.Double.parseDouble(p(0))
      ys(i) = java.lang.Double.parseDouble(p(1))
      i += 1
    }
    (xs, ys)
  }

  def parsePolygon(wkt: String): Polygon = {
    val (xs, ys) = parseCoords(wkt)
    // close the ring if the source didn't
    if (xs.length > 1 && (xs(0) != xs(xs.length - 1) || ys(0) != ys(ys.length - 1)))
      Polygon(xs :+ xs(0), ys :+ ys(0))
    else Polygon(xs, ys)
  }

  def parsePoint(wkt: String): (Double, Double) = {
    val (xs, ys) = parseCoords(wkt)
    (xs(0), ys(0))
  }

  // ------------------------------------------------------- derived geometry

  def envelopeOf(xs: Array[Double], ys: Array[Double]): Envelope = Polygon(xs, ys).envelope

  /** Ring order matches osm2rdf's envelope corner walk — (xmin ymin),
   * (xmin ymax), (xmax ymax), (xmax ymin), close — so envelope WKT is
   * string-identical to the reference goldens
   * (reference: tests/data/way.ttl `osm2rdfgeom:envelope` rows). */
  def envelopeWkt(e: Envelope): String =
    fmtPolygon(Array(e.xMin, e.xMin, e.xMax, e.xMax, e.xMin),
               Array(e.yMin, e.yMax, e.yMax, e.yMin, e.yMin))

  /** Polyline length (planar, degree units — same space the reference's
   * osm2rdf lengths live in). */
  def lineLength(xs: Array[Double], ys: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < xs.length - 1) {
      val dx = xs(i + 1) - xs(i); val dy = ys(i + 1) - ys(i)
      d += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    d
  }

  /** Vertex-mean centroid of a polyline over the FULL point sequence —
   * a repeated closing vertex counts like any other (the way_derived
   * DuckDB oracle implements the identical mean; Polygon.centroid handles
   * the POLYGON path separately). */
  def lineCentroid(xs: Array[Double], ys: Array[Double]): (Double, Double) = {
    var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < xs.length) { sx += xs(i); sy += ys(i); i += 1 }
    (sx / xs.length, sy / xs.length)
  }

  /** Monotone-chain convex hull; returns a closed CCW ring. */
  def convexHull(xs0: Array[Double], ys0: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xs0.length
    val idx = (0 until n).sortBy(i => (xs0(i), ys0(i))).toArray
    // dedupe identical points
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (i <- idx) {
      val p = (xs0(i), ys0(i))
      if (pts.isEmpty || pts.last != p) pts += p
    }
    if (pts.length == 1) {
      val (x, y) = pts(0)
      return (Array(x, x), Array(y, y))
    }
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val hull = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts) { // lower
      while (hull.length >= 2 && cross(hull(hull.length - 2), hull(hull.length - 1), p) <= 0) hull.remove(hull.length - 1)
      hull += p
    }
    val lower = hull.length + 1
    for (p <- pts.reverseIterator) { // upper
      while (hull.length >= lower && cross(hull(hull.length - 2), hull(hull.length - 1), p) <= 0) hull.remove(hull.length - 1)
      hull += p
    }
    // last point == first point: already closed by construction
    (hull.map(_._1).toArray, hull.map(_._2).toArray)
  }

  /** Minimum-area oriented bounding box via rotating calipers over hull
   * edges; returns a closed 5-point ring. */
  def obb(xs0: Array[Double], ys0: Array[Double]): (Array[Double], Array[Double]) = {
    val (hx, hy) = convexHull(xs0, ys0)
    val m = hx.length - 1 // open vertex count
    if (m <= 1) return (Array(hx(0), hx(0), hx(0), hx(0), hx(0)),
                        Array(hy(0), hy(0), hy(0), hy(0), hy(0)))
    var bestArea = Double.MaxValue
    var best: (Double, Double, Double, Double, Double, Double) = null // cos, sin, x0, y0, x1, y1
    var e = 0
    while (e < m) {
      val dx = hx(e + 1) - hx(e); val dy = hy(e + 1) - hy(e)
      val len = math.sqrt(dx * dx + dy * dy)
      if (len > 0) {
        val c = dx / len; val s = dy / len
        var x0 = Double.MaxValue; var y0 = Double.MaxValue
        var x1 = -Double.MaxValue; var y1 = -Double.MaxValue
        var i = 0
        while (i < m) {
          val rx = c * hx(i) + s * hy(i)
          val ry = -s * hx(i) + c * hy(i)
          if (rx < x0) x0 = rx; if (rx > x1) x1 = rx
          if (ry < y0) y0 = ry; if (ry > y1) y1 = ry
          i += 1
        }
        val a = (x1 - x0) * (y1 - y0)
        if (a < bestArea) { bestArea = a; best = (c, s, x0, y0, x1, y1) }
      }
      e += 1
    }
    val (c, s, x0, y0, x1, y1) = best
    def unrot(rx: Double, ry: Double): (Double, Double) = (c * rx - s * ry, s * rx + c * ry)
    val corners = Array(unrot(x0, y0), unrot(x1, y0), unrot(x1, y1), unrot(x0, y1), unrot(x0, y0))
    (corners.map(_._1), corners.map(_._2))
  }

  /** Planar Euclidean distance in degree units (the kNN refine metric;
   * matches the SQL oracle's sqrt(dx^2+dy^2)). */
  def dist(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    math.sqrt(dx * dx + dy * dy)
  }

  /** Great-circle (haversine) distance in meters — offered alongside the
   * planar metric for callers that need geodesic semantics. */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val R = 6371008.8
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }
}
