package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.{CellIndex, Geo}

/**
 * Native Catalyst expressions for the cell index + geometry core — the
 * engine's replacement for the reference's vendored osm2rdf geometry stage
 * (reference: src/osm/Osm2ttl.cpp:91-112) and its external `osmium extract`
 * spatial filter (reference: src/osm/OsmUpdater.cpp:281-304).
 *
 * Hot scalar paths (cell encode, tile id, distance, point format) implement
 * `doGenCode` as static calls into the pure-Scala core, so they stay inside
 * whole-stage codegen. Array- and WKT-shaped results use eval with a
 * per-partition parse cache (`WktCache`) — parsing each distinct polygon WKT
 * once per task, which is the moral equivalent of the reference broadcasting
 * pre-parsed geometries.
 */
object WktCache {
  private val cache = new ThreadLocal[java.util.LinkedHashMap[String, Geo.Polygon]] {
    override def initialValue(): java.util.LinkedHashMap[String, Geo.Polygon] =
      new java.util.LinkedHashMap[String, Geo.Polygon](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Geo.Polygon]): Boolean =
          size() > 4096
      }
  }
  def polygon(wkt: String): Geo.Polygon = {
    val c = cache.get()
    var p = c.get(wkt)
    if (p == null) { p = Geo.parsePolygon(wkt); c.put(wkt, p) }
    p
  }
}

/** Static entry points referenced from generated Java code. */
object GeoOps {
  def cellEncode(lon: Double, lat: Double, res: Int): Long = CellIndex.encode(lon, lat, res)
  def tileId(lon: Double, lat: Double, z: Int): Long = CellIndex.tileId(lon, lat, z)
  def planarDist(x1: Double, y1: Double, x2: Double, y2: Double): Double = Geo.dist(x1, y1, x2, y2)
  def haversine(x1: Double, y1: Double, x2: Double, y2: Double): Double =
    Geo.haversineMeters(x1, y1, x2, y2)
  def stPoint(lon: Double, lat: Double): UTF8String = UTF8String.fromString(Geo.fmtPoint(lon, lat))
  def cellParent(cell: Long, res: Int): Long = CellIndex.parent(cell, res)
  def stContains(wkt: UTF8String, lon: Double, lat: Double): Boolean =
    WktCache.polygon(wkt.toString).contains(lon, lat)

  /** Edge-inclusive ray-cast over interleaved [x0,y0,x1,y1,...] coords —
   * identical decision procedure to Geo.Polygon.contains, minus the
   * envelope precheck (one fused loop, no allocation). */
  def containsPacked(packed: ArrayData, px: Double, py: Double): Boolean = {
    val n = packed.numElements() / 2 - 1 // ring is closed
    var inside = false
    var i = 0
    while (i < n) {
      val x1 = packed.getDouble(2 * i);     val y1 = packed.getDouble(2 * i + 1)
      val x2 = packed.getDouble(2 * i + 2); val y2 = packed.getDouble(2 * i + 3)
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
}

/** cell_encode(lon, lat, res) -> sortable Z-order cell id. */
case class CellEncode(lon: Expression, lat: Expression, res: Expression)
    extends TernaryExpression {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = res
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoOps.cellEncode(a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoOps.cellEncode($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(lon = f, lat = s, res = t)
}

/** tile_id(lon, lat, z) -> flat row-major tile id x * 2^z + y. */
case class TileIdExpr(lon: Expression, lat: Expression, z: Expression)
    extends TernaryExpression {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = z
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoOps.tileId(a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoOps.tileId($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(lon = f, lat = s, z = t)
}

/** cell_parent(cell, parentRes) -> ancestor cell id. */
case class CellParent(cell: Expression, res: Expression) extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = res
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.cellParent(a.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.cellParent($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(cell = l, res = r)
}

/** cell_kring(cell, k) -> array<long> of same-resolution neighbors (sorted). */
case class CellKRing(cell: Expression, k: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = cell
  override def right: Expression = k
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(CellIndex.kRing(a.asInstanceOf[Long], b.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(cell = l, k = r)
}

/** cell_cover_wkt(polygonWkt, maxCells, maxRes) -> array<long> cell-union
 * cover (S2 RegionCoverer analogue; superset prefilter for PIP). */
case class CellCoverWkt(wkt: Expression, maxCells: Expression, maxRes: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = wkt
  override def second: Expression = maxCells
  override def third: Expression = maxRes
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val poly = WktCache.polygon(a.asInstanceOf[UTF8String].toString)
    new GenericArrayData(CellIndex.coverPolygon(poly, b.asInstanceOf[Int], c.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(wkt = f, maxCells = s, maxRes = t)
}

/**
 * st_pack(polygonWkt) -> array<double> of interleaved ring coordinates
 * [x0,y0,x1,y1,...]. Parse-once companion to `st_contains_packed`: the WKT
 * is parsed on the (small) polygon side of a PIP join, and the refine
 * filter then runs over unboxed doubles — no per-candidate string
 * conversion, hashing, or cache lookups.
 */
case class StPack(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val p = Geo.parsePolygon(v.asInstanceOf[UTF8String].toString)
    val out = new Array[Double](p.xs.length * 2)
    var i = 0
    while (i < p.xs.length) { out(2 * i) = p.xs(i); out(2 * i + 1) = p.ys(i); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_contains_packed(packed, lon, lat) — edge-inclusive ray-cast PIP over a
 * packed coordinate array (same semantics as StContains; hot-path variant
 * that stays inside whole-stage codegen and touches no strings). */
case class StContainsPacked(packed: Expression, lon: Expression, lat: Expression)
    extends TernaryExpression {
  override def first: Expression = packed
  override def second: Expression = lon
  override def third: Expression = lat
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoOps.containsPacked(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoOps.containsPacked($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(packed = f, lon = s, lat = t)
}

/** st_contains(polygonWkt, lon, lat) — exact edge-inclusive PIP refine. */
case class StContains(wkt: Expression, lon: Expression, lat: Expression)
    extends TernaryExpression {
  override def first: Expression = wkt
  override def second: Expression = lon
  override def third: Expression = lat
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoOps.stContains(a.asInstanceOf[UTF8String], b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.GeoOps.stContains($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(wkt = f, lon = s, lat = t)
}

/** st_point(lon, lat) -> 'POINT(l.lllllll a.aaaaaaa)' at fixed precision 7. */
case class StPoint(lon: Expression, lat: Expression) extends BinaryExpression {
  override def left: Expression = lon
  override def right: Expression = lat
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoOps.stPoint(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GeoOps.stPoint($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lon = l, lat = r)
}

/** planar_dist(x1, y1, x2, y2) — Euclidean degree-space distance (kNN metric). */
case class PlanarDist(x1: Expression, y1: Expression, x2: Expression, y2: Expression)
    extends QuaternaryExpression {
  override def first: Expression = x1
  override def second: Expression = y1
  override def third: Expression = x2
  override def fourth: Expression = y2
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.planarDist(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.GeoOps.planarDist($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(x1 = f, y1 = s, x2 = t, y2 = q)
}

/** haversine_m(lon1, lat1, lon2, lat2) — geodesic meters. */
case class HaversineM(x1: Expression, y1: Expression, x2: Expression, y2: Expression)
    extends QuaternaryExpression {
  override def first: Expression = x1
  override def second: Expression = y1
  override def third: Expression = x2
  override def fourth: Expression = y2
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.haversine(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.functions.GeoOps.haversine($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(x1 = f, y1 = s, x2 = t, y2 = q)
}

/**
 * Unary WKT -> derived-geometry family. One expression class per output,
 * mirroring the derived columns osm2rdf materializes per geometry
 * (centroid / envelope / convex hull / OBB / length / area; see reference
 * golden fixtures tests/data/way.ttl).
 */
abstract class WktUnary extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  protected def coords(v: Any): (Array[Double], Array[Double]) =
    Geo.parseCoords(v.asInstanceOf[UTF8String].toString)
}

case class StEnvelope(child: Expression) extends WktUnary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val (xs, ys) = coords(v)
    UTF8String.fromString(Geo.envelopeWkt(Geo.envelopeOf(xs, ys)))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StCentroid(child: Expression) extends WktUnary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val (cx, cy) =
      if (Geo.stripLiteral(s).startsWith("POLYGON")) Geo.parsePolygon(s).centroid
      else { val (xs, ys) = Geo.parseCoords(s); Geo.lineCentroid(xs, ys) }
    UTF8String.fromString(Geo.fmtPoint(cx, cy))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StLength(child: Expression) extends WktUnary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val (xs, ys) = coords(v)
    Geo.lineLength(xs, ys)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StArea(child: Expression) extends WktUnary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Geo.parsePolygon(v.asInstanceOf[UTF8String].toString).area
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StConvexHull(child: Expression) extends WktUnary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val (xs, ys) = coords(v)
    val (hx, hy) = Geo.convexHull(xs, ys)
    UTF8String.fromString(Geo.fmtPolygon(hx, hy))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StObb(child: Expression) extends WktUnary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val (xs, ys) = coords(v)
    val (ox, oy) = Geo.obb(xs, ys)
    UTF8String.fromString(Geo.fmtPolygon(ox, oy))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_bbox(wkt) -> array<double> [xmin, ymin, xmax, ymax] — StEnvelope's
 * numeric sibling, so range operators (tile covers, cell ranges) can
 * consume geometry bounds without re-parsing envelope-WKT corners. */
case class StBbox(child: Expression) extends WktUnary {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val (xs, ys) = coords(v)
    val e = Geo.envelopeOf(xs, ys)
    new GenericArrayData(Array(e.xMin, e.yMin, e.xMax, e.yMax))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_x / st_y — coordinate extraction from a point WKT (typed-literal
 * tolerant, like the reference's parseLonLatFromWktPoint,
 * src/osm/OsmObjectHelper.cpp:94-138). */
case class StX(child: Expression) extends WktUnary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = coords(v)._1(0)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
case class StY(child: Expression) extends WktUnary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = coords(v)._2(0)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_makeline(array<struct<...lon, lat>>) is composed from built-ins in
 * GeometryBuild (sort_array + aggregate + format_string) — no expression
 * needed; kept out deliberately to maximize whole-stage codegen coverage. */

/**
 * st_stitch_rings(segs) — the multipolygon ring assembler as a native
 * expression with a HASH ENDPOINT INDEX (VERDICT.md r04 missing #3 / next
 * #5). Implements EXACTLY the stitching contract documented on
 * GeometryBuild.buildRelPolygonsStitched (and replayed bit-for-bit by the
 * rel_polygons_stitched DuckDB oracle's recursive CTE):
 *
 *  - an empty chain seeds from the LOWEST-indexed unconsumed segment;
 *  - otherwise the LOWEST-indexed unconsumed segment sharing an endpoint
 *    node with either chain endpoint extends it (orientation precedence:
 *    seg.first=chain.last append, seg.last=chain.last append-reversed,
 *    seg.last=chain.first prepend, seg.first=chain.first prepend-reversed);
 *  - no touching segment -> the chain force-closes (repeat first point
 *    unless already closed; counts into `forced` unless already closed);
 *  - after every step a chain with >= 4 points and first == last closes as
 *    a ring.
 *
 * The prior higher-order-function fold (aggregate over 2S steps, each
 * filter-scanning the unconsumed array) was O(S^2) element_at scans plus
 * O(S * points) chain copies per relation — fine for the
 * hundreds-of-segments regime, a task-staller at osm2rdf's
 * 10k-segment coastline relations (reference keeps this linear via
 * hash-indexed assembly, vendored geometry at src/osm/Osm2ttl.cpp:91-112).
 * Here: endpoint-node -> TreeSet[segment index] buckets give O(log S)
 * lowest-index lookup, an ArrayDeque gives O(1) append/prepend, total
 * O(S log S + points) — a 1k-segment ring stitches in milliseconds
 * (GeometryStitchSpec bounds it).
 *
 * Input:  array<array<struct<n:bigint, x:double, y:double>>> (segments in
 *         (pos, member_id) order, each segment >= 1 point)
 * Output: struct<rings: array<array<struct<n,x,y>>>, forced: int>
 *
 * Runs once per (relation, role) row on relation-sized state — an eval-mode
 * expression (CodegenFallback) like every non-scalar geometry op here; the
 * hot scan paths around it stay codegen'd.
 */
case class StStitchRings(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val ptStruct = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("rings",
      ArrayType(ArrayType(ptStruct, containsNull = false), containsNull = false),
      nullable = false),
    StructField("forced", IntegerType, nullable = false)))

  private final class Pt(val n: Long, val x: Double, val y: Double)

  override protected def nullSafeEval(v: Any): Any = {
    val segsData = v.asInstanceOf[ArrayData]
    val s = segsData.numElements()
    // decode once into primitive-backed segments
    val segs = new Array[Array[Pt]](s)
    var i = 0
    while (i < s) {
      val seg = segsData.getArray(i)
      val m = seg.numElements()
      val pts = new Array[Pt](m)
      var j = 0
      while (j < m) {
        val r = seg.getStruct(j, 3)
        pts(j) = new Pt(r.getLong(0), r.getDouble(1), r.getDouble(2))
        j += 1
      }
      segs(i) = pts
      i += 1
    }
    // endpoint-node -> unconsumed segment indices (lowest-first)
    val buckets = new java.util.HashMap[Long, java.util.TreeSet[Integer]]()
    def bucket(n: Long): java.util.TreeSet[Integer] = {
      var b = buckets.get(n)
      if (b == null) { b = new java.util.TreeSet[Integer](); buckets.put(n, b) }
      b
    }
    i = 0
    while (i < s) {
      if (segs(i).nonEmpty) {
        bucket(segs(i).head.n).add(i)
        bucket(segs(i).last.n).add(i)
      }
      i += 1
    }
    val consumed = new Array[Boolean](s)
    def consume(ix: Int): Unit = {
      consumed(ix) = true
      // empty segments were never bucketed (defensive skip in the seed
      // scan) — touching .head/.last here would throw on exactly them
      if (segs(ix).nonEmpty) {
        bucket(segs(ix).head.n).remove(ix)
        bucket(segs(ix).last.n).remove(ix)
      }
      ()
    }
    val rings = new scala.collection.mutable.ArrayBuffer[Array[Pt]]()
    var forced = 0
    val chain = new java.util.ArrayDeque[Pt]()
    def closeChainToRing(): Unit = {
      val ring =
        if (chain.size > 0 && chain.peekFirst.n != chain.peekLast.n) {
          val a = new Array[Pt](chain.size + 1)
          var k = 0; val it = chain.iterator()
          while (it.hasNext) { a(k) = it.next(); k += 1 }
          a(k) = a(0); a
        } else {
          val a = new Array[Pt](chain.size)
          var k = 0; val it = chain.iterator()
          while (it.hasNext) { a(k) = it.next(); k += 1 }
          a
        }
      rings += ring
      chain.clear()
    }
    var nextSeed = 0
    var remaining = s
    while (remaining > 0 || !chain.isEmpty) {
      if (chain.isEmpty) {
        // seed from the lowest-indexed unconsumed segment
        while (nextSeed < s && (consumed(nextSeed) || segs(nextSeed).isEmpty)) {
          if (!consumed(nextSeed)) { consume(nextSeed); remaining -= 1 } // empty seg
          nextSeed += 1
        }
        if (nextSeed >= s) { remaining = 0 }
        else {
          val sg = segs(nextSeed)
          var j = 0
          while (j < sg.length) { chain.addLast(sg(j)); j += 1 }
          consume(nextSeed); remaining -= 1
        }
      } else {
        val hN = chain.peekFirst.n
        val tN = chain.peekLast.n
        val bh = buckets.get(hN); val bt = buckets.get(tN)
        val candH = if (bh == null || bh.isEmpty) -1 else bh.first().intValue()
        val candT = if (bt == null || bt.isEmpty) -1 else bt.first().intValue()
        val ix =
          if (candH < 0) candT
          else if (candT < 0) candH
          else math.min(candH, candT)
        if (ix < 0) {
          // no unconsumed segment touches the chain: force-close
          if (chain.peekFirst.n != chain.peekLast.n) forced += 1
          closeChainToRing()
        } else {
          val sg = segs(ix)
          // orientation precedence mirrors the documented contract order —
          // and WHICH copy of the shared endpoint survives matches the
          // fold/oracle exactly (append keeps the chain's copy: tail(seg)
          // drops seg's; prepend keeps the SEG's copy: tail(chain) drops
          // the chain's). Identical only matters for dirty inputs where
          // one node id carries two coordinate values, but the oracle
          // replay is bit-for-bit either way (review finding).
          if (sg.head.n == tN) { // chain ++ tail(seg)
            var j = 1; while (j < sg.length) { chain.addLast(sg(j)); j += 1 }
          } else if (sg.last.n == tN) { // chain ++ tail(reverse(seg))
            var j = sg.length - 2; while (j >= 0) { chain.addLast(sg(j)); j -= 1 }
          } else if (sg.last.n == hN) { // seg ++ tail(chain)
            chain.pollFirst()
            var j = sg.length - 1; while (j >= 0) { chain.addFirst(sg(j)); j -= 1 }
          } else { // sg.head.n == hN: reverse(seg) ++ tail(chain)
            chain.pollFirst()
            var j = 0; while (j < sg.length) { chain.addFirst(sg(j)); j += 1 }
          }
          consume(ix); remaining -= 1
        }
      }
      if (chain.size >= 4 && chain.peekFirst.n == chain.peekLast.n)
        closeChainToRing()
    }
    val ringsData = new GenericArrayData(rings.map { r =>
      new GenericArrayData(r.map(p =>
        InternalRow(p.n, p.x, p.y): Any).toArray[Any]): Any
    }.toArray[Any])
    InternalRow(ringsData, forced)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
