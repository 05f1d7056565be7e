package graft.geo

/**
 * From-scratch hierarchical geospatial cell index (H3/S2-style API, Z-order
 * layout). Replaces the external H3/S2 libraries called for by the north
 * rule — none ship with this Spark distribution, so the index is built from
 * first principles on a Morton (Z-order) space-filling curve over an
 * equirectangular lon/lat grid.
 *
 * Design rationale (scale-first):
 *  - At resolution `r` the world splits into 2^r x 2^r cells; a cell id packs
 *    `(r << 60) | morton(x, y)` into one Long, so a cell id is a *sortable*
 *    key and children of a cell occupy a contiguous id range. That is exactly
 *    what the lineage/checkpoint layer needs: `repartitionByRange($"cell")`
 *    yields partitions whose content is describable as one `(lo, hi)` cell
 *    range (BASELINE.json north_rule "range-partitioned shuffles",
 *    "per-partition lineage (cell range, ...)").
 *  - kRing/cover have the same roles as H3 `kRing` / S2 `RegionCoverer`:
 *    kRing powers the kNN cell-ring expansion, cover powers the PIP/tile
 *    prefilter joins. The reference's only spatial predicate was an external
 *    `osmium extract --bbox/--polygon` child process
 *    (reference: src/osm/OsmUpdater.cpp:281-304); here the same filtering is
 *    a cell-prefilter equi-join plus exact refinement, fully inside Catalyst.
 *
 * All functions are pure, allocation-light, and deterministic — safe inside
 * codegen'd expressions and safe to replay from a checkpoint.
 */
object CellIndex {
  /** Max resolution: 2r Morton bits live in bits 0..55; the 5-bit
   * resolution field lives in bits 56..60, keeping ids positive Longs. */
  val MaxRes = 28
  private val ResShift = 56
  private val MortonMask = (1L << ResShift) - 1

  val LonMin = -180.0
  val LonMax = 180.0
  val LatMin = -90.0
  val LatMax = 90.0

  /** Interleave the low 30 bits of x (even positions) and y (odd). */
  def interleave(x: Long, y: Long): Long = part1by1(x) | (part1by1(y) << 1)

  /** Spread the low 30 bits of v to even bit positions (0,2,4,...,58). */
  private[geo] def part1by1(v0: Long): Long = {
    var v = v0 & 0x3fffffffL // 30 bits
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Inverse of part1by1: gather even bit positions into the low 30 bits. */
  private[geo] def compact1by1(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >> 1)) & 0x3333333333333333L
    v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >> 16)) & 0x000000003fffffffL
    v
  }

  /** Grid x index of a longitude at resolution r (clamped to the grid). */
  def lonToX(lon: Double, res: Int): Long = {
    val n = 1L << res
    val t = (lon - LonMin) / (LonMax - LonMin)
    val x = (t * n).toLong
    if (x < 0) 0L else if (x >= n) n - 1 else x
  }

  def latToY(lat: Double, res: Int): Long = {
    val n = 1L << res
    val t = (lat - LatMin) / (LatMax - LatMin)
    val y = (t * n).toLong
    if (y < 0) 0L else if (y >= n) n - 1 else y
  }

  /** Encode a lon/lat point into a cell id at resolution `res`. */
  def encode(lon: Double, lat: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"resolution $res out of [0, $MaxRes]")
    fromXY(lonToX(lon, res), latToY(lat, res), res)
  }

  def fromXY(x: Long, y: Long, res: Int): Long =
    (res.toLong << ResShift) | interleave(x, y)

  def resolution(cell: Long): Int = ((cell >>> ResShift) & 0x1fL).toInt

  def cellX(cell: Long): Long = compact1by1(cell & MortonMask)
  def cellY(cell: Long): Long = compact1by1((cell & MortonMask) >> 1)

  /** West edge longitude of the cell. */
  def cellLonMin(cell: Long): Double = {
    val r = resolution(cell); val n = (1L << r).toDouble
    LonMin + (LonMax - LonMin) * (cellX(cell) / n)
  }
  def cellLatMin(cell: Long): Double = {
    val r = resolution(cell); val n = (1L << r).toDouble
    LatMin + (LatMax - LatMin) * (cellY(cell) / n)
  }
  def cellLonWidth(res: Int): Double = (LonMax - LonMin) / (1L << res).toDouble
  def cellLatHeight(res: Int): Double = (LatMax - LatMin) / (1L << res).toDouble

  /** Center of the cell — the canonical representative point. */
  def cellCenterLon(cell: Long): Double =
    cellLonMin(cell) + cellLonWidth(resolution(cell)) / 2
  def cellCenterLat(cell: Long): Double =
    cellLatMin(cell) + cellLatHeight(resolution(cell)) / 2

  /** Parent cell at a coarser resolution (like H3 cellToParent). */
  def parent(cell: Long, parentRes: Int): Long = {
    val r = resolution(cell)
    require(parentRes <= r, s"parentRes $parentRes > res $r")
    fromXY(cellX(cell) >> (r - parentRes), cellY(cell) >> (r - parentRes), parentRes)
  }

  /**
   * Contiguous Morton range `[lo, hi]` (inclusive) of all descendants of
   * `cell` at resolution `childRes`. Because ids are Z-ordered, children of
   * one cell form exactly one range — the property the lineage table's
   * `cellRange` field and `repartitionByRange` both exploit.
   */
  def childRange(cell: Long, childRes: Int): (Long, Long) = {
    val r = resolution(cell)
    require(childRes >= r)
    val d = childRes - r
    val base = cell & MortonMask
    val lo = (childRes.toLong << ResShift) | (base << (2 * d))
    val hi = lo | ((1L << (2 * d)) - 1)
    (lo, hi)
  }

  /**
   * All cells within Chebyshev distance k of `cell` at the same resolution
   * (the analogue of H3 kRing): the (2k+1)^2 window, longitude-wrapped at
   * the antimeridian, latitude-clamped at the poles. Result is sorted and
   * deduplicated so callers can rely on a canonical order.
   */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val r = resolution(cell)
    val n = 1L << r
    val cx = cellX(cell); val cy = cellY(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dy = -k
    while (dy <= k) {
      val y = cy + dy
      if (y >= 0 && y < n) {
        var dx = -k
        while (dx <= k) {
          val x = ((cx + dx) % n + n) % n // wrap lon
          out += fromXY(x, y, r)
          dx += 1
        }
      }
      dy += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    // dedupe (wrap can alias when 2k+1 >= n)
    var w = 0; var i = 0
    while (i < arr.length) {
      if (w == 0 || arr(w - 1) != arr(i)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(arr, w)
  }

  /**
   * Cell cover of a lon/lat bounding box at `res` — every cell whose box
   * intersects the query box. Caller bounds the blow-up via `coverRes`:
   * use `resForCover` to pick a resolution that keeps the count <= maxCells.
   */
  def coverBBox(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, res: Int): Array[Long] = {
    val x0 = lonToX(lonMin, res); val x1 = lonToX(lonMax, res)
    val y0 = latToY(latMin, res); val y1 = latToY(latMax, res)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var y = y0
    while (y <= y1) {
      var x = x0
      while (x <= x1) { out(i) = fromXY(x, y, res); i += 1; x += 1 }
      y += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Finest resolution whose bbox cover of the given extent has <= maxCells cells. */
  def resForCover(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                  maxCells: Int, maxRes: Int = MaxRes): Int = {
    var r = maxRes
    while (r > 0) {
      val nx = lonToX(lonMax, r) - lonToX(lonMin, r) + 1
      val ny = latToY(latMax, r) - latToY(latMin, r) + 1
      if (nx * ny <= maxCells) return r
      r -= 1
    }
    0
  }

  /**
   * Cell-union cover of a polygon (S2 RegionCoverer analogue): bbox cover at
   * an adaptive resolution, narrowed to cells whose box intersects the
   * polygon. The cover is a *superset* prefilter — exact containment is the
   * refine step's job (Geo.contains), mirroring the two-phase PIP plan.
   */
  def coverPolygon(poly: Geo.Polygon, maxCells: Int, maxRes: Int = MaxRes): Array[Long] = {
    val env = poly.envelope
    val r = resForCover(env.xMin, env.yMin, env.xMax, env.yMax, maxCells, maxRes)
    coverBBox(env.xMin, env.yMin, env.xMax, env.yMax, r).filter { c =>
      val lo = cellLonMin(c); val la = cellLatMin(c)
      poly.intersectsBox(lo, la, lo + cellLonWidth(r), la + cellLatHeight(r))
    }
  }

  /** Web-mercator-style flat tile id at zoom z: row-major x * 2^z + y.
   * Deliberately arithmetic (no bit interleave) so external systems
   * (and the DuckDB oracle) can derive the same id with plain SQL. */
  def tileId(lon: Double, lat: Double, z: Int): Long = {
    val n = 1L << z
    lonToX(lon, z) * n + latToY(lat, z)
  }
}
