package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests over a seeded RNG (scalacheck's forAll bridge for
  * scalatest isn't in the offline cache; determinism matters more anyway). */
class CellIndexSpec extends AnyFunSuite {
  import CellIndex._

  private def forAllSeeded(n: Int = 200)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }
  private def lonOf(r: scala.util.Random) = r.nextDouble() * 359.998 - 179.999
  private def latOf(r: scala.util.Random) = r.nextDouble() * 179.998 - 89.999

  test("morton interleave round-trips") {
    forAllSeeded() { rnd =>
      val x = rnd.nextLong() & ((1L << 30) - 1); val y = rnd.nextLong() & ((1L << 30) - 1)
      val m = interleave(x, y)
      assert(compact1by1(m) === x)
      assert(compact1by1(m >> 1) === y)
    }
  }

  test("encode embeds resolution and is stable within a cell") {
    forAllSeeded() { rnd =>
      val lon = lonOf(rnd); val lat = latOf(rnd); val r = 1 + rnd.nextInt(MaxRes)
      val c = encode(lon, lat, r)
      assert(resolution(c) === r)
      // center of the cell encodes back to the same cell
      assert(encode(cellCenterLon(c), cellCenterLat(c), r) === c)
    }
  }

  test("point lies inside its cell box") {
    forAllSeeded() { rnd =>
      val lon = lonOf(rnd); val lat = latOf(rnd); val r = 1 + rnd.nextInt(MaxRes)
      val c = encode(lon, lat, r)
      val x0 = cellLonMin(c); val y0 = cellLatMin(c)
      assert(lon >= x0 - 1e-9 && lon <= x0 + cellLonWidth(r) + 1e-9)
      assert(lat >= y0 - 1e-9 && lat <= y0 + cellLatHeight(r) + 1e-9)
    }
  }

  test("parent contains child; childRange is contiguous and sorted-aligned") {
    forAllSeeded() { rnd =>
      val lon = lonOf(rnd); val lat = latOf(rnd); val r = 2 + rnd.nextInt(MaxRes - 1)
      val c = encode(lon, lat, r)
      val p = parent(c, r - 2)
      val (lo, hi) = childRange(p, r)
      assert(c >= lo && c <= hi)
      assert(hi - lo === (1L << (2 * 2)) - 1)
    }
  }

  test("kRing(c, 0) == [c]; kRing grows and contains the center") {
    forAllSeeded() { rnd =>
      val lon = lonOf(rnd); val lat = latOf(rnd); val r = 3 + rnd.nextInt(18); val k = 1 + rnd.nextInt(3)
      val c = encode(lon, lat, r)
      assert(kRing(c, 0).toSeq === Seq(c))
      val ring = kRing(c, k)
      assert(ring.contains(c))
      assert(ring.length <= (2 * k + 1) * (2 * k + 1))
      assert(ring.toSeq == ring.toSeq.sorted && ring.distinct.length == ring.length)
    }
  }

  test("kRing neighbors are adjacent cells (interior case, no wrap)") {
    val c = encode(10.0, 20.0, 10)
    val ring = kRing(c, 1)
    assert(ring.length === 9)
    val cx = cellX(c); val cy = cellY(c)
    for (n <- ring) {
      assert(math.abs(cellX(n) - cx) <= 1)
      assert(math.abs(cellY(n) - cy) <= 1)
    }
  }

  test("kRing wraps longitude at the antimeridian") {
    val c = fromXY(0, 5, 6) // west edge
    val ring = kRing(c, 1)
    assert(ring.length === 9)
    assert(ring.exists(n => cellX(n) === (1L << 6) - 1)) // wrapped to east edge
  }

  test("coverBBox covers every point of the box") {
    forAllSeeded(100) { rnd =>
      val lon = lonOf(rnd); val lat = latOf(rnd); val r = 3 + rnd.nextInt(10)
      val cover = coverBBox(lon, lat, math.min(lon + 1.0, 180), math.min(lat + 1.0, 90), r)
      val c = encode(lon, lat, r)
      assert(cover.contains(c))
      assert(java.util.Arrays.binarySearch(cover, encode(math.min(lon + 1.0, 179.999), math.min(lat + 1.0, 89.999), r)) >= 0)
    }
  }

  test("resForCover respects maxCells") {
    val r = resForCover(-10, -10, 10, 10, 64)
    val cover = coverBBox(-10, -10, 10, 10, r)
    assert(cover.length <= 64)
    // one resolution finer would exceed the budget
    assert(coverBBox(-10, -10, 10, 10, r + 1).length > 64)
  }

  test("coverPolygon is a superset of the polygon's points") {
    val poly = Geo.parsePolygon("POLYGON((0 0, 4 0, 4 3, 0 3, 0 0))")
    val cover = coverPolygon(poly, 256)
    val r = resolution(cover(0))
    // sample interior points: each must land in a covered cell
    for (i <- 0 to 11; j <- 0 to 8) {
      val px = 0.1 + i * 0.35; val py = 0.1 + j * 0.31
      assert(java.util.Arrays.binarySearch(cover, encode(px, py, r)) >= 0,
        s"point ($px,$py) not covered at res $r")
    }
  }

  test("tileId is row-major x * 2^z + y") {
    val z = 4
    assert(tileId(-180.0, -90.0, z) === 0L)
    assert(tileId(179.999, 89.999, z) === (1L << z) * (1L << z) - 1)
    assert(tileId(0.0, -90.0, z) === (1L << (z - 1)) * (1L << z)) // x=8,y=0
  }

  test("cell ids are Z-ordered: spatial locality implies id locality") {
    // two points in the same parent cell share the parent's id range
    val a = encode(13.5690032, 42.7957187, 20)
    val b = encode(13.5690100, 42.7957200, 20)
    val pa = parent(a, 12)
    val (lo, hi) = childRange(pa, 20)
    assert(b >= lo && b <= hi)
  }
}
