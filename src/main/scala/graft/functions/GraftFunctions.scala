package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.functions.call_function

/**
 * Registration + typed Column API for the graft geo expression family.
 *
 * Two registration paths, both public-Spark:
 *  - `GraftExtensions` for `SparkSession.builder().withExtensions(...)` /
 *    `spark.sql.extensions=graft.functions.GraftExtensions` (cluster path);
 *  - `GraftFunctions.register(spark)` for an existing session (test path).
 *
 * The Column wrappers use `functions.call_function`, so the same code works
 * against any registered session without reaching into private Column
 * internals.
 */
object GraftFunctions {

  // Inputs are coerced with explicit Casts at build time (the expressions
  // require exact input types; AbstractDataType/ExpectsInputTypes is
  // private[sql] in Spark 4, so coercion happens here instead).
  private def d(e: Expression) = Cast(e, DoubleType)
  private def i(e: Expression) = Cast(e, IntegerType)
  private def l(e: Expression) = Cast(e, LongType)
  private def t(e: Expression) = Cast(e, StringType)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cell_encode" -> (e => CellEncode(d(e(0)), d(e(1)), i(e(2)))),
    "cell_parent" -> (e => CellParent(l(e(0)), i(e(1)))),
    "cell_kring" -> (e => CellKRing(l(e(0)), i(e(1)))),
    "cell_cover_wkt" -> (e => CellCoverWkt(t(e(0)), i(e(1)), i(e(2)))),
    "tile_id" -> (e => TileIdExpr(d(e(0)), d(e(1)), i(e(2)))),
    "st_contains_pt" -> (e => StContains(t(e(0)), d(e(1)), d(e(2)))),
    "st_pack" -> (e => StPack(t(e(0)))),
    "st_contains_packed" -> (e => StContainsPacked(e(0), d(e(1)), d(e(2)))),
    "st_point" -> (e => StPoint(d(e(0)), d(e(1)))),
    "st_envelope" -> (e => StEnvelope(t(e(0)))),
    "st_centroid" -> (e => StCentroid(t(e(0)))),
    "st_length" -> (e => StLength(t(e(0)))),
    "st_area" -> (e => StArea(t(e(0)))),
    "st_convex_hull" -> (e => StConvexHull(t(e(0)))),
    "st_obb" -> (e => StObb(t(e(0)))),
    "st_bbox" -> (e => StBbox(t(e(0)))),
    "st_stitch_rings" -> (e => StStitchRings(e(0))),
    "st_x" -> (e => StX(t(e(0)))),
    "st_y" -> (e => StY(t(e(0)))),
    "planar_dist" -> (e => PlanarDist(d(e(0)), d(e(1)), d(e(2)), d(e(3)))),
    "haversine_m" -> (e => HaversineM(d(e(0)), d(e(1)), d(e(2)), d(e(3)))),
    // training-data hot paths (graft.text semantics, native loops)
    "vec_dot" -> (e => VecDot(e(0), e(1))),
    "char_fold_hash" -> (e => CharFoldHash(t(e(0)), l(e(1)), l(e(2)))),
    "token_hashes" -> (e => TokenHashes(e(0), l(e(1)), l(e(2)))),
    "trigram_hashes" -> (e => TrigramHashes(e(0), l(e(1)), l(e(2)))),
    "trigram60" -> (e => Trigram60(e(0))),
    "hash60_array" -> (e => Hash60Array(e(0))),
    "minhash_sig" -> (e => MinHashSig(e(0))),
    "simhash60" -> (e => SimHash60(e(0))),
    // k must be a foldable literal: the bound is part of the plan shape
    "topk_min" -> (e => TopKMinLongs(l(e(0)),
      e(1).eval().asInstanceOf[Number].intValue)),
  )

  def register(spark: SparkSession): Unit = builders.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
  }

  def injectAll(ext: SparkSessionExtensions): Unit = builders.foreach { case (name, b) =>
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GeoExpressions", name),
      (e: Seq[Expression]) => b(e)))
  }

  // ------------------------------------------------------------ Column API

  def cell_encode(lon: Column, lat: Column, res: Column): Column =
    call_function("cell_encode", lon, lat, res)
  def cell_parent(cell: Column, res: Column): Column =
    call_function("cell_parent", cell, res)
  def cell_kring(cell: Column, k: Column): Column =
    call_function("cell_kring", cell, k)
  def cell_cover_wkt(wkt: Column, maxCells: Column, maxRes: Column): Column =
    call_function("cell_cover_wkt", wkt, maxCells, maxRes)
  def tile_id(lon: Column, lat: Column, z: Column): Column =
    call_function("tile_id", lon, lat, z)
  def st_contains_pt(wkt: Column, lon: Column, lat: Column): Column =
    call_function("st_contains_pt", wkt, lon, lat)
  def st_pack(wkt: Column): Column = call_function("st_pack", wkt)
  def st_contains_packed(packed: Column, lon: Column, lat: Column): Column =
    call_function("st_contains_packed", packed, lon, lat)
  def st_point(lon: Column, lat: Column): Column = call_function("st_point", lon, lat)
  def st_envelope(wkt: Column): Column = call_function("st_envelope", wkt)
  def st_centroid(wkt: Column): Column = call_function("st_centroid", wkt)
  def st_length(wkt: Column): Column = call_function("st_length", wkt)
  def st_area(wkt: Column): Column = call_function("st_area", wkt)
  def st_convex_hull(wkt: Column): Column = call_function("st_convex_hull", wkt)
  def st_obb(wkt: Column): Column = call_function("st_obb", wkt)
  def st_bbox(wkt: Column): Column = call_function("st_bbox", wkt)
  def st_stitch_rings(segs: Column): Column = call_function("st_stitch_rings", segs)
  def st_x(wkt: Column): Column = call_function("st_x", wkt)
  def st_y(wkt: Column): Column = call_function("st_y", wkt)
  def planar_dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    call_function("planar_dist", x1, y1, x2, y2)
  def haversine_m(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    call_function("haversine_m", x1, y1, x2, y2)
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def char_fold_hash(s: Column, mult: Column, mod: Column): Column =
    call_function("char_fold_hash", s, mult, mod)
  def token_hashes(arr: Column, mult: Column, mod: Column): Column =
    call_function("token_hashes", arr, mult, mod)
  def trigram_hashes(toks: Column, mult: Column, mod: Column): Column =
    call_function("trigram_hashes", toks, mult, mod)
  def trigram60(toks: Column): Column = call_function("trigram60", toks)
  def hash60_array(arr: Column): Column = call_function("hash60_array", arr)
  def minhash_sig(hashes: Column): Column = call_function("minhash_sig", hashes)
  def simhash60(hashes: Column): Column = call_function("simhash60", hashes)
  /** k smallest values of a long column per group, sorted ascending. */
  def topk_min(v: Column, k: Int): Column =
    call_function("topk_min", v, org.apache.spark.sql.functions.lit(k))
}

/** `spark.sql.extensions`-loadable injector (cluster deployment path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectAll(ext)
}
