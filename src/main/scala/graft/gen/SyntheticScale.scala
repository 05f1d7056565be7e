package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic spatial input at arbitrary scale, generated from
 * `spark.range` with the same integer-hash arithmetic as DerivedTables — no
 * external data, no RNG state. Used by the scaling study (same job, same
 * input, two parallelism levels) because the driver parquet at sf0.1 is too
 * small to expose parallel efficiency: generation is distributed and
 * unbounded.
 *
 * ~30% of points land in one hot ~0.1 degree box (FIXTURES.md §4 skew
 * fixture) so the scaling run also exercises the salted/AQE skew paths.
 */
object SyntheticScale {

  def points(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("pid"),
      when(col("id") % 10 < 3,
        lit(-0.05) + (pmod(col("id") * 7919 + 131, lit(1000)).cast("double")) / 10000.0)
        .otherwise(
          (pmod(col("id") * 7919 + 104729, lit(3600000)).cast("double")) / 10000.0 - 180.0)
        .as("lon"),
      when(col("id") % 10 < 3,
        lit(51.5) + (pmod(col("id") * 104729 + 173, lit(1000)).cast("double")) / 10000.0)
        .otherwise(
          (pmod(col("id") * 104729 + 7919, lit(1700000)).cast("double")) / 10000.0 - 85.0)
        .as("lat"))

  /** Rectangle polygons as WKT (one in the hot box, the rest spread). */
  def rectPolys(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("poly_id"),
      ((pmod(col("id") * 7919, lit(3200000)).cast("double")) / 10000.0 - 160.0).as("cx"),
      ((pmod(col("id") * 104729, lit(1500000)).cast("double")) / 10000.0 - 75.0).as("cy"),
      (lit(0.2) + pmod(col("id"), lit(37)).cast("double") / 10.0).as("hw"),
      (lit(0.2) + pmod(col("id"), lit(23)).cast("double") / 10.0).as("hh"))
      .select(col("poly_id"),
        concat(lit("POLYGON(("),
          format_string("%.7f %.7f", col("cx") - col("hw"), col("cy") - col("hh")), lit(","),
          format_string("%.7f %.7f", col("cx") + col("hw"), col("cy") - col("hh")), lit(","),
          format_string("%.7f %.7f", col("cx") + col("hw"), col("cy") + col("hh")), lit(","),
          format_string("%.7f %.7f", col("cx") - col("hw"), col("cy") + col("hh")), lit(","),
          format_string("%.7f %.7f", col("cx") - col("hw"), col("cy") - col("hh")), lit("))"))
          .as("wkt"))

  /** Irregular star-convex polygons as WKT: `nVertices` vertices at sorted
   * angles with hash-jittered radii around a hash-placed center. Same
   * deterministic integer arithmetic as the rest of the generator.
   *
   * Real-world polygon sets (buildings, admin boundaries) carry dozens to
   * hundreds of vertices, so the PIP refine step does real ray-cast work
   * per candidate — the 4-vertex rectangles keep the scaling job almost
   * pure memory streaming, which on a single VM measures the DRAM
   * bandwidth ceiling instead of operator scalability (measured: a
   * bandwidth-bound sweep scales 2.4x from 8 to 32 threads on this host
   * while pure compute scales 3.9x; executors on a real cluster do not
   * share one memory bus). */
  def irregularPolys(spark: SparkSession, n: Long, nVertices: Int = 48): DataFrame = {
    val twoPi = 2.0 * math.Pi
    spark.range(n).select(
      col("id").as("poly_id"),
      ((pmod(col("id") * 7919, lit(3200000)).cast("double")) / 10000.0 - 160.0).as("cx"),
      ((pmod(col("id") * 104729, lit(1500000)).cast("double")) / 10000.0 - 75.0).as("cy"),
      (lit(0.2) + pmod(col("id"), lit(37)).cast("double") / 10.0).as("base"))
      .select(col("poly_id"),
        concat(lit("POLYGON(("),
          array_join(transform(sequence(lit(0), lit(nVertices)), j => {
            val jj = pmod(j, lit(nVertices)) // vertex nVertices wraps to 0: closed ring
            val r = col("base") * (lit(0.55) +
              lit(0.45) * pmod(col("poly_id") * 31 + jj * 7919 + 17, lit(997)).cast("double") / 997.0)
            val ang = jj.cast("double") * (twoPi / nVertices)
            format_string("%.7f %.7f",
              col("cx") + r * cos(ang), col("cy") + r * lit(0.6) * sin(ang))
          }), ","),
          lit("))")).as("wkt"))
  }

  /** kNN query points (some probing the hot box). */
  def queryPoints(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("qid"),
      when(col("id") % 7 === 0,
        lit(-0.04) + (pmod(col("id") * 131, lit(800)).cast("double")) / 10000.0)
        .otherwise((pmod(col("id") * 6271, lit(3600000)).cast("double")) / 10000.0 - 180.0)
        .as("qlon"),
      when(col("id") % 7 === 0,
        lit(51.51) + (pmod(col("id") * 173, lit(800)).cast("double")) / 10000.0)
        .otherwise((pmod(col("id") * 8191, lit(1700000)).cast("double")) / 10000.0 - 85.0)
        .as("qlat"))
}
