package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions._
import graft.geo.CellIndex

/**
 * Typed spatial join operators: point-in-polygon, exact kNN, raster-tile <->
 * vector joins. These are the north-rule additions on top of the reference's
 * equi/semi/anti join vocabulary (SURVEY.md §2.3): the reference ships IDs to
 * a SPARQL endpoint as batched broadcast semi-joins
 * (reference: src/sparql/QueryWriter.cpp:449-474,
 * include/util/BatchHelper.h:33-46); here the "endpoint" is a DataFrame and
 * the batching is Spark's shuffle/broadcast machinery.
 *
 * Scale design notes:
 *  - PIP is a two-phase plan: adaptive cell-union cover (superset prefilter,
 *    equi-join on cell id) + exact refine (st_contains_pt). The point side
 *    expands only to the resolutions actually present in the covers, so the
 *    probe stays a plain equi-join Catalyst can plan as broadcast or
 *    shuffled-hash, with AQE free to re-plan at runtime.
 *  - kNN is exact: ring-expansion candidates, then a guaranteed-radius check;
 *    the (rare) unqualified queries fall back to a broadcast brute-force
 *    pass. No result depends on the ring guess being right.
 *  - Hot cells (a mega-city) are handled by salting helpers; the tile
 *    histogram uses two-phase salted aggregation.
 */
object SpatialJoins {

  /**
   * Point-in-polygon containment join.
   *
   * @param points  (pid, lon, lat)
   * @param polys   (poly_id, wkt) — arbitrary simple polygons
   * @param maxCellsPerPoly cover budget per polygon (adaptive resolution)
   * @param maxRes  finest cover resolution
   * @return (pid, poly_id, lon, lat) — one row per contained pair
   */
  def pipJoin(points: DataFrame, polys: DataFrame,
              maxCellsPerPoly: Int = 64, maxRes: Int = 12,
              broadcastPolys: Boolean = true): DataFrame = {
    val covers = polys
      .withColumn("cell", explode(cell_cover_wkt(col("wkt"), lit(maxCellsPerPoly), lit(maxRes))))
    // resolutions actually present in the covers — a tiny driver-side set
    // (metadata, bounded by maxRes), NOT a data collect.
    val resolutions: Array[Int] = covers
      .select(shiftrightunsigned(col("cell"), 56).cast("int").as("r"))
      .distinct().collect().map(_.getInt(0)).sorted
    require(resolutions.nonEmpty, "empty polygon side")
    // expand each point to its ancestor cell at every cover resolution
    val cellsOfPoint = array(resolutions.map(r => cell_encode(col("lon"), col("lat"), lit(r))): _*)
    val probes = points.withColumn("cell", explode(cellsOfPoint))
    val coverSide = if (broadcastPolys) broadcast(covers) else covers
    probes.join(coverSide, "cell")
      .filter(st_contains_pt(col("wkt"), col("lon"), col("lat")))
      .select(col("pid"), col("poly_id"), col("lon"), col("lat"))
  }

  /**
   * Exact k-nearest-neighbors join (planar degree metric, ties broken by pid).
   *
   * Cascaded cell-ring expansion, fine to coarse: at each resolution,
   * candidates come from a Chebyshev ring of `ringK` cells around the query
   * cell (cell_kring explode, equi-join on cell). A query is *proven
   * complete* at a level when it found >= k candidates within the guaranteed
   * radius (ringK - 1) * min(cellW, cellH) — no point outside the ring can
   * be closer. Unproven queries fall through to the next (coarser) level;
   * the final residue (typically a handful in empty regions) is brute-forced
   * by broadcast. Exactness never depends on the level parameters — only
   * cost does.
   *
   * Why a cascade: a single coarse resolution melts down on skew — a
   * mega-city cell holds 10^5+ points and every nearby query drags them ALL
   * in as candidates. Starting fine means dense-region queries complete with
   * small rings; only sparse-region queries (few candidates each, by
   * definition) escalate. Per-level candidate volume stays bounded at both
   * extremes of the density spectrum.
   *
   * Each level's surviving top-k (<= |queries| * k rows) is
   * `localCheckpoint`ed so the proof/anti-join consumers don't recompute the
   * candidate join.
   *
   * @param queries (qid, qlon, qlat)
   * @param targets (pid, lon, lat)
   * @return (qid, pid, dist, rank) with rank in [1, k]
   */
  def knnJoin(queries: DataFrame, targets: DataFrame, k: Int,
              resolutions: Seq[Int] = Seq(16, 12, 7), ringK: Int = 2): DataFrame = {
    require(ringK >= 1 && resolutions.nonEmpty)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
    val out = Seq("qid", "pid", "dist", "rank")

    var remaining = queries
    var acc: Option[DataFrame] = None
    for (res <- resolutions) {
      val guaranteedRadius =
        (ringK - 1) * math.min(CellIndex.cellLonWidth(res), CellIndex.cellLatHeight(res))
      val targetCells = targets.withColumn("cell", cell_encode(col("lon"), col("lat"), lit(res)))
      val probeCells = remaining
        .withColumn("qcell", cell_encode(col("qlon"), col("qlat"), lit(res)))
        .withColumn("cell", explode(cell_kring(col("qcell"), lit(ringK))))
        .drop("qcell")
      val ranked = probeCells.join(targetCells, "cell")
        .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .localCheckpoint() // <= |remaining| * k rows; cuts recompute + lineage
      val proof = ranked.groupBy("qid")
        .agg(count(lit(1)).as("n"), max("dist").as("kth"))
        .withColumn("complete", col("n") === k && col("kth") < guaranteedRadius)
      val provenQids = proof.filter(col("complete")).select("qid")
      val proven = ranked.join(provenQids.hint("broadcast"), Seq("qid"), "left_semi")
        .select(out.head, out.tail: _*)
      acc = Some(acc.map(_.unionByName(proven)).getOrElse(proven))
      remaining = remaining.join(provenQids, Seq("qid"), "left_anti")
    }

    // final residue: exact brute force over a broadcast of the few leftovers
    val brute = broadcast(remaining).crossJoin(targets)
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(out.head, out.tail: _*)
    acc.get.unionByName(brute)
  }

  /** Tile assignment at zoom z: every point -> flat tile id, output
   * range-partitioned by tile so downstream writes get contiguous tile
   * ranges (north rule: range-partitioned shuffles / per-partition lineage). */
  def tileAssign(points: DataFrame, z: Int, partitions: Int = 0): DataFrame = {
    val assigned = points.withColumn("tile_id", tile_id(col("lon"), col("lat"), lit(z)))
    if (partitions > 0) assigned.repartitionByRange(partitions, col("tile_id")) else assigned
  }

  /** Raster-tile <-> vector join: points against a tile inventory.
   * The inventory is broadcast (tile catalogs are small relative to data). */
  def tileJoin(points: DataFrame, tiles: DataFrame, z: Int): DataFrame =
    tileAssign(points, z).join(broadcast(tiles), "tile_id")

  /**
   * Two-phase salted aggregation for skewed keys: partial counts on
   * (key, salt), final combine on key. Spark's hash aggregate already does
   * map-side partial aggregation for algebraic functions; explicit salting
   * is for the hot-cell case where even the *reduce* side of a single key
   * overwhelms one task (north rule: "salted-key skew handling").
   */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame = {
    val allCols = df.columns.map(col).toSeq
    val salted = df
      .withColumn("__salt", pmod(hash(allCols: _*), lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
    salted.groupBy("key").agg(sum("partial").as("cnt"))
  }

  /** Per-tile histogram with salted two-phase aggregation (hot-cell safe). */
  def tileHistogram(points: DataFrame, z: Int, saltBuckets: Int = 16): DataFrame =
    saltedCount(tileAssign(points, z), col("tile_id"), saltBuckets)
      .withColumnRenamed("key", "tile_id")
}
