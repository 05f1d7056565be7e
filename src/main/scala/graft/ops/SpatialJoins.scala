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
    // Parse each polygon ONCE on the (small) build side: the refine filter
    // then runs st_contains_packed over unboxed doubles inside whole-stage
    // codegen — no per-candidate WKT string conversion / hashing / caching.
    val covers = polys
      .withColumn("packed", st_pack(col("wkt")))
      .withColumn("cell", explode(cell_cover_wkt(col("wkt"), lit(maxCellsPerPoly), lit(maxRes))))
      .select("poly_id", "packed", "cell")
      // build side is small by contract; materialize once so the
      // resolution-set collect below and the probe join don't each re-run
      // the WKT parse + cover computation (VERDICT.md)
      .localCheckpoint()
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
      .filter(st_contains_packed(col("packed"), col("lon"), col("lat")))
      .select(col("pid"), col("poly_id"), col("lon"), col("lat"))
  }

  /**
   * Exact k-nearest-neighbors join (planar degree metric, ties broken by pid).
   *
   * Density-adaptive level assignment, then ONE candidate join:
   *
   *  1. Cell histogram: one aggregation over targets at the finest level,
   *     rolled up to every coarser level (aggs over the cell table, not the
   *     raw data; cell ids are resolution-tagged so rollups need no extra
   *     key column).
   *  2. Ring population: each query's Chebyshev ring of `ringK` cells at
   *     every level, joined against the histogram -> (qid, level, pop).
   *  3. Assignment: each query takes the FINEST level whose ring holds
   *     >= proofFactor * k points (coarsest level when none qualifies).
   *     proofFactor trades candidate volume against proof success: of a
   *     (2*ringK+1)^2-cell ring's population, only ~pi*(ringK-1)^2/(2*ringK+1)^2
   *     (~1/8 at ringK=2) sits inside the proof radius under uniform
   *     density, so proofFactor must exceed ~8 or most queries fail the
   *     proof and fall to the brute path; 32 keeps the expected in-radius
   *     count at ~4k while bounding per-query candidates at
   *     ~16 * proofFactor * k for spacing-2 level ladders.
   *     This is the skew defense: a query inside a mega-city hot cell gets
   *     a fine level (small ring, bounded candidates); a query in empty
   *     ocean gets a coarse one. A fixed resolution melts down at one end
   *     or the other — measured at 2M points, a fixed-coarse plan drags
   *     10^5 hot-box candidates into the rank window per nearby query.
   *  4. Candidate join: probes explode their ring at the assigned level;
   *     targets expand to one cell per *assigned-levels-in-use* (a tiny
   *     driver-side set). Equi-join on the res-tagged cell id, distance,
   *     per-query top-k window.
   *  5. Proof: a query is complete if it found k candidates within the
   *     guaranteed radius (ringK - 1) * min(cellW, cellH) of its level —
   *     no point outside the ring can be closer. The (rare) unproven
   *     residue is re-run brute-force via broadcast. Exactness never
   *     depends on the assignment being right — only cost does.
   *
   * The ranked candidates (<= |queries| * k rows) are `localCheckpoint`ed so
   * the proof/semi/anti consumers don't recompute the candidate join; the
   * fine histogram is checkpointed for the same reason (at warehouse scale
   * both would live as bucketed tables instead).
   *
   * @param queries (qid, qlon, qlat)
   * @param targets (pid, lon, lat)
   * @return (qid, pid, dist, rank) with rank in [1, k]
   */
  def knnJoin(queries: DataFrame, targets: DataFrame, k: Int,
              levels: Seq[Int] = Seq(20, 18, 16, 14, 12, 10, 8, 6),
              ringK: Int = 2, proofFactor: Int = 32): DataFrame = {
    require(ringK >= 1 && levels.nonEmpty && levels == levels.sorted.reverse,
      "levels must be distinct, finest (largest) first")
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
    val out = Seq("qid", "pid", "dist", "rank")
    val res = shiftrightunsigned(col("cell"), 56).cast("int")

    // 0. stack dedup: of co-located targets (identical lon/lat) only the k
    // smallest pids can ever enter any query's top-k (ties break by pid),
    // so prune duplicates up front. Duplicate-heavy data otherwise defeats
    // cell-granularity bounds — a 600-deep stack turns every ring that
    // touches it into 600x candidates. The rank window's map-side group
    // limit keeps the extra pass one bounded shuffle.
    // Materialized once: three downstream jobs (histogram, candidate join,
    // round-2/brute) would otherwise each re-run the dedup window shuffle.
    // At warehouse scale this is a maintained table, not a checkpoint.
    val targetsD = targets
      .withColumn("__sr", row_number().over(
        Window.partitionBy(col("lon"), col("lat")).orderBy(col("pid"))))
      .filter(col("__sr") <= k).drop("__sr")
      .localCheckpoint()

    // 1. histogram: fine agg over targets, then ALL level rollups in ONE
    // shuffle (explode each fine cell to its ancestors; map-side combine
    // collapses the 8x expansion before the exchange)
    val fineCounts = targetsD
      .groupBy(cell_encode(col("lon"), col("lat"), lit(levels.max)).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val levelCounts = fineCounts
      .select(explode(array(levels.map(l =>
        cell_parent(col("cell"), lit(l))): _*)).as("cell"), col("cnt"))
      .groupBy("cell").agg(sum("cnt").as("cnt"))

    // 2. ring population per (query, level)
    val rings = queries.select(col("qid"), explode(flatten(array(levels.map(l =>
      cell_kring(cell_encode(col("qlon"), col("qlat"), lit(l)), lit(ringK))): _*))).as("cell"))
    val ringPop = rings.join(levelCounts, "cell")
      .groupBy(col("qid"), res.as("res"))
      .agg(sum("cnt").as("pop"))

    // 3. finest level with enough ring population (coarsest as fallback)
    val assigned = ringPop.groupBy("qid")
      .agg(max(when(col("pop") >= proofFactor.toLong * k, col("res"))).as("lvl"))
      .select(col("qid"), coalesce(col("lvl"), lit(levels.min)).as("lvl"))
      .localCheckpoint() // one row per query; reused by usedLevels + probes
    val probes = queries.join(assigned, Seq("qid"), "left_outer")
      .withColumn("lvl", coalesce(col("lvl"), lit(levels.min))) // empty-ring queries
      .withColumn("cell", explode(cell_kring(
        cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))

    // 4. candidate join at the levels actually in use. The level set rides
    // a broadcast cross join instead of a driver collect — one less
    // sequential job round-trip (they add up: every action costs seconds
    // of scheduling/broadcast latency that no amount of cores shrinks).
    val lvlsInUse = assigned.select(col("lvl")).distinct()
    val targetCells = targetsD.crossJoin(broadcast(lvlsInUse))
      .withColumn("cell", cell_encode(col("lon"), col("lat"), col("lvl")))
      .drop("lvl")
    val ranked = probes.join(targetCells, "cell")
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .localCheckpoint() // <= |queries| * k rows; cuts recompute + lineage

    // 5. per-level guaranteed radius; proof (cheap aggs over the
    // checkpointed top-k — recomputed per consumer, no extra job)
    def guaranteed(l: Int): Double =
      (ringK - 1) * math.min(CellIndex.cellLonWidth(l), CellIndex.cellLatHeight(l))
    val radius = levels.foldLeft(lit(0.0)) { (acc, l) =>
      when(col("lvl") === l, guaranteed(l)).otherwise(acc)
    }
    val proof = ranked.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("dist").as("kth"), first("lvl").as("lvl"))
      .withColumn("complete", col("n") === k && col("kth") < radius)
    val provenQids = proof.filter(col("complete")).select("qid")
    val proven = ranked.join(provenQids.hint("broadcast"), Seq("qid"), "left_semi")
      .select(out.head, out.tail: _*)

    // 6. round 2 for unproven queries that DID find k candidates: round 1's
    // kth is an upper bound on the true k-th distance, so the finest level
    // with guaranteed radius > kth is provably sufficient — the second pass
    // is complete BY CONSTRUCTION (every true neighbor lies within the
    // guarantee), no further proof or iteration needed. Each query gets its
    // own level, so the candidate volume stays matched to local sparsity
    // instead of melting down into a |unproven| x |targets| brute join.
    val lvl2Expr = (0 to levels.max).foldLeft(lit(0)) { (acc, l) =>
      when(lit(guaranteed(l)) > col("kth"), l).otherwise(acc)
    }
    val needs = proof.filter(!col("complete") && col("n") === k)
      .select(col("qid"), lvl2Expr.as("lvl"))
    val probes2 = queries.join(needs, "qid")
      .withColumn("cell", explode(cell_kring(
        cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))
    val targetCells2 = targetsD.crossJoin(broadcast(needs.select("lvl").distinct()))
      .withColumn("cell", cell_encode(col("lon"), col("lat"), col("lvl")))
      .drop("lvl")
    val round2 = probes2.join(targetCells2, "cell")
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(out.head, out.tail: _*)

    // 7. brute backstop only for pathological queries (< k candidates found,
    // e.g. k > |targets| in range, or no candidates at any level)
    val handled = provenQids.unionByName(needs.select("qid"))
    val remaining = queries.join(handled, Seq("qid"), "left_anti")
    val brute = broadcast(remaining).crossJoin(targetsD)
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(out.head, out.tail: _*)
    proven.unionByName(round2).unionByName(brute)
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
