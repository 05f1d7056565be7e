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
  /**
   * @param queryCountHint the EXACT row count of `queries`, when the caller
   *        knows it statically (a generated query set) — saves one count()
   *        job of pure fixed driver latency. CORRECTNESS-load-bearing, not
   *        advisory: it decides whether the brute backstop for queries with
   *        fewer than k in-ring candidates runs at all, so an UNDER-count
   *        silently drops those queries from the result (review finding).
   *        Pass None (default) unless the count is exact.
   */
  def knnJoin(queries: DataFrame, targets: DataFrame, k: Int,
              levels: Seq[Int] = Seq(20, 18, 16, 14, 12, 10, 8, 6),
              ringK: Int = 2, proofFactor: Int = 32,
              broadcastQueries: Boolean = true,
              queryCountHint: Option[Long] = None): DataFrame = {
    require(ringK >= 1 && levels.nonEmpty && levels == levels.sorted.reverse &&
      levels.distinct == levels,
      "levels must be distinct, finest (largest) first")
    val (targetsD, levelCounts, _) =
      prepareKnnTargets(targets, k, levels, ringK, proofFactor)
    knnCore(queries, targetsD, levelCounts, k, levels, ringK, proofFactor,
      broadcastQueries, queryCountHint)
  }

  /**
   * kNN over a prebuilt [[KnnIndex]] — identical results to [[knnJoin]]
   * (KnnIndexSpec asserts row-for-row equality), but the corpus-sized
   * stages (count, coarse histogram, hot/cold split, stack dedup) were paid
   * ONCE at [[KnnIndex.build]] time; each query batch runs only the
   * queries-sized assignment + one candidate equi-join. This is the
   * warehouse-scale shape: the index is a maintained, cell-clustered table,
   * not a per-job localCheckpoint.
   *
   * Requires `k <= index.kMax`: the index's co-located-stack dedup kept only
   * the `kMax` smallest pids per coordinate stack, which is lossless for any
   * top-k with `k <= kMax` (ties break by pid).
   */
  def knnJoinIndexed(queries: DataFrame, index: KnnIndex, k: Int,
                     proofFactor: Int = 32,
                     broadcastQueries: Boolean = true): DataFrame = {
    require(k <= index.kMax,
      s"knnJoinIndexed: k=$k exceeds the index's kMax=${index.kMax}; " +
        "rebuild the index with a larger kMax")
    knnCore(queries, index.targetsD, index.levelCounts, k, index.levels,
      index.ringK, proofFactor, broadcastQueries)
  }

  // dev-only phase timing (GRAFT_KNN_DEBUG=1): prints at each eager step
  private def dbg = sys.env.get("GRAFT_KNN_DEBUG").contains("1")
  private def tt[T](name: String)(f: => T): T =
    if (!dbg) f else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[knn] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

  /**
   * Target-side preparation for kNN (steps 0+1 of [[knnJoin]]'s plan):
   * stack-dedup the corpus and build the multi-level cell histogram.
   * Returns (targetsD, levelCounts, lc) where lc is the coarse collapse
   * level (the natural clustering key when the result is persisted —
   * [[KnnIndex]]).
   */
  private[ops] def prepareKnnTargets(targets: DataFrame, k: Int,
      levels: Seq[Int], ringK: Int,
      proofFactor: Int): (DataFrame, DataFrame, Int) = {
    // the stack dedup below narrows to exactly (pid, lon, lat); make that
    // explicit at the API boundary instead of silently dropping a future
    // caller's extra columns in the degenerate branch (ADVICE.md)
    require(targets.columns.toSeq.sorted == Seq("lat", "lon", "pid"),
      s"kNN targets must be exactly (pid, lon, lat), got ${targets.columns.mkString(",")}")
    // 0+1. density-guided selective refinement (histogram + stack dedup).
    //
    // The r01 plan aggregated every target at the FINEST ladder level and
    // rolled up: at 10M targets that is a ~|targets|-distinct-key hash
    // aggregate whose partial maps overflow to sort-based fallback —
    // measured 355 s of a 540 s job at 8 cores, and the spill serializes on
    // I/O so it also stopped scaling 8 -> 32. Replacement:
    //
    //  a. ONE coarse aggregation at `lc`, the finest ladder level that still
    //     collapses >= 4:1 (4^lc <= N/4) — partial aggregation stays
    //     in-memory by construction at any N, on any cluster size.
    //  b. Ladder levels <= lc roll up from the (small) coarse table.
    //  c. Ladder levels > lc are counted ONLY over points in "refinable"
    //     coarse cells — cells with cnt >= proofFactor*k/S, where S bounds
    //     how many coarse cells a fine ring can straddle (a ring at level l
    //     is (2*ringK+1)*2^(lc-l) coarse cells wide; a segment of width w
    //     intersects at most ceil(w)+1 unit intervals, so S =
    //     (ceil(w)+1)^2 at the finest-gap level). A ring whose coarse
    //     parents are ALL below the threshold has true population
    //     < S * proofFactor*k/S = proofFactor*k and could never qualify at
    //     that level anyway: pruning cold cells cannot flip any assignment
    //     upward, it only (provably-safely) omits counts that decide
    //     nothing. Fine-histogram work is therefore proportional to
    //     HOT-REGION size, not corpus size.
    //
    // Stack dedup (co-located targets: only the k smallest pids can ever
    // enter a top-k, ties break by pid) rides the same split: a stack deep
    // enough to distort ring width makes its own coarse cell refinable, so
    // deduping the hot side alone bounds every ring; cold-cell stacks are
    // <= refineThresh points by definition. Cold targets skip the window
    // shuffle entirely (the global 10M-row dedup window was the other
    // non-scaling stage: 15 s at 8 cores, 29 s at 32 — exchange+sort
    // contention with no compute to hide it).
    //
    // Coarse counts are pre-dedup (the dedup needs the coarse histogram to
    // exist); a cold stack can thus overcount a ring by < refineThresh,
    // shifting its assignment at most one level finer — a bounded cost
    // effect, never a correctness one (the proof re-checks every query).
    //
    // At warehouse scale coarseCounts/hotD are maintained tables, not
    // checkpoints.
    // lc is NOT tied to the ladder: it targets mean occupancy ~6 points per
    // coarse cell (collapse >= 4:1 for the agg, comfortably under the
    // refine threshold so uniform regions stay cold). Ladder levels <= lc
    // roll up from it; ladder levels > lc refine selectively.
    // Corpus size: a plain count is metadata-only on file sources but still
    // one job round-trip, and the small-corpus branch below needs both the
    // finest-cell table (histogram base) and its max occupancy (the stack-
    // dedup gate). When the Catalyst size ESTIMATE puts the corpus under
    // the small bound, build the finest-cell table ONCE (checkpointed) and
    // read count + max off it — one corpus scan serves the count, the gate,
    // AND the histogram rollup below. The estimate picks only which stats
    // job runs, never a result: stats.sizeInBytes is COMPRESSED on-disk
    // bytes for file sources, so /8 can in principle under-count a heavily
    // dictionary/RLE-compressed corpus — but the branch is SELF-CORRECTING:
    // smallCorpus below is decided by the TRUE row count (sum of cnt), so a
    // mis-estimated big corpus still takes the sampled big branch, having
    // paid one extra aggregate. That wasted aggregate is itself bounded:
    // rows that compress below 8 B/row have low-entropy coordinate bytes,
    // i.e. heavily repeated coords, i.e. FEW distinct finest cells — the
    // many-distinct-keys agg blow-up requires high-entropy doubles that do
    // not compress below ~16 B/row.
    val estRows = targets.queryExecution.optimizedPlan.stats.sizeInBytes / 8
    def fineCells(df: DataFrame): DataFrame = df
      .groupBy(cell_encode(col("lon"), col("lat"), lit(levels.max)).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val (nTargets, maxStackPre, fineCellsPre): (Long, Option[Long], Option[DataFrame]) =
      if (estRows <= 4000000L) {
        val fc = tt("fine cells ckpt")(fineCells(targets).localCheckpoint())
        val r = fc.agg(sum(col("cnt")), max(col("cnt"))).first()
        (if (r.isNullAt(0)) 0L else r.getLong(0),
          Some(if (r.isNullAt(1)) 0L else r.getLong(1)), Some(fc))
      } else (tt("count")(targets.count()), None, None)
    val lc = math.min(levels.max, math.max(levels.min,
      (math.log(math.max(1024.0, nTargets / 6.0)) / math.log(4.0)).toInt))
    // Small corpora take the direct plan (one full-ladder rollup from the
    // finest level): below ~4M targets the base aggregate fits in the
    // partial-agg hash maps, so the selective-refinement machinery's extra
    // driver actions (coarse agg, percentile, hot/cold split — each a
    // multi-second job round-trip) cost more than the rollup they avoid.
    // Measured at sf0.1 (600k targets): 41 s refined vs ~17 s direct.
    val smallCorpus = nTargets <= 4000000L
    val fineLevels = if (smallCorpus) Nil else levels.filter(_ > lc)
    val coarseLevels = levels.filter(_ <= lc)
    // Prune-exactness background for refineThresh below (the exact
    // criterion is derived here but deliberately NOT used as the threshold):
    // a ring at fine level l is (2*ringK+1)*2^(lc-l) coarse cells wide, so
    // it straddles at most S = (ceil(width)+1)^2 coarse cells; a ring whose
    // coarse parents are ALL below proofFactor*k/S true points has true
    // population < proofFactor*k and could never qualify at that level —
    // pruning those cells is cost-free for the assignment. That exact
    // threshold (~pf*k/9 at a gap-2 ladder) is under 2 EXPECTED SAMPLES at
    // the sampling rate below, so using it would flag ~1% of cells as
    // false-positive hot and bloat the hot set ~50x; refineThresh instead
    // keys on the detectable pf*k regime, and borderline cells just stay
    // cold (cost-only — the proof + round 2 re-check every query).
    // Stack dedup = "k smallest pids per coordinate" — a BOUNDED aggregate
    // (topk_min, TypedImperativeAggregate), not a row_number window: the
    // window was one exchange of EVERY deduped row plus a per-reducer sort
    // (at 1B points a ~300M-row multi-GB sort-shuffle whose spill swung the
    // measured job time 2x between identical runs); the aggregate's
    // map-side partial combine ships <= stacks x k longs through the
    // exchange and sorts nothing.
    def stackDedup(rows: DataFrame): DataFrame = {
      // narrows to exactly (pid, lon, lat); fail loudly on any wider input
      // rather than silently dropping columns (ADVICE.md r02)
      require(rows.columns.sorted.sameElements(Array("lat", "lon", "pid")),
        s"stackDedup expects exactly (pid, lon, lat), got ${rows.columns.mkString(",")}")
      rows
        .groupBy(col("lon"), col("lat"))
        .agg(topk_min(col("pid"), k).as("__pids"))
        .select(explode(col("__pids")).as("pid"), col("lon"), col("lat"))
    }
    val (targetsD, levelCounts) = if (fineLevels.isEmpty) {
      // Degenerate ladder (all levels coarser than the collapse bound): the
      // small-corpus shape. Stack dedup here is COST machinery, not
      // correctness (top-k ties break by pid, so dropping all but the k
      // smallest pids per coordinate never changes a result) — and for a
      // corpus with shallow stacks it is a pure waste: a full
      // ObjectHashAggregate + localCheckpoint of the whole corpus (measured
      // 3-4 s of a ~10 s sf0.1 job) that saves nothing downstream. So gate
      // it on MEASURED stack depth: finest-cell occupancy bounds coordinate-
      // stack depth from above, and with every finest cell <= proofFactor*k
      // points, per-query candidates stay <= (2*ringK+1)^2 * proofFactor*k
      // — the same order as the design's pf*k*16 candidate budget — so the
      // dedup could not reduce cost materially. One cheap stats job decides;
      // deep-stack corpora still take the dedup path unchanged.
      val maxStack = maxStackPre.getOrElse(tt("stack stats") {
        val r = fineCells(targets).agg(max(col("cnt"))).first()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      })
      val (tD, base) = if (maxStack > proofFactor.toLong * k) {
        val d = tt("global dedup")(stackDedup(targets).localCheckpoint())
        (d, fineCells(d))
      } else (targets, fineCellsPre.getOrElse(fineCells(targets)))
      val lcs = base
        .select(explode(array(levels.map(l =>
          cell_parent(col("cell"), lit(l))): _*)).as("cell"), col("cnt"))
        .groupBy("cell").agg(sum("cnt").as("cnt"))
      (tD, lcs)
    } else {
      // The coarse histogram is an ASSIGNMENT HEURISTIC, not a correctness
      // input (the completeness proof + per-query round 2 re-check every
      // query no matter what level it was assigned), so it is built from a
      // deterministic hash-sample capped at ~4M rows: a full-corpus
      // groupBy at lc shuffles nearly |targets| partially-aggregated rows
      // (per-task key cardinality ~= task rows, so map-side combine
      // collapses almost nothing — measured 208 s of a ~250 s job at 100M
      // points), while the sampled aggregate is corpus-size-independent.
      // Counts are rescaled by 1/f for ring-population estimates; the
      // proofFactor margin (~8x the geometric minimum) absorbs sampling
      // error, and a misestimate only shifts WHERE a query's cost is paid
      // (round 2 / extra candidates), never what it answers.
      val sampleF = math.min(1.0, 8000000.0 / math.max(1L, nTargets))
      // floor the hash threshold at 1: above ~8e12 targets (sampleF*1e6 < 1)
      // a truncated-to-zero threshold would keep NO rows and NPE the
      // percentile read below (review finding) — one-in-a-million sampling
      // is the coarsest this switch goes
      val sampled = if (sampleF >= 1.0) targets
        else targets.filter(pmod(xxhash64(col("pid")), lit(1000000)) <
          lit(math.max(1L, (sampleF * 1000000).toLong)))
      val coarseCounts = tt("coarse agg")(sampled
        .groupBy(cell_encode(col("lon"), col("lat"), lit(lc)).as("ccell"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint())
      // Hot-set bound: the prune-exact criterion (see the derivation above
      // fineLevels) is ABSOLUTE — on a corpus dense enough that mean
      // occupancy approaches it, every cell qualifies and refinement
      // degenerates to the full-corpus histogram.
      // The 99.5th-percentile floor caps the refined set at ~0.5% of cells
      // (true hot spots dominate that tail by construction; a
      // ring-distorting stack big enough to matter survives sampling and
      // lands in it — a stack of S appears as ~S*f samples). Raising the
      // threshold above the exact criterion can only UNDER-assign
      // borderline rings — they fall to a coarser level and pay more
      // candidates; exactness is untouched.
      val p995 = tt("p995") {
        val r = coarseCounts.agg(expr("approx_percentile(cnt, 0.995)")).first()
        if (r.isNullAt(0)) 0L else r.getLong(0) // empty sample -> no hot set
      }
      // Refine only GENUINELY hot cells: >= proofFactor*k true points (a
      // cell that single-handedly qualifies rings at its level) — the
      // detectable regime; see the prune-exactness note above fineLevels
      // for why the exact ~pf*k/9 criterion is NOT usable under sampling.
      val refineThresh = math.max(
        math.max(1L, math.ceil(proofFactor.toLong * k * sampleF).toLong),
        p995 + 1)
      val refinable = coarseCounts.filter(col("cnt") >= refineThresh).select("ccell")
      val withC = targets.withColumn("ccell",
        cell_encode(col("lon"), col("lat"), lit(lc)))
      val hotD = tt("hotD")(stackDedup(
          withC.join(broadcast(refinable), Seq("ccell"), "left_semi")
            .drop("ccell"))
        .localCheckpoint())
      // cold side stays LAZY: a rescan + broadcast anti-join per consumer
      // costs no shuffle, vs materializing |targets| rows
      val cold = withC.join(broadcast(refinable), Seq("ccell"), "left_anti")
        .drop("ccell")
      // rescale sampled coarse counts back to corpus-scale estimates (the
      // fine counts below are exact — they aggregate the full hot subset)
      val rollup = coarseCounts
        .select(explode(array(coarseLevels.map(l =>
          cell_parent(col("ccell"), lit(l))): _*)).as("cell"), col("cnt"))
        .groupBy("cell")
        .agg((sum("cnt") / lit(sampleF)).cast("long").as("cnt"))
      val fineAgg = hotD
        .select(explode(array(fineLevels.map(l =>
          cell_encode(col("lon"), col("lat"), lit(l))): _*)).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("cnt"))
      (hotD.unionByName(cold), rollup.unionByName(fineAgg))
    }
    (targetsD, levelCounts, lc)
  }

  /**
   * Steps 2-7 of the kNN plan (assignment, candidate join, proof, rescue
   * passes) over a prepared target side — shared by [[knnJoin]] (per-call
   * preparation) and [[knnJoinIndexed]] (prebuilt [[KnnIndex]]).
   */
  private def knnCore(queries: DataFrame, targetsD: DataFrame,
      levelCounts: DataFrame, k: Int, levels: Seq[Int], ringK: Int,
      proofFactor: Int, broadcastQueries: Boolean,
      queryCountHint: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
    val out = Seq("qid", "pid", "dist", "rank")
    val res = shiftrightunsigned(col("cell"), 56).cast("int")

    // 2. ring population per (query, level): the ring side is queries-sized
    // — broadcast it so the (corpus-sized) histogram never shuffles. Like
    // every queries-sized broadcast in this plan it honors
    // broadcastQueries=false (the escape hatch for query sets too large to
    // broadcast would otherwise still OOM the driver right here — review
    // finding); without the hint the equi-join shuffles both sides on cell.
    val rings = queries.select(col("qid"), explode(flatten(array(levels.map(l =>
      cell_kring(cell_encode(col("qlon"), col("qlat"), lit(l)), lit(ringK))): _*))).as("cell"))
    val ringSide = if (broadcastQueries) broadcast(rings) else rings
    val ringPop = levelCounts.join(ringSide, "cell")
      .groupBy(col("qid"), res.as("res"))
      .agg(sum("cnt").as("pop"))

    // 3. finest level with enough ring population (coarsest as fallback).
    // Checkpoints here are EAGER deliberately: lazy localCheckpoint(false)
    // was measured 1.8x SLOWER end-to-end — under AQE, building the lazy
    // checkpoint's RDD already executes every non-result query stage at
    // plan-construction time (AdaptiveSparkPlanExec.getFinalPhysicalPlan),
    // so laziness saves no work and serializes the stages in a worse order.
    val assigned = tt("assigned ckpt")(ringPop.groupBy("qid")
      .agg(max(when(col("pop") >= proofFactor.toLong * k, col("res"))).as("lvl"))
      .select(col("qid"), coalesce(col("lvl"), lit(levels.min)).as("lvl"))
      .localCheckpoint()) // one row per query; reused by usedLevels + probes
    val probes = queries.join(assigned, Seq("qid"), "left_outer")
      .withColumn("lvl", coalesce(col("lvl"), lit(levels.min))) // empty-ring queries
      .withColumn("cell", explode(cell_kring(
        cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))

    // 4. candidate join at the levels actually in use. The level set rides
    // a broadcast cross join instead of a driver collect — one less
    // sequential job round-trip (they add up: every action costs seconds
    // of scheduling/broadcast latency that no amount of cores shrinks).
    // The probe side (<= |queries| * (2*ringK+1)^2 ring rows) is explicitly
    // broadcast: its lineage goes through a localCheckpoint whose size the
    // planner can't estimate, so without the hint this planned as a
    // sort-merge join that SHUFFLED the replicated target side — the whole
    // candidate join then cost one exchange of |targets| * |levels-in-use|
    // rows, by far the dominant stage (measured 5x the rest of the job).
    // Broadcasting the rings leaves targets completely unshuffled: scan ->
    // cell-encode -> hash-probe -> project, all inside one codegen stage.
    // For query sets too large to broadcast, set broadcastQueries=false
    // (the equi-join then shuffles both sides on cell — still exact).
    val lvlsInUse = assigned.select(col("lvl")).distinct()
    val targetCells = targetsD.crossJoin(broadcast(lvlsInUse))
      .withColumn("cell", cell_encode(col("lon"), col("lat"), col("lvl")))
      .drop("lvl")
    val probeSide = if (broadcastQueries) broadcast(probes) else probes
    val ranked = tt("ranked ckpt")(probeSide.join(targetCells, "cell")
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .localCheckpoint()) // <= |queries| * k rows; cuts recompute + lineage

    // 5. per-level guaranteed radius; proof — checkpointed (one row per
    // query) so the three consumers below and the driver-side branch
    // pruning all read the same tiny table
    def guaranteed(l: Int): Double =
      (ringK - 1) * math.min(CellIndex.cellLonWidth(l), CellIndex.cellLatHeight(l))
    val radius = levels.foldLeft(lit(0.0)) { (acc, l) =>
      when(col("lvl") === l, guaranteed(l)).otherwise(acc)
    }
    val proof = tt("proof ckpt")(ranked.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("dist").as("kth"), first("lvl").as("lvl"))
      .withColumn("complete", col("n") === k && col("kth") < radius)
      .localCheckpoint())
    val provenQids = proof.filter(col("complete")).select("qid")
    val provenSide = if (broadcastQueries) provenQids.hint("broadcast") else provenQids
    val proven = ranked.join(provenSide, Seq("qid"), "left_semi")
      .select(out.head, out.tail: _*)

    // Driver-side branch pruning (the reference prunes plan branches by
    // option the same way, src/osm/Osm2ttl.cpp:115-121): in the common
    // all-proven case the round-2 and brute branches would still each SCAN
    // the full corpus — empty-broadcast elimination is not guaranteed
    // pre-AQE — so spend three sub-second aggregates over the per-query
    // proof table to cut whole corpus passes.
    // the hint shaves one full action (a job round-trip that no parallelism
    // shrinks — it is pure fixed cost, the Amdahl term that caps what a
    // reduced-point scaling study can read); callers that generate their
    // query set (the Bench scaling job) know the count statically
    val nQueriesTotal = queryCountHint.getOrElse(queries.count())
    // one aggregate job for both branch-pruning counts (each Spark action
    // costs fixed scheduling latency that no cores shrink)
    val (nProven, nNeeds) = tt("proof counts") {
      val r = proof.agg(
        sum(when(col("complete"), 1L).otherwise(0L)),
        sum(when(!col("complete") && col("n") === k, 1L).otherwise(0L))).first()
      (if (r.isNullAt(0)) 0L else r.getLong(0),
       if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val nRemaining = nQueriesTotal - nProven - nNeeds
    if (dbg) System.err.println(
      s"[knn] queries=$nQueriesTotal proven=$nProven round2=$nNeeds brute=$nRemaining")
    def emptyResult = ranked.filter(lit(false)).select(out.head, out.tail: _*)

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
    // Both rescue branches end in localCheckpoint: (a) their results are
    // tiny (<= |unproven queries| * k rows) while their lineage holds the
    // full corpus scan, so one checkpoint pins the rows and frees the plan;
    // (b) Spark's Union constraint rewrite (UnionBase.rewriteConstraints)
    // throws "key not found: <attr>" when a union child's constraint set
    // reaches through the hot-union-cold targets plan — checkpointed leaves
    // carry no constraints, making the final 3-way union rewrite-safe.
    val round2 = if (nNeeds == 0) emptyResult else tt("round2 ckpt") {
      val probes2 = queries.join(needs, "qid")
        .withColumn("cell", explode(cell_kring(
          cell_encode(col("qlon"), col("qlat"), col("lvl")), lit(ringK))))
      val targetCells2 = targetsD.crossJoin(broadcast(needs.select("lvl").distinct()))
        .withColumn("cell", cell_encode(col("lon"), col("lat"), col("lvl")))
        .drop("lvl")
      val probeSide2 = if (broadcastQueries) broadcast(probes2) else probes2
      probeSide2.join(targetCells2, "cell")
        .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(out.head, out.tail: _*)
        .localCheckpoint()
    }

    // 7. brute backstop only for pathological queries (< k candidates found,
    // e.g. k > |targets| in range, or no candidates at any level)
    val brute = if (nRemaining == 0) emptyResult else tt("brute ckpt") {
      val handled = provenQids.unionByName(needs.select("qid"))
      val remaining = queries.join(handled, Seq("qid"), "left_anti")
      val remSide = if (broadcastQueries) broadcast(remaining) else remaining
      remSide.crossJoin(targetsD)
        .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(out.head, out.tail: _*)
        .localCheckpoint()
    }
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
   * Raster-tile <-> vector-GEOMETRY join: every inventory tile whose grid
   * cell intersects a geometry's envelope at zoom z. Exact containment for
   * axis-aligned geometries (the envelope IS the geometry); for general
   * polygons this is the standard bbox-superset stage a refine (pipJoin's
   * st_contains) follows. The tile x/y ranges use the SAME clamped floor
   * arithmetic as `tile_id` — written as Spark SQL expressions so an
   * external system (the DuckDB oracle) derives identical ids from the
   * identical doubles. Per-geometry fan-out is bounded by envelope area in
   * tiles; the inventory is broadcast. At warehouse scale the exploded
   * (geometry, tile) side stays shuffle-free: scan -> sequence-explode ->
   * broadcast-hash-probe in one codegen stage.
   *
   * @param boxes (…, xmin, ymin, xmax, ymax) — numeric envelopes; extra
   *              columns (ids) pass through
   * @param tiles (tile_id) inventory
   */
  def tileCoverJoin(boxes: DataFrame, tiles: DataFrame, z: Int): DataFrame = {
    val n = 1L << z
    def tx(c: Column): Column = least(greatest(
      floor((c + lit(180.0)) / lit(360.0) * lit(n.toDouble)).cast("long"),
      lit(0L)), lit(n - 1))
    def ty(c: Column): Column = least(greatest(
      floor((c + lit(90.0)) / lit(180.0) * lit(n.toDouble)).cast("long"),
      lit(0L)), lit(n - 1))
    boxes
      // inverted envelopes must not make Spark's `sequence` step BACKWARDS —
      // but the guard compares TILE INDICES, not raw coords: an inverted box
      // whose corners clamp/floor into the same tile yields one tile from
      // SQL generate_series(t, t), and a raw-coordinate filter dropped it
      // while the oracle kept it (ADVICE.md). Index comparison matches
      // generate_series semantics exactly for every input.
      .filter(tx(col("xmin")) <= tx(col("xmax")) && ty(col("ymin")) <= ty(col("ymax")))
      .withColumn("__tx", explode(sequence(tx(col("xmin")), tx(col("xmax")))))
      .withColumn("__ty", explode(sequence(ty(col("ymin")), ty(col("ymax")))))
      .withColumn("tile_id", col("__tx") * n + col("__ty"))
      .join(broadcast(tiles), "tile_id")
      .drop("__tx", "__ty")
  }

  /**
   * Dirty-cell tile reassignment (north rule: "tile reassignments
   * recomputed only for dirty cells"): ONLY nodes whose stored location
   * differs from the incoming change batch get a tile recomputed — the
   * clean-tile corpus is never rescanned. The batch side is
   * minute-diff-small by construction and broadcasts; at warehouse scale
   * the snapshot is the bucketed store table, so the probe touches only
   * matching buckets. Emits one row per node whose tile ACTUALLY changes,
   * with old and new assignment — exactly the delta a tile-partitioned
   * store MERGEs (reference analogue: the geometry-dirty 'moved' branch of
   * the J2 location diff, src/osm/NodeHandler.cpp:48-80).
   *
   * @param nodeBatch (id, lon, lat) — incoming modified nodes
   * @param snapshot  (id, lon, lat) — the stored node locations
   * @param broadcastThreshold max batch rows to force-broadcast (the Corpus
   *        size-gate idiom, one count): the minute-diff contract makes the
   *        batch tiny, but a backfill replaying months of diffs through this
   *        API would broadcast a corpus-scale batch and OOM driver +
   *        executors (VERDICT.md r03 #7) — above the gate the join runs as
   *        a plain shuffled equi-join on id, correct either way
   */
  def dirtyTileReassign(nodeBatch: DataFrame, snapshot: DataFrame, z: Int,
                        broadcastThreshold: Long = 1L << 22): DataFrame = {
    val snap = snapshot
      .withColumnRenamed("lon", "snap_lon").withColumnRenamed("lat", "snap_lat")
    // Materialize the batch ONCE before the gate count: a bare count() on
    // the caller's plan would compute its full lineage (e.g. the j9
    // caller's dedup window) and then the join would recompute the
    // identical lineage — and a non-deterministic source could even show
    // the gate and the join different data (review finding). One eager
    // localCheckpoint is strictly cheaper than two full computations, and
    // it is the same small side the join ships anyway.
    val batch = nodeBatch.localCheckpoint()
    val batchSide = if (batch.count() <= broadcastThreshold)
      batch.hint("broadcast") else batch
    batchSide.join(snap, Seq("id"))
      .filter(col("lon") =!= col("snap_lon") || col("lat") =!= col("snap_lat"))
      .withColumn("tile_old", tile_id(col("snap_lon"), col("snap_lat"), lit(z)))
      .withColumn("tile_new", tile_id(col("lon"), col("lat"), lit(z)))
      .filter(col("tile_old") =!= col("tile_new"))
      .select(col("id"), col("tile_old"), col("tile_new"))
  }

  /** WKT convenience overload of [[tileCoverJoin]]: envelopes via st_bbox.
   * The oracled query feeds numeric boxes instead — a %.7f WKT round-trip
   * can move an envelope corner by ~1 ulp, which flips `floor` exactly on
   * tile boundaries; st_bbox is for callers that only have geometry. */
  def tileCoverJoinWkt(geoms: DataFrame, tiles: DataFrame, z: Int): DataFrame =
    tileCoverJoin(
      geoms.withColumn("__bb", st_bbox(col("wkt")))
        .withColumn("xmin", element_at(col("__bb"), 1))
        .withColumn("ymin", element_at(col("__bb"), 2))
        .withColumn("xmax", element_at(col("__bb"), 3))
        .withColumn("ymax", element_at(col("__bb"), 4))
        .drop("__bb"),
      tiles, z)
      .drop("xmin", "ymin", "xmax", "ymax")

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

  /**
   * Within-distance (ε-range) join: every (query, target) pair closer than
   * `eps` in the planar degree metric (the kNN refine metric, so radius and
   * rank queries agree on geometry). The fixed-radius sibling of [[knnJoin]]:
   * kNN answers "nearest k whatever the distance", this answers "everything
   * within r whatever the count" — the primitive under DBSCAN neighborhoods,
   * map-matching gates, and POI conflation.
   *
   * Plan shape: targets get their home grid cell (cell width = eps, floor
   * division); queries explode to the 3×3 neighbor cells; one equi-join on
   * (cx, cy); codegen'd exact refine `planar_dist < eps`. Correctness: any
   * pair with dist < eps differs by < eps per axis, so the target's home
   * cell is within ±1 of the query's in both axes — the 3×3 stencil is a
   * superset of every qualifying pair, and the refine is exact.
   *
   * Scale: the ×9 fan-out lands on the QUERY side — pass the smaller set as
   * `queries`. The join is a plain two-column equi-join; AQE splits a hot
   * cell (a mega-city at the chosen eps) at runtime. Nothing is quadratic
   * except genuinely-dense neighborhoods, which ARE the output.
   *
   * `broadcastQueries` picks the join strategy EXPLICITLY instead of
   * trusting Catalyst's size estimate: for a corpus-sized query side the
   * estimator (compressed parquet bytes) undercounts the ×9 explode and
   * plans a broadcast whose hashed relation is built single-threaded on the
   * driver — measured 9.2 s of an 11 s sf0.1 self-join, vs ~2 s as a
   * shuffled-hash join. true (default) = broadcast the exploded query side
   * (right for bounded query batches); false = hint shuffle_hash on the
   * target side so both sides stay distributed (right for self-joins and
   * corpus-sized query sets). NOTE the default FORCES the broadcast
   * (hints override autoBroadcastJoinThreshold): a corpus-sized query set
   * MUST pass false or the driver builds a 9x|queries|-row hashed relation
   * — the same caller contract as [[knnJoin]]'s broadcastQueries.
   *
   * @param queries (qid, qlon, qlat)
   * @param targets (pid, lon, lat)
   * @return (qid, pid, dist) — one row per pair with dist < eps
   */
  def distJoin(queries: DataFrame, targets: DataFrame, eps: Double,
               broadcastQueries: Boolean = true): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    def cellOf(c: Column): Column = floor(c / lit(eps)).cast("long")
    // narrow both sides to the contract columns up front: a caller-side
    // extra column named like the other side's (e.g. a `lon` on the query
    // frame) would otherwise make the post-join refine ambiguous
    val t0 = targets.select("pid", "lon", "lat")
      .withColumn("__cx", cellOf(col("lon")))
      .withColumn("__cy", cellOf(col("lat")))
    val t = if (broadcastQueries) t0 else t0.hint("shuffle_hash")
    val q0 = queries.select("qid", "qlon", "qlat")
      .withColumn("__cx", explode(sequence(cellOf(col("qlon")) - 1, cellOf(col("qlon")) + 1)))
      .withColumn("__cy", explode(sequence(cellOf(col("qlat")) - 1, cellOf(col("qlat")) + 1)))
    val q = if (broadcastQueries) broadcast(q0) else q0
    q.join(t, Seq("__cx", "__cy"))
      .withColumn("dist", planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")))
      .filter(col("dist") < lit(eps))
      .select(col("qid"), col("pid"), col("dist"))
  }

  /**
   * ε-connectivity clustering: points are in the same cluster iff they are
   * linked by a chain of hops each shorter than `eps` — single-linkage with
   * a distance threshold, i.e. DBSCAN's connectivity with every point core
   * (minPts ≤ 2). Cluster id = the component's minimum pid (deterministic
   * canonical representative, same policy as the dedup clusters).
   *
   * Plan shape: a HALF-STENCIL grid self-join (each point probes 5 of the 9
   * neighbor cells — the plane-sweep trick, details inline) produces each
   * undirected ε-edge exactly once, checkpointed; the symmetric list the
   * shared log-diameter connected-components kernel (neighbor-min + pointer
   * jumping, graft.text.Corpus.connectedComponentsSym) consumes is two
   * projections of that checkpoint — no re-symmetrizing distinct, no double
   * computation, half of [[distJoin]]'s exchange/candidate/refine volume
   * (VERDICT.md r04 #3: the r04 shape cost 28–64 s at sf0.1; this one ~8 s).
   * Isolated points never enter CC state — they are restored by one left
   * join at the end, so CC memory is sized by the ε-GRAPH, not the corpus.
   * The edge list is the only thing that can explode: a dense blob of n
   * points within eps of each other emits O(n²) edges — choose eps below
   * the blob scale or pre-aggregate coincident points; the operator itself
   * never densifies.
   *
   * `pid` is the NODE identity: rows sharing a pid (a multi-location
   * feature) contribute all their locations' edges to that one node, and
   * the output carries one row per distinct pid — the id-keyed contract a
   * MERGE-shaped consumer needs.
   *
   * @param points (pid, lon, lat)
   * @param ccDriverThreshold passthrough to the CC kernel's driver-fast-path
   *        gate (max edges to close with one driver union-find; above it the
   *        distributed log-diameter loop runs)
   * @return (pid, cluster_id) — one row per distinct pid
   */
  def epsCluster(points: DataFrame, eps: Double,
                 ccDriverThreshold: Long = 1L << 20): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    // the input plan is read THREE times (self-join query side, target side,
    // final distinct-pid restore): materialize the narrowed points once so a
    // non-trivial upstream plan (scan + filters) runs once, not three times
    val pts = points.select("pid", "lon", "lat").localCheckpoint()
    def cellOf(c: Column): Column = floor(c / lit(eps)).cast("long")
    // HALF-STENCIL self-join (the plane-sweep trick): instead of distJoin's
    // full 3×3 probe, each point probes only {self, E, NE, N, NW}. For a
    // pair in DIFFERENT cells exactly one endpoint's half-stencil covers the
    // other's home cell (the five offsets tile one half-plane of the 8
    // neighbor directions), and same-cell pairs — covered twice via the
    // self offset — keep only the qid < pid ordering. Each undirected
    // ε-edge therefore lands in `half` EXACTLY once, for half of distJoin's
    // exchange volume, candidate count, and refine work.
    val t = pts
      .withColumn("__cx", cellOf(col("lon")))
      .withColumn("__cy", cellOf(col("lat")))
      .hint("shuffle_hash")
    val offsets = array(Seq((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1)).map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }: _*)
    val q = pts
      .select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      .withColumn("__o", explode(offsets))
      .withColumn("__cx", cellOf(col("qlon")) + col("__o.dx"))
      .withColumn("__cy", cellOf(col("qlat")) + col("__o.dy"))
      .drop("__o")
    val sameCell = cellOf(col("qlon")) === cellOf(col("lon")) &&
      cellOf(col("qlat")) === cellOf(col("lat"))
    val half = q.join(t, Seq("__cx", "__cy"))
      .where(planar_dist(col("qlon"), col("qlat"), col("lon"), col("lat")) < lit(eps) &&
        col("qid") =!= col("pid") && // multi-location pid: no self-loops
        (!sameCell || col("qid") < col("pid")))
      // cast like the connectedComponents wrapper does: the CC driver fast
      // path reads long edge columns, and an IntegerType pid would CCE
      // there (review finding — the old distJoin->connectedComponents path
      // normalized doc_a/doc_b the same way)
      .select(col("qid").cast("long").as("src"), col("pid").cast("long").as("dst"))
      .localCheckpoint() // computed once; both union branches below read it
    // symmetric list for the CC kernel: two projections of the CHECKPOINT —
    // no recompute, no distinct (a multi-location pid can repeat a pair,
    // which the kernel tolerates: min-aggregation is idempotent)
    val sym = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))
    val comp = graft.text.Corpus
      .connectedComponentsSym(sym, driverThreshold = ccDriverThreshold)
      .select(col("id").as("pid"), col("comp"))
    pts.select("pid").distinct().join(comp, Seq("pid"), "left_outer")
      .select(col("pid"), coalesce(col("comp"), col("pid")).as("cluster_id"))
  }
}
