package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/**
 * Persisted target-side kNN state: the stack-deduped corpus plus the
 * multi-level cell histogram that [[SpatialJoins.knnJoin]] otherwise
 * rebuilds (and `localCheckpoint`s) on every call.
 *
 * This is the warehouse-scale answer to those checkpoints (VERDICT.md r01:
 * "these become maintained/bucketed tables at warehouse scale — do that
 * before 100x"): at 100 TB the corpus-sized stages (full count, coarse
 * aggregation, hot/cold split, co-located-stack dedup window) are paid once
 * per corpus version by [[KnnIndex.build]]/[[KnnIndex.save]], and every
 * query batch runs only the queries-sized work via
 * [[SpatialJoins.knnJoinIndexed]].
 *
 * On-disk layout under `path/`:
 *  - `targets/`  — (pid, lon, lat, ccell) parquet, `repartitionByRange` +
 *    `sortWithinPartitions` on `ccell` (the coarse collapse cell at level
 *    `lc`): files and row groups are spatially contiguous, so parquet
 *    min/max stats prune scans to the cell ranges a query batch touches,
 *    and per-partition lineage can record contiguous cell ranges (north
 *    rule). `ccell` is dropped on load — column pruning makes it free.
 *  - `hist/`     — (cell, cnt) per ladder level, sorted by cell.
 *  - `meta/`     — one row: (levels, ringK, kMax, lc).
 *
 * The index is exact-preserving: dedup kept the `kMax` smallest pids per
 * coordinate stack (lossless for any k <= kMax since ties break by pid);
 * the histogram is an assignment heuristic only — the completeness proof
 * re-checks every query regardless (SpatialJoins.knnJoin step 5).
 */
final case class KnnIndex(targetsD: DataFrame, levelCounts: DataFrame,
                          levels: Seq[Int], ringK: Int, kMax: Int, lc: Int)

object KnnIndex {

  /** Build the index in memory (checkpoint-backed, like knnJoin's own
   * preparation). `kMax` bounds the k of every future query batch. */
  def build(targets: DataFrame, kMax: Int,
            levels: Seq[Int] = Seq(20, 18, 16, 14, 12, 10, 8, 6),
            ringK: Int = 2, proofFactor: Int = 32): KnnIndex = {
    require(ringK >= 1 && levels.nonEmpty && levels == levels.sorted.reverse &&
      levels.distinct == levels,
      "levels must be distinct, finest (largest) first")
    val (targetsD, levelCounts, lc) =
      SpatialJoins.prepareKnnTargets(targets, kMax, levels, ringK, proofFactor)
    KnnIndex(targetsD, levelCounts, levels, ringK, kMax, lc)
  }

  /** Persist as cell-clustered parquet tables (see layout above). */
  def save(index: KnnIndex, path: String): Unit = {
    index.targetsD
      .withColumn("ccell", cell_encode(col("lon"), col("lat"), lit(index.lc)))
      .repartitionByRange(col("ccell"))
      .sortWithinPartitions("ccell")
      .write.mode("overwrite").parquet(s"$path/targets")
    index.levelCounts
      .repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(s"$path/hist")
    val spark = index.targetsD.sparkSession
    import spark.implicits._
    Seq((index.levels.mkString(","), index.ringK, index.kMax, index.lc))
      .toDF("levels", "ringK", "kMax", "lc")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reopen a saved index. The DataFrames are plain parquet scans — no
   * checkpoints to pin, estimable sizes for the planner, prunable files. */
  def load(spark: SparkSession, path: String): KnnIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    KnnIndex(
      targetsD = spark.read.parquet(s"$path/targets").drop("ccell"),
      levelCounts = spark.read.parquet(s"$path/hist"),
      levels = meta.getAs[String]("levels").split(",").map(_.trim.toInt).toSeq,
      ringK = meta.getAs[Int]("ringK"),
      kMax = meta.getAs[Int]("kMax"),
      lc = meta.getAs[Int]("lc"))
  }
}
