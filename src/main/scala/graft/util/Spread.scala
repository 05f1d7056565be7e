package graft.util

import org.apache.spark.sql.DataFrame

/**
 * Spread a (possibly single-split) input across the session's shuffle
 * parallelism before CPU-heavy per-row work: a small parquet table arrives
 * as one split, and without this every downstream narrow stage runs serial.
 *
 * The common-at-scale exit ("input already has many splits") keys on the
 * backing scan's FILE COUNT — a logical-plan walk — so it does not
 * instantiate the physical plan; `df.rdd.getNumPartitions` did, once per
 * call site, three times per query in the dedup pipelines (VERDICT.md).
 * Only when the file count alone cannot rule out a small input does it
 * fall back to the accurate physical-partition count.
 */
object Spread {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val nFiles = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (nFiles >= target) df
    else {
      // post-shuffle plans expose a KNOWN partitioning on the physical plan
      // — inspect it before falling back to df.rdd (which instantiates the
      // RDD DAG; cheap but not free, and this runs once per call site)
      val planParts = try
        df.queryExecution.executedPlan.outputPartitioning.numPartitions
      catch { case _: Throwable => 0 }
      if (planParts >= target) df
      else if (df.rdd.getNumPartitions < target) df.repartition(target)
      else df
    }
  }
}
