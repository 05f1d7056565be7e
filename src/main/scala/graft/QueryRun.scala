package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query against an sf dir and count it.
 * `sbt "runMain graft.QueryRun <name> [sfDir] [cpus]"` — the smallest
 * reproducer for a per-query bench/verify failure. */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    System.err.println(f"[queryrun] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
