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
    // dev experiment knob: SPARK_GRAFT_CONF="key=val;key2=val2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t1 = System.nanoTime()
    val n = df.count()
    val t2 = System.nanoTime()
    // second count on the SAME frame separates one-time cost (closure
    // eval: operator-internal checkpoints/driver loops + first-plan
    // optimization/codegen) from steady-state execution
    val n2 = df.count()
    val t3 = System.nanoTime()
    System.err.println(f"[queryrun] $name rows=$n build=${(t1 - t0) / 1e9}%.2f s " +
      f"count1=${(t2 - t1) / 1e9}%.2f s count2=${(t3 - t2) / 1e9}%.2f s" +
      (if (n2 != n) s" NONDETERMINISTIC n2=$n2" else ""))
    spark.stop()
  }
}
