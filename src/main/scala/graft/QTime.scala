package graft

/** Dev utility: time individual registered queries in a fresh session,
 * three attempts each (attempt 1 exposes the codegen-compile share, 2-3
 * the warm execution). `runMain graft.QTime <query> [<query> ...]` with
 * SPARK_GRAFT_SF_DIR selecting the input. Not part of the bench contract. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("qtime")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args.toSeq; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"[qtime] $n attempt=$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
